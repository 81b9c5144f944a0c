from splade_tpu.utils.logging import setup_logging, MetricWriter
from splade_tpu.utils.metrics import MovingAverage, WindowedAverage, MetricsTracker

__all__ = [
    "setup_logging",
    "MetricWriter",
    "MovingAverage",
    "WindowedAverage",
    "MetricsTracker",
]
