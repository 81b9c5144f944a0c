"""Production serving tier.

The reference serves queries through an external OpenSearch cluster
(reference: benchmark/index_manager.py:24-45, scripts/demo_neural_sparse_search.py);
this package replaces that with an in-process TPU engine: a fused
encode→search jit (one device dispatch per query batch), a dynamic
micro-batcher that coalesces concurrent requests, and a dependency-free
HTTP server.
"""

from splade_tpu.serving.batcher import DynamicBatcher
from splade_tpu.serving.engine import ServingEngine

__all__ = ["DynamicBatcher", "ServingEngine"]
