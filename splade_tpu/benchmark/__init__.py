"""Benchmark harness: retrieval-quality evaluation with BM25 / dense /
neural-sparse / hybrid searchers over in-memory or TPU-resident indexes.

Reference counterpart: benchmark/ (runner, searchers, hybrid_searcher,
score_fusion, metrics, report). The external OpenSearch cluster is replaced
by in-process index backends (exact CPU and TPU impact index), so the whole
suite runs air-gapped and the "index + search" path is testable.
"""

from splade_tpu.benchmark.metrics import (
    QueryResult,
    aggregate_metrics,
    bootstrap_ci,
    paired_t_test,
)
from splade_tpu.benchmark.fusion import (
    LinearFusion,
    RRFFusion,
    WeightedRRFFusion,
    create_fusion,
)

__all__ = [
    "QueryResult",
    "aggregate_metrics",
    "bootstrap_ci",
    "paired_t_test",
    "RRFFusion",
    "LinearFusion",
    "WeightedRRFFusion",
    "create_fusion",
]
