"""splade_tpu — TPU-native Korean SPLADE neural sparse retrieval framework.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of the reference
CUDA/torch pipeline (``sa-project-private-repo/opensearch-neural-pre-train``):

- ModernBERT SPLADE-max encoder (MLM logits -> log1p(relu) -> masked max-pool
  over a 50K vocabulary), fused on TPU so the [B, S, 50000] logits tensor is
  never materialized.
- V33 training recipe: InfoNCE (in-batch + explicit hard negatives) + FLOPS
  regularization with quadratic lambda warmup, optional MarginMSE / KL KD.
- SPMD data-parallel training over a `jax.sharding.Mesh` (ICI collectives in
  place of NCCL DDP), gradient accumulation as a `lax.scan` inside one jitted
  step.
- TPU-resident sparse impact index with batched sparse dot-product + top-k
  query kernels, plus BM25 / dense / hybrid-fusion baselines and the full
  benchmark harness (Recall@k / MRR / nDCG / latency / significance tests).
- Offline tier: preprocessing, hard-negative mining, teacher-score precompute,
  PMI / information-gain analysis, corpus IDF, HuggingFace export.
"""

__version__ = "0.1.0"

# Honor JAX_PLATFORMS=cpu for EVERY entry point that imports this package.
# On hosts whose sitecustomize imports jax (registering the TPU plugin)
# before any script code runs, the env var alone is too late — and a
# "CPU-only" script silently grabbing the single-tenant TPU can deadlock
# against a live training run (observed 2026-08-19: bench_postings.py under
# JAX_PLATFORMS=cpu ran on the chip mid-run). Scripts that import jax
# before splade_tpu should still call force_cpu_if_requested() themselves.
from splade_tpu.utils.runtime import force_cpu_if_requested as _force_cpu

_force_cpu()
del _force_cpu
