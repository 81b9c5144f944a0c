"""Sparse-retrieval QPS benchmark on the TPU impact index.

Target (BASELINE.md): >=10k QPS per v5e chip at ~54 nnz/doc, ~33 nnz/query,
10K-doc corpus (the published benchmark scale). Reference latency for one
OpenSearch neural_sparse query: p50 9.4-9.6 ms (~106 QPS/client).
"""
import json
import time

import numpy as np
import jax

from splade_tpu.ops.impact_index import TpuImpactIndex

V, N, NNZ_D, NNZ_Q, B, K = 50000, 10000, 54, 33, 256, 10
rng = np.random.default_rng(0)
idx = TpuImpactIndex(V)
rows = np.zeros((N, V), np.float32)
for i in range(N):
    cols = rng.choice(V, size=NNZ_D, replace=False)
    rows[i, cols] = np.abs(rng.normal(size=NNZ_D)) + 0.1
    idx.add(f"d{i}", cols.astype(np.int32), rows[i, cols])
idx.build()

queries = np.zeros((B, V), np.float32)
for b in range(B):
    cols = rng.choice(V, size=NNZ_Q, replace=False)
    queries[b, cols] = np.abs(rng.normal(size=NNZ_Q)) + 0.1

# device-resident queries: measure pure index throughput
qd = jax.device_put(queries.astype(np.float32))
vals, ids = idx._search_jit(qd, K)
jax.block_until_ready(vals)
t0 = time.time()
reps = 20
for _ in range(reps):
    vals, ids = idx._search_jit(qd, K)
jax.block_until_ready(vals)
dt = time.time() - t0
qps_device = reps * B / dt

# host-roundtrip path (numpy in, ranked lists out)
t0 = time.time()
out = idx.search_batch_dense(queries, K)
host_dt = time.time() - t0
qps_host = B / host_dt

print(json.dumps({
    "metric": "sparse_qps_per_chip",
    "device_qps": round(qps_device),
    "host_roundtrip_qps": round(qps_host),
    "batch": B, "docs": N, "vocab": V, "k": K,
    "index_mb": round(idx.memory_bytes / 1e6),
    "vs_target_10k": round(qps_device / 10000, 2),
}))
