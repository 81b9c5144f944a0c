"""Sparse-retrieval QPS benchmark on the TPU impact index.

Target (BASELINE.md): >=10k QPS per v5e chip at ~54 nnz/doc, ~33 nnz/query,
10K-doc corpus (the published benchmark scale). Reference p50 for one
OpenSearch neural_sparse query: 9.4-9.6 ms.

Measurement protocol: the query sweep runs as a lax.scan INSIDE one jit call
so per-dispatch RPC latency (~50-70 ms on the tunneled dev chip) doesn't
pollute the number; plain repeated dispatch both adds that latency and can
be memoized by the remote-execution proxy.
"""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # run without install
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from splade_tpu.ops.impact_index import TpuImpactIndex

V, N, NNZ_D, NNZ_Q, B, K, REPS = 50000, 10000, 54, 33, 256, 10, 20


def main():
    rng = np.random.default_rng(0)
    idx = TpuImpactIndex(V, quantize_int8=True)
    for i in range(N):
        cols = rng.choice(V, size=NNZ_D, replace=False)
        idx.add(f"d{i}", cols.astype(np.int32),
                np.abs(rng.normal(size=NNZ_D)).astype(np.float32) + 0.1)
    t0 = time.time()
    idx.build()
    build_s = time.time() - t0

    Q = np.zeros((REPS, B, V), np.float32)
    for r in range(REPS):
        for b in range(B):
            cols = rng.choice(V, size=NNZ_Q, replace=False)
            Q[r, b, cols] = np.abs(rng.normal(size=NNZ_Q)) + 0.1

    mat, scale, nv = idx._mat, idx._scale, len(idx.doc_ids)

    @jax.jit
    def sweep(mat, Qs):
        def body(c, q):
            scores = jax.lax.dot_general(
                q.astype(jnp.bfloat16), mat.astype(jnp.bfloat16).T,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32) * scale
            scores = jnp.where(jnp.arange(scores.shape[1])[None, :] < nv,
                               scores, -jnp.inf)
            v, _ = jax.lax.top_k(scores, K)
            return c + v.sum(), None
        s, _ = jax.lax.scan(body, jnp.float32(0), Qs)
        return s

    Qd = jax.device_put(Q)
    _ = float(sweep(mat, Qd))  # compile + warm
    t0 = time.time()
    _ = float(sweep(mat, Qd))
    dt = time.time() - t0
    qps = REPS * B / dt
    print(json.dumps({
        "metric": "sparse_qps_per_chip",
        "device_qps": round(qps),
        "ms_per_batch": round(dt / REPS * 1000, 2),
        "batch": B, "docs": N, "vocab": V, "k": K,
        "index_mb": round(idx.memory_bytes / 1e6),
        "build_upload_s": round(build_s, 1),
        "vs_target_10k": round(qps / 10000, 2),
    }))


if __name__ == "__main__":
    main()
