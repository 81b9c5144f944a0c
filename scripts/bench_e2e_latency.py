"""End-to-end query latency: ModernBERT encode + top-64 truncation + int8
impact-index matmul + top-10, fused into one executable.

Comparable headline: the reference's OpenSearch neural_sparse p50 of
9.4-9.6 ms per query (model card, 10K-doc corpora) — that includes a GPU
encode and an HTTPS round-trip. Here the whole path is on-device; the sweep
runs as a lax.scan inside one jit so tunnel RPC latency (~50-70 ms/dispatch
on the dev chip) doesn't pollute the number, and each iteration uses a
different query batch so the remote proxy can't memoize.

Usage: python scripts/bench_e2e_latency.py [--batch 1 8 32]
"""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # run without install

import argparse
import json
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, nargs="+", default=[1, 8, 32])
    p.add_argument("--docs", type=int, default=10_000)
    p.add_argument("--reps", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from splade_tpu.models.modernbert import ModernBertConfig
    from splade_tpu.models.splade import SpladeEncoder
    from splade_tpu.ops.impact_index import TpuImpactIndex
    from splade_tpu.serving.engine import make_fused_search_fn

    V, NNZ_D, QLEN, K = 50000, 54, 64, 10
    rng = np.random.default_rng(0)

    mcfg = ModernBertConfig(dtype=jnp.bfloat16, remat=False)
    model = SpladeEncoder(mcfg, pool_impl="streamed", with_token_weights=False)
    ids0 = jnp.zeros((1, 16), jnp.int32)
    params = jax.device_put(
        model.init(jax.random.PRNGKey(0), ids0, jnp.ones_like(ids0))["params"])

    index = TpuImpactIndex(V, quantize_int8=True)
    for i in range(args.docs):
        cols = rng.choice(V, size=NNZ_D, replace=False)
        index.add(f"d{i}", cols.astype(np.int32),
                  np.abs(rng.normal(size=NNZ_D)).astype(np.float32) + 0.1)
    index.build()
    mat, scale, n_valid = index.device_arrays()

    fused = make_fused_search_fn(model, banned=None, query_top_k=64,
                                 is_int8=True)

    results = {}
    for B in args.batch:
        # Distinct value sets for warm vs timed runs: the remote-execution
        # proxy memoizes identical (executable, args) calls.
        def qset():
            ids = rng.integers(3, V - 2,
                               size=(args.reps, B, QLEN)).astype(np.int32)
            return ids, np.ones((args.reps, B, QLEN), np.int32)

        @jax.jit
        def sweep(params, mat, scale, q_ids, q_mask):
            def body(acc, q):
                ids, mask = q
                vals, idxs = fused(params, mat, scale, ids, mask, n_valid, K)
                return acc + vals.sum(), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), (q_ids, q_mask))
            return acc

        warm_ids, warm_mask = qset()
        float(sweep(params, mat, scale, jnp.asarray(warm_ids),
                    jnp.asarray(warm_mask)))  # compile + warm
        # Timing forces a scalar FETCH: on the remote-execution backend
        # block_until_ready can return before the work completes.
        times = []
        for _ in range(3):
            t_ids, t_mask = qset()
            t_ids, t_mask = jnp.asarray(t_ids), jnp.asarray(t_mask)
            jax.block_until_ready((t_ids, t_mask))  # exclude upload time
            t0 = time.time()
            float(sweep(params, mat, scale, t_ids, t_mask))
            times.append(time.time() - t0)
        dt = min(times)
        per_batch_ms = dt / args.reps * 1e3
        results[B] = {
            "per_batch_ms": round(per_batch_ms, 3),
            "per_query_ms": round(per_batch_ms / B, 3),
            "qps": round(args.reps * B / dt, 1),
            "runs_ms": [round(t / args.reps * 1e3, 2) for t in times],
        }

    print(json.dumps({
        "metric": "e2e_encode_plus_search_latency",
        "unit": "ms/query (on-device, 10K docs int8, top-64 query, k=10)",
        "reference_p50_ms": 9.4,
        "batches": results,
    }, indent=2))


if __name__ == "__main__":
    main()
