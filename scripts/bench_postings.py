"""Postings-index QPS at corpus scales the dense matrix cannot hold.

At N=10^6 docs x V=50K, the dense int8 impact matrix would need 50 GB HBM
(impossible on a 16 GB v5e); the truncated postings structure needs
O(total postings) — ~0.5 GB at P=2048. This bench measures end-of-index
search QPS at that scale (queries already encoded: top-32 terms), with the
sweep in one jit (lax.scan) so tunnel RPC latency doesn't pollute it and
inputs varying so the remote proxy can't memoize.

Usage: python scripts/bench_postings.py [--docs 1000000] [--batch 256]
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
    p.add_argument("--docs", type=int, default=1_000_000)
    p.add_argument("--nnz-doc", type=int, default=54)
    p.add_argument("--n-postings", type=int, default=2048)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--top-t", type=int, default=32)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--exact-topk", action="store_true",
                   help="lax.top_k instead of approx_max_k")
    p.add_argument("--rescore", type=int, default=0,
                   help=">0: two-phase — short-cap candidates (this many) "
                        "re-scored exactly from the doc-major CSR")
    p.add_argument("--phase1-f32", action="store_true",
                   help="f32 phase-1 accumulator (default: bf16 when "
                        "two-phase — halves the [B, N] memory wall)")
    p.add_argument("--scoring", default="scatter",
                   choices=["scatter", "sort"],
                   help="scatter: [B, N] accumulator (O(N)/batch); sort: "
                        "sort+segment-sum over the [B, T*P] gathered "
                        "postings — corpus-size-independent")
    p.add_argument("--index", default="postings",
                   choices=["postings", "cluster"],
                   help="cluster = cluster-summary union index "
                        "(TpuClusterIndex)")
    p.add_argument("--cluster-size", type=int, default=64)
    p.add_argument("--probes", type=int, default=32)
    p.add_argument("--posting-cap", type=int, default=64)
    p.add_argument("--posting-candidates", type=int, default=128)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from splade_tpu.ops.cluster_index import TpuClusterIndex
    from splade_tpu.ops.postings_index import TpuPostingsIndex

    V = 50_000
    rng = np.random.default_rng(0)
    t0 = time.time()
    if args.index == "cluster":
        idx = TpuClusterIndex(V, cluster_size=args.cluster_size,
                              n_probes=args.probes, query_top_t=args.top_t,
                              posting_cap=args.posting_cap,
                              posting_candidates=args.posting_candidates)
    else:
        idx = TpuPostingsIndex(V, n_postings=args.n_postings,
                               query_top_t=args.top_t,
                               approx=not args.exact_topk,
                               rescore_candidates=args.rescore)
    # bulk synthetic corpus (shared recipe: splade_tpu.utils.synth)
    from splade_tpu.utils.synth import zipf_corpus_csr

    all_idx, all_val = zipf_corpus_csr(rng, args.docs, V, args.nnz_doc)
    idx.add_csr([f"d{i}" for i in range(args.docs)], all_idx, all_val)
    gen_s = time.time() - t0
    t0 = time.time()
    idx.build()
    build_s = time.time() - t0

    n = len(idx.doc_ids)
    B, T, K, R = args.batch, args.top_t, args.k, args.reps
    approx = idx.approx

    def qset():
        qi = rng.integers(0, V, size=(R, B, T)).astype(np.int32)
        qv = (np.abs(rng.normal(size=(R, B, T))).astype(np.float32) + 0.1)
        return jnp.asarray(qi), jnp.asarray(qv)

    if args.index == "cluster":
        from splade_tpu.ops.cluster_index import cluster_search_topk

        with_post = bool(args.posting_cap)

        @jax.jit
        def csweep(built_and_dm, q_idx, q_val):
            summary, cluster_docs, *rest = built_and_dm
            post = tuple(rest[:3]) if with_post else None
            d_terms, d_vals, d_scale = rest[3:6] if with_post else rest[:3]

            def body(acc0, q):
                qi_, qv_ = q
                vals, _ = cluster_search_topk(
                    summary, cluster_docs, post, d_terms, d_vals, d_scale,
                    qi_, qv_, K, V, args.probes, n, args.posting_candidates,
                    posting_scoring=idx.posting_scoring)
                return acc0 + vals.sum(), None

            out, _ = jax.lax.scan(body, jnp.float32(0.0), (q_idx, q_val))
            return out

        arrs = (*idx._built, *idx._doc_major)
        qi, qv = qset()
        float(csweep(arrs, qi, qv))  # compile+warm
        times = []
        for _ in range(3):
            qi, qv = qset()
            jax.block_until_ready((qi, qv))
            t0 = time.time()
            float(csweep(arrs, qi, qv))
            times.append(time.time() - t0)
        dt = min(times)
        qps = R * B / dt
        print(json.dumps({
            "metric": "cluster_index_qps",
            "device": str(jax.devices()[0]),
            "docs": n,
            "cluster_size": args.cluster_size,
            "n_probes": args.probes,
            "n_clusters": idx.n_clusters,
            "posting_cap": args.posting_cap,
            "posting_candidates": args.posting_candidates,
            "candidate_pool": idx.rescore_candidates,
            "device_mb": round(idx.memory_bytes() / 1e6, 1),
            "build_s": round(build_s, 1),
            "corpus_gen_s": round(gen_s, 1),
            "batch": B,
            "qps": round(qps, 1),
            "ms_per_query": round(1e3 / qps, 4),
            "topk": "exact (rescored union)",
            "runs_s": [round(t, 3) for t in times],
        }))
        return

    post_docs, post_w, scale = idx._built

    from splade_tpu.ops.postings_index import (
        postings_score_topk, postings_two_phase_topk)

    # doc-major arrays are ARGUMENTS (closure constants ship inside the
    # remote compile request); zero-size placeholders when single-phase.
    doc_major = (idx._doc_major if args.rescore else
                 (jnp.zeros((0, 0), jnp.int32), jnp.zeros((0, 0), jnp.int8),
                  jnp.zeros((0,), jnp.float32)))

    @jax.jit
    def sweep(post_docs, post_w, scale, d_terms, d_vals, d_scale,
              q_idx, q_val):
        def body(acc0, q):
            qi, qv = q
            p1 = jnp.float32 if args.phase1_f32 else jnp.bfloat16
            if args.rescore:
                vals, _ = postings_two_phase_topk(
                    post_docs, post_w, scale, d_terms, d_vals, d_scale,
                    qi, qv, K, n, V, min(args.rescore, n), approx,
                    phase1_dtype=p1, scoring=args.scoring)
            else:
                vals, _ = postings_score_topk(post_docs, post_w, scale, qi,
                                              qv, K, n, approx,
                                              scoring=args.scoring)
            return acc0 + vals.sum(), None

        out, _ = jax.lax.scan(body, jnp.float32(0.0), (q_idx, q_val))
        return out

    qi, qv = qset()
    float(sweep(post_docs, post_w, scale, *doc_major, qi, qv))  # compile+warm
    # NOTE: timing must force a scalar FETCH — on the remote-execution
    # backend block_until_ready can return before the work completes.
    times = []
    for _ in range(3):
        qi, qv = qset()
        jax.block_until_ready((qi, qv))
        t0 = time.time()
        float(sweep(post_docs, post_w, scale, *doc_major, qi, qv))
        times.append(time.time() - t0)
    dt = min(times)
    qps = R * B / dt
    print(json.dumps({
        "metric": "postings_index_qps",
        "device": str(jax.devices()[0]),
        "docs": n,
        "n_postings": args.n_postings,
        "truncated_pct": round(100.0 * idx.truncated_postings / idx.nnz, 2),
        "device_mb": round(idx.memory_bytes() / 1e6, 1),
        "dense_int8_equivalent_mb": round(n * V / 1e6, 1),
        "build_s": round(build_s, 1),
        "corpus_gen_s": round(gen_s, 1),
        "batch": B,
        "qps": round(qps, 1),
        "ms_per_query": round(1e3 / qps, 4),
        # the sort aggregation is always exact top-k over its pool
        "topk": ("exact" if args.scoring == "sort" or not approx
                 else "approx"),
        "rescore_candidates": args.rescore,
        "scoring": args.scoring,
        "runs_s": [round(t, 3) for t in times],
    }))


if __name__ == "__main__":
    main()
