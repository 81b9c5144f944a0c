"""TPU impact-index experiment suite.

Reference counterpart: scripts/neural_sparse_search_aws.py (1,930 LoC of
AWS-OpenSearch SEISMIC experiments): (1) baseline method comparison vs an
exact reference, (2) index-parameter sweep, (3) query-parameter sweep. Here
the ANN/SEISMIC knobs map to the TPU index's real knobs:

  experiment 1  exact bf16 vs int8-quantized index      (storage precision)
  experiment 2  query top-k truncation sweep            (query pruning)
  experiment 3  two-phase prune_ratio/expansion sweep   (two-phase processor)

Each reports recall@k against the exact full-precision reference — the same
exact-vs-approximate methodology the reference used (its `:667-827`
SparseEncoder + recall-vs-exact harness).

Usage: python scripts/run_index_experiments.py [--docs N] [--queries N]
(synthetic SPLADE-like sparsity by default; --checkpoint + --corpus to run
on real encodings).
"""

from __future__ import annotations
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # run without install

import argparse
import json
import time
from pathlib import Path

import numpy as np

from splade_tpu.ops.impact_index import TpuImpactIndex
from splade_tpu.utils.logging import setup_logging


def synth_vectors(rng, n, vocab, nnz):
    out = []
    for _ in range(n):
        idx = rng.choice(vocab, size=nnz, replace=False).astype(np.int32)
        vals = (np.abs(rng.normal(size=nnz)) + 0.05).astype(np.float32)
        out.append((idx, vals))
    return out


def recall_vs_exact(got, want, k):
    w = set(d for d, _ in want[:k])
    g = set(d for d, _ in got[:k])
    return len(g & w) / max(len(w), 1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--docs", type=int, default=2000)
    p.add_argument("--queries", type=int, default=64)
    p.add_argument("--vocab", type=int, default=50000)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--output", default="outputs/index_experiments.json")
    args = p.parse_args()
    setup_logging()
    rng = np.random.default_rng(42)
    docs = synth_vectors(rng, args.docs, args.vocab, 54)
    queries = synth_vectors(rng, args.queries, args.vocab, 33)
    doc_ids = [f"d{i}" for i in range(args.docs)]

    def build(**kw):
        idx = TpuImpactIndex(args.vocab, **kw)
        idx.add_batch(doc_ids, docs)
        t0 = time.time()
        idx.build()
        return idx, time.time() - t0

    results = {}
    exact, t_exact = build()
    exact_results = [exact.search_vector(qi, qv, k=args.k * 4) for qi, qv in queries]

    # 1) storage precision
    q8, t_q8 = build(quantize_int8=True)
    rec = np.mean([
        recall_vs_exact(q8.search_vector(qi, qv, k=args.k), exact_results[i], args.k)
        for i, (qi, qv) in enumerate(queries)])
    results["int8_vs_bf16"] = {
        "recall@k_vs_exact": float(rec),
        "memory_mb_exact": round(exact.memory_bytes / 1e6),
        "memory_mb_int8": round(q8.memory_bytes / 1e6),
        "build_s": [round(t_exact, 1), round(t_q8, 1)],
    }
    print("exp1 int8 recall vs exact:", round(float(rec), 4))

    # 2) query top-k truncation sweep (reference: top-64 rank_feature clauses)
    sweep = {}
    for qtk in (8, 16, 32, 64):
        recs = []
        for i, (qi, qv) in enumerate(queries):
            keep = np.argpartition(-qv, min(qtk, len(qv)) - 1)[:qtk]
            got = exact.search_vector(qi[keep], qv[keep], k=args.k)
            recs.append(recall_vs_exact(got, exact_results[i], args.k))
        sweep[str(qtk)] = float(np.mean(recs))
        print(f"exp2 query_top_k={qtk}: recall {np.mean(recs):.4f}")
    results["query_top_k_sweep"] = sweep

    # 3) two-phase prune/expansion sweep
    tp = {}
    for prune in (0.2, 0.4, 0.6):
        for exp in (2.0, 5.0):
            recs = [
                recall_vs_exact(
                    exact.search_two_phase(qi, qv, k=args.k,
                                           prune_ratio=prune, expansion=exp),
                    exact_results[i], args.k)
                for i, (qi, qv) in enumerate(queries)]
            tp[f"prune{prune}_exp{exp}"] = float(np.mean(recs))
            print(f"exp3 prune={prune} expansion={exp}: recall {np.mean(recs):.4f}")
    results["two_phase_sweep"] = tp

    # 4) postings-list truncation sweep (reference: SEISMIC n_postings —
    # the posting-length cap vs recall trade, neural_sparse_search_aws.py
    # parameter sweep). Measured against the same exact reference.
    from splade_tpu.ops.postings_index import TpuPostingsIndex

    ps = {}
    df_cap = max(int(args.docs * 54 / args.vocab * 4), 8)  # ~4x mean df
    for n_post in sorted({8, 32, df_cap, args.docs}):
        pidx = TpuPostingsIndex(args.vocab, n_postings=min(n_post, args.docs),
                                query_top_t=33, approx=False)
        pidx.add_batch(doc_ids, docs)
        pidx.build()
        recs = [
            recall_vs_exact(pidx.search_vector(qi, qv, k=args.k),
                            exact_results[i], args.k)
            for i, (qi, qv) in enumerate(queries)]
        ps[str(n_post)] = {
            "recall@k_vs_exact": float(np.mean(recs)),
            "truncated_pct": round(
                100.0 * pidx.truncated_postings / max(pidx.nnz, 1), 2),
            "memory_mb": round(pidx.memory_bytes() / 1e6, 1),
        }
        print(f"exp4 n_postings={n_post}: recall {np.mean(recs):.4f} "
              f"({ps[str(n_post)]['truncated_pct']}% truncated)")
    results["postings_cap_sweep"] = ps

    # 5) two-phase postings candidate sweep (SEISMIC heap_factor analogue,
    # neural_sparse_search_aws.py query-params experiment): phase 2 re-scores
    # candidates EXACTLY, so recall is bounded only by whether the true
    # top-k appear among the C phase-1 candidates from aggressively
    # truncated (short-cap) postings.
    tp2 = {}
    short_cap = max(4, df_cap // 4)
    base_idx = None
    for C in sorted({args.k, args.k * 2, args.k * 5, args.k * 20}):
        # scoring='scatter' so the candidate count is honored exactly:
        # sort mode caps candidates at T*P, which can be below the larger
        # C sweep points and would silently measure a smaller pool
        if base_idx is None:
            base_idx = TpuPostingsIndex(
                args.vocab, n_postings=short_cap, query_top_t=33,
                approx=False, rescore_candidates=min(C, args.docs),
                scoring="scatter")
            base_idx.add_batch(doc_ids, docs)
            base_idx.build()
            pidx = base_idx
        else:
            # the postings/doc-major structures are C-independent: share
            # them and only re-make the search jit for the new C
            import copy

            pidx = copy.copy(base_idx)
            pidx.rescore_candidates = min(C, args.docs)
            pidx._make_search()
        recs = [
            recall_vs_exact(pidx.search_vector(qi, qv, k=args.k),
                            exact_results[i], args.k)
            for i, (qi, qv) in enumerate(queries)]
        tp2[str(C)] = {
            "recall@k_vs_exact": float(np.mean(recs)),
            "short_cap": short_cap,
            "truncated_pct": round(
                100.0 * pidx.truncated_postings / max(pidx.nnz, 1), 2),
            "memory_mb": round(pidx.memory_bytes() / 1e6, 1),
        }
        print(f"exp5 rescore_candidates={C}: recall {np.mean(recs):.4f} "
              f"(cap {short_cap}, {tp2[str(C)]['truncated_pct']}% truncated)")
    results["two_phase_candidates_sweep"] = tp2

    out = Path(args.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=2))
    print("wrote", out)


if __name__ == "__main__":
    main()
