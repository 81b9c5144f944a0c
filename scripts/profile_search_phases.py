"""Decompose two-phase search time: phase 1 (candidate ranking) vs phase 2
(exact rescore), and A/B the rescore implementations (gather vs the
gather-free match kernel, ops/rescore_kernel.py).

Motivated by the round-4 chip rows (docs/PHASE0_COST_MODEL.md
post-measurement verdict): QPS tracked 1/(candidate count) across every
index configuration, implicating the qd[b, terms] element-gather. This
script pins the decomposition instead of inferring it, and measures what
the match kernel buys.

Reuses the agenda's encode cache (d_idx/d_val/q_idx/q_val CSR arrays) so
no encoder pass is needed:

    python scripts/profile_search_phases.py --enc-cache /tmp/enc_r4.npz \
        --n-postings 512 --rescore 1000

Writes docs/STEP_BREAKDOWN.json key ``search_phase_profile_<device>``.
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import json
import time
from pathlib import Path

import numpy as np


def timed(fn, *args, reps=3):
    """Time fn by materializing its outputs on the HOST each rep.

    block_until_ready alone is NOT sufficient on the tunneled axon
    backend: isolated phase timings came back 20x faster than the HBM
    bound (0.11 ms for a 2 GB scatter pass), i.e. the ready signal fires
    before the work is actually done. device_get round-trips the result
    buffers, which cannot complete before the compute has; the (small)
    [B, C]-sized D2H transfer it adds is noise next to the phases being
    measured."""
    import jax

    out = fn(*args)
    jax.device_get(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.device_get(out)
    return (time.perf_counter() - t0) / reps, out


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--enc-cache", default="/tmp/enc_r4.npz")
    p.add_argument("--docs", type=int, default=0,
                   help="truncate corpus (0 = all cached docs)")
    p.add_argument("--queries", type=int, default=1024)
    p.add_argument("--n-postings", type=int, default=512)
    p.add_argument("--rescore", type=int, default=1000)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--out", default="docs/STEP_BREAKDOWN.json")
    p.add_argument("--tiny", action="store_true",
                   help="synthetic micro shapes (CI smoke, no cache needed)")
    p.add_argument("--scoring", default="auto",
                   help="phase-1 scoring (auto|scatter|sort|select|"
                        "select_sum) — 'auto' resolves by device/shape")
    p.add_argument("--key-suffix", default="",
                   help="appended to the STEP_BREAKDOWN.json key so "
                        "profiles of different scorings don't collide")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from splade_tpu.ops.postings_index import TpuPostingsIndex

    if args.tiny:
        rng = np.random.default_rng(0)
        V, N, Q, T, M = 2000, 4096, 64, 8, 16
        d_idx = rng.integers(0, V - 1, (N, M)).astype(np.int32)
        d_val = rng.uniform(0.1, 1.0, (N, M)).astype(np.float32)
        q_idx = rng.integers(0, V - 1, (Q, T)).astype(np.int32)
        q_val = rng.uniform(0.1, 1.0, (Q, T)).astype(np.float32)
        args.n_postings, args.rescore = 16, 32
    else:
        z = np.load(args.enc_cache)
        d_idx, d_val = z["d_idx"], z["d_val"]
        q_idx, q_val = z["q_idx"], z["q_val"]
        V = int(z["vocab_size"])
        if args.docs:
            d_idx, d_val = d_idx[: args.docs], d_val[: args.docs]
        q_idx, q_val = q_idx[: args.queries], q_val[: args.queries]
    N, M = d_idx.shape
    Q, T = q_idx.shape
    dev = jax.devices()[0].device_kind
    print(f"{N} docs x {Q} queries on {dev}; P={args.n_postings} "
          f"C={args.rescore}", flush=True)

    idx = TpuPostingsIndex(V, n_postings=args.n_postings, query_top_t=T,
                           rescore_candidates=args.rescore,
                           scoring=args.scoring)
    t0 = time.time()
    idx.add_csr(
        [str(i) for i in range(N)], d_idx, d_val)
    idx.build()
    print(f"build {time.time()-t0:.0f}s (scoring={idx.resolved_scoring()})",
          flush=True)

    from splade_tpu.ops.postings_index import (dispatch_rescore,
                                               postings_score_topk,
                                               sparse_query_dense)

    post_docs, post_w, scale = idx._built
    d_terms, d_vals, d_scale = idx._doc_major
    qi = jnp.asarray(q_idx)
    qv = jnp.asarray(q_val)
    C = min(args.rescore, N)
    scoring = idx.resolved_scoring()

    # ---- phase 1 alone (candidate ranking)
    p1 = jax.jit(lambda a, b, c, x, y: postings_score_topk(
        a, b, c, x, y, C, N, approx=True, acc_dtype=jnp.bfloat16,
        scoring=scoring))
    t_p1, (_, cand) = timed(p1, post_docs, post_w, scale, qi, qv)

    # ---- phase 2 alone, each implementation, on phase 1's candidates
    cand = jax.block_until_ready(cand)
    res = {}
    for mode in ("gather", "match", "match_rows", "match_xla"):
        f = jax.jit(lambda dt, dv, ds, a, b, c, m=mode: dispatch_rescore(
            dt, dv, ds, a, b, c, V, mode=m))
        try:
            t, out = timed(f, d_terms, d_vals, d_scale, qi, qv, cand)
        except Exception as e:  # a mode may not lower on this backend
            print(f"  rescore[{mode}]: FAILED {type(e).__name__}: {e}",
                  flush=True)
            res[mode] = None
            continue
        res[mode] = t
        print(f"  rescore[{mode}]: {t*1e3:8.1f} ms "
              f"({Q/t:,.0f} QPS rescore-only)", flush=True)

    # ---- agreement check between implementations that ran
    outs = {}
    for mode, t in res.items():
        if t is None:
            continue
        f = jax.jit(lambda dt, dv, ds, a, b, c, m=mode: dispatch_rescore(
            dt, dv, ds, a, b, c, V, mode=m))
        outs[mode] = np.asarray(f(d_terms, d_vals, d_scale, qi, qv, cand))
    modes = list(outs)
    max_diff = max((float(np.abs(outs[a] - outs[b]).max())
                    for i, a in enumerate(modes) for b in modes[i + 1:]),
                   default=0.0)
    print(f"  max score diff across implementations: {max_diff:.2e}",
          flush=True)

    # ---- end-to-end two-phase, per mode
    e2e = {}
    for mode in [m for m, t in res.items() if t is not None]:
        import os

        os.environ["SPLADE_RESCORE"] = mode
        idx.build()  # re-jit under the mode
        t_total, _ = timed(
            lambda: idx._search_jit(qi, qv, args.k))
        e2e[mode] = t_total
        print(f"  e2e[{mode}]: {t_total*1e3:8.1f} ms ({Q/t_total:,.0f} QPS)",
              flush=True)
    os.environ.pop("SPLADE_RESCORE", None)

    entry = {
        "device": dev,
        "docs": N, "queries": Q, "n_postings": args.n_postings,
        "rescore_candidates": C, "phase1_scoring": scoring,
        "phase1_ms": t_p1 * 1e3,
        "rescore_ms": {m: (t * 1e3 if t else None) for m, t in res.items()},
        "e2e_ms": {m: t * 1e3 for m, t in e2e.items()},
        "e2e_qps": {m: Q / t for m, t in e2e.items()},
        "max_score_diff": max_diff,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    out = Path(args.out)
    data = json.loads(out.read_text()) if out.exists() else {}
    key = f"search_phase_profile_{'tpu' if 'TPU' in dev or 'tpu' in dev else 'cpu'}"
    if args.tiny:
        key += "_tiny"
    if args.key_suffix:
        key += f"_{args.key_suffix}"
    data[key] = entry
    out.write_text(json.dumps(data, indent=1))
    print(f"wrote {out} [{key}]", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
