"""Bound the one assumed term in the serving production estimate.

docs/SERVING_PRODUCTION_ESTIMATE.json (round 2) derived production latency
from pipelined device time plus a single ASSUMED term:
``colocated_dispatch_ms: 0.8`` — the host-side cost of dispatching the
fused search executable plus an HTTP loopback, for a server co-located
with its TPU (no tunnel). This script replaces the assumption with a
measured bracket (VERDICT r2 #8):

1. **PJRT dispatch overhead** — a jitted program with the SAME argument
   surface as the production fused search (the 149M-param pytree of ~200
   arrays + 6 index arrays + ids/mask) but a trivial body, executed on
   this host's LOCAL CPU PJRT backend. Per-call wall time measures
   python->jax->PJRT argument handling + enqueue + completion sync with
   ~zero compute. The client-side dispatch path is identical code for CPU
   and a local TPU PJRT plugin; only the device-side enqueue differs —
   stated as such in the artifact.
2. **HTTP loopback** — p50 round trip of a small JSON POST against a
   live local HTTP server (the repo's own SearchService skeleton with a
   stub engine), 127.0.0.1.

Writes the bracket into SERVING_PRODUCTION_ESTIMATE.json, replacing the
``assumption`` block with ``measured_bracket`` and re-deriving the
production rows from its upper edge.

    JAX_PLATFORMS=cpu python scripts/measure_dispatch_overhead.py
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import json
import time
from pathlib import Path


def measure_dispatch(reps: int = 200) -> dict:
    from splade_tpu.utils.runtime import force_cpu_if_requested

    force_cpu_if_requested()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from splade_tpu.models.modernbert import ModernBertConfig
    from splade_tpu.models.splade import SpladeEncoder

    # Full-size param pytree: the dispatch cost we are bounding is
    # per-argument handling, so the argument SURFACE must match production
    # (~200 arrays, 149M params) even though the body touches almost none
    # of it.
    cfg = ModernBertConfig()
    model = SpladeEncoder(cfg, pool_impl="streamed", with_token_weights=False)
    ids0 = jnp.zeros((1, 8), jnp.int32)
    params = jax.device_put(
        model.init(jax.random.PRNGKey(0), ids0, jnp.ones_like(ids0))["params"])
    n_arrays = len(jax.tree_util.tree_leaves(params))

    # index-argument stand-ins (shapes irrelevant to dispatch cost scale,
    # but keep realistic count: postings/cluster fused search passes 6)
    idx_args = [jax.device_put(jnp.zeros((128, 128), d))
                for d in (jnp.int32, jnp.int8, jnp.float32,
                          jnp.int32, jnp.int8, jnp.float32)]
    ids = jax.device_put(jnp.zeros((32, 64), jnp.int32))
    mask = jax.device_put(jnp.ones((32, 64), jnp.int32))

    def trivial(p, a0, a1, a2, a3, a4, a5, ids, mask):
        # touch one leaf of each arg class so none is dead-code eliminated
        leaf = jax.tree_util.tree_leaves(p)[0]
        return (leaf.ravel()[0].astype(jnp.float32)
                + a0[0, 0] + a1[0, 0].astype(jnp.float32) + a2[0, 0]
                + a3[0, 0] + a4[0, 0].astype(jnp.float32) + a5[0, 0]
                + ids[0, 0] + mask[0, 0])

    fn = jax.jit(trivial)
    jax.block_until_ready(fn(params, *idx_args, ids, mask))  # compile

    # blocking per-call (dispatch + completion sync)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(params, *idx_args, ids, mask))
        times.append((time.perf_counter() - t0) * 1000)
    blocking = np.percentile(times, [50, 95])

    # pipelined (amortized dispatch: N enqueues, one sync) — the serving
    # engine's dynamic batcher operates in this regime
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn(params, *idx_args, ids, mask)
    jax.block_until_ready(out)
    pipelined = (time.perf_counter() - t0) * 1000 / reps

    return {
        "backend": str(jax.devices()[0].platform),
        "param_arrays": n_arrays,
        "blocking_dispatch_p50_ms": round(float(blocking[0]), 3),
        "blocking_dispatch_p95_ms": round(float(blocking[1]), 3),
        "pipelined_dispatch_ms": round(float(pipelined), 3),
        "reps": reps,
    }


def measure_http_loopback(reps: int = 200) -> dict:
    import http.client
    import threading

    import numpy as np

    from splade_tpu.serving.server import SearchService, create_server

    class StubEngine:  # no device work: isolates the HTTP+JSON cost
        num_docs = 0
        index = type("I", (), {"doc_ids": []})()

        def search_batch(self, queries, k=10):
            return [[] for _ in queries]

        def encode(self, texts, queries=True):
            return [([], []) for _ in texts]

    service = SearchService(StubEngine(), max_batch_size=8, max_wait_ms=0)
    srv = create_server(service, "127.0.0.1", 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        addr = srv.server_address
        body = json.dumps({"queries": ["테스트 질의"], "k": 10}).encode()
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            conn = http.client.HTTPConnection(*addr, timeout=10)
            conn.request("POST", "/search", body=body,
                         headers={"Content-Type": "application/json"})
            conn.getresponse().read()
            conn.close()
            times.append((time.perf_counter() - t0) * 1000)
        return {
            "http_loopback_p50_ms": round(float(np.percentile(times, 50)), 3),
            "http_loopback_p95_ms": round(float(np.percentile(times, 95)), 3),
            "reps": reps,
        }
    finally:
        srv.shutdown()
        service.close()


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=200)
    p.add_argument("--out", default="docs/SERVING_PRODUCTION_ESTIMATE.json")
    args = p.parse_args()

    disp = measure_dispatch(args.reps)
    http_ms = measure_http_loopback(args.reps)
    print(json.dumps({"dispatch": disp, "http": http_ms}, indent=2))

    out = Path(args.out)
    if not out.exists():
        print(f"{out} missing — nothing to update")
        return 1
    est = json.loads(out.read_text())
    # bracket: [pipelined dispatch + loopback p50, blocking p95 + loopback
    # p95] — production serving batches through the dynamic batcher
    # (pipelined regime), so the upper edge is already conservative
    lo = disp["pipelined_dispatch_ms"] + http_ms["http_loopback_p50_ms"]
    hi = (disp["blocking_dispatch_p95_ms"]
          + http_ms["http_loopback_p95_ms"])
    prior = est.pop("assumption", {})
    est["measured_bracket"] = {
        "colocated_dispatch_ms_lo": round(lo, 3),
        "colocated_dispatch_ms_hi": round(hi, 3),
        "dispatch": disp,
        "http_loopback": http_ms,
        "note": ("replaces the round-2 assumed colocated_dispatch_ms="
                 f"{prior.get('colocated_dispatch_ms', 0.8)}: dispatch of a "
                 "trivial-body jitted program with the production fused "
                 "search's full argument surface (149M-param pytree, "
                 f"{disp['param_arrays']} arrays) on the LOCAL CPU PJRT "
                 "backend, plus a live HTTP loopback against the repo's "
                 "server with a stub engine. The python->PJRT client "
                 "dispatch path is the same code for a local TPU plugin; "
                 "device-side enqueue may differ — this bounds the "
                 "host-side component."),
    }
    # re-derive production rows from the bracket's upper edge
    dev = est.get("measured", {}).get("pipelined_device_ms_per_batch", {})
    tok = est.get("measured", {}).get("tokenize_p50_ms", {})
    if dev:
        derived = {}
        for b, ms in dev.items():
            derived[b] = round(ms + tok.get(b, 0.0) + hi, 2)
        est["derived"]["production_p50_ms_est"] = derived
        if "32" in dev:
            per_q = derived["32"] / 32
            est["derived"]["production_per_query_ms_at_B32"] = round(per_q, 3)
            est["derived"]["production_qps_per_chip_est_B32"] = round(
                1000.0 / per_q, 1)
        ref = est.get("reference", {})
        if "opensearch_neural_sparse_p50_ms" in ref and "1" in derived:
            ref["speedup_at_B1"] = round(
                ref["opensearch_neural_sparse_p50_ms"] / derived["1"], 2)
    out.write_text(json.dumps(est, indent=2))
    print(f"updated {out}: bracket [{lo:.3f}, {hi:.3f}] ms")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
