"""HTTP-level serving load test: concurrent clients against the daemon.

Measures what a deployer sees — end-to-end HTTP QPS and latency percentiles
with dynamic micro-batching — complementing the device-level numbers in
scripts/bench_e2e_latency.py. Reference comparable: the OpenSearch
neural_sparse p50 of 9.4 ms/query (model card).

Usage:
    python scripts/bench_serving.py --checkpoint DIR --docs corpus.jsonl \
        [--tokenizer DIR] [--clients 64] [--requests 256] [--index dense]
"""

from __future__ import annotations
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # run without install

import argparse
import http.client
import json
import threading
import time


def run_load(address, n_clients: int, n_requests: int, queries):
    lat, errors = [], []
    lock = threading.Lock()
    counter = {"i": 0}

    def worker():
        while True:
            with lock:
                i = counter["i"]
                if i >= n_requests:
                    return
                counter["i"] += 1
            q = queries[i % len(queries)]
            t0 = time.perf_counter()
            try:
                conn = http.client.HTTPConnection(*address, timeout=120)
                conn.request("POST", "/search",
                             json.dumps({"query": q, "k": 10}).encode())
                resp = conn.getresponse()
                body = json.loads(resp.read())
                conn.close()
                assert resp.status == 200, body
            except Exception as e:  # noqa: BLE001
                with lock:
                    errors.append(repr(e))
                continue
            with lock:
                lat.append(time.perf_counter() - t0)

    threads = [threading.Thread(target=worker) for _ in range(n_clients)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    lat.sort()
    if not lat:
        # all requests failed (e.g. cold compile outlived the client
        # timeout) — report the errors instead of IndexError-ing on lat[-1]
        return {"requests_ok": 0, "errors": len(errors),
                "wall_s": round(wall, 2), "qps": 0.0,
                "error_sample": errors[:3]}
    pick = lambda p: round(lat[min(int(p * len(lat)), len(lat) - 1)] * 1e3, 2)
    return {
        "requests_ok": len(lat),
        "errors": len(errors),
        "wall_s": round(wall, 2),
        "qps": round(len(lat) / wall, 1),
        "latency_ms": {"p50": pick(0.5), "p95": pick(0.95), "p99": pick(0.99)},
        "reference_p50_ms": 9.4,
    }


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--docs", default=None,
                   help="corpus JSONL; omit with --synthetic-docs")
    p.add_argument("--synthetic-docs", type=int, default=0,
                   help="build a synthetic postings index of this many "
                        "docs instead of encoding a corpus (query encoding "
                        "still runs the real model) — serving-layer QPS at "
                        "million-doc scale without hours of doc encoding")
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--clients", type=int, default=64)
    p.add_argument("--requests", type=int, default=256)
    p.add_argument("--index", default="dense",
               choices=["dense", "postings", "cluster"])
    p.add_argument("--n-postings", type=int, default=None,
                   help="postings: list cap (default 2048); cluster: the "
                        "union's posting_cap (default 64)")
    p.add_argument("--rescore", type=int, default=0,
                   help=">0 with --index postings: two-phase search (pair "
                        "with --n-postings 64)")
    p.add_argument("--posting-scoring", default="auto",
                   choices=["auto", "scatter", "sort", "select",
                            "select_sum"],
                   help="postings phase-1 aggregation policy (select/"
                        "select_sum need --rescore > 0)")
    p.add_argument("--max-batch-size", type=int, default=32)
    p.add_argument("--max-wait-ms", type=float, default=5.0)
    args = p.parse_args()
    if not args.docs and not args.synthetic_docs:
        p.error("either --docs or --synthetic-docs is required")
    if args.synthetic_docs and args.index not in ("postings", "cluster"):
        p.error("--synthetic-docs requires --index postings|cluster")

    from splade_tpu.benchmark.encoders import SparseEncoderV33
    from splade_tpu.serving.engine import build_engine_from_docs
    from splade_tpu.serving.server import SearchService, create_server
    from splade_tpu.utils.logging import setup_logging
    from splade_tpu.utils.tokenizer import create_tokenizer

    setup_logging(None)
    tokenizer = create_tokenizer(args.tokenizer or args.checkpoint)
    enc = SparseEncoderV33.from_any(args.checkpoint, tokenizer)
    if args.synthetic_docs:
        import numpy as np

        from splade_tpu.ops.cluster_index import TpuClusterIndex
        from splade_tpu.ops.postings_index import TpuPostingsIndex
        from splade_tpu.serving.engine import ServingEngine

        from splade_tpu.utils.synth import zipf_corpus_csr

        rng = np.random.default_rng(0)
        n, V = args.synthetic_docs, len(tokenizer)
        if args.index == "cluster":
            index = TpuClusterIndex(
                V, query_top_t=32,
                posting_cap=64 if args.n_postings is None
                else args.n_postings,
                posting_candidates=args.rescore or 128)
        else:
            index = TpuPostingsIndex(
                V,
                n_postings=2048 if args.n_postings is None
                else args.n_postings,
                query_top_t=32, rescore_candidates=args.rescore,
                scoring=args.posting_scoring)
        index.add_csr([f"d{i}" for i in range(n)],
                      *zipf_corpus_csr(rng, n, V))
        index.build()
        engine = ServingEngine(enc.model, enc.params, tokenizer, index,
                               query_top_k=32)
        docs = [(f"d{i}", f"한국어 질의 문서 {i}") for i in range(64)]
    else:
        docs = []
        with open(args.docs, encoding="utf-8") as f:
            for line in f:
                if line.strip():
                    d = json.loads(line)
                    docs.append((str(d.get("id", len(docs))),
                                 d.get("text") or d.get("contents") or ""))
        engine = build_engine_from_docs(enc.model, enc.params, tokenizer,
                                        docs, index_type=args.index,
                                        n_postings=args.n_postings,
                                        rescore_candidates=args.rescore,
                                        posting_scoring=args.posting_scoring)
    service = SearchService(engine, max_batch_size=args.max_batch_size,
                            max_wait_ms=args.max_wait_ms, warmup=True)
    srv = create_server(service, "127.0.0.1", 0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()

    queries = [t[:40] for _, t in docs[:64]]
    try:
        stats = run_load(srv.server_address, args.clients, args.requests,
                         queries)
        stats["batcher"] = service.stats()
        print(json.dumps({"metric": "serving_http_load", "index": args.index,
                          "rescore": args.rescore,
                          "num_docs": engine.num_docs,
                          **stats}, ensure_ascii=False))
    finally:
        srv.shutdown()
        service.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
