"""BM25 analyzer-sensitivity experiment (VERDICT r1 item 6).

The reference BM25 baseline uses the nori Korean morphological analyzer
(reference: benchmark/index_manager.py:47-79); this repo's default is the
50K WordPiece tokenizer (documented deviation). This script measures how
much the analyzer choice moves BM25 retrieval quality, comparing:

  whitespace | wordpiece | korean-heuristic | morphological (if installed)

over either a benchmark dataset (--dataset, needs $SPLADE_BENCH_DATA or a
triplet val file) or the built-in Korean fixture corpus (--builtin).

Writes docs/ANALYZER_SENSITIVITY.json and prints a table.
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import json
from pathlib import Path


# Small built-in Korean retrieval fixture: queries use bare nouns, documents
# carry josa-inflected forms — the regime where subword/whitespace matching
# loses and morphological normalization wins.
BUILTIN = [
    # (query, positive doc, negative doc)
    ("검색 엔진", "검색엔진은 문서를 색인하고 질의에 답한다", "김치는 발효 음식이다"),
    ("한국어 형태소 분석", "한국어의 형태소를 분석하는 도구가 필요하다", "주식 시장이 급등했다"),
    ("신경망 학습", "신경망을 학습하려면 데이터가 필요하다", "여행 일정을 계획한다"),
    ("희소 벡터", "희소 벡터는 대부분의 차원이 영이다", "축구 경기가 열렸다"),
    ("문서 색인", "문서를 색인에서 빠르게 찾는다", "날씨가 맑고 따뜻하다"),
    ("질의 확장", "질의를 확장하면 재현율이 오른다", "음악회 표를 예매했다"),
    ("임베딩 모델", "임베딩 모델이 문장을 벡터로 바꾼다", "등산로 입구에 도착했다"),
    ("역색인 구조", "역색인은 용어에서 문서로 가는 구조이다", "요리법을 검색한다"),
]


def evaluate(analyzer, corpus, queries, qrels, k=10):
    from splade_tpu.benchmark.bm25 import BM25Index
    from splade_tpu.benchmark.metrics import QueryResult, aggregate_metrics

    idx = BM25Index(analyzer=analyzer)
    idx.add_documents(list(corpus.items()))
    idx.finalize()
    results = []
    for qid, qtext in queries.items():
        ranked = idx.search(qtext, k)
        results.append(QueryResult(qid, [d for d, _ in ranked],
                                   qrels.get(qid, set()), 0.0))
    return aggregate_metrics(results)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default=None,
                   help="benchmark dataset name (needs local data); "
                        "omit for the synthetic Korean morphology fixture")
    p.add_argument("--val-files", default=None)
    p.add_argument("--sample-size", type=int, default=500)
    p.add_argument("--builtin", action="store_true",
                   help="use the tiny 8-query hand-written fixture instead "
                        "of the generated morphology corpus (smoke only — "
                        "it cannot support quantitative claims)")
    p.add_argument("--docs", type=int, default=1200)
    p.add_argument("--queries", type=int, default=240)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="docs/ANALYZER_SENSITIVITY.json")
    args = p.parse_args()

    from splade_tpu.benchmark.bm25 import (
        korean_heuristic_analyzer, make_morphological_analyzer,
        make_wordpiece_analyzer, whitespace_analyzer)

    if args.dataset:
        from splade_tpu.benchmark.data import load_benchmark, load_triplet_benchmark

        if args.dataset == "triplet-val":
            data = load_triplet_benchmark(args.val_files, args.sample_size)
        else:
            data = load_benchmark(args.dataset)
        corpus, queries, qrels = data.corpus, data.queries, data.qrels
        source = data.name
    elif args.builtin:
        corpus, queries, qrels = {}, {}, {}
        for i, (q, pos, neg) in enumerate(BUILTIN):
            corpus[f"d{i}_pos"], corpus[f"d{i}_neg"] = pos, neg
            queries[f"q{i}"] = q
            qrels[f"q{i}"] = {f"d{i}_pos"}
        source = "builtin-korean-fixture"
    else:
        import numpy as np

        from splade_tpu.utils.synth import korean_morph_benchmark

        corpus, queries, qrels = korean_morph_benchmark(
            np.random.default_rng(args.seed), n_docs=args.docs,
            n_queries=args.queries)
        source = (f"synthetic-korean-morphology (seed {args.seed}: random "
                  "Hangul noun stems rendered with josa particles in docs, "
                  "bare in queries)")

    analyzers = {
        "whitespace": whitespace_analyzer,
        "korean-heuristic": korean_heuristic_analyzer,
    }
    try:
        from splade_tpu.utils.tokenizer import create_tokenizer

        analyzers["wordpiece"] = make_wordpiece_analyzer(create_tokenizer())
    except Exception as e:  # no local tokenizer artifact
        print(f"wordpiece analyzer unavailable: {e}")
    try:
        analyzers["morphological"] = make_morphological_analyzer()
    except ImportError as e:
        print(f"morphological analyzer unavailable: {e}")

    report = {"source": source, "num_queries": len(queries),
              "num_docs": len(corpus), "analyzers": {},
              "caveat": ("on the synthetic fixture the heuristic's ceiling "
                         "is partly by construction — the generator's josa "
                         "inventory is a subset of the heuristic's suffix "
                         "table; real Korean adds morphology (conjugation, "
                         "compounding, spacing errors) it cannot strip. The "
                         "defensible claim is the RANKING "
                         "morphological>=heuristic>>whitespace>wordpiece "
                         "and its magnitude, matching the reference's "
                         "choice of the nori analyzer for BM25 "
                         "(index_manager.py:47-79).")}
    for name, an in analyzers.items():
        m = evaluate(an, corpus, queries, qrels)
        report["analyzers"][name] = {
            k: round(v, 4) for k, v in m.items()
            if k in ("recall@1", "recall@5", "recall@10", "mrr", "ndcg@10")}
        print(f"{name:18s} R@1={m['recall@1']:.3f} R@5={m['recall@5']:.3f} "
              f"MRR={m['mrr']:.3f}")

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(report, indent=2))
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
