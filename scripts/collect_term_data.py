"""Collect KO-EN terminology pair data for bilingual-synonym training.

Reference: scripts/collect_term_data_v19.py (MUSE + Wikidata + Wikipedia
langlinks + curated IT glossary -> filter/dedup -> pair-type rows) and
scripts/collect_it_terms.py. Mining logic lives in
splade_tpu/preprocessing/term_pairs.py; this driver composes the sources.

Zero-egress behavior: local caches under $SPLADE_TERM_DATA win; the
network collectors degrade to empty with a warning; the builtin IT
glossary always contributes.
"""
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import glob
import json
import os
from pathlib import Path

from splade_tpu.preprocessing.term_pairs import (
    collect_muse,
    collect_wikidata,
    collect_wikipedia,
    filter_and_deduplicate,
    pairs_to_triplets,
    parse_muse_lines,
)
from splade_tpu.utils.logging import setup_logging

IT_GLOSSARY = [
    ("인공지능", "artificial intelligence"), ("머신러닝", "machine learning"),
    ("딥러닝", "deep learning"), ("신경망", "neural network"),
    ("데이터베이스", "database"), ("알고리즘", "algorithm"),
    ("운영체제", "operating system"), ("클라우드", "cloud computing"),
    ("보안", "security"), ("암호화", "encryption"),
    ("네트워크", "network"), ("서버", "server"),
    ("검색엔진", "search engine"), ("색인", "index"),
    ("임베딩", "embedding"), ("토큰화", "tokenization"),
    ("분산처리", "distributed processing"), ("가상화", "virtualization"),
    ("컨테이너", "container"), ("마이크로서비스", "microservices"),
    ("캐시", "cache"), ("압축", "compression"),
    ("병렬처리", "parallel processing"), ("역색인", "inverted index"),
    ("형태소", "morpheme"), ("말뭉치", "corpus"),
    ("자연어처리", "natural language processing"), ("분류기", "classifier"),
    ("정밀도", "precision"), ("재현율", "recall"),
]

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--output", default="data/terms/term_pairs.jsonl")
    p.add_argument("--muse-glob", default=None,
                   help="extra MUSE-format dict files "
                        "(also honors $SPLADE_TERM_DATA/muse/*.txt)")
    p.add_argument("--no-network", action="store_true",
                   help="skip network collectors even if reachable")
    p.add_argument("--stats", default=None,
                   help="optional JSON stats output path")
    args = p.parse_args()
    setup_logging()

    pairs = [{"ko": ko, "en": en, "source": "it_glossary"}
             for ko, en in IT_GLOSSARY]
    if args.muse_glob:
        for fp in sorted(glob.glob(args.muse_glob)):
            with open(fp, encoding="utf-8") as f:
                pairs.extend(parse_muse_lines(f))
    offline_fetch = ((lambda url, params=None: (_ for _ in ()).throw(
        OSError("network disabled (--no-network)"))) if args.no_network
        else None)
    pairs.extend(collect_muse(offline_fetch))
    pairs.extend(collect_wikidata(offline_fetch))
    pairs.extend(collect_wikipedia(offline_fetch))

    unique, rejected = filter_and_deduplicate(pairs)
    rows = pairs_to_triplets(unique)
    out = Path(args.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w", encoding="utf-8") as f:
        for row in rows:
            f.write(json.dumps(row, ensure_ascii=False) + "\n")
    by_source = {}
    for pr in unique:
        by_source[pr["source"]] = by_source.get(pr["source"], 0) + 1
    stats = {"collected": len(pairs), "kept": len(unique),
             "by_source": by_source, "rejected": rejected}
    if args.stats:
        Path(args.stats).write_text(json.dumps(stats, indent=2))
    print(f"wrote {len(rows)} term pairs -> {out} "
          f"(sources: {by_source}; rejected: {sum(rejected.values())})")
