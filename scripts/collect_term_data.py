"""Collect KO-EN terminology pair data for bilingual-synonym training
(reference: scripts/collect_term_data_v19.py — MUSE/Wikidata/Wikipedia pairs
— and scripts/collect_it_terms.py — curated KO->EN IT glossary).

Sources here: MUSE-format bilingual dictionaries from local files
($SPLADE_TERM_DATA/*.txt, "ko_term en_term" per line) plus the built-in
curated IT glossary. Output: pair-type triplets JSONL.
"""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # run without install
import argparse
import glob
import json
import os
from pathlib import Path

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
]

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--output", default="data/terms/term_pairs.jsonl")
    p.add_argument("--muse-glob", default=None,
                   help="MUSE-format dict files (default $SPLADE_TERM_DATA/*.txt)")
    args = p.parse_args()
    setup_logging()
    pairs = list(IT_GLOSSARY)
    pattern = args.muse_glob or (os.environ.get("SPLADE_TERM_DATA", "") + "/*.txt")
    for fp in sorted(glob.glob(pattern)) if pattern != "/*.txt" else []:
        with open(fp, encoding="utf-8") as f:
            for line in f:
                parts = line.split()
                if len(parts) == 2:
                    pairs.append((parts[0], parts[1]))
    out = Path(args.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w", encoding="utf-8") as f:
        for ko, en in pairs:
            f.write(json.dumps({
                "query": ko, "positive": f"{ko} ({en})",
                "pair_type": "term", "source": "term_glossary",
            }, ensure_ascii=False) + "\n")
    print(f"wrote {len(pairs)} term pairs -> {out}")
