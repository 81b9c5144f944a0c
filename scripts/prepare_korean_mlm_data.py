"""Prepare a Korean MLM pre-training corpus from local raw text
(reference: scripts/prepare_korean_mlm_data.py — Korean Wikipedia + mC4
cleanup). Input: text/jsonl files; output: cleaned, deduped sentence shards.
"""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # run without install
import argparse
import glob
import json
from pathlib import Path

from splade_tpu.preprocessing.cleaners import KoreanTextCleaner
from splade_tpu.preprocessing.dedup import ExactDeduplicator
from splade_tpu.pmi.cooccurrence import split_sentences
from splade_tpu.utils.logging import setup_logging

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="glob of .txt/.jsonl files")
    p.add_argument("--output-dir", default="data/mlm")
    p.add_argument("--shard-size", type=int, default=500_000)
    p.add_argument("--min-hangul-ratio", type=float, default=0.3)
    args = p.parse_args()
    setup_logging()
    cleaner = KoreanTextCleaner(min_hangul_ratio=args.min_hangul_ratio,
                                min_length=10)
    dedup = ExactDeduplicator()
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    shard, count, kept = [], 0, 0

    def flush():
        global shard, count
        if shard:
            (out_dir / f"mlm_{count:04d}.txt").write_text("\n".join(shard))
            shard.clear()
            count += 1

    for fp in sorted(glob.glob(args.input)):
        with open(fp, encoding="utf-8", errors="replace") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                if line.startswith("{"):
                    try:
                        line = json.loads(line).get("text", "")
                    except json.JSONDecodeError:
                        pass
                for sent in split_sentences(line):
                    cleaned = cleaner.clean(sent)
                    if cleaned and not dedup.is_duplicate(cleaned):
                        shard.append(cleaned)
                        kept += 1
                        if len(shard) >= args.shard_size:
                            flush()
    flush()
    (out_dir / "metadata.json").write_text(json.dumps(
        {"sentences": kept, "shards": count,
         "cleaner": vars(cleaner.stats)}, default=str))
    print(f"kept {kept} sentences in {count} shards -> {out_dir}")
