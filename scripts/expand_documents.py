"""Append doc2query expansions to shard positives
(reference: scripts/expand_documents.py)."""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # run without install
import argparse
import glob

from splade_tpu.preprocessing.doc2query import T5QueryGenerator, expand_documents
from splade_tpu.utils.logging import setup_logging

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--shards", required=True)
    p.add_argument("--model", required=True, help="local T5 checkpoint dir")
    p.add_argument("--num-queries", type=int, default=5)
    p.add_argument("--workers", type=int, default=4)
    args = p.parse_args()
    setup_logging()
    gen = T5QueryGenerator(args.model, num_queries=args.num_queries)
    expand_documents(sorted(glob.glob(args.shards)), gen,
                     num_queries=args.num_queries, max_workers=args.workers)
