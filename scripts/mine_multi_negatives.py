"""Mine k hard negatives per triplet from cached teacher embeddings
(reference: scripts/mine_multi_negatives.py)."""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # run without install
import argparse

from splade_tpu.mining import mine_multi_negatives
from splade_tpu.utils.logging import setup_logging

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--cache-dir", required=True)
    p.add_argument("--num-negatives", type=int, default=7)
    p.add_argument("--rank-lo", type=int, default=10)
    p.add_argument("--rank-hi", type=int, default=50)
    p.add_argument("--search-k", type=int, default=100)
    args = p.parse_args()
    setup_logging()
    mine_multi_negatives(args.input, args.output, args.cache_dir,
                         num_negatives=args.num_negatives,
                         rank_lo=args.rank_lo, rank_hi=args.rank_hi,
                         search_k=args.search_k)
