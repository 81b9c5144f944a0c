"""Fill missing 'negative' fields in shards with TF-IDF hard negatives
(reference: scripts/mine_hard_negatives.py)."""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # run without install
import argparse
import glob

from splade_tpu.preprocessing.miners import TfidfHardNegativeMiner
from splade_tpu.utils.logging import setup_logging

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--shards", required=True, help="glob of jsonl shards")
    p.add_argument("--top-k", type=int, default=3)
    args = p.parse_args()
    setup_logging()
    miner = TfidfHardNegativeMiner(top_k=args.top_k)
    for shard in sorted(glob.glob(args.shards)):
        miner.fill_missing_negatives(shard)
