"""Build training triplets from the registered Korean datasets.

Reference: scripts/collect_korean_datasets.py (13 HF sources -> v29 triplets)
— here driven through the preprocessing pipeline/registry; air-gapped hosts
supply raw JSONL drops via $SPLADE_RAW_DATA/<key>.jsonl.
"""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # run without install
import argparse

from splade_tpu.preprocessing import PipelineConfig, PreprocessingPipeline
from splade_tpu.utils.logging import setup_logging

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--output-dir", default="data/v29.0")
    p.add_argument("--datasets", nargs="*", default=[])
    p.add_argument("--limit-per-dataset", type=int, default=0)
    p.add_argument("--shard-size", type=int, default=100_000)
    args = p.parse_args()
    setup_logging()
    cfg = PipelineConfig(output_dir=args.output_dir, datasets=args.datasets,
                         shard_size=args.shard_size)
    PreprocessingPipeline(cfg).run(limit_per_dataset=args.limit_per_dataset)
