"""Attach dense-teacher scores to triplet shards (reference:
scripts/precompute_teacher_scores.py). Requires a local BGE-M3-compatible
checkpoint dir (config.json + weights + tokenizer)."""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # run without install
import argparse

from splade_tpu.mining import precompute_teacher_scores
from splade_tpu.models.teachers import BGEM3Teacher
from splade_tpu.utils.logging import setup_logging

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--input", nargs="+", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--teacher-model", required=True,
                   help="local HF dir of the BGE-M3 / XLM-R teacher")
    p.add_argument("--cache-dir", default=None)
    args = p.parse_args()
    setup_logging()
    teacher = BGEM3Teacher.from_hf_dir(args.teacher_model)
    precompute_teacher_scores(args.input, args.output, teacher, args.cache_dir)
