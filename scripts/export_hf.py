"""Export a trained checkpoint to HF format (reference: scripts/export_v33_hf.py)."""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # run without install
import argparse

from splade_tpu.export import export_checkpoint_to_hf
from splade_tpu.utils.logging import setup_logging

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--tokenizer", default=None)
    args = p.parse_args()
    setup_logging()
    export_checkpoint_to_hf(args.checkpoint, args.output, args.tokenizer)
