"""Tokenizer resolution for the 50K-vocab Korean ModernBERT checkpoint.

The reference wraps ``AutoTokenizer.from_pretrained(name)`` (reference:
src/train/data/collator.py via train_v33_ddp.py:44,506). On an air-gapped TPU
host the hub is unreachable, so we resolve in order:

1. an explicit local path argument,
2. ``$SPLADE_TOKENIZER_PATH``,
3. the HF name (hits local cache only),
4. known local artifact locations of the exported V33 tokenizer.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

_FALLBACK_DIRS = (
    "assets/tokenizer",
    "/root/reference/huggingface/v33",
)


def resolve_tokenizer_path(name_or_path: Optional[str] = None) -> str:
    if name_or_path and (Path(name_or_path).exists() or "/" not in name_or_path):
        if Path(name_or_path).exists():
            return name_or_path
    env = os.environ.get("SPLADE_TOKENIZER_PATH")
    if env and Path(env).exists():
        return env
    for d in _FALLBACK_DIRS:
        if Path(d).exists():
            return d
    # Last resort: return the given name and let HF try its offline cache.
    return name_or_path or "skt/A.X-Encoder-base"


def create_tokenizer(name_or_path: Optional[str] = None):
    """Load the HF fast tokenizer (reference contract: create_tokenizer)."""
    from transformers import AutoTokenizer

    path = resolve_tokenizer_path(name_or_path)
    return AutoTokenizer.from_pretrained(path)
