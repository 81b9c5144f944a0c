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
    # 1. explicit local path
    if name_or_path and Path(name_or_path).exists():
        return name_or_path
    # 2. env override
    env = os.environ.get("SPLADE_TOKENIZER_PATH")
    if env and Path(env).exists():
        return env
    # 3. an explicitly requested HF name resolves via the offline cache —
    # BEFORE the fallback dirs, or an unrelated local artifact would
    # silently shadow the tokenizer the caller asked for by name.
    if name_or_path:
        return name_or_path
    # 4. known local artifact locations (no name given at all)
    for d in _FALLBACK_DIRS:
        if Path(d).exists():
            return d
    return "skt/A.X-Encoder-base"


def create_tokenizer(name_or_path: Optional[str] = None):
    """Load the HF fast tokenizer (reference contract: create_tokenizer).

    An explicitly requested name is honored first (offline HF cache); the
    known local artifact dirs are a LAST resort taken only when that load
    fails, with a warning — never silently shadowing the requested name."""
    import logging

    from transformers import AutoTokenizer

    path = resolve_tokenizer_path(name_or_path)
    try:
        return AutoTokenizer.from_pretrained(path)
    except (OSError, ValueError) as e:
        for d in _FALLBACK_DIRS:
            if Path(d).exists() and str(Path(d)) != str(path):
                logging.getLogger(__name__).warning(
                    "tokenizer %r unavailable (%s); falling back to %s",
                    path, e, d)
                return AutoTokenizer.from_pretrained(d)
        raise
