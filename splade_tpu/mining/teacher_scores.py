"""Teacher-score precompute for MarginMSE KD.

Reference: scripts/precompute_teacher_scores.py:44-351 — md5-dedup unique
texts, encode once with the dense teacher, attach per-triplet
``teacher_pos_score`` / ``teacher_neg_score`` (cosine via normalized dot),
write augmented JSONL, and cache ``teacher_embeddings.npy`` +
``text_to_idx.json`` for reuse by the multi-negative miner.
"""

from __future__ import annotations

import hashlib
import json
import logging
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)


def _text_key(text: str) -> str:
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def collect_unique_texts(rows: Sequence[dict]) -> tuple[List[str], Dict[str, int]]:
    """All distinct query/positive/negative texts, keyed by md5."""
    texts: List[str] = []
    key_to_idx: Dict[str, int] = {}
    for row in rows:
        cands = [row.get("query"), row.get("positive"), row.get("negative")]
        cands.extend(row.get("negatives") or [])
        for t in cands:
            if not t:
                continue
            k = _text_key(t)
            if k not in key_to_idx:
                key_to_idx[k] = len(texts)
                texts.append(t)
    return texts, key_to_idx


def precompute_teacher_scores(
    input_paths: Sequence[str] | str,
    output_path: str,
    teacher,
    cache_dir: Optional[str] = None,
) -> dict:
    """Augment triplet shards with teacher scores.

    ``teacher`` needs ``encode(texts) -> [N, D]`` (normalized). The embedding
    cache is reused if present (idempotent pipelines; reference
    run_v34_pipeline.sh skip-if-cached behavior).
    """
    import glob as _glob

    if isinstance(input_paths, str):
        input_paths = [input_paths]
    files: List[str] = []
    for p in input_paths:
        files.extend(sorted(_glob.glob(p)) or ([p] if Path(p).exists() else []))
    rows: List[dict] = []
    for fp in files:
        with open(fp, encoding="utf-8") as f:
            rows.extend(json.loads(l) for l in f if l.strip())

    texts, key_to_idx = collect_unique_texts(rows)
    cache = Path(cache_dir) if cache_dir else Path(output_path).parent / "teacher_cache"
    cache.mkdir(parents=True, exist_ok=True)
    emb_path = cache / "teacher_embeddings.npy"
    idx_path = cache / "text_to_idx.json"
    if emb_path.exists() and idx_path.exists():
        emb = np.load(emb_path)
        key_to_idx = json.loads(idx_path.read_text())
        logger.info("reusing cached embeddings: %s (%d texts)", emb_path, len(emb))
    else:
        logger.info("encoding %d unique texts with teacher", len(texts))
        emb = np.asarray(teacher.encode(texts), np.float32)
        np.save(emb_path, emb)
        idx_path.write_text(json.dumps(key_to_idx))

    def score(a: str, b: str) -> float:
        return float(emb[key_to_idx[_text_key(a)]] @ emb[key_to_idx[_text_key(b)]])

    n_scored = 0
    out_path = Path(output_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with open(out_path, "w", encoding="utf-8") as f:
        for row in rows:
            try:
                row["teacher_pos_score"] = score(row["query"], row["positive"])
                if row.get("negatives"):
                    row["teacher_neg_scores"] = [
                        score(row["query"], n) for n in row["negatives"]]
                elif row.get("negative"):
                    row["teacher_neg_score"] = score(row["query"], row["negative"])
                n_scored += 1
            except KeyError:
                pass
            f.write(json.dumps(row, ensure_ascii=False) + "\n")
    meta = {"rows": len(rows), "scored": n_scored, "unique_texts": len(key_to_idx),
            "cache": str(cache)}
    logger.info("teacher precompute: %s", meta)
    return meta
