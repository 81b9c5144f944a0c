"""Fixed-shape triplet collation for XLA.

Reference behavior: src/train/data/dataloader.py:13-164 (TripletCollator) —
asymmetric query/doc truncation, multi-negative flattening to [B*k, S] with
short lists padded by the last negative or the positive, teacher-score
passthrough ([B] or [B, k]), raw-text/metadata passthrough.

TPU difference (SURVEY.md §7 hard part #4): the reference pads dynamically to
the longest sequence in the batch; XLA requires static shapes, so every batch
is padded to ``query_max_length`` / ``doc_max_length``. The wasted pad FLOPs
are reclaimed by the fused SPLADE pooling and larger effective batches.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np


class TripletCollator:
    def __init__(
        self,
        tokenizer,
        max_length: int = 256,
        query_max_length: Optional[int] = None,
        doc_max_length: Optional[int] = None,
        num_hard_negatives: int = 1,
    ):
        self.tokenizer = tokenizer
        self.query_max_length = query_max_length or max_length
        self.doc_max_length = doc_max_length or max_length
        self.num_hard_negatives = max(int(num_hard_negatives), 1)

    def _tokenize(self, texts: List[str], max_length: int) -> Dict[str, np.ndarray]:
        enc = self.tokenizer(
            texts,
            padding="max_length",
            truncation=True,
            max_length=max_length,
            return_tensors="np",
        )
        return {
            "input_ids": enc["input_ids"].astype(np.int32),
            "attention_mask": enc["attention_mask"].astype(np.int32),
        }

    def _gather_negatives(self, batch: Sequence[Dict[str, Any]]) -> List[str]:
        """Flatten each row to exactly k negative texts.

        Multi-neg rows short of k are padded with their last negative, or the
        positive when empty (reference: dataloader.py:75-92). Single-neg rows
        fall back to the positive when 'negative' is missing.
        """
        k = self.num_hard_negatives
        out: List[str] = []
        for item in batch:
            negs = item.get("negatives")
            if not isinstance(negs, list):
                single = item.get("negative")
                negs = [single] if isinstance(single, str) and single else []
            negs = [n for n in negs if isinstance(n, str) and n]
            while len(negs) < k:
                negs.append(negs[-1] if negs else item["positive"])
            out.extend(negs[:k])
        return out

    def _teacher_scores(
        self, batch: Sequence[Dict[str, Any]]
    ) -> tuple[Optional[np.ndarray], Optional[np.ndarray]]:
        """[B] pos scores and [B, k] neg scores, or (None, None) when absent.

        Reference: dataloader.py:134-151 — pass through when every row has
        them; rows short of k neg scores repeat the last one.
        """
        k = self.num_hard_negatives
        if not all("teacher_pos_score" in it for it in batch):
            return None, None
        pos = np.asarray([float(it["teacher_pos_score"]) for it in batch], np.float32)
        negs = np.zeros((len(batch), k), np.float32)
        for i, it in enumerate(batch):
            raw = it.get("teacher_neg_scores")
            if raw is None:
                raw = [it.get("teacher_neg_score", 0.0)]
            raw = [float(x) for x in (raw if isinstance(raw, list) else [raw])]
            while len(raw) < k:
                raw.append(raw[-1] if raw else 0.0)
            negs[i] = raw[:k]
        return pos, negs

    def __call__(self, batch: Sequence[Dict[str, Any]]) -> Dict[str, Any]:
        queries = [it["query"] for it in batch]
        positives = [it["positive"] for it in batch]
        negatives = self._gather_negatives(batch)
        out: Dict[str, Any] = {}
        q = self._tokenize(queries, self.query_max_length)
        p = self._tokenize(positives, self.doc_max_length)
        n = self._tokenize(negatives, self.doc_max_length)
        out["query_input_ids"], out["query_attention_mask"] = q["input_ids"], q["attention_mask"]
        out["positive_input_ids"], out["positive_attention_mask"] = p["input_ids"], p["attention_mask"]
        out["negative_input_ids"], out["negative_attention_mask"] = n["input_ids"], n["attention_mask"]
        out["num_negatives"] = self.num_hard_negatives
        t_pos, t_neg = self._teacher_scores(batch)
        if t_pos is not None:
            out["teacher_pos_scores"], out["teacher_neg_scores"] = t_pos, t_neg
        out["pair_types"] = [it.get("pair_type", "") for it in batch]
        out["difficulties"] = [it.get("difficulty", "") for it in batch]
        return out
