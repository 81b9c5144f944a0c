"""BGE-M3 dense teacher: on-device batched encoding, scoring, soft labels.

Reference: src/model/teachers/bge_m3.py:22-387 — a frozen
sentence-transformer (1024-d normalized dense embeddings) exposing
pairwise/matrix cosine scoring, per-triplet and in-batch soft labels, plus
``KDLossWithBGEM3`` (temperature-scaled KL + MSE). The TPU build runs the
teacher as jitted JAX (XLM-R encoder weight-ported from the BGE-M3
checkpoint) instead of a torch multiprocess pool; when no local checkpoint
exists, the offline-precompute path (scripts/precompute_teacher_scores
equivalent) is the supported KD source, matching the reference's primary
workflow (SURVEY.md §7 hard part 6).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)


class BGEM3Teacher:
    """Frozen dense teacher over a ported XLM-R encoder."""

    def __init__(self, model, params, tokenizer, max_length: int = 512,
                 batch_size: int = 32):
        import jax

        self.model = model
        self.params = jax.device_put(params)
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.batch_size = batch_size
        self._encode_jit = jax.jit(
            lambda p, ids, m: model.apply(
                {"params": p}, ids, m, method=model.encode_cls))

    @classmethod
    def from_hf_dir(cls, model_dir: str, tokenizer=None, **kwargs) -> "BGEM3Teacher":
        import json

        import jax.numpy as jnp

        from splade_tpu.models.xlmr import (
            XlmRobertaConfig, XlmRobertaEncoder, port_xlmr_state_dict)

        d = Path(model_dir)
        cfg = XlmRobertaConfig.from_hf_dict(
            json.loads((d / "config.json").read_text()), dtype=jnp.bfloat16)
        state: Dict[str, Any] = {}
        st = sorted(d.glob("*.safetensors"))
        if st:
            from safetensors.numpy import load_file

            for f in st:
                state.update(load_file(str(f)))
        else:
            import torch

            for f in sorted(d.glob("pytorch_model*.bin")):
                state.update(torch.load(str(f), map_location="cpu", weights_only=True))
        if not state:
            raise FileNotFoundError(f"no weights under {model_dir}")
        params = port_xlmr_state_dict(state, cfg)
        if tokenizer is None:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(model_dir)
        return cls(XlmRobertaEncoder(cfg), params, tokenizer, **kwargs)

    # ------------------------------------------------------------ encode
    def encode(self, texts: Sequence[str]) -> np.ndarray:
        """[N, H] L2-normalized dense embeddings."""
        import jax.numpy as jnp

        out = []
        B = self.batch_size
        for i in range(0, len(texts), B):
            chunk = list(texts[i:i + B])
            pad = B - len(chunk)
            enc = self.tokenizer(
                chunk + [""] * pad, padding="max_length", truncation=True,
                max_length=self.max_length, return_tensors="np")
            emb = self._encode_jit(
                self.params,
                jnp.asarray(enc["input_ids"].astype(np.int32)),
                jnp.asarray(enc["attention_mask"].astype(np.int32)))
            out.append(np.asarray(emb)[: len(chunk)])
        return np.concatenate(out) if out else np.zeros((0, 1), np.float32)

    # ------------------------------------------------------------ scoring
    def score_pairs(self, queries: Sequence[str], docs: Sequence[str]) -> np.ndarray:
        """[N] cosine of aligned (query, doc) pairs (reference: pairwise)."""
        q = self.encode(queries)
        d = self.encode(docs)
        return np.sum(q * d, axis=-1)

    def score_matrix(self, queries: Sequence[str], docs: Sequence[str]) -> np.ndarray:
        """[Nq, Nd] cosine matrix (reference: matrix scoring)."""
        return self.encode(queries) @ self.encode(docs).T

    def soft_labels(self, queries: Sequence[str], positives: Sequence[str],
                    negatives: Sequence[str], temperature: float = 1.0
                    ) -> np.ndarray:
        """[N, 2] per-triplet softmax over (pos, neg) teacher scores."""
        s_pos = self.score_pairs(queries, positives)
        s_neg = self.score_pairs(queries, negatives)
        logits = np.stack([s_pos, s_neg], axis=1) / temperature
        logits -= logits.max(axis=1, keepdims=True)
        e = np.exp(logits)
        return e / e.sum(axis=1, keepdims=True)

    def in_batch_soft_labels(self, queries: Sequence[str], docs: Sequence[str],
                             temperature: float = 1.0) -> np.ndarray:
        """[N, N] row-softmax of the in-batch score matrix."""
        m = self.score_matrix(queries, docs) / temperature
        m -= m.max(axis=1, keepdims=True)
        e = np.exp(m)
        return e / e.sum(axis=1, keepdims=True)


def kd_loss_with_teacher(
    student_scores, teacher_scores, temperature: float = 2.0,
    mse_weight: float = 0.5,
):
    """KDLossWithBGEM3 (reference: bge_m3.py:301-387): KL(teacher||student)
    at temperature T scaled by T^2, plus an MSE term on raw scores."""
    import jax
    import jax.numpy as jnp

    s = jnp.asarray(student_scores, jnp.float32)
    t = jnp.asarray(teacher_scores, jnp.float32)
    t_logp = jax.nn.log_softmax(t / temperature, axis=-1)
    s_logp = jax.nn.log_softmax(s / temperature, axis=-1)
    kl = jnp.mean(jnp.sum(jnp.exp(t_logp) * (t_logp - s_logp), axis=-1))
    mse = jnp.mean((s - t) ** 2)
    return temperature ** 2 * kl + mse_weight * mse
