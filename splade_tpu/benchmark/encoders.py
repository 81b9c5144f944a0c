"""Benchmark-side encoders: batched device encoding to sparse/dense vectors.

Reference: benchmark/encoders.py — NeuralSparseEncoderV33 loads a raw
training checkpoint (:249-402), batch-encodes via DataLoader, extracts
nonzeros into python dicts with special-token and "["/"<"-prefix filtering
and optional per-doc top-k, plus encode_for_query(top_k).

TPU-native changes: vectors stay as (indices, values) arrays end to end —
the per-element nonzero->dict loop (reference encoders.py:160-182, a major
CPU bottleneck) is replaced by batched on-device top-k + a single host
transfer.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

SparseVec = Tuple[np.ndarray, np.ndarray]  # (indices int32, values float32)


class SparseEncoderV33:
    """SPLADE encoder for indexing/search, from a trained params pytree."""

    def __init__(
        self,
        model,
        params,
        tokenizer,
        query_max_length: int = 64,
        doc_max_length: int = 256,
        batch_size: int = 32,
        doc_top_k: int = 0,
        query_top_k: int = 64,
        filter_special: bool = True,
    ):
        import jax

        self.model = model
        # Pin params on device once — host-resident params would be
        # re-uploaded on every jitted call (observed: 24s/query).
        self.params = jax.device_put(params)
        self.tokenizer = tokenizer
        self.query_max_length = query_max_length
        self.doc_max_length = doc_max_length
        self.batch_size = batch_size
        self.doc_top_k = doc_top_k
        self.query_top_k = query_top_k
        self._banned = self._banned_token_mask(tokenizer) if filter_special else None
        self._encode_jit = jax.jit(
            lambda p, ids, m: model.apply({"params": p}, ids, m)[0])
        # Device-side top-k: only [B, k] (values, indices) cross the host
        # boundary instead of the dense [B, V] f32 matrix (200KB/query on
        # the tunneled dev chip). The banned-token mask is applied on device.
        import jax.numpy as jnp

        banned = (jnp.asarray(self._banned) if self._banned is not None else None)

        def encode_topk(p, ids, m, k):
            repr_, _ = model.apply({"params": p}, ids, m)
            if banned is not None:
                repr_ = jnp.where(banned[None, :], 0.0, repr_)
            return jax.lax.top_k(repr_, k)

        self._encode_topk_jit = jax.jit(encode_topk, static_argnums=3)

    @staticmethod
    def _banned_token_mask(tokenizer) -> np.ndarray:
        """Vocab mask of tokens excluded from sparse vectors: special tokens
        and "["/"<"-prefixed markers (reference: encoders.py:168-176)."""
        vocab_size = len(tokenizer)
        banned = np.zeros(vocab_size, bool)
        for tid in tokenizer.all_special_ids:
            if 0 <= tid < vocab_size:
                banned[tid] = True
        vocab = tokenizer.get_vocab()
        for tok, tid in vocab.items():
            if tid < vocab_size and tok[:1] in ("[", "<"):
                banned[tid] = True
        return banned

    def _encode_batch(self, texts: Sequence[str], max_length: int) -> np.ndarray:
        import jax.numpy as jnp

        enc = self.tokenizer(
            list(texts), padding="max_length", truncation=True,
            max_length=max_length, return_tensors="np")
        out = self._encode_jit(
            self.params,
            jnp.asarray(enc["input_ids"].astype(np.int32)),
            jnp.asarray(enc["attention_mask"].astype(np.int32)))
        return np.asarray(out)

    def _to_sparse(self, mat: np.ndarray, top_k: int) -> List[SparseVec]:
        if self._banned is not None:
            mat = mat.copy()
            mat[:, self._banned] = 0.0
        out: List[SparseVec] = []
        for row in mat:
            nz = np.flatnonzero(row > 0)
            vals = row[nz]
            if top_k and len(nz) > top_k:
                keep = np.argpartition(-vals, top_k - 1)[:top_k]
                nz, vals = nz[keep], vals[keep]
            out.append((nz.astype(np.int32), vals.astype(np.float32)))
        return out

    def _encode_texts(self, texts: Sequence[str], max_length: int,
                      top_k: int) -> List[SparseVec]:
        vecs: List[SparseVec] = []
        B = self.batch_size
        for i in range(0, len(texts), B):
            chunk = list(texts[i:i + B])
            pad = B - len(chunk)
            mat = self._encode_batch(chunk + [""] * pad, max_length)[: len(chunk)]
            vecs.extend(self._to_sparse(mat, top_k))
        return vecs

    def encode_documents(self, texts: Sequence[str]) -> List[SparseVec]:
        return self._encode_texts(texts, self.doc_max_length, self.doc_top_k)

    def encode_queries(self, texts: Sequence[str]) -> List[SparseVec]:
        """Query vectors truncated to the strongest ``query_top_k`` tokens
        (reference: searchers.py:161-170 builds top-64 rank_feature clauses).
        Top-k selection happens ON DEVICE; only [B, k] pairs transfer."""
        import jax.numpy as jnp

        if not self.query_top_k:  # 0 = keep the full query vector
            return self._encode_texts(texts, self.query_max_length, 0)
        out: List[SparseVec] = []
        B, k = self.batch_size, self.query_top_k
        for i in range(0, len(texts), B):
            chunk = list(texts[i:i + B])
            pad = B - len(chunk)
            enc = self.tokenizer(
                chunk + [""] * pad, padding="max_length", truncation=True,
                max_length=self.query_max_length, return_tensors="np")
            vals, idxs = self._encode_topk_jit(
                self.params,
                jnp.asarray(enc["input_ids"].astype(np.int32)),
                jnp.asarray(enc["attention_mask"].astype(np.int32)), k)
            vals = np.asarray(vals)[: len(chunk)]
            idxs = np.asarray(idxs)[: len(chunk)]
            for r in range(len(chunk)):
                nz = vals[r] > 0
                out.append((idxs[r][nz].astype(np.int32),
                            vals[r][nz].astype(np.float32)))
        return out

    def encode_for_query(self, text: str) -> SparseVec:
        return self.encode_queries([text])[0]

    @classmethod
    def from_any(cls, path: str, tokenizer=None, **kwargs) -> "SparseEncoderV33":
        """Load from either artifact format: a training checkpoint dir
        (model.msgpack) or an exported HF dir (config.json + safetensors)."""
        from pathlib import Path

        if (Path(path) / "model.msgpack").exists():
            enc = cls.from_checkpoint(path, tokenizer, **kwargs)
        else:
            enc = cls.from_hf_dir(path, tokenizer, **kwargs)
        enc.source_path = str(path)  # cache fingerprinting (runner.py)
        return enc

    @classmethod
    def from_checkpoint(cls, ckpt_dir: str, tokenizer, **kwargs) -> "SparseEncoderV33":
        """Load from a training checkpoint dir (model.msgpack)."""
        import jax
        import jax.numpy as jnp

        from splade_tpu.models.modernbert import ModernBertConfig
        from splade_tpu.models.splade import SpladeEncoder
        from splade_tpu.train.checkpoint import load_params

        import numpy as np_

        cfg = ModernBertConfig(
            vocab_size=len(tokenizer), dtype=jnp.bfloat16,
            pad_token_id=tokenizer.pad_token_id)
        model = SpladeEncoder(cfg, pool_impl="streamed")
        ids = jnp.zeros((1, 8), jnp.int32)
        # Shape-only template (eval_shape): no device-side random init.
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), ids, jnp.ones_like(ids)))
        template = jax.tree_util.tree_map(
            lambda s: np_.zeros(s.shape, s.dtype), shapes["params"])
        params = load_params(ckpt_dir, template)
        return cls(model, params, tokenizer, **kwargs)

    @classmethod
    def from_hf_dir(cls, model_dir: str, tokenizer=None, **kwargs) -> "SparseEncoderV33":
        """Load from an exported HF-format dir (config.json + safetensors)."""
        import jax.numpy as jnp

        from splade_tpu.models.hf_port import load_hf_checkpoint
        from splade_tpu.models.splade import SpladeEncoder

        if tokenizer is None:
            from splade_tpu.utils.tokenizer import create_tokenizer

            tokenizer = create_tokenizer(model_dir)
        cfg, params = load_hf_checkpoint(model_dir, dtype=jnp.bfloat16)
        model = SpladeEncoder(cfg, pool_impl="streamed")
        return cls(model, {"mlm": params}, tokenizer, **kwargs)


class DenseEncoderBase:
    """Interface for dense baseline encoders (reference BgeM3Encoder,
    encoders.py:24-69: 1024-d normalized embeddings)."""

    dim: int = 0

    def encode(self, texts: Sequence[str]) -> np.ndarray:  # [N, dim] normalized
        raise NotImplementedError


class TeacherDenseEncoder(DenseEncoderBase):
    """Runnable dense (BGE-M3) baseline for the benchmark harness.

    Reference: benchmark/encoders.py:24-69 (``BgeM3Encoder`` — normalized
    1024-d sentence embeddings) and :405-422 (``create_encoders_v33`` wires
    the sparse and dense encoders together). The TPU build backs it with the
    ported XLM-R/BGE-M3 teacher (jitted Flax encode) instead of
    sentence-transformers, so the ``semantic`` baseline and every
    sparse+dense hybrid are runnable from the CLI via ``--dense-checkpoint``.
    """

    def __init__(self, teacher):
        self.teacher = teacher
        self.dim = int(teacher.model.config.hidden_size)

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        return self.teacher.encode(texts)

    @classmethod
    def from_hf_dir(cls, model_dir: str, max_length: int = 512,
                    batch_size: int = 16, tokenizer=None) -> "TeacherDenseEncoder":
        from splade_tpu.models.teachers import BGEM3Teacher

        return cls(BGEM3Teacher.from_hf_dir(
            model_dir, tokenizer=tokenizer, max_length=max_length,
            batch_size=batch_size))


class PrecomputedDenseEncoder(DenseEncoderBase):
    """Embeddings from an external model, precomputed to disk.

    Replaces the reference's Bedrock Titan path
    (reference: scripts/run_comprehensive_benchmark.py — a 4th commercial
    embedding model joined into cross-model hybrids) on a zero-egress host:
    compute embeddings with any external service offline, save them with
    :meth:`save_embeddings`, and plug the file into the benchmark runner via
    ``--external-dense``. Lookup is md5(text) -> L2-normalized vector.
    """

    def __init__(self, path: str):
        import hashlib

        z = np.load(path, allow_pickle=False)
        self._hash = hashlib.md5
        hashes = [h.decode() if isinstance(h, bytes) else str(h)
                  for h in z["hashes"]]
        emb = np.asarray(z["embeddings"], np.float32)
        emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-9)
        self._table = dict(zip(hashes, emb))
        self.dim = int(emb.shape[1])

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), np.float32)
        missing = 0
        for i, t in enumerate(texts):
            v = self._table.get(self._hash(t.encode("utf-8")).hexdigest())
            if v is None:
                missing += 1
            else:
                out[i] = v
        if missing:
            raise KeyError(
                f"{missing}/{len(texts)} texts missing from the precomputed "
                "embedding table — re-run the offline embedding job over the "
                "full corpus+queries")
        return out

    @staticmethod
    def save_embeddings(path: str, texts: Sequence[str],
                        embeddings: np.ndarray) -> None:
        import hashlib

        hashes = np.asarray(
            [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts])
        np.savez_compressed(path, hashes=hashes,
                            embeddings=np.asarray(embeddings, np.float32))
