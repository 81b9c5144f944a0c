"""SPLADE-max encoder: ModernBERT backbone + fused vocabulary pooling.

Reference behavior: src/model/splade_modern.py:19-114 (SPLADEModernBERT).
Forward returns (sparse_repr [B, V], token_weights [B, S]); ``encode`` is the
inference shortcut; ``top_k_tokens`` is the debug decode.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from splade_tpu.models.modernbert import ModernBertConfig, ModernBertForMaskedLM
from splade_tpu.ops.splade_pool import splade_pool_from_logits, splade_pool_streamed


class SpladeEncoder(nn.Module):
    """SPLADE-max model over a ModernBERT MLM backbone.

    pool_impl:
        'streamed' — XLA vocab-tile projection+max, never materializes
                     [B, S, V] (the measured-fastest TPU path; default —
                     docs/TRAIN_VARIANTS.json).
        'pallas'   — hand-fused Pallas kernel (custom VJP; measured ~6%
                     slower than 'streamed' on v5e).
        'logits'   — reference-shaped full-logits path (parity/debug).
    """

    config: ModernBertConfig
    pool_impl: str = "streamed"
    pool_tile: int = 6250
    pallas_tile_v: int = 512
    with_token_weights: bool = True
    """False skips the per-position monitoring maxima (training fast path)."""

    def setup(self) -> None:
        self.mlm = ModernBertForMaskedLM(self.config, name="mlm")

    def __call__(
        self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        hidden = self.mlm.encode(input_ids, attention_mask)
        return self._pool(self.mlm.head_transform(hidden), attention_mask)

    def _pool(
        self, transformed: jnp.ndarray, attention_mask: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """[B, S, H] head-transformed states -> (sparse [B, V], token_w [B, S])."""
        if self.pool_impl == "logits":
            logits = self.mlm.project_vocab(transformed)
            return splade_pool_from_logits(logits, attention_mask)
        emb, bias = self.mlm.decoder_weights()
        if self.pool_impl == "pallas":
            from splade_tpu.ops.fused_splade import fused_splade_pool

            return fused_splade_pool(
                transformed, emb.astype(transformed.dtype), bias,
                attention_mask, self.pallas_tile_v)
        return splade_pool_streamed(
            transformed, emb, bias, attention_mask, tile=self.pool_tile,
            with_token_weights=self.with_token_weights)

    def forward_packed_qd(
        self,
        query_input_ids: jnp.ndarray,
        query_attention_mask: jnp.ndarray,
        doc_input_ids: jnp.ndarray,
        doc_attention_mask: jnp.ndarray,
    ) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]:
        """Queries + docs in ONE backbone forward, queries sequence-packed.

        A seq-64 query row keeps the MXU ~4x less busy per token than a
        seq-256 doc row (small matmul M dim), so the separate query forward
        costs ~37% of the doc forward for ~12% of the tokens (measured,
        docs/STEP_BREAKDOWN.json). Packing S_doc//S_q queries per doc-shaped
        row (RoPE positions restart per segment, attention segment-masked via
        ModernBertForMaskedLM.encode) and concatenating them onto the doc
        batch makes the whole micro-batch one uniform [R, S_doc] stream.
        Results are bit-compatible with the unpacked path up to bf16
        reduction order (tests/test_packed_query.py).

        Returns ((q_sparse [B,V], q_token_w), (d_sparse [D,V], d_token_w)).
        """
        B, Sq = query_input_ids.shape
        D, Sd = doc_input_ids.shape
        if Sd % Sq != 0:
            raise ValueError(f"doc len {Sd} must be a multiple of query len {Sq}")
        pack = Sd // Sq
        rows = -(-B // pack)  # ceil: last row may hold empty (mask-0) segments
        pad_n = rows * pack - B
        q_ids, q_mask = query_input_ids, query_attention_mask
        if pad_n:
            q_ids = jnp.concatenate(
                [q_ids, jnp.zeros((pad_n, Sq), q_ids.dtype)])
            q_mask = jnp.concatenate(
                [q_mask, jnp.zeros((pad_n, Sq), q_mask.dtype)])
        ids = jnp.concatenate([doc_input_ids, q_ids.reshape(rows, Sd)])
        mask = jnp.concatenate([doc_attention_mask, q_mask.reshape(rows, Sd)])
        positions = jnp.concatenate([
            jnp.broadcast_to(jnp.arange(Sd, dtype=jnp.int32), (D, Sd)),
            jnp.broadcast_to(jnp.tile(jnp.arange(Sq, dtype=jnp.int32), pack),
                             (rows, Sd)),
        ])
        segment_ids = jnp.concatenate([
            jnp.zeros((D, Sd), jnp.int32),
            jnp.broadcast_to(
                jnp.repeat(jnp.arange(pack, dtype=jnp.int32), Sq), (rows, Sd)),
        ])
        hidden = self.mlm.encode(ids, mask, positions=positions,
                                 segment_ids=segment_ids)
        transformed = self.mlm.head_transform(hidden)
        t_doc = transformed[:D]
        t_q = transformed[D:].reshape(rows * pack, Sq, -1)[:B]
        doc_out = self._pool(t_doc, doc_attention_mask)
        q_out = self._pool(t_q, query_attention_mask)
        return q_out, doc_out

    def encode(self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
        """Inference shortcut -> sparse_repr [B, V]."""
        return self(input_ids, attention_mask)[0]


def top_k_tokens(
    sparse_repr: jnp.ndarray, tokenizer, k: int = 50
) -> Dict[str, float]:
    """Debug decode of the strongest vocabulary activations for one vector.

    Reference: src/model/splade_modern.py:99-114.
    """
    import numpy as np

    vec = np.asarray(sparse_repr).reshape(-1)
    k = min(k, vec.shape[0])
    top_ids = np.argpartition(-vec, k - 1)[:k]
    top_ids = top_ids[np.argsort(-vec[top_ids])]
    out: Dict[str, float] = {}
    for idx in top_ids:
        val = float(vec[idx])
        if val > 0:
            out[tokenizer.decode([int(idx)]).strip()] = val
    return out
