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
        'streamed' — fused projection+max, never materializes [B, S, V]
                     (the TPU path; default).
        'logits'   — reference-shaped full-logits path (parity/debug).
    """

    config: ModernBertConfig
    pool_impl: str = "pallas"
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
        transformed = self.mlm.head_transform(hidden)
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
