"""SPLADE-max pooling over the 50K vocabulary — the framework's hot op.

Reference math (reference: src/model/splade_modern.py:75-88):

    sparse_repr[b, v]   = max_s( log1p(relu(logits[b, s, v])) * mask[b, s] )
    token_weights[b, s] = max_v( log1p(relu(logits[b, s, v])) * mask[b, s] )

TPU-native insight: ``log1p(relu(x))`` is monotonic non-decreasing with a
fixed point at 0 for x <= 0, and masked positions contribute exactly 0, so
the pooling commutes with the activation:

    sparse_repr[b, v] = log1p(relu( max over valid s of logits[b, s, v] ))

This lets us fuse the [B,S,H] x [H,V] vocab projection with the seq-max
reduction and never materialize the [B, S, V] logits tensor (1.6 GB at
B=64, S=256, V=50K in bf16). ``splade_pool_streamed`` streams vocab tiles
through a rematerialized ``lax.scan``; only [B, V] leaves the loop. The
backward pass recomputes each tile (checkpointed scan body), so peak HBM is
O(B*S*tile) instead of O(B*S*V).

``splade_pool_from_logits`` is the reference-shaped path kept for parity
testing and CPU use.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_NEG = jnp.float32(-1e30)


def splade_pool_from_logits(
    logits: jnp.ndarray, attention_mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference-shaped pooling from full [B, S, V] logits.

    Returns (sparse_repr [B, V] f32, token_weights [B, S] f32).
    """
    mask = attention_mask.astype(jnp.float32)
    scores = jnp.log1p(jax.nn.relu(logits.astype(jnp.float32)))
    scores = scores * mask[:, :, None]
    sparse_repr = scores.max(axis=1)
    token_weights = scores.max(axis=-1)
    return sparse_repr, token_weights


def splade_pool_streamed(
    transformed: jnp.ndarray,
    emb: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    attention_mask: jnp.ndarray,
    tile: int = 6250,
    with_token_weights: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused vocab-projection + masked seq-max without [B, S, V].

    Args:
        transformed: [B, S, H] MLM-head-transformed hidden states.
        emb: [V, H] tied decoder weights (token embedding matrix).
        bias: [V] decoder bias or None.
        attention_mask: [B, S] 1/0 validity.
        tile: vocab tile width; must divide V (50000 % 6250 == 0).

    Returns:
        (sparse_repr [B, V] f32, token_weights [B, S] f32). token_weights is
        monitoring-only and carries no gradient; with_token_weights=False
        skips its per-position max (a second full [B,S,V] reduction) and
        returns zeros — the training loss never reads it.
    """
    B, S, H = transformed.shape
    V = emb.shape[0]
    if V % tile != 0:
        # Fall back to the largest divisor <= tile.
        tile = next(t for t in range(tile, 0, -1) if V % t == 0)
    n_tiles = V // tile
    emb_tiles = emb.reshape(n_tiles, tile, H)
    bias_tiles = (
        bias.reshape(n_tiles, tile)
        if bias is not None
        else jnp.zeros((n_tiles, tile), jnp.float32)
    )
    maskb = attention_mask.astype(bool)[:, :, None]  # [B, S, 1]

    @jax.checkpoint
    def body(carry, wt):
        w, b = wt  # [tile, H], [tile]
        logits = jax.lax.dot_general(
            transformed, w,
            dimension_numbers=(((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b.astype(jnp.float32)  # [B, S, tile]
        masked = jnp.where(maskb, logits, _NEG)
        pooled = masked.max(axis=1)  # [B, tile]
        if with_token_weights:
            pos_max = jax.lax.stop_gradient(masked.max(axis=2))  # [B, S]
            carry = jnp.maximum(carry, pos_max)
        return carry, pooled

    init = jnp.full((B, S), _NEG, jnp.float32)
    pos_max, pooled_tiles = jax.lax.scan(body, init, (emb_tiles, bias_tiles))
    sparse_repr = jnp.log1p(jax.nn.relu(
        jnp.moveaxis(pooled_tiles, 0, 1).reshape(B, V)))
    if not with_token_weights:
        return sparse_repr, jnp.zeros((B, S), jnp.float32)
    token_weights = jnp.log1p(jax.nn.relu(pos_max)) * attention_mask.astype(jnp.float32)
    return sparse_repr, token_weights
