"""Pallas-fused SPLADE vocabulary projection + masked seq-max.

The hot op of both training and indexing (SURVEY.md §7 hard part #2):

    m[b, v]      = max over valid s of ( h[b,s,:] . W[v,:] + bias[v] )
    pooled[b, v] = log1p(relu(m[b, v]))

The XLA streamed path (splade_pool.splade_pool_streamed) avoids
materializing [B, S, V] but still round-trips [B, S, tile] f32 score tiles
through HBM for every vocab tile (the dot's output cannot fuse into a
reduction). This kernel keeps each [S, TILE_V] score tile in VMEM: one MXU
matmul per (batch row, vocab tile), bias add, mask, and the seq-max all
happen on-chip; only the [B, V] maxima and [B, S] per-position maxima ever
touch HBM.

Backward (custom VJP): residuals are just the pre-activation maxima m
([B, V] — 12.8 MB at B=64). Each bwd kernel recomputes its score tile on
the MXU, reconstructs the argmax by equality with m, and contracts:

    dH[b]  = sum_vt  G_tile @ W_tile          (grid (B, Vt), dH accumulated)
    dW[vt] = sum_b   G_tile^T @ h_b           (grid (Vt, B), dW accumulated)
    dbias  = sum_b g_pre                      (XLA)

where G = 1[scores == m] * g_pre and g_pre folds the log1p'(relu') factor.
Ties receive duplicate gradient (measure-zero for real activations).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30  # python scalar: a jnp constant would be captured by the kernel


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ------------------------------------------------------------------ forward
def _fwd_kernel(h_ref, w_ref, b_ref, mask_ref, m_ref, pos_ref):
    vt = pl.program_id(1)
    scores = jax.lax.dot_general(
        h_ref[0], w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # [S, TILE_V]
    scores = scores + b_ref[:]                        # [1, TILE_V] broadcast
    masked = jnp.where(mask_ref[0] > 0, scores, NEG)  # mask [S, 1] broadcast
    m_ref[0] = jnp.max(masked, axis=0, keepdims=True)

    @pl.when(vt == 0)
    def _init():
        pos_ref[0] = jnp.full_like(pos_ref[0], NEG)

    pos_ref[0] = jnp.maximum(pos_ref[0], jnp.max(masked, axis=1, keepdims=True))


def _fwd_pallas(h, w_pad, b_pad, mask, tile_v: int):
    B, S, H = h.shape
    Vp = w_pad.shape[0]
    grid = (B, Vp // tile_v)
    m, pos = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, S, H), lambda b, v: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_v, H), lambda b, v: (v, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_v), lambda b, v: (0, v), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 1), lambda b, v: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tile_v), lambda b, v: (b, 0, v), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 1), lambda b, v: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, Vp), jnp.float32),
            jax.ShapeDtypeStruct((B, S, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(h, w_pad, b_pad, mask)
    return m[:, 0, :], pos[..., 0]


# ------------------------------------------------------------------ backward
def _bwd_dh_kernel(h_ref, w_ref, b_ref, mask_ref, m_ref, g_ref, dh_ref):
    vt = pl.program_id(1)
    scores = jax.lax.dot_general(
        h_ref[0], w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) + b_ref[:]
    masked = jnp.where(mask_ref[0] > 0, scores, NEG)
    G = jnp.where(masked == m_ref[0], g_ref[0], 0.0)  # [S, TILE_V]
    partial = jax.lax.dot_general(
        G, w_ref[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # [S, H]

    @pl.when(vt == 0)
    def _init():
        dh_ref[0] = jnp.zeros_like(dh_ref[0])

    dh_ref[0] += partial


def _bwd_dw_kernel(h_ref, w_ref, b_ref, mask_ref, m_ref, g_ref, dw_ref):
    b = pl.program_id(1)
    scores = jax.lax.dot_general(
        h_ref[0], w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) + b_ref[:]
    masked = jnp.where(mask_ref[0] > 0, scores, NEG)
    G = jnp.where(masked == m_ref[0], g_ref[0], 0.0)  # [S, TILE_V]
    partial = jax.lax.dot_general(
        G, h_ref[0].astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # [TILE_V, H]

    @pl.when(b == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref[:])

    dw_ref[:] += partial


def _bwd_pallas(h, w_pad, b_pad, mask, m, g_pre, tile_v: int):
    B, S, H = h.shape
    Vp = w_pad.shape[0]

    def specs(order):
        # order: 'bv' (b slow, vt fast) or 'vb' (vt slow, b fast)
        if order == "bv":
            bmap = lambda b, v: b
            vmap = lambda b, v: v
        else:
            bmap = lambda v, b: b
            vmap = lambda v, b: v
        ins = [
            pl.BlockSpec((1, S, H), lambda *i: (bmap(*i), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_v, H), lambda *i: (vmap(*i), 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_v), lambda *i: (0, vmap(*i)), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 1), lambda *i: (bmap(*i), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_v), lambda *i: (bmap(*i), 0, vmap(*i)), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_v), lambda *i: (bmap(*i), 0, vmap(*i)), memory_space=pltpu.VMEM),
        ]
        return ins

    dh = pl.pallas_call(
        _bwd_dh_kernel,
        grid=(B, Vp // tile_v),
        in_specs=specs("bv"),
        out_specs=pl.BlockSpec((1, S, H), lambda b, v: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, H), jnp.float32),
        interpret=_interpret(),
    )(h, w_pad, b_pad, mask, m, g_pre)
    dw = pl.pallas_call(
        _bwd_dw_kernel,
        grid=(Vp // tile_v, B),
        in_specs=specs("vb"),
        out_specs=pl.BlockSpec((tile_v, H), lambda v, b: (v, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Vp, H), jnp.float32),
        interpret=_interpret(),
    )(h, w_pad, b_pad, mask, m, g_pre)
    return dh, dw


# ------------------------------------------------------------------ wrapper
@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_splade_pool(h, w, bias, mask, tile_v: int = 512):
    """(pooled [B,V] f32, token_weights [B,S] f32) from h [B,S,H], tied
    decoder w [V,H], bias [V], attention mask [B,S]."""
    out, _ = _fused_fwd(h, w, bias, mask, tile_v)
    return out


def _prep(h, w, bias, mask, tile_v):
    V, H = w.shape
    Vp = _cdiv(V, tile_v) * tile_v
    w_pad = jnp.pad(w, ((0, Vp - V), (0, 0))).astype(h.dtype)
    b_full = bias if bias is not None else jnp.zeros((V,), jnp.float32)
    b_pad = jnp.pad(b_full.astype(jnp.float32), (0, Vp - V)).reshape(1, Vp)
    mask3 = mask.astype(jnp.float32)[:, :, None]
    return w_pad, b_pad, mask3


def _fused_fwd(h, w, bias, mask, tile_v):
    V = w.shape[0]
    w_pad, b_pad, mask3 = _prep(h, w, bias, mask, tile_v)
    m, pos = _fwd_pallas(h, w_pad, b_pad, mask3, tile_v)
    m = m[:, :V]
    pooled = jnp.log1p(jax.nn.relu(m))
    token_weights = jnp.log1p(jax.nn.relu(pos)) * mask.astype(jnp.float32)
    return (pooled, token_weights), (h, w, bias, mask, m)


def _fused_bwd(tile_v, res, cotangents):
    g_pooled, _ = cotangents  # token_weights is monitoring-only
    h, w, bias, mask, m = res
    V = w.shape[0]
    Vp = _cdiv(V, tile_v) * tile_v
    # d pooled / d m = 1/(1+m) for m > 0 else 0.
    g_pre = g_pooled * jnp.where(m > 0, 1.0 / (1.0 + m), 0.0)
    g_pad = jnp.pad(g_pre.astype(jnp.float32), ((0, 0), (0, Vp - V)))[:, None, :]
    m_pad = jnp.pad(m.astype(jnp.float32), ((0, 0), (0, Vp - V)),
                    constant_values=np.float32(np.inf))[:, None, :]  # never matches
    w_pad, b_pad, mask3 = _prep(h, w, bias, mask, tile_v)
    dh, dw = _bwd_pallas(h, w_pad, b_pad, mask3, m_pad, g_pad, tile_v)
    dbias = (jnp.sum(g_pre, axis=0).astype(bias.dtype)
             if bias is not None else None)
    dmask = np.zeros(mask.shape, dtype=jax.dtypes.float0)
    return dh.astype(h.dtype), dw[:V].astype(w.dtype), dbias, dmask


fused_splade_pool.defvjp(
    lambda h, w, bias, mask, tile_v: _fused_fwd(h, w, bias, mask, tile_v),
    _fused_bwd,
)
