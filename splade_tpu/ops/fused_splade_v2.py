"""Row-blocked variant of the fused SPLADE pool kernel.

v1 (ops/fused_splade.py) issues one [S, H] x [H, TILE_V] matmul per
(batch row, vocab tile) program — ~200 MFLOP each, small enough that MXU
pipeline overhead shows. v2 processes ROW_BLOCK batch rows per program:
the matmul becomes [ROW_BLOCK*S, H] x [H, TILE_V] (~1.6 GFLOP at RB=8),
amortizing weight-tile residency and pipeline ramp.

Same math, same custom-VJP structure as v1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _row_block(B: int, max_rb: int = 8) -> int:
    # Mosaic requires the output block's second-to-last dim to be a multiple
    # of 8 (or equal to the full array dim), so on TPU row_block is 8 or B.
    if B % max_rb == 0:
        return max_rb
    if _interpret():
        for rb in (4, 2, 1):
            if B % rb == 0:
                return rb
    return B


# ------------------------------------------------------------------ forward
def _fwd_kernel(h_ref, w_ref, b_ref, mask_ref, m_ref, pos_ref):
    vt = pl.program_id(1)
    RB, S, H = h_ref.shape
    hf = h_ref[:].reshape(RB * S, H)
    scores = jax.lax.dot_general(
        hf, w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # [RB*S, TILE_V]
    T = scores.shape[-1]
    scores = (scores + b_ref[:]).reshape(RB, S, T)
    masked = jnp.where(mask_ref[:] > 0, scores, NEG)   # mask [RB, S, 1]
    m_ref[:] = jnp.max(masked, axis=1)                 # [RB, TILE_V]

    @pl.when(vt == 0)
    def _init():
        pos_ref[:] = jnp.full_like(pos_ref[:], NEG)

    pos_ref[:] = jnp.maximum(pos_ref[:], jnp.max(masked, axis=2, keepdims=True))


def _bwd_dh_kernel(h_ref, w_ref, b_ref, mask_ref, m_ref, g_ref, dh_ref):
    vt = pl.program_id(1)
    RB, S, H = h_ref.shape
    hf = h_ref[:].reshape(RB * S, H)
    scores = jax.lax.dot_general(
        hf, w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    T = scores.shape[-1]
    scores = (scores + b_ref[:]).reshape(RB, S, T)
    masked = jnp.where(mask_ref[:] > 0, scores, NEG)
    G = jnp.where(masked == m_ref[:][:, None, :], g_ref[:][:, None, :], 0.0)
    partial = jax.lax.dot_general(
        G.reshape(RB * S, T), w_ref[:].astype(jnp.float32),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(vt == 0)
    def _init():
        dh_ref[:] = jnp.zeros_like(dh_ref[:])

    dh_ref[:] += partial.reshape(RB, S, H)


def _bwd_dw_kernel(h_ref, w_ref, b_ref, mask_ref, m_ref, g_ref, dw_ref):
    bb = pl.program_id(1)
    RB, S, H = h_ref.shape
    hf = h_ref[:].reshape(RB * S, H)
    scores = jax.lax.dot_general(
        hf, w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    T = scores.shape[-1]
    scores = (scores + b_ref[:]).reshape(RB, S, T)
    masked = jnp.where(mask_ref[:] > 0, scores, NEG)
    G = jnp.where(masked == m_ref[:][:, None, :], g_ref[:][:, None, :], 0.0)
    partial = jax.lax.dot_general(
        G.reshape(RB * S, T), hf.astype(jnp.float32),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(bb == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref[:])

    dw_ref[:] += partial


def _specs(RB, S, H, tile_v, order):
    if order == "bv":
        bmap = lambda b, v: b
        vmap = lambda b, v: v
    else:
        bmap = lambda v, b: b
        vmap = lambda v, b: v
    return [
        pl.BlockSpec((RB, S, H), lambda *i: (bmap(*i), 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_v, H), lambda *i: (vmap(*i), 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_v), lambda *i: (0, vmap(*i)), memory_space=pltpu.VMEM),
        pl.BlockSpec((RB, S, 1), lambda *i: (bmap(*i), 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((RB, tile_v), lambda *i: (bmap(*i), vmap(*i)), memory_space=pltpu.VMEM),
        pl.BlockSpec((RB, tile_v), lambda *i: (bmap(*i), vmap(*i)), memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_splade_pool_v2(h, w, bias, mask, tile_v: int = 512, row_block: int = 0):
    if row_block and h.shape[0] % row_block:
        # grid floor-divides B // row_block: a non-dividing row_block would
        # silently leave the tail rows uncomputed (garbage output, dropped
        # gradients) — refuse instead
        raise ValueError(
            f"row_block={row_block} must divide batch {h.shape[0]} "
            "(or pass 0 to pick a dividing block automatically)")
    out, _ = _fwd(h, w, bias, mask, tile_v, row_block)
    return out


def _prep(h, w, bias, mask, tile_v):
    V, H = w.shape
    Vp = _cdiv(V, tile_v) * tile_v
    w_pad = jnp.pad(w, ((0, Vp - V), (0, 0))).astype(h.dtype)
    b_full = bias if bias is not None else jnp.zeros((V,), jnp.float32)
    b_pad = jnp.pad(b_full.astype(jnp.float32), (0, Vp - V)).reshape(1, Vp)
    mask3 = mask.astype(jnp.float32)[:, :, None]
    return w_pad, b_pad, mask3


def _fwd(h, w, bias, mask, tile_v, row_block):
    B, S, H = h.shape
    V = w.shape[0]
    RB = row_block or _row_block(B)
    w_pad, b_pad, mask3 = _prep(h, w, bias, mask, tile_v)
    Vp = w_pad.shape[0]
    grid = (B // RB, Vp // tile_v)
    m, pos = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=_specs(RB, S, H, tile_v, "bv")[:4],
        out_specs=[
            pl.BlockSpec((RB, tile_v), lambda b, v: (b, v), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, S, 1), lambda b, v: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Vp), jnp.float32),
            jax.ShapeDtypeStruct((B, S, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(h, w_pad, b_pad, mask3)
    m = m[:, :V]
    pooled = jnp.log1p(jax.nn.relu(m))
    token_weights = jnp.log1p(jax.nn.relu(pos[..., 0])) * mask.astype(jnp.float32)
    return (pooled, token_weights), (h, w, bias, mask, m)


def _bwd(tile_v, row_block, res, cotangents):
    g_pooled, _ = cotangents
    h, w, bias, mask, m = res
    B, S, H = h.shape
    V = w.shape[0]
    RB = row_block or _row_block(B)
    Vp = _cdiv(V, tile_v) * tile_v
    g_pre = g_pooled * jnp.where(m > 0, 1.0 / (1.0 + m), 0.0)
    g_pad = jnp.pad(g_pre.astype(jnp.float32), ((0, 0), (0, Vp - V)))
    m_pad = jnp.pad(m.astype(jnp.float32), ((0, 0), (0, Vp - V)),
                    constant_values=np.float32(np.inf))
    w_pad, b_pad, mask3 = _prep(h, w, bias, mask, tile_v)
    dh = pl.pallas_call(
        _bwd_dh_kernel,
        grid=(B // RB, Vp // tile_v),
        in_specs=_specs(RB, S, H, tile_v, "bv"),
        out_specs=pl.BlockSpec((RB, S, H), lambda b, v: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, H), jnp.float32),
        interpret=_interpret(),
    )(h, w_pad, b_pad, mask3, m_pad, g_pad)
    dw = pl.pallas_call(
        _bwd_dw_kernel,
        grid=(Vp // tile_v, B // RB),
        in_specs=_specs(RB, S, H, tile_v, "vb"),
        out_specs=pl.BlockSpec((tile_v, H), lambda v, b: (v, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Vp, H), jnp.float32),
        interpret=_interpret(),
    )(h, w_pad, b_pad, mask3, m_pad, g_pad)
    dbias = (jnp.sum(g_pre, axis=0).astype(bias.dtype)
             if bias is not None else None)
    dmask = np.zeros(mask.shape, dtype=jax.dtypes.float0)
    return dh.astype(h.dtype), dw[:V].astype(w.dtype), dbias, dmask


fused_splade_pool_v2.defvjp(
    lambda h, w, bias, mask, tile_v, row_block: _fwd(h, w, bias, mask, tile_v, row_block),
    _bwd,
)
