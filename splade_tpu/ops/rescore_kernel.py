"""Gather-free exact rescore: the phase-2 kernel, TPU-native.

The original ``exact_rescore`` (ops/postings_index.py) scores candidates by
per-element gathers from a dense [B, V+1] query table (``qd[b, terms]``).
On TPU, XLA lowers that to serialized scalar loads: the round-4 chip rows
(docs/POSTINGS_BENCH.json ``r4_lambda_complete_1m_*``) measured ~0.74M
candidate-rescores/s — ~47M gathered f32/s, two orders below HBM speed —
and QPS tracked 1/(candidate count) across every row, i.e. the rescore
gather dominated the entire search (docs/PHASE0_COST_MODEL.md,
post-measurement verdict).

This module replaces the gather with an equality match — a formulation
with NO random memory access, which is what the VPU wants:

    score[b, c] = sum_t q_val[b, t] * sum_m w[b, c, m]
                                      * [ d_terms[b, c, m] == q_idx[b, t] ]

Exactly ``exact_rescore``'s math (duplicate query slots accumulate in both
formulations; pad query slots carry q_val = 0, pad doc slots carry
d_val = 0, so every pad cross-term vanishes), but the inner op is a
broadcast compare + select + sublane reduce over a [RB, M, BC] block — all
streaming, MXU/VPU-friendly, zero gathers. T (query top-k, 32-64) is
static, so the t-loop unrolls at trace time.

Layout: candidate CSR blocks are fed as [B, M, C] so the candidate axis
lands on the 128-wide lane dimension and the M reduce runs over sublanes.

Reference behavior matched: the exact phase-2 rescore of the two-phase
SEISMIC-style search (reference methodology:
/root/reference/scripts/neural_sparse_search_aws.py:1314-1434); the
formulation itself has no reference counterpart — it exists because TPU
has no fast scalar gather, where the reference's OpenSearch/CPU backend
does.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _rescore_kernel(qi_ref, qv_ref, terms_ref, w_ref, out_ref):
    # terms_ref/w_ref [RB, M, BC]; qi_ref/qv_ref [RB, T]; out_ref [RB, BC]
    terms = terms_ref[:]
    w = w_ref[:].astype(jnp.float32)
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    T = qi_ref.shape[1]
    for t in range(T):  # T is static: unrolled compare/select/reduce chain
        ti = qi_ref[:, t : t + 1]                        # [RB, 1]
        tv = qv_ref[:, t : t + 1]                        # [RB, 1]
        hit = jnp.where(terms == ti[:, :, None], w, 0.0)  # [RB, M, BC]
        acc = acc + tv * jnp.sum(hit, axis=1)            # [RB, BC]
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def rescore_match(d_terms, d_vals, d_scale, q_idx, q_val, cand,
                  interpret: bool | None = None):
    """EXACT f32 candidate scores, gather-free (see module docstring).

    d_terms [N, M] (pad id = V, pad val 0), d_vals [N, M] int8 with per-doc
    d_scale [N]; q_idx/q_val [B, T] sparse queries (pad val 0);
    cand [B, C] doc ids. Returns scores [B, C] == exact_rescore's output.

    The [B, C, M] candidate-row gather stays in XLA (contiguous M-element
    rows — a streaming dynamic-slice, not a scalar gather); only the
    per-element qd lookup is replaced by the match kernel.
    """
    if interpret is None:
        interpret = _interpret()
    B, C = cand.shape
    M = d_terms.shape[1]
    T = q_idx.shape[1]

    # [B, M, C]: candidates on lanes, CSR slots on sublanes
    terms_c = jnp.swapaxes(d_terms[cand].astype(jnp.int32), 1, 2)
    w_c = jnp.swapaxes(
        d_vals[cand].astype(jnp.float32) * d_scale[cand][:, :, None], 1, 2)

    RB = 8
    BC = 128
    pad_b = -B % RB  # Mosaic wants the out block's sublane dim a multiple of 8
    pad_c = -C % BC
    if pad_b or pad_c:
        # padded rows/columns replay edge entries; sliced off below
        terms_c = jnp.pad(terms_c, ((0, pad_b), (0, 0), (0, pad_c)),
                          mode="edge")
        w_c = jnp.pad(w_c, ((0, pad_b), (0, 0), (0, pad_c)), mode="edge")
        q_idx = jnp.pad(q_idx, ((0, pad_b), (0, 0)), mode="edge")
        q_val = jnp.pad(q_val, ((0, pad_b), (0, 0)), mode="edge")
    Bp, Cp = B + pad_b, C + pad_c

    grid = (Bp // RB, Cp // BC)
    out = pl.pallas_call(
        _rescore_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((RB, T), lambda b, c: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, T), lambda b, c: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, M, BC), lambda b, c: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, M, BC), lambda b, c: (b, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RB, BC), lambda b, c: (b, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Cp), jnp.float32),
        interpret=interpret,
    )(q_idx.astype(jnp.int32), q_val.astype(jnp.float32), terms_c, w_c)
    return out[:B, :C]


def _rescore_kernel_rows(qi_ref, qv_ref, terms_ref, w_ref, out_ref):
    # terms_ref/w_ref [RB, BC, M]; qi_ref/qv_ref [RB, T]; out_ref [RB, BC]
    terms = terms_ref[:]
    w = w_ref[:].astype(jnp.float32)
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    T = qi_ref.shape[1]
    for t in range(T):  # T static: unrolled
        ti = qi_ref[:, t : t + 1]                         # [RB, 1]
        tv = qv_ref[:, t : t + 1]                         # [RB, 1]
        hit = jnp.where(terms == ti[:, :, None], w, 0.0)  # [RB, BC, M]
        acc = acc + tv * jnp.sum(hit, axis=2)             # [RB, BC]
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def rescore_match_rows(d_terms, d_vals, d_scale, q_idx, q_val, cand,
                       interpret: bool | None = None):
    """``rescore_match`` without the [B,C,M]→[B,M,C] transpose.

    The round-5 finite-difference decomposition (docs/PHASE0_COST_MODEL.md)
    put the measured rescore slope ~10–30× above the match kernel's
    streaming bound; the prime suspect is the materialized `swapaxes`
    layout change (~2×1 GB per batch at C=2000) that `rescore_match` pays
    to place candidates on the lane axis. This variant keeps the candidate
    gather's natural [B, C, M] layout — candidates on sublanes, the
    M-element CSR rows on lanes (M=64 wastes half the 128-lane width, but
    a half-empty lane beats a full transpose pass). Bit-identical output
    (tests/test_rescore_kernel.py)."""
    if interpret is None:
        interpret = _interpret()
    B, C = cand.shape
    M = d_terms.shape[1]
    T = q_idx.shape[1]

    terms_c = d_terms[cand].astype(jnp.int32)              # [B, C, M]
    w_c = d_vals[cand].astype(jnp.float32) * d_scale[cand][:, :, None]

    RB = 8
    BC = 128
    pad_b = -B % RB
    pad_c = -C % BC
    if pad_b or pad_c:
        terms_c = jnp.pad(terms_c, ((0, pad_b), (0, pad_c), (0, 0)),
                          mode="edge")
        w_c = jnp.pad(w_c, ((0, pad_b), (0, pad_c), (0, 0)), mode="edge")
        q_idx = jnp.pad(q_idx, ((0, pad_b), (0, 0)), mode="edge")
        q_val = jnp.pad(q_val, ((0, pad_b), (0, 0)), mode="edge")
    Bp, Cp = B + pad_b, C + pad_c

    grid = (Bp // RB, Cp // BC)
    out = pl.pallas_call(
        _rescore_kernel_rows,
        grid=grid,
        in_specs=[
            pl.BlockSpec((RB, T), lambda b, c: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, T), lambda b, c: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, BC, M), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, BC, M), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RB, BC), lambda b, c: (b, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Cp), jnp.float32),
        interpret=interpret,
    )(q_idx.astype(jnp.int32), q_val.astype(jnp.float32), terms_c, w_c)
    return out[:B, :C]


def rescore_match_xla(d_terms, d_vals, d_scale, q_idx, q_val, cand):
    """Same match formulation in plain XLA: a T-step scan that streams the
    candidate CSR once per step — no [B, V] table, no per-element gather.
    The portable fallback (CPU production path keeps the original
    ``exact_rescore``; this exists for parity tests and as a non-pallas
    device path)."""
    terms_c = d_terms[cand].astype(jnp.int32)                    # [B, C, M]
    w_c = d_vals[cand].astype(jnp.float32) * d_scale[cand][:, :, None]

    def step(acc, tq):
        ti, tv = tq                                              # [B], [B]
        hit = jnp.where(terms_c == ti[:, None, None], w_c, 0.0)
        return acc + tv[:, None] * hit.sum(-1), None

    acc = jnp.zeros(cand.shape, jnp.float32)
    acc, _ = jax.lax.scan(
        step, acc, (q_idx.T.astype(jnp.int32), q_val.T.astype(jnp.float32)))
    return acc
