"""Parity tests for the gather-free phase-2 rescore (ops/rescore_kernel.py).

Every implementation (gather / pallas match / XLA match) must produce the
SAME exact f32 scores — the rescore is the correctness anchor of the
two-phase search, so the fast path is held to bit-level agreement with the
original on CPU (pallas runs in interpret mode off-TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from splade_tpu.ops.postings_index import (dispatch_rescore, exact_rescore,
                                           resolve_rescore_mode,
                                           sparse_query_dense)
from splade_tpu.ops.rescore_kernel import (rescore_match, rescore_match_rows,
                                           rescore_match_xla)


def _make_case(seed, N=300, M=16, V=700, B=8, T=12, C=50):
    rng = np.random.default_rng(seed)
    d_terms = np.full((N, M), V, np.int32)
    d_vals = np.zeros((N, M), np.int8)
    d_scale = rng.uniform(0.01, 0.1, N).astype(np.float32)
    for i in range(N):
        nnz = int(rng.integers(0, M + 1))
        if nnz:
            d_terms[i, :nnz] = rng.choice(V, nnz, replace=False)
            d_vals[i, :nnz] = rng.integers(1, 127, nnz)
    q_idx = np.zeros((B, T), np.int32)
    q_val = np.zeros((B, T), np.float32)
    for b in range(B):
        t = int(rng.integers(1, T + 1))
        q_idx[b, :t] = rng.choice(V, t, replace=False)
        q_val[b, :t] = rng.uniform(0.1, 2.0, t)
    cand = rng.integers(0, N, (B, C)).astype(np.int32)
    return (jnp.asarray(d_terms), jnp.asarray(d_vals), jnp.asarray(d_scale),
            jnp.asarray(q_idx), jnp.asarray(q_val), jnp.asarray(cand), V)


def _gather_ref(d_terms, d_vals, d_scale, q_idx, q_val, cand, V):
    qd = sparse_query_dense(q_idx, q_val, V)
    return np.asarray(exact_rescore(d_terms, d_vals, d_scale, qd, cand))


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_match_parity(seed):
    dt, dv, ds, qi, qv, cand, V = _make_case(seed)
    ref = _gather_ref(dt, dv, ds, qi, qv, cand, V)
    out = np.asarray(rescore_match(dt, dv, ds, qi, qv, cand))
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-4)


def test_pallas_match_parity_unaligned():
    # B not a multiple of 8, C not a multiple of 128: exercises the
    # edge-padding path (padded rows/cols must be sliced off, not leak)
    dt, dv, ds, qi, qv, cand, V = _make_case(2, B=5, C=37)
    ref = _gather_ref(dt, dv, ds, qi, qv, cand, V)
    out = np.asarray(rescore_match(dt, dv, ds, qi, qv, cand))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-4)


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_match_rows_parity(seed):
    dt, dv, ds, qi, qv, cand, V = _make_case(seed)
    ref = _gather_ref(dt, dv, ds, qi, qv, cand, V)
    out = np.asarray(rescore_match_rows(dt, dv, ds, qi, qv, cand))
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-4)


def test_pallas_match_rows_parity_unaligned():
    dt, dv, ds, qi, qv, cand, V = _make_case(2, B=5, C=37)
    ref = _gather_ref(dt, dv, ds, qi, qv, cand, V)
    out = np.asarray(rescore_match_rows(dt, dv, ds, qi, qv, cand))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-4)


def test_xla_match_parity():
    dt, dv, ds, qi, qv, cand, V = _make_case(3, B=6, C=41)
    ref = _gather_ref(dt, dv, ds, qi, qv, cand, V)
    out = np.asarray(rescore_match_xla(dt, dv, ds, qi, qv, cand))
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-4)


def test_duplicate_query_terms_accumulate():
    # sparse_query_dense .add()s duplicate slots; the match formulation
    # sums over t — both must double-count the repeated term
    dt, dv, ds, qi, qv, cand, V = _make_case(4, B=4, T=6)
    qi = qi.at[:, 1].set(qi[:, 0])
    qv = qv.at[:, 1].set(qv[:, 0])
    ref = _gather_ref(dt, dv, ds, qi, qv, cand, V)
    out_k = np.asarray(rescore_match(dt, dv, ds, qi, qv, cand))
    out_x = np.asarray(rescore_match_xla(dt, dv, ds, qi, qv, cand))
    np.testing.assert_allclose(out_k, ref, rtol=0, atol=1e-4)
    np.testing.assert_allclose(out_x, ref, rtol=0, atol=1e-4)


def test_xla_match_vmap_safe():
    # the mesh shard loop vmaps the search body — the XLA match must
    # produce per-shard results identical to a python loop
    dt, dv, ds, qi, qv, cand, V = _make_case(5, B=4, C=20)
    D = 3
    dts = jnp.stack([dt] * D)
    dvs = jnp.stack([jnp.roll(dv, s, axis=0) for s in range(D)])
    dss = jnp.stack([ds] * D)
    out = jax.vmap(lambda a, b, c: rescore_match_xla(a, b, c, qi, qv, cand))(
        dts, dvs, dss)
    for s in range(D):
        ref = _gather_ref(dts[s], dvs[s], dss[s], qi, qv, cand, V)
        np.testing.assert_allclose(np.asarray(out[s]), ref, rtol=0, atol=1e-4)


def test_resolve_mode_env_override(monkeypatch):
    monkeypatch.setenv("SPLADE_RESCORE", "match_xla")
    assert resolve_rescore_mode("auto") == "match_xla"
    assert resolve_rescore_mode("gather") == "match_xla"  # env wins
    monkeypatch.delenv("SPLADE_RESCORE")
    assert resolve_rescore_mode("gather") == "gather"
    # auto off-TPU -> gather (CPU scalar gathers are cheap)
    if jax.default_backend() != "tpu":
        assert resolve_rescore_mode("auto") == "gather"
        assert resolve_rescore_mode("auto", vmapped=True) == "gather"


def test_dispatch_all_modes_agree():
    dt, dv, ds, qi, qv, cand, V = _make_case(6)
    outs = {m: np.asarray(dispatch_rescore(dt, dv, ds, qi, qv, cand, V,
                                           mode=m))
            for m in ("gather", "match", "match_rows", "match_xla")}
    np.testing.assert_allclose(outs["match"], outs["gather"], atol=1e-4)
    np.testing.assert_allclose(outs["match_rows"], outs["gather"], atol=1e-4)
    np.testing.assert_allclose(outs["match_xla"], outs["gather"], atol=1e-4)


def test_two_phase_end_to_end_mode_invariance(monkeypatch):
    # the full two-phase search must return identical (vals, ids) whichever
    # rescore implementation the env picks
    from splade_tpu.ops.postings_index import TpuPostingsIndex

    rng = np.random.default_rng(7)
    V, N = 500, 400
    idx = TpuPostingsIndex(vocab_size=V, n_postings=32, query_top_t=8,
                           approx=False, rescore_candidates=64)
    for i in range(N):
        nnz = int(rng.integers(2, 10))
        terms = rng.choice(V, nnz, replace=False)
        vals = rng.uniform(0.1, 1.5, nnz).astype(np.float32)
        idx.add(i, terms, vals)
    idx.build()
    qi = np.zeros((4, 8), np.int32)
    qv = np.zeros((4, 8), np.float32)
    for b in range(4):
        qi[b] = rng.choice(V, 8, replace=False)
        qv[b] = rng.uniform(0.1, 2.0, 8)

    results = {}
    for mode in ("gather", "match_xla", "match"):
        monkeypatch.setenv("SPLADE_RESCORE", mode)
        idx.build()  # re-jit: the mode is resolved at trace time
        results[mode] = idx.search_topk(qi, qv, k=10)
    for mode in ("match_xla", "match"):
        for b in range(4):
            ref, got = results["gather"][b], results[mode][b]
            assert [d for d, _ in ref] == [d for d, _ in got], mode
            np.testing.assert_allclose([s for _, s in ref],
                                       [s for _, s in got], atol=1e-4)
