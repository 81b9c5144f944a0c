"""Pallas fused SPLADE pool: forward/backward parity vs the XLA paths
(interpret mode on CPU; the same kernels compile on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from splade_tpu.ops.fused_splade import fused_splade_pool
from splade_tpu.ops.splade_pool import splade_pool_from_logits, splade_pool_streamed


@pytest.fixture(scope="module")
def inputs(rng):
    B, S, H, V = 3, 16, 32, 300  # V not a tile multiple -> exercises padding
    h = rng.normal(size=(B, S, H)).astype(np.float32)
    w = rng.normal(size=(V, H)).astype(np.float32) * 0.3
    bias = rng.normal(size=(V,)).astype(np.float32) * 0.1
    lengths = rng.integers(S // 2, S + 1, size=(B,))
    mask = (np.arange(S)[None] < lengths[:, None]).astype(np.int32)
    return tuple(jnp.asarray(x) for x in (h, w, bias, mask))


def _reference(h, w, bias, mask):
    logits = jnp.einsum("bsh,vh->bsv", h, w) + bias
    return splade_pool_from_logits(logits, mask)


def test_forward_matches_reference(inputs):
    h, w, bias, mask = inputs
    pooled, tw = fused_splade_pool(h, w, bias, mask, 128)
    want_p, want_tw = _reference(h, w, bias, mask)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(want_p),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tw), np.asarray(want_tw),
                               rtol=1e-5, atol=1e-5)


def test_backward_matches_reference(inputs):
    h, w, bias, mask = inputs

    def loss_fused(h, w, bias):
        p, _ = fused_splade_pool(h, w, bias, mask, 128)
        return jnp.sum(jnp.sin(p) * p)

    def loss_ref(h, w, bias):
        p, _ = _reference(h, w, bias, mask)
        return jnp.sum(jnp.sin(p) * p)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(h, w, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(h, w, bias)
    for a, b, name in zip(gf, gr, "h w bias".split()):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"grad mismatch: {name}")


def test_backward_under_jit_and_streamed_agreement(inputs):
    h, w, bias, mask = inputs

    @jax.jit
    def loss_fused(h):
        p, _ = fused_splade_pool(h, w, bias, mask, 128)
        return jnp.sum(p ** 2)

    @jax.jit
    def loss_streamed(h):
        p, _ = splade_pool_streamed(h, w, bias, mask, tile=60)
        return jnp.sum(p ** 2)

    gf = jax.grad(loss_fused)(h)
    gs = jax.grad(loss_streamed)(h)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gs),
                               rtol=1e-4, atol=1e-5)


def test_fully_padded_row_gets_zero(inputs):
    h, w, bias, mask = inputs
    mask0 = jnp.zeros_like(mask).at[0].set(mask[0])  # rows 1,2 fully padded
    pooled, tw = fused_splade_pool(h, w, bias, mask0, 128)
    assert float(jnp.abs(pooled[1]).max()) == 0.0
    assert float(jnp.abs(tw[2]).max()) == 0.0

    # gradient through fully-padded rows is zero, not NaN
    def loss(h):
        p, _ = fused_splade_pool(h, w, bias, mask0, 128)
        return jnp.sum(p)

    g = jax.grad(loss)(h)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g[1]).max()) == 0.0


def test_encoder_pallas_impl_matches_logits(rng):
    from splade_tpu.models.modernbert import ModernBertConfig
    from splade_tpu.models.splade import SpladeEncoder

    cfg = ModernBertConfig.tiny()
    ref = SpladeEncoder(cfg, pool_impl="logits")
    fused = SpladeEncoder(cfg, pool_impl="pallas", pallas_tile_v=128)
    ids0 = jnp.zeros((1, 8), jnp.int32)
    params = ref.init(jax.random.PRNGKey(0), ids0, jnp.ones_like(ids0))["params"]
    ids = jnp.asarray(rng.integers(3, 500, size=(2, 12)), jnp.int32)
    mask = jnp.ones_like(ids)
    r1, t1 = ref.apply({"params": params}, ids, mask)
    r2, t2 = fused.apply({"params": params}, ids, mask)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=1e-4, atol=1e-4)


def test_v2_row_blocked_matches_reference(inputs):
    from splade_tpu.ops.fused_splade_v2 import fused_splade_pool_v2

    h, w, bias, mask = inputs
    # B=3 -> row_block falls back to 1; also exercise explicit rb=1
    pooled, tw = fused_splade_pool_v2(h, w, bias, mask, 128, 1)
    want_p, want_tw = _reference(h, w, bias, mask)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(want_p),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tw), np.asarray(want_tw),
                               rtol=1e-5, atol=1e-5)

    def loss_v2(h, w, bias):
        p, _ = fused_splade_pool_v2(h, w, bias, mask, 128, 1)
        return jnp.sum(jnp.sin(p) * p)

    def loss_ref(h, w, bias):
        p, _ = _reference(h, w, bias, mask)
        return jnp.sum(jnp.sin(p) * p)

    gf = jax.grad(loss_v2, argnums=(0, 1, 2))(h, w, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(h, w, bias)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_v2_row_block_4(rng):
    from splade_tpu.ops.fused_splade_v2 import fused_splade_pool_v2

    B, S, H, V = 4, 8, 32, 256
    h = jnp.asarray(rng.normal(size=(B, S, H)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(V, H)).astype(np.float32) * 0.3)
    bias = jnp.asarray(rng.normal(size=(V,)).astype(np.float32) * 0.1)
    mask = jnp.ones((B, S), jnp.int32)
    p4, _ = fused_splade_pool_v2(h, w, bias, mask, 128, 4)
    want, _ = _reference(h, w, bias, mask)
    np.testing.assert_allclose(np.asarray(p4), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
