"""Packed query tower == unpacked query tower, exactly.

SpladeEncoder.forward_packed_qd packs doc_len//query_len queries per
doc-shaped row (segment-masked attention + per-segment RoPE positions,
splade_tpu/models/modernbert.py encode) and runs queries + docs as one
backbone forward. The math must be identical to the separate per-tower
forwards — these tests pin that, including the B % pack != 0 padding path
and the gradient.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splade_tpu.models.modernbert import ModernBertConfig
from splade_tpu.models.splade import SpladeEncoder


def _toks(rng, n, length, vocab, pad_id):
    ids = rng.integers(3, vocab - 2, size=(n, length)).astype(np.int32)
    lengths = rng.integers(2, length + 1, size=(n,))
    mask = (np.arange(length)[None] < lengths[:, None]).astype(np.int32)
    return jnp.asarray(np.where(mask > 0, ids, pad_id)), jnp.asarray(mask)


def _model_and_params(f32=True):
    # f32 activations so packed-vs-unpacked differences are pure reduction
    # order (~1e-6), not bf16 rounding. Sq=8, Sd=32 -> pack factor 4, same
    # ratio as the flagship 64/256. local_attention=8 (half-window 4 < Sq)
    # exercises the window+segment mask interaction.
    cfg = ModernBertConfig.tiny(local_attention=8,
                                dtype=jnp.float32 if f32 else jnp.bfloat16)
    model = SpladeEncoder(cfg, pool_impl="streamed", pool_tile=128,
                          with_token_weights=True)
    ids0 = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids0, jnp.ones_like(ids0))["params"]
    return cfg, model, params


@pytest.mark.parametrize("B", [8, 5])  # 8 % 4 == 0; 5 needs a padded row
def test_packed_matches_unpacked(B):
    cfg, model, params = _model_and_params()
    rng = np.random.default_rng(0)
    q_ids, q_mask = _toks(rng, B, 8, cfg.vocab_size, cfg.pad_token_id)
    d_ids, d_mask = _toks(rng, 2 * B, 32, cfg.vocab_size, cfg.pad_token_id)

    q_ref, q_tw_ref = model.apply({"params": params}, q_ids, q_mask)
    d_ref, d_tw_ref = model.apply({"params": params}, d_ids, d_mask)
    (q_p, q_tw_p), (d_p, d_tw_p) = model.apply(
        {"params": params}, q_ids, q_mask, d_ids, d_mask,
        method="forward_packed_qd")

    np.testing.assert_allclose(q_p, q_ref, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(d_p, d_ref, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(q_tw_p, q_tw_ref, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(d_tw_p, d_tw_ref, atol=2e-5, rtol=1e-5)


def test_packed_gradients_match():
    cfg, model, params = _model_and_params()
    rng = np.random.default_rng(1)
    B = 4
    q_ids, q_mask = _toks(rng, B, 8, cfg.vocab_size, cfg.pad_token_id)
    d_ids, d_mask = _toks(rng, 2 * B, 32, cfg.vocab_size, cfg.pad_token_id)

    def loss_unpacked(p):
        q, _ = model.apply({"params": p}, q_ids, q_mask)
        d, _ = model.apply({"params": p}, d_ids, d_mask)
        return jnp.sum(q * q) + jnp.sum(jnp.abs(d))

    def loss_packed(p):
        (q, _), (d, _) = model.apply({"params": p}, q_ids, q_mask, d_ids,
                                     d_mask, method="forward_packed_qd")
        return jnp.sum(q * q) + jnp.sum(jnp.abs(d))

    g_ref = jax.grad(loss_unpacked)(params)
    g_p = jax.grad(loss_packed)(params)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_p = jax.tree_util.tree_leaves(g_p)
    for a, b in zip(flat_p, flat_ref):
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=5e-4)


def test_rejects_non_multiple_lengths():
    cfg, model, params = _model_and_params()
    rng = np.random.default_rng(2)
    q_ids, q_mask = _toks(rng, 2, 7, cfg.vocab_size, cfg.pad_token_id)
    d_ids, d_mask = _toks(rng, 4, 32, cfg.vocab_size, cfg.pad_token_id)
    with pytest.raises(ValueError, match="multiple"):
        model.apply({"params": params}, q_ids, q_mask, d_ids, d_mask,
                    method="forward_packed_qd")


def test_packed_step_on_8_device_mesh_matches_unpacked():
    """The packed forward inside the full SPMD train step (8-device data
    mesh, grad-accum scan, donated buffers) produces the same loss as the
    unpacked step — the shape that actually runs in production. Packing
    concatenates 2B doc rows with ceil(B/4) query rows, so the batch dim is
    not a multiple of the mesh; GSPMD must still compile and reduce right."""
    import numpy as np

    from splade_tpu.config.v33 import V33Config
    from splade_tpu.parallel.mesh import make_mesh
    from splade_tpu.train.state import create_train_state
    from splade_tpu.train.trainer import make_train_step, stack_microbatches

    cfg, model, params = _model_and_params()
    rng = np.random.default_rng(4)
    B = 8
    losses = {}
    for packed in (False, True):
        vcfg = V33Config.from_dict({
            "model": {"packed_query_tower": packed},
            "loss": {"flops_warmup_steps": 10},
            "training": {"gradient_accumulation_steps": 2,
                         "learning_rate": 1e-3},
        })
        rng = np.random.default_rng(4)  # same batch for both modes
        micro = []
        for _ in range(2):
            q_ids, q_mask = _toks(rng, B, 8, cfg.vocab_size, cfg.pad_token_id)
            p_ids, p_mask = _toks(rng, B, 32, cfg.vocab_size, cfg.pad_token_id)
            n_ids, n_mask = _toks(rng, B, 32, cfg.vocab_size, cfg.pad_token_id)
            micro.append({
                "query_input_ids": np.asarray(q_ids),
                "query_attention_mask": np.asarray(q_mask),
                "positive_input_ids": np.asarray(p_ids),
                "positive_attention_mask": np.asarray(p_mask),
                "negative_input_ids": np.asarray(n_ids),
                "negative_attention_mask": np.asarray(n_mask),
            })
        batch = stack_microbatches(micro)
        mesh = make_mesh()
        state = create_train_state(
            jax.tree_util.tree_map(jnp.array, params), vcfg.training,
            total_steps=10)
        step_fn = make_train_step(model, vcfg, mesh, state.tx)
        _, _, step, metrics = step_fn(
            state.params, state.opt_state, state.step, batch)
        assert int(step) == 1
        losses[packed] = float(metrics["loss"])
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5)


@pytest.mark.parametrize("k", [1, 3])  # single and multi-negative [B,k,V]
def test_trainer_packed_loss_matches_unpacked(k):
    """The full V33 loss through make_loss_fn is packing-invariant,
    including the multi-negative flatten (negatives are doc-shaped rows
    appended to the same packed stream)."""
    from splade_tpu.config.v33 import V33Config
    from splade_tpu.train.trainer import make_loss_fn

    cfg, model, params = _model_and_params()
    rng = np.random.default_rng(3)
    B = 6
    q_ids, q_mask = _toks(rng, B, 8, cfg.vocab_size, cfg.pad_token_id)
    p_ids, p_mask = _toks(rng, B, 32, cfg.vocab_size, cfg.pad_token_id)
    n_ids, n_mask = _toks(rng, B * k, 32, cfg.vocab_size, cfg.pad_token_id)
    micro = {
        "query_input_ids": q_ids, "query_attention_mask": q_mask,
        "positive_input_ids": p_ids, "positive_attention_mask": p_mask,
        "negative_input_ids": n_ids, "negative_attention_mask": n_mask,
    }
    vcfg = V33Config()
    step = jnp.int32(10)
    loss_u, _ = make_loss_fn(model, vcfg.loss, 1, packed_query=False)(
        params, micro, step)
    loss_p, _ = make_loss_fn(model, vcfg.loss, 1, packed_query=True)(
        params, micro, step)
    np.testing.assert_allclose(loss_p, loss_u, atol=1e-5, rtol=1e-5)
