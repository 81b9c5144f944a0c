"""Numerical parity of the Flax ModernBERT vs HuggingFace torch reference.

A randomly initialized HF ModernBertForMaskedLM is ported via
``port_hf_state_dict`` and must reproduce logits to float32 tolerance. This
validates architecture fidelity (alternating local/global attention, dual
RoPE thetas, GeGLU, pre-norm layout, tied decoder) — the property SURVEY.md
§7 "hard parts" #1 calls essential for Recall@1 parity.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from splade_tpu.models.modernbert import ModernBertConfig, ModernBertForMaskedLM
from splade_tpu.models.hf_port import port_hf_state_dict, export_to_hf_state_dict
from splade_tpu.models.splade import SpladeEncoder
from splade_tpu.ops.splade_pool import splade_pool_from_logits


def _make_pair(seed=0, seq=24, batch=3, local_attention=8, layers=4):
    torch = pytest.importorskip("torch")
    from transformers import ModernBertConfig as HFConfig
    from transformers.models.modernbert.modeling_modernbert import (
        ModernBertForMaskedLM as HFModel,
    )

    hf_cfg = HFConfig(
        vocab_size=512, hidden_size=64, intermediate_size=96,
        num_hidden_layers=layers, num_attention_heads=4,
        global_attn_every_n_layers=3, local_attention=local_attention,
        global_rope_theta=160000.0, local_rope_theta=10000.0,
        max_position_embeddings=128, pad_token_id=511,
        attn_implementation="sdpa", reference_compile=False,
    )
    torch.manual_seed(seed)
    hf_model = HFModel(hf_cfg).eval()

    cfg = ModernBertConfig(
        vocab_size=512, hidden_size=64, intermediate_size=96,
        num_hidden_layers=layers, num_attention_heads=4,
        global_attn_every_n_layers=3, local_attention=local_attention,
        pad_token_id=511,
    )
    params = port_hf_state_dict(hf_model.state_dict(), cfg)

    rng = np.random.default_rng(seed)
    ids = rng.integers(0, 500, size=(batch, seq)).astype(np.int32)
    lengths = rng.integers(seq // 2, seq + 1, size=(batch,))
    mask = (np.arange(seq)[None, :] < lengths[:, None]).astype(np.int32)
    ids = np.where(mask.astype(bool), ids, 511)

    with torch.no_grad():
        hf_logits = hf_model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).logits.numpy()
    return cfg, params, ids, mask, hf_logits


@pytest.fixture(scope="module")
def pair():
    return _make_pair()


def test_logits_match_hf(pair):
    cfg, params, ids, mask, hf_logits = pair
    model = ModernBertForMaskedLM(cfg)
    logits = model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    logits = np.asarray(logits, dtype=np.float32)
    # Compare only valid positions (HF computes padded rows too, but their
    # values are attention-order dependent; SPLADE masks them anyway).
    valid = mask.astype(bool)
    diff = np.abs(logits - hf_logits)[valid]
    assert diff.max() < 2e-4, f"max abs diff {diff.max()}"


def test_splade_pool_impls_agree(pair):
    cfg, params, ids, mask, hf_logits = pair
    ref = SpladeEncoder(cfg, pool_impl="logits")
    fused = SpladeEncoder(cfg, pool_impl="streamed", pool_tile=128)
    wrapped = {"params": {"mlm": params}}
    r_repr, r_w = ref.apply(wrapped, jnp.asarray(ids), jnp.asarray(mask))
    f_repr, f_w = fused.apply(wrapped, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(r_repr), np.asarray(f_repr),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r_w), np.asarray(f_w),
                               rtol=1e-5, atol=1e-5)


def test_splade_matches_reference_math(pair):
    """SPLADE pooling from HF logits == our end-to-end sparse repr."""
    cfg, params, ids, mask, hf_logits = pair
    want, _ = splade_pool_from_logits(jnp.asarray(hf_logits), jnp.asarray(mask))
    enc = SpladeEncoder(cfg, pool_impl="streamed", pool_tile=64)
    got, _ = enc.apply({"params": {"mlm": params}}, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4)
    assert float(jnp.min(got)) >= 0.0


def test_streamed_pool_gradients_flow(pair):
    cfg, params, ids, mask, _ = pair
    enc = SpladeEncoder(cfg, pool_impl="streamed", pool_tile=128)

    def loss_fn(p):
        repr_, _ = enc.apply({"params": {"mlm": p}}, jnp.asarray(ids), jnp.asarray(mask))
        return jnp.sum(repr_ ** 2)

    ref_enc = SpladeEncoder(cfg, pool_impl="logits")

    def ref_loss_fn(p):
        repr_, _ = ref_enc.apply({"params": {"mlm": p}}, jnp.asarray(ids), jnp.asarray(mask))
        return jnp.sum(repr_ ** 2)

    g_fused = jax.grad(loss_fn)(params)
    g_ref = jax.grad(ref_loss_fn)(params)
    flat_f, _ = ravel_pytree(g_fused)
    flat_r, _ = ravel_pytree(g_ref)
    assert float(jnp.abs(flat_f).max()) > 0
    np.testing.assert_allclose(np.asarray(flat_f), np.asarray(flat_r),
                               rtol=2e-3, atol=2e-5)


def test_export_roundtrip(pair):
    cfg, params, *_ = pair
    state = export_to_hf_state_dict(params, cfg)
    back = port_hf_state_dict(state, cfg)
    f1, _ = ravel_pytree(params)
    f2, _ = ravel_pytree(back)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2))
