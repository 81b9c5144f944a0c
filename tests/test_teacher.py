"""XLM-R teacher parity vs HF torch + teacher scoring API tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from splade_tpu.models.xlmr import (
    XlmRobertaConfig,
    XlmRobertaEncoder,
    port_xlmr_state_dict,
    roberta_position_ids,
)
from splade_tpu.models.teachers import BGEM3Teacher, kd_loss_with_teacher


def test_roberta_position_ids():
    ids = jnp.asarray([[5, 6, 7, 1, 1]])  # pad=1
    pos = roberta_position_ids(ids, 1)
    np.testing.assert_array_equal(np.asarray(pos), [[2, 3, 4, 1, 1]])


@pytest.fixture(scope="module")
def xlmr_pair():
    torch = pytest.importorskip("torch")
    from transformers import XLMRobertaConfig as HFConfig, XLMRobertaModel

    hf_cfg = HFConfig(
        vocab_size=256, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=66, type_vocab_size=1, pad_token_id=1,
        hidden_act="gelu", layer_norm_eps=1e-5,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = XLMRobertaModel(hf_cfg, add_pooling_layer=False).eval()
    cfg = XlmRobertaConfig.tiny()
    params = port_xlmr_state_dict(hf.state_dict(), cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(2, 250, size=(2, 12)).astype(np.int32)
    lengths = [12, 8]
    mask = (np.arange(12)[None] < np.asarray(lengths)[:, None]).astype(np.int32)
    ids = np.where(mask > 0, ids, 1)
    with torch.no_grad():
        hf_out = hf(input_ids=torch.tensor(ids, dtype=torch.long),
                    attention_mask=torch.tensor(mask, dtype=torch.long)
                    ).last_hidden_state.numpy()
    return cfg, params, ids, mask, hf_out


def test_xlmr_matches_hf(xlmr_pair):
    cfg, params, ids, mask, hf_out = xlmr_pair
    model = XlmRobertaEncoder(cfg)
    out = np.asarray(model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask)))
    diff = np.abs(out - hf_out)[mask.astype(bool)]
    assert diff.max() < 2e-4, f"max diff {diff.max()}"


def test_encode_cls_normalized(xlmr_pair):
    cfg, params, ids, mask, _ = xlmr_pair
    model = XlmRobertaEncoder(cfg)
    emb = model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask),
                      method=model.encode_cls)
    norms = np.linalg.norm(np.asarray(emb), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


class SpacedTokenizer:
    """Char-code tokenizer compatible with the HF call signature."""

    def __call__(self, texts, padding, truncation, max_length, return_tensors):
        ids = np.full((len(texts), max_length), 1, np.int64)
        mask = np.zeros((len(texts), max_length), np.int64)
        for i, t in enumerate(texts):
            codes = [ord(c) % 250 + 2 for c in t][: max_length]
            ids[i, : len(codes)] = codes
            mask[i, : len(codes)] = 1
        return {"input_ids": ids, "attention_mask": mask}


def test_teacher_scoring_api(xlmr_pair):
    cfg, params, *_ = xlmr_pair
    teacher = BGEM3Teacher(XlmRobertaEncoder(cfg), params, SpacedTokenizer(),
                           max_length=16, batch_size=4)
    queries = ["ab", "cd", "ef"]
    docs = ["ab x", "cd y", "zz q"]
    pair = teacher.score_pairs(queries, docs)
    assert pair.shape == (3,)
    mat = teacher.score_matrix(queries, docs)
    assert mat.shape == (3, 3)
    np.testing.assert_allclose(np.diag(mat), pair, rtol=1e-3, atol=1e-3)
    # identical text scores 1.0 with itself
    self_sim = teacher.score_pairs(["ab"], ["ab"])[0]
    assert self_sim == pytest.approx(1.0, abs=1e-3)
    soft = teacher.soft_labels(queries, docs, ["qq", "rr", "ss"])
    assert soft.shape == (3, 2)
    np.testing.assert_allclose(soft.sum(axis=1), 1.0, rtol=1e-5)
    inb = teacher.in_batch_soft_labels(queries, docs)
    np.testing.assert_allclose(inb.sum(axis=1), 1.0, rtol=1e-5)


def test_kd_loss_golden(rng):
    s = rng.normal(size=(4, 4)).astype(np.float32)
    t = rng.normal(size=(4, 4)).astype(np.float32)
    T, w = 2.0, 0.5

    def lsm(x):
        x = x - x.max(axis=-1, keepdims=True)
        return x - np.log(np.exp(x).sum(axis=-1, keepdims=True))

    t_logp, s_logp = lsm(t / T), lsm(s / T)
    kl = (np.exp(t_logp) * (t_logp - s_logp)).sum(-1).mean()
    want = T * T * kl + w * ((s - t) ** 2).mean()
    got = float(kd_loss_with_teacher(s, t, T, w))
    assert got == pytest.approx(float(want), rel=1e-4)
    assert float(kd_loss_with_teacher(t, t, T, w)) == pytest.approx(0.0, abs=1e-6)
