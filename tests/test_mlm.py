"""MLM pre-training tier tests (splade_tpu/train/mlm.py).

The reference's pretrain_mlm trainer module was deleted upstream; contract
reconstructed from configs/pretrain_mlm.yaml (reference). Covers corpus
packing, in-graph dynamic masking statistics, learning on a tiny model,
the full trainer loop on the 8-virtual-device mesh, and checkpoint interop
with the SPLADE fine-tuning path.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splade_tpu.models.modernbert import ModernBertConfig, ModernBertForMaskedLM
from splade_tpu.train.mlm import (
    MLMConfig,
    MLMTrainer,
    apply_mlm_masking,
    make_mlm_loss_fn,
    pack_corpus,
)

CLS, SEP, PAD, MASK = 2, 3, 0, 4
VOCAB = 97


class MLMFakeTokenizer:
    cls_token_id = CLS
    sep_token_id = SEP
    pad_token_id = PAD
    mask_token_id = MASK
    all_special_ids = [CLS, SEP, PAD, MASK]

    def __len__(self):
        return VOCAB

    def __call__(self, texts, add_special_tokens=False, **kw):
        assert not add_special_tokens
        return {"input_ids": [[ord(c) % 90 + 5 for c in t if c != " "]
                              for t in texts]}

    def save_pretrained(self, path):
        pass


def korean_ish_corpus(n=400, seed=0):
    rng = np.random.default_rng(seed)
    words = ["검색", "모델", "한국어어", "문서다", "질의", "벡터값", "학습", "평가셋"]
    return [" ".join(rng.choice(words, size=rng.integers(3, 9)))
            for _ in range(n)]


# ---------------------------------------------------------------- packing
def test_pack_corpus_rows_are_full_and_framed():
    tok = MLMFakeTokenizer()
    rows = pack_corpus(korean_ish_corpus(), tok, max_length=32)
    assert rows.ndim == 2 and rows.shape[1] == 32
    # every row starts with CLS and ends with SEP (or pad on the final row)
    assert (rows[:, 0] == CLS).all()
    assert (rows[:-1, -1] == SEP).all()
    # zero padding waste except possibly the last row
    assert (rows[:-1] != PAD).all()
    # round-trip token conservation: non-special token count == corpus tokens
    corpus_tokens = sum(len(x) for x in tok(korean_ish_corpus())["input_ids"])
    packed_tokens = int(np.isin(rows, [CLS, SEP, PAD], invert=True).sum())
    assert packed_tokens == corpus_tokens


def test_pack_corpus_long_sentence_spills():
    tok = MLMFakeTokenizer()
    one_long = ["a" * 100]  # 100 tokens > body of 14
    rows = pack_corpus(one_long, tok, max_length=16)
    assert len(rows) == int(np.ceil(100 / 14))


# ---------------------------------------------------------------- masking
def test_masking_statistics_and_proportions():
    rng = np.random.default_rng(1)
    B, S, P = 64, 64, 9
    ids = rng.integers(5, VOCAB, size=(B, S)).astype(np.int32)
    ids[:, 0] = CLS
    ids[:, -1] = SEP
    eligible = np.ones((B, S), np.float32)
    eligible[:, 0] = eligible[:, -1] = 0.0

    corrupted, positions, labels, weights = jax.jit(
        lambda k, i, e: apply_mlm_masking(k, i, e, P, MASK, VOCAB)
    )(jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(eligible))
    corrupted, positions, labels, weights = map(
        np.asarray, (corrupted, positions, labels, weights))

    # exactly P picks per row, all eligible (rows have plenty of tokens)
    assert weights.shape == (B, P) and (weights == 1.0).all()
    assert (positions > 0).all() and (positions < S - 1).all()
    # positions are distinct within a row
    for r in range(B):
        assert len(set(positions[r])) == P
    # labels are the original tokens
    np.testing.assert_array_equal(
        labels, np.take_along_axis(ids, positions, axis=1))
    # non-selected positions unchanged
    sel_mask = np.zeros((B, S), bool)
    np.put_along_axis(sel_mask, positions, True, axis=1)
    np.testing.assert_array_equal(corrupted[~sel_mask], ids[~sel_mask])
    # 80/10/10 corruption split (binomial tolerance over 576 picks)
    picked = np.take_along_axis(corrupted, positions, axis=1)
    frac_mask = (picked == MASK).mean()
    frac_keep = (picked == labels).mean()
    assert 0.70 <= frac_mask <= 0.90
    assert 0.05 <= frac_keep <= 0.20  # includes random==label collisions


def test_masking_short_rows_get_zero_weight_picks():
    ids = np.full((2, 8), PAD, np.int32)
    ids[:, 0] = CLS
    ids[0, 1:3] = 50  # only 2 eligible tokens, P=4
    eligible = (ids != PAD) & (ids != CLS)
    _, _, _, weights = apply_mlm_masking(
        jax.random.PRNGKey(1), jnp.asarray(ids),
        jnp.asarray(eligible.astype(np.float32)), 4, MASK, VOCAB)
    w = np.asarray(weights)
    assert w[0].sum() == 2.0  # both eligible picked, 2 dead picks
    assert w[1].sum() == 0.0  # fully padded row contributes nothing


def test_masks_differ_across_steps():
    ids = jnp.asarray(np.random.default_rng(2).integers(
        5, VOCAB, size=(4, 32)).astype(np.int32))
    eligible = jnp.ones((4, 32), jnp.float32)
    _, p1, _, _ = apply_mlm_masking(jax.random.PRNGKey(10), ids, eligible, 5, MASK, VOCAB)
    _, p2, _, _ = apply_mlm_masking(jax.random.PRNGKey(11), ids, eligible, 5, MASK, VOCAB)
    assert not np.array_equal(np.asarray(p1), np.asarray(p2))


# ---------------------------------------------------------------- learning
def test_mlm_loss_decreases_on_tiny_model():
    cfg = ModernBertConfig.tiny(num_hidden_layers=2, vocab_size=VOCAB)
    model = ModernBertForMaskedLM(cfg)
    S = 16
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, S), jnp.int32),
                        jnp.ones((1, S), jnp.int32))["params"]
    loss_fn = make_mlm_loss_fn(
        model, MASK, VOCAB, np.array([CLS, SEP, PAD, MASK]), PAD,
        mlm_prob=0.15, max_length=S)

    rng = np.random.default_rng(3)
    # a highly predictable corpus: token t is always followed by t+1
    base = np.arange(5, 5 + S - 2, dtype=np.int32)
    ids = np.stack([np.concatenate([[CLS], base, [SEP]]) for _ in range(8)])

    import optax

    tx = optax.adam(5e-3)
    opt = tx.init(params)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    losses = []
    for step in range(30):
        (loss, m), g = grad_fn(params, {"input_ids": jnp.asarray(ids)},
                               jax.random.PRNGKey(step))
        updates, opt = tx.update(g, opt, params)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses[::6]
    assert float(m["masked_per_row"]) == pytest.approx(
        round(0.15 * (S - 2)), abs=0.01)


# ---------------------------------------------------------------- trainer
def test_mlm_trainer_end_to_end(tmp_path):
    tok = MLMFakeTokenizer()
    rows = pack_corpus(korean_ish_corpus(800), tok, max_length=16)
    cfg = MLMConfig(
        data_dir="unused", output_dir=str(tmp_path / "run"), max_length=16,
        epochs=2, batch_size=1, grad_accum=2, lr=1e-3, logging_steps=1,
        save_steps=0, eval_steps=0, val_fraction=0.05, dtype="float32")
    mcfg = ModernBertConfig.tiny(num_hidden_layers=2, vocab_size=VOCAB)
    model = ModernBertForMaskedLM(mcfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16), jnp.int32),
                        jnp.ones((1, 16), jnp.int32))["params"]
    trainer = MLMTrainer(cfg, model, params, rows, tok)
    assert trainer.mesh.devices.size == 8  # conftest virtual mesh
    state = trainer.train()
    assert int(state.step) == trainer.total_steps > 0

    out = tmp_path / "run"
    rec = [json.loads(l) for l in (out / "metrics.jsonl").read_text().splitlines()]
    assert rec[-1]["loss"] < rec[0]["loss"]
    scores = trainer.evaluate()
    assert set(scores) == {"mlm_loss", "mlm_acc", "perplexity"}

    # final checkpoint resumable
    from splade_tpu.train.checkpoint import find_latest_checkpoint, load_checkpoint

    ckpt = find_latest_checkpoint(str(out))
    restored, meta = load_checkpoint(ckpt, trainer.state)
    assert meta["full_resume"] and meta["step"] == int(state.step)


def test_mlm_preemption_checkpoints_and_stops(tmp_path):
    import os
    import signal
    import threading

    tok = MLMFakeTokenizer()
    rows = pack_corpus(korean_ish_corpus(800), tok, max_length=16)
    cfg = MLMConfig(
        data_dir="unused", output_dir=str(tmp_path / "run"), max_length=16,
        epochs=100, batch_size=1, grad_accum=2, lr=1e-3, logging_steps=10,
        save_steps=0, eval_steps=0, val_fraction=0.0, dtype="float32")
    mcfg = ModernBertConfig.tiny(num_hidden_layers=2, vocab_size=VOCAB)
    model = ModernBertForMaskedLM(mcfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16), jnp.int32),
                        jnp.ones((1, 16), jnp.int32))["params"]
    trainer = MLMTrainer(cfg, model, params, rows, tok)
    trainer.install_preemption_handler()
    try:
        threading.Timer(2.0, lambda: os.kill(os.getpid(), signal.SIGTERM)).start()
        state = trainer.train()
        assert trainer._preempted
        assert int(state.step) < trainer.total_steps
        from splade_tpu.train.checkpoint import find_latest_checkpoint

        assert find_latest_checkpoint(str(tmp_path / "run")) is not None
    finally:
        signal.signal(signal.SIGTERM, signal.SIG_DFL)
        signal.signal(signal.SIGINT, signal.default_int_handler)


def test_mlm_final_model_loads_into_splade(tmp_path):
    """{"mlm": tree} final artifact is a valid model-only checkpoint for the
    V33 SPLADE trainer (pretrain -> fine-tune interop)."""
    from splade_tpu.models.splade import SpladeEncoder
    from splade_tpu.train.checkpoint import load_params, save_final_model

    mcfg = ModernBertConfig.tiny(num_hidden_layers=2, vocab_size=VOCAB)
    mlm_params = ModernBertForMaskedLM(mcfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
        jnp.ones((1, 8), jnp.int32))["params"]
    save_final_model(str(tmp_path), {"mlm": mlm_params})

    splade = SpladeEncoder(mcfg, pool_impl="streamed")
    template = splade.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32),
                           jnp.ones((1, 8), jnp.int32))["params"]
    loaded = load_params(str(tmp_path / "final_model"), template)
    got = np.asarray(loaded["mlm"]["tok_embeddings"]["embedding"])
    want = np.asarray(mlm_params["tok_embeddings"]["embedding"])
    np.testing.assert_array_equal(got, want)


def test_mlm_config_env_and_yaml(tmp_path, monkeypatch):
    y = tmp_path / "mlm.yaml"
    y.write_text("epochs: 7\nlr: 1.0e-4\nmlm_probability: 0.2\n")
    monkeypatch.setenv("MLM_BATCH_SIZE", "13")
    cfg = MLMConfig.load(str(y), {"seed": 99})
    assert cfg.epochs == 7 and cfg.lr == 1e-4 and cfg.mlm_probability == 0.2
    assert cfg.batch_size == 13 and cfg.seed == 99
    with pytest.raises(ValueError):
        MLMConfig.load(None, {"nope": 1})


def test_mlm_mid_epoch_resume_is_bitwise_exact(tmp_path):
    """step-derived resume position reproduces the uninterrupted run bitwise
    (code-review finding: --resume used to replay from epoch 1)."""
    from jax.flatten_util import ravel_pytree
    from splade_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    tok = MLMFakeTokenizer()
    rows = pack_corpus(korean_ish_corpus(800), tok, max_length=16)
    mcfg = ModernBertConfig.tiny(num_hidden_layers=2, vocab_size=VOCAB)
    model = ModernBertForMaskedLM(mcfg)
    params0 = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16), jnp.int32),
                         jnp.ones((1, 16), jnp.int32))["params"]

    host_params = jax.tree_util.tree_map(np.asarray, params0)

    def mk(out, max_steps):
        cfg = MLMConfig(
            data_dir="unused", output_dir=str(out), max_length=16,
            epochs=2, batch_size=1, grad_accum=2, lr=1e-3, logging_steps=100,
            save_steps=0, eval_steps=0, val_fraction=0.0, dtype="float32",
            max_steps=max_steps)
        # fresh device copy per trainer: the jitted step donates params
        fresh = jax.tree_util.tree_map(jnp.asarray, host_params)
        return MLMTrainer(cfg, model, fresh, rows, tok)

    probe = mk(tmp_path / "probe", 0)
    spe = probe.steps_per_epoch
    assert spe >= 2
    mid = spe // 2 + 1  # inside epoch 1 (or boundary when spe==2)
    target = spe + 1    # ends inside epoch 2

    # all trainers share max_steps=target at init so the LR schedule
    # (a function of total_steps) is identical; the interrupted run stops
    # early via a post-init override
    t_full = mk(tmp_path / "a", target)
    full = t_full.train()

    t_half = mk(tmp_path / "b", target)
    t_half.cfg.max_steps = mid
    half = t_half.train()
    ckpt = save_checkpoint(str(tmp_path / "b"), half, epoch=1)

    t_res = mk(tmp_path / "c", target)
    t_res.state, meta = load_checkpoint(ckpt, t_res.state)
    t_res.start_epoch = min(int(t_res.state.step) // spe + 1, 2)
    res = t_res.train()
    assert int(res.step) == int(full.step) == target

    f1, _ = ravel_pytree(full.params)
    f2, _ = ravel_pytree(res.params)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
