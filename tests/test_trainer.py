"""Trainer tests on the 8-virtual-device CPU mesh: the SPMD train step runs,
loss decreases, grads are synchronized, and checkpoint resume is exact."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from splade_tpu.config.v33 import V33Config
from splade_tpu.models.modernbert import ModernBertConfig
from splade_tpu.models.splade import SpladeEncoder
from splade_tpu.parallel.mesh import make_mesh
from splade_tpu.train.checkpoint import (
    find_latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from splade_tpu.train.state import create_train_state, decay_mask
from splade_tpu.train.trainer import Trainer, make_train_step, stack_microbatches
from splade_tpu.train.eval import MidTrainingEvaluator
from splade_tpu.data.collator import TripletCollator

from test_data import FakeTokenizer


VOCAB = 512


def tiny_model(pool_impl="streamed"):
    cfg = ModernBertConfig.tiny(num_hidden_layers=2)
    return SpladeEncoder(cfg, pool_impl=pool_impl, pool_tile=128), cfg


def synth_batch(rng, accum=2, B=8, k=1, Lq=8, Ld=12, teacher=False):
    def tok(n, L):
        ids = rng.integers(3, VOCAB - 2, size=(n, L)).astype(np.int32)
        lengths = rng.integers(2, L + 1, size=(n,))
        mask = (np.arange(L)[None] < lengths[:, None]).astype(np.int32)
        return np.where(mask > 0, ids, VOCAB - 1), mask

    out = {}
    micro = []
    for _ in range(accum):
        qi, qm = tok(B, Lq)
        pi, pm = tok(B, Ld)
        ni, nm = tok(B * k, Ld)
        mb = {
            "query_input_ids": qi, "query_attention_mask": qm,
            "positive_input_ids": pi, "positive_attention_mask": pm,
            "negative_input_ids": ni, "negative_attention_mask": nm,
        }
        if teacher:
            mb["teacher_pos_scores"] = rng.normal(size=(B,)).astype(np.float32)
            mb["teacher_neg_scores"] = rng.normal(size=(B, k)).astype(np.float32)
        micro.append(mb)
    return stack_microbatches(micro)


class _Setup:
    """Fresh state copies per test: the train step donates params/opt_state
    buffers (desired in production), so tests must not reuse consumed arrays."""

    def __init__(self):
        self.model, self.mcfg = tiny_model()
        self.cfg = V33Config.from_dict({
            "loss": {"flops_warmup_steps": 10},
            "training": {"gradient_accumulation_steps": 2, "learning_rate": 1e-3},
        })
        rng = jax.random.PRNGKey(0)
        ids = jnp.zeros((1, 8), jnp.int32)
        params = self.model.init(rng, ids, jnp.ones_like(ids))["params"]
        self._state = create_train_state(params, self.cfg.training, total_steps=100)
        self.mesh = make_mesh()
        self.step_fn = make_train_step(self.model, self.cfg, self.mesh, self._state.tx)

    @property
    def state(self):
        return self._state.replace(
            params=jax.tree_util.tree_map(jnp.array, self._state.params),
            opt_state=jax.tree_util.tree_map(jnp.array, self._state.opt_state),
        )

    def __iter__(self):
        return iter((self.model, self.cfg, self.mesh, self.state, self.step_fn))


@pytest.fixture(scope="module")
def setup():
    return _Setup()


def test_mesh_uses_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_train_step_runs_and_loss_decreases(setup):
    model, cfg, mesh, state, step_fn = setup
    rng = np.random.default_rng(0)
    batch = synth_batch(rng, accum=2, B=8)
    params, opt_state, step = state.params, state.opt_state, state.step
    losses = []
    for _ in range(8):
        params, opt_state, step, metrics = step_fn(params, opt_state, step, batch)
        losses.append(float(metrics["loss"]))
    assert int(step) == 8
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    assert np.isfinite(losses).all()
    assert float(metrics["nonzero_q"]) >= 0
    assert float(metrics["lambda_q"]) > float(cfg.loss.lambda_q) * 0.09


def test_multi_negative_and_teacher_path(setup):
    model, _, mesh, state, _ = setup
    cfg = V33Config.from_dict({
        "loss": {"lambda_margin_mse": 0.3, "flops_warmup_steps": 10},
        "training": {"gradient_accumulation_steps": 2},
    })
    step_fn = make_train_step(model, cfg, mesh, state.tx)
    batch = synth_batch(np.random.default_rng(1), accum=2, B=8, k=3, teacher=True)
    _, _, _, metrics = step_fn(state.params, state.opt_state, state.step, batch)
    assert float(metrics["margin_mse"]) > 0
    assert np.isfinite(float(metrics["loss"]))


def test_global_negatives_grad_sync_equals_single_device(setup):
    """With global in-batch negatives (all_gather) and FLOPS off, the
    8-device sharded step must produce the same loss and update as a
    1-device run on the full batch. (With per-device negatives — the
    reference's DDP semantics — losses legitimately differ, see below.)"""
    model, _, mesh, state, _ = setup
    cfg = V33Config.from_dict({
        "loss": {"lambda_q": 0.0, "lambda_d": 0.0,
                 "global_in_batch_negatives": True},
        "training": {"gradient_accumulation_steps": 2, "learning_rate": 1e-3},
    })
    batch = synth_batch(np.random.default_rng(2), accum=2, B=8)
    step_fn8 = make_train_step(model, cfg, mesh, state.tx)
    p8, o8, s8, m8 = step_fn8(state.params, state.opt_state, state.step, batch)

    state1 = setup.state  # fresh copy (previous buffers were donated)
    mesh1 = make_mesh(num_data=1)
    step_fn1 = make_train_step(model, cfg, mesh1, state1.tx)
    p1, o1, s1, m1 = step_fn1(state1.params, state1.opt_state, state1.step, batch)

    assert float(m8["loss"]) == pytest.approx(float(m1["loss"]), rel=2e-4)
    f8, _ = ravel_pytree(p8)
    f1, _ = ravel_pytree(p1)
    np.testing.assert_allclose(np.asarray(f8), np.asarray(f1), atol=2e-5)


def test_per_device_negatives_match_reference_ddp_semantics(setup):
    """Default mode: each device's InfoNCE sees only its local batch as
    in-batch negatives (reference: losses.py:152-181 per-rank scope), so the
    8-device loss differs from the 1-device full-batch loss by design."""
    model, cfg, mesh, state, step_fn = setup
    batch = synth_batch(np.random.default_rng(2), accum=2, B=8)
    _, _, _, m8 = step_fn(state.params, state.opt_state, state.step, batch)
    state1 = setup.state
    step_fn1 = make_train_step(model, cfg, make_mesh(num_data=1), state1.tx)
    _, _, _, m1 = step_fn1(state1.params, state1.opt_state, state1.step, batch)
    # 1-device in-batch candidate set is 8x larger -> strictly harder task.
    assert float(m1["infonce"]) > float(m8["infonce"])


def test_decay_mask_structure(setup):
    model, cfg, mesh, state, _ = setup
    mask = decay_mask(state.params)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    decayed = {jax.tree_util.keystr(p): v for p, v in flat}
    assert any("Wqkv" in k and v for k, v in decayed.items())
    assert all(not v for k, v in decayed.items() if "scale" in k)
    assert not decayed["['mlm']['decoder_bias']"]


def test_checkpoint_save_resume_exact(setup, tmp_path):
    model, cfg, mesh, state, step_fn = setup
    batch = synth_batch(np.random.default_rng(3))
    params, opt_state, step = state.params, state.opt_state, state.step
    for _ in range(3):
        params, opt_state, step, _ = step_fn(params, opt_state, step, batch)
    st3 = state.replace(params=params, opt_state=opt_state, step=step)
    save_checkpoint(str(tmp_path), st3, cfg, epoch=1, best=0.5)

    found = find_latest_checkpoint(str(tmp_path))
    assert found and found.endswith("checkpoint_epoch1_step3")
    restored, meta = load_checkpoint(found, setup.state)
    assert meta["full_resume"] and meta["epoch"] == 1 and meta["step"] == 3

    # One more step from live vs restored state must match bit-for-bit paths.
    pa, oa, sa, ma = step_fn(st3.params, st3.opt_state, st3.step, batch)
    pb, ob, sb, mb = step_fn(restored.params, restored.opt_state,
                             jnp.asarray(restored.step), batch)
    fa, _ = ravel_pytree(pa)
    fb, _ = ravel_pytree(pb)
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb), atol=1e-7)
    assert float(ma["loss"]) == pytest.approx(float(mb["loss"]), abs=1e-6)


def test_model_only_checkpoint_fine_tune_mode(setup, tmp_path):
    """Model-only dir -> params restored, fresh optimizer (V34/V35 pattern)."""
    model, cfg, mesh, state, _ = setup
    d = tmp_path / "final_model"
    d.mkdir()
    from flax import serialization

    (d / "model.msgpack").write_bytes(
        serialization.to_bytes(jax.tree_util.tree_map(np.asarray, state.params)))
    restored, meta = load_checkpoint(str(d), state)
    assert meta["full_resume"] is False
    f1, _ = ravel_pytree(restored.params)
    f2, _ = ravel_pytree(state.params)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2))


def test_trainer_end_to_end_smoke(tmp_path):
    """Full Trainer loop: synthetic korean-ish triplets, fake tokenizer,
    2 epochs on the 8-device mesh, eval + checkpoint artifacts written."""
    rng = np.random.default_rng(7)
    words = ["검색", "모델", "한국어", "문서", "질의", "벡터", "학습", "평가"]
    mk = lambda: " ".join(rng.choice(words, size=4))
    samples = [{"query": mk(), "positive": mk(), "negative": mk()}
               for _ in range(128)]

    model, mcfg = tiny_model()
    cfg = V33Config.from_dict({
        "data": {"batch_size": 2, "query_max_length": 8, "doc_max_length": 12},
        "loss": {"flops_warmup_steps": 10},
        "training": {
            "num_epochs": 2, "gradient_accumulation_steps": 2,
            "log_every_n_steps": 1, "save_every_n_epochs": 2,
            "eval_every_n_epochs": 2, "learning_rate": 1e-3,
            "output_dir": str(tmp_path / "run"),
        },
    })
    collator = TripletCollator(FakeTokenizer(), query_max_length=8, doc_max_length=12)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                        jnp.ones((1, 8), jnp.int32))["params"]
    evaluator = MidTrainingEvaluator(samples[:32], collator, batch_size=8)
    trainer = Trainer(cfg, model, params, samples, collator, evaluator=evaluator)
    state = trainer.train()
    assert int(state.step) == trainer.total_steps
    out = tmp_path / "run"
    assert (out / "metrics.jsonl").exists()
    assert (out / "summary.json").exists()
    ckpt = find_latest_checkpoint(str(out))
    assert ckpt is not None
    rec = [json.loads(l) for l in (out / "metrics.jsonl").read_text().splitlines()]
    assert rec[-1]["loss"] < rec[0]["loss"] * 1.5  # sane trajectory


def test_same_seed_same_first_step(setup):
    """Determinism: identical params + batch -> bitwise-identical loss and
    update (the step is RNG-free; reference relied on per-rank seeds)."""
    model, cfg, mesh, _, step_fn = setup
    batch = synth_batch(np.random.default_rng(9), accum=2, B=8)
    s1 = setup.state
    p1, o1, _, m1 = step_fn(s1.params, s1.opt_state, s1.step, batch)
    s2 = setup.state
    p2, o2, _, m2 = step_fn(s2.params, s2.opt_state, s2.step, batch)
    assert float(m1["loss"]) == float(m2["loss"])
    f1, _ = ravel_pytree(p1)
    f2, _ = ravel_pytree(p2)
    assert np.array_equal(np.asarray(f1), np.asarray(f2))


def _mini_trainer(tmp_path, epochs=6):
    rng = np.random.default_rng(7)
    words = ["검색", "모델", "한국어", "문서", "질의", "벡터"]
    mk = lambda: " ".join(rng.choice(words, size=4))
    samples = [{"query": mk(), "positive": mk(), "negative": mk()}
               for _ in range(64)]
    model, _ = tiny_model()
    cfg = V33Config.from_dict({
        "data": {"batch_size": 1, "query_max_length": 8, "doc_max_length": 12},
        "training": {
            "num_epochs": epochs, "gradient_accumulation_steps": 2,
            "log_every_n_steps": 1, "save_every_n_epochs": 2,
            "eval_every_n_epochs": 100, "learning_rate": 1e-3,
            "output_dir": str(tmp_path / "run"),
        },
    })
    collator = TripletCollator(FakeTokenizer(), query_max_length=8,
                               doc_max_length=12)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                        jnp.ones((1, 8), jnp.int32))["params"]
    return Trainer(cfg, model, params, samples, collator)


def test_async_checkpoint_save_is_valid_and_atomic(tmp_path):
    from splade_tpu.train.checkpoint import (
        save_checkpoint, wait_for_pending_saves)

    trainer = _mini_trainer(tmp_path, epochs=1)
    path = save_checkpoint(str(tmp_path), trainer.state, epoch=1,
                           async_write=True)
    wait_for_pending_saves()
    assert not list(tmp_path.glob("**/*.tmp"))  # atomic rename, no leftovers
    restored, meta = load_checkpoint(path, trainer.state)
    assert meta["full_resume"] is True
    f1, _ = ravel_pytree(restored.params)
    f2, _ = ravel_pytree(trainer.state.params)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


def test_find_latest_skips_incomplete_checkpoints(tmp_path):
    from splade_tpu.train.checkpoint import save_checkpoint

    trainer = _mini_trainer(tmp_path, epochs=1)
    good = save_checkpoint(str(tmp_path), trainer.state, epoch=1)
    # a crash left a higher-step dir without training_state
    bad = tmp_path / "checkpoint_epoch9_step99"
    bad.mkdir()
    (bad / "model.msgpack").write_bytes(b"partial")
    assert find_latest_checkpoint(str(tmp_path)) == good


def test_preemption_signal_checkpoints_and_stops(tmp_path):
    """SIGTERM mid-training -> break at the step boundary, checkpoint, stop
    before num_epochs completes."""
    import os
    import signal
    import threading

    trainer = _mini_trainer(tmp_path, epochs=50)
    trainer.install_preemption_handler()
    threading.Timer(3.0, lambda: os.kill(os.getpid(), signal.SIGTERM)).start()
    state = trainer.train()
    assert trainer._preempted
    assert int(state.step) < trainer.total_steps  # stopped early
    ckpt = find_latest_checkpoint(str(tmp_path / "run"))
    assert ckpt is not None
    restored, meta = load_checkpoint(ckpt, trainer.state)
    assert meta["full_resume"] and meta["step"] == int(state.step)
    signal.signal(signal.SIGTERM, signal.SIG_DFL)
    signal.signal(signal.SIGINT, signal.default_int_handler)


def test_mid_epoch_resume_is_bitwise_exact(tmp_path):
    """Preempt-style checkpoint mid-epoch + resume == uninterrupted run,
    bitwise (the code-review found epoch-boundary resume skipped the rest
    of the interrupted epoch)."""
    from splade_tpu.train.checkpoint import save_checkpoint

    # uninterrupted: 6 steps across two 4-step epochs
    t_full = _mini_trainer(tmp_path / "a", epochs=2)
    assert t_full.steps_per_epoch == 4
    t_full.cfg.training.max_steps = 6
    full_state = t_full.train()
    assert int(full_state.step) == 6

    # interrupted at step 3 (mid-epoch-1), checkpoint, fresh trainer resumes
    t_half = _mini_trainer(tmp_path / "b", epochs=2)
    t_half.cfg.training.max_steps = 3
    half = t_half.train()
    ckpt = save_checkpoint(str(tmp_path / "b"), half, epoch=1)

    t_res = _mini_trainer(tmp_path / "c", epochs=2)
    t_res.state, meta = load_checkpoint(ckpt, t_res.state)
    assert meta["full_resume"] and int(t_res.state.step) == 3
    t_res.start_epoch = min(
        int(t_res.state.step) // t_res.steps_per_epoch + 1, 2)
    assert t_res.start_epoch == 1  # resumes INSIDE epoch 1, not at epoch 2
    t_res.cfg.training.max_steps = 6
    res_state = t_res.train()
    assert int(res_state.step) == 6

    f1, _ = ravel_pytree(full_state.params)
    f2, _ = ravel_pytree(res_state.params)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


class TestDevicePrefetcher:
    """H2D double-buffering (VERDICT r2 #3): transfers happen on a worker
    thread, order is preserved, errors propagate, early exit never hangs."""

    def test_order_and_transfer_applied(self):
        from splade_tpu.train.trainer import DevicePrefetcher

        seen = []
        pf = DevicePrefetcher(iter(range(10)), lambda x: (seen.append(x), x * 2)[1],
                              depth=2)
        out = list(pf)
        assert out == [x * 2 for x in range(10)]
        assert seen == list(range(10))  # source consumed in order, once

    def test_source_exception_propagates(self):
        from splade_tpu.train.trainer import DevicePrefetcher

        def gen():
            yield 1
            raise RuntimeError("boom")

        pf = DevicePrefetcher(gen(), lambda x: x, depth=2)
        it = iter(pf)
        assert next(it) == 1
        with pytest.raises(RuntimeError, match="boom"):
            next(it)

    def test_transfer_exception_propagates(self):
        from splade_tpu.train.trainer import DevicePrefetcher

        def bad(x):
            raise ValueError("transfer failed")

        with pytest.raises(ValueError, match="transfer failed"):
            list(DevicePrefetcher(iter([1]), bad, depth=2))

    def test_early_close_unblocks_worker(self):
        from splade_tpu.train.trainer import DevicePrefetcher

        # infinite source; consumer takes 1 item and leaves (preemption)
        def forever():
            i = 0
            while True:
                yield i
                i += 1

        pf = DevicePrefetcher(forever(), lambda x: x, depth=2)
        assert next(iter(pf)) == 0
        pf.close()
        assert not pf._thread.is_alive()

    def test_close_closes_source_generator(self):
        # An abandoned source generator must be CLOSED by close(), not
        # left suspended: its finally is what stops the dataloader's own
        # prefetch producer, whose continued tokenization raced the final
        # eval on the shared HF tokenizer ("Already borrowed", round 5).
        from splade_tpu.train.trainer import DevicePrefetcher

        closed = []

        def src():
            try:
                i = 0
                while True:
                    yield i
                    i += 1
            finally:
                closed.append(True)

        pf = DevicePrefetcher(src(), lambda x: x, depth=2)
        assert next(iter(pf)) == 0
        pf.close()
        assert closed, "source generator finally did not run"

    def test_depth_zero_disables_in_trainer(self, tmp_path):
        # trainer integration both ways: default (prefetch on) is covered
        # by every other trainer test; this pins the depth=0 fallback
        cfg = V33Config.from_dict({
            "data": {"batch_size": 2, "query_max_length": 8,
                     "doc_max_length": 16, "device_prefetch_depth": 0},
            "training": {"num_epochs": 1, "gradient_accumulation_steps": 2,
                         "log_every_n_steps": 1,
                         "output_dir": str(tmp_path / "run")},
        })
        mcfg = ModernBertConfig.tiny()
        model = SpladeEncoder(mcfg)
        ids = jnp.zeros((1, 8), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids, jnp.ones_like(ids))["params"]
        data = [{"query": f"q{i}", "positive": f"p{i}", "negative": f"n{i}"}
                for i in range(64)]  # >= global_batch (2 x 8 devs) x accum 2
        col = TripletCollator(FakeTokenizer(), query_max_length=8,
                              doc_max_length=16)
        tr = Trainer(cfg, model, params, data, col,
                     output_dir=str(tmp_path / "run"))
        state = tr.train()
        assert int(state.step) >= 1
