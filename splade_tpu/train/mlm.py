"""Korean MLM pre-training tier.

The reference ships ``configs/pretrain_mlm.yaml`` targeting
``src.train.cli.pretrain_mlm``, a module that no longer exists in the repo
(SURVEY.md §2.6 — "legacy path"); only the config and the corpus-prep script
survive. This module implements that contract TPU-first:

- **In-graph dynamic masking** — the 15% BERT masking (80% ``[MASK]`` / 10%
  random / 10% keep) runs inside the jitted step from a step-folded PRNG key,
  so every epoch sees fresh masks (RoBERTa-style) with zero host RNG work.
- **Masked-position gather before the vocab projection** — the 50K-vocab head
  is applied only to the ~15% selected positions (``[B, P, V]`` instead of
  ``[B, S, V]``), a ~6.6x FLOP/HBM cut on the head at S=512. This mirrors the
  original BERT TPU implementation's ``masked_lm_positions`` design.
- **Sequence packing** — sentences are concatenated into full fixed-length
  rows instead of padded, so no MXU cycles are spent on pad tokens.
- Same GSPMD data-parallel step structure as the V33 trainer (grad-accum scan
  inside one jitted step, single gradient reduction).

Final params are saved wrapped as ``{"mlm": tree}`` so the V33 SPLADE trainer
can fine-tune from them directly via ``--checkpoint`` (model-only resume).
"""

from __future__ import annotations

import dataclasses
import glob
import json
import logging
import os
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Iterator, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


# --------------------------------------------------------------------------
# Config (keys mirror reference configs/pretrain_mlm.yaml)
# --------------------------------------------------------------------------
@dataclass
class MLMConfig:
    model_name: str = "skt/A.X-Encoder-base"
    data_dir: str = "data/mlm_korean"
    max_length: int = 512
    output_dir: str = "outputs/pretrain_mlm"
    epochs: int = 3
    batch_size: int = 32
    grad_accum: int = 4
    lr: float = 5e-5
    weight_decay: float = 0.01
    warmup_ratio: float = 0.05
    mlm_probability: float = 0.15
    save_steps: int = 2000
    eval_steps: int = 1000
    logging_steps: int = 100
    dataloader_workers: int = 4
    seed: int = 42
    # TPU additions ---------------------------------------------------------
    tokenizer_path: str = ""
    max_steps: int = 0
    val_fraction: float = 0.01
    """Held-out packed rows for masked-LM eval (fixed mask RNG)."""
    remat: bool = False
    dtype: str = "bfloat16"
    attention_impl: str = "sdpa"
    """'sdpa' | 'splash' (Pallas flash-style kernel; TPU-only, falls back
    to sdpa off-TPU or when max_length % 128 != 0)."""
    watchdog_timeout_s: float = 0.0
    """>0 arms the wedged-transport hang watchdog (see
    V33TrainingConfig.watchdog_timeout_s)."""

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def load(cls, path: Optional[str], overrides: Optional[Dict[str, Any]] = None
             ) -> "MLMConfig":
        """YAML <- env (``MLM_<KEY>``) <- explicit overrides."""
        import yaml

        d: Dict[str, Any] = {}
        if path:
            with open(path) as f:
                d.update({k: v for k, v in (yaml.safe_load(f) or {}).items()})
        fields = {f.name: f.type for f in dataclasses.fields(cls)}
        for name in fields:
            env = os.environ.get(f"MLM_{name.upper()}")
            if env is not None:
                cur = getattr(cls, name, None)
                default = cls.__dataclass_fields__[name].default
                if isinstance(default, bool):
                    d[name] = env.lower() in ("1", "true", "yes")
                elif isinstance(default, int):
                    d[name] = int(env)
                elif isinstance(default, float):
                    d[name] = float(env)
                else:
                    d[name] = env
        d.update(overrides or {})
        unknown = set(d) - set(fields)
        if unknown:
            raise ValueError(f"unknown MLM config keys: {sorted(unknown)}")
        return cls(**d)


# --------------------------------------------------------------------------
# Corpus packing
# --------------------------------------------------------------------------
def read_corpus(data_dir: str) -> Iterator[str]:
    """Yield sentences from mlm_*.txt shards (scripts/prepare_korean_mlm_data.py
    output) or from *.jsonl files with a ``text`` field."""
    paths = sorted(glob.glob(os.path.join(data_dir, "mlm_*.txt")))
    paths += sorted(glob.glob(os.path.join(data_dir, "*.jsonl")))
    if not paths:
        raise FileNotFoundError(f"no mlm_*.txt or *.jsonl under {data_dir}")
    for p in paths:
        with open(p, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                if line.startswith("{"):
                    try:
                        line = json.loads(line).get("text", "")
                    except json.JSONDecodeError:
                        pass
                if line:
                    yield line


def pack_corpus(sentences, tokenizer, max_length: int,
                batch_tokenize: int = 512) -> np.ndarray:
    """Pack tokenized sentences into full [N, max_length] rows.

    Layout per row: ``[CLS] tok tok ... [SEP]`` with sentences concatenated
    back to back; a sentence crossing the boundary spills into the next row.
    Only the final row can carry padding — zero pad waste elsewhere (the
    reference pads every sample to 512 instead).
    """
    cls_id, sep_id = tokenizer.cls_token_id, tokenizer.sep_token_id
    pad_id = tokenizer.pad_token_id or 0
    body = max_length - 2
    rows: List[np.ndarray] = []
    cur: List[int] = []
    buf: List[str] = []

    def flush_batch():
        nonlocal cur
        if not buf:
            return
        enc = tokenizer(buf, add_special_tokens=False)["input_ids"]
        buf.clear()
        for ids in enc:
            cur.extend(ids)
            while len(cur) >= body:
                rows.append(np.array([cls_id] + cur[:body] + [sep_id], np.int32))
                cur = cur[body:]

    for s in sentences:
        buf.append(s)
        if len(buf) >= batch_tokenize:
            flush_batch()
    flush_batch()
    if cur:
        tail = [cls_id] + cur + [sep_id]
        tail += [pad_id] * (max_length - len(tail))
        rows.append(np.array(tail, np.int32))
    if not rows:
        raise ValueError("empty MLM corpus")
    return np.stack(rows)


# --------------------------------------------------------------------------
# In-graph masking + loss
# --------------------------------------------------------------------------
def apply_mlm_masking(rng, ids, eligible, P: int, mask_token_id: int,
                      vocab_size: int):
    """BERT dynamic masking, fully in-graph (static shapes).

    Selects exactly ``P`` positions per row by top-k over uniform scores
    restricted to eligible positions (ineligible picks — rows with fewer than
    P eligible tokens — get weight 0), then corrupts 80% to ``[MASK]``, 10%
    to a random token, 10% kept.

    Returns (corrupted_ids [B,S], positions [B,P], labels [B,P], weights [B,P]).
    """
    import jax
    import jax.numpy as jnp

    B = ids.shape[0]
    r_pos, r_op, r_tok = jax.random.split(rng, 3)
    scores = jax.random.uniform(r_pos, ids.shape, jnp.float32,
                                minval=1e-6) * eligible
    _, positions = jax.lax.top_k(scores, P)                      # [B, P]
    weights = jnp.take_along_axis(eligible, positions, axis=1)   # [B, P]
    labels = jnp.take_along_axis(ids, positions, axis=1)         # [B, P]

    u = jax.random.uniform(r_op, (B, P))
    rand_tok = jax.random.randint(r_tok, (B, P), 0, vocab_size)
    corrupted_val = jnp.where(
        u < 0.8, mask_token_id, jnp.where(u < 0.9, rand_tok, labels))
    corrupted_val = jnp.where(weights > 0, corrupted_val, labels)
    corrupted = ids.at[jnp.arange(B)[:, None], positions].set(corrupted_val)
    return corrupted, positions, labels, weights


def make_mlm_loss_fn(model, mask_token_id: int, vocab_size: int,
                     special_ids: np.ndarray, pad_id: int, mlm_prob: float,
                     max_length: int):
    """Loss over one micro-batch {input_ids [B,S]} with in-graph masking.

    P = round(mlm_prob * (S-2)) positions are selected per row by top-k over
    uniform scores restricted to eligible (non-special, non-pad) positions;
    rows with fewer than P eligible tokens contribute weight-0 picks.
    """
    import jax
    import jax.numpy as jnp

    P = max(int(round(mlm_prob * (max_length - 2))), 1)
    specials = np.asarray(special_ids, np.int32).reshape(-1)

    def loss_fn(params, micro: Dict[str, Any], rng):
        ids = micro["input_ids"]
        B = ids.shape[0]
        attn_mask = (ids != pad_id).astype(jnp.int32)
        is_special = jnp.isin(ids, jnp.asarray(specials))
        eligible = (attn_mask.astype(bool) & ~is_special).astype(jnp.float32)
        corrupted, positions, labels, weights = apply_mlm_masking(
            rng, ids, eligible, P, mask_token_id, vocab_size)

        def fwd(mdl, c_ids, mask, pos):
            hidden = mdl.encode(c_ids, mask)                          # [B,S,H]
            sel = jnp.take_along_axis(hidden, pos[:, :, None], axis=1)  # [B,P,H]
            return mdl.project_vocab(mdl.head_transform(sel))         # [B,P,V]

        logits = model.apply({"params": params}, corrupted, attn_mask,
                             positions, method=fwd).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        denom = weights.sum() + 1e-6
        loss = (ce * weights).sum() / denom
        acc = ((logits.argmax(-1) == labels) * weights).sum() / denom
        metrics = {"mlm_acc": acc, "masked_per_row": denom / B}
        return loss, metrics

    return loss_fn


def make_mlm_train_step(model, mesh, tx, accum: int, loss_fn, seed: int):
    """(params, opt_state, step, batch[accum,B,S]) -> (params, opt, step+1, metrics).

    Same GSPMD structure as the V33 step (splade_tpu/train/trainer.py):
    grad-accum ``lax.scan`` inside one jit, batch sharded on the data axis,
    single gradient reduction per optimizer step. Single chip uses plain jit
    (the SPMD partitioner is pathologically slow on the remote TPU backend).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as Pspec

    axis = mesh.axis_names[0]
    n_dev = int(mesh.devices.size)
    base_key = jax.random.PRNGKey(seed)

    def device_step(params, opt_state, step, batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        step_key = jax.random.fold_in(base_key, step)

        def micro_step(carry, xs):
            g_acc, loss_acc, m_acc = carry
            idx, mb = xs
            if n_dev > 1:
                mb = jax.lax.with_sharding_constraint(
                    mb, NamedSharding(mesh, Pspec(axis)))
            rng = jax.random.fold_in(step_key, idx)
            (loss, metrics), grads = grad_fn(params, mb, rng)
            g_acc = jax.tree_util.tree_map(jnp.add, g_acc, grads)
            m_acc = jax.tree_util.tree_map(jnp.add, m_acc, metrics)
            return (g_acc, loss_acc + loss, m_acc), None

        g0 = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, jnp.float32), params)
        first = jax.tree_util.tree_map(lambda x: x[0], batch)
        _, m0 = jax.eval_shape(
            lambda: loss_fn(params, first, jax.random.PRNGKey(0)))
        m0 = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, jnp.float32), m0)
        (g_acc, loss_acc, m_acc), _ = jax.lax.scan(
            micro_step, (g0, jnp.float32(0.0), m0),
            (jnp.arange(accum), batch))
        grads = jax.tree_util.tree_map(lambda g: g / accum, g_acc)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u.astype(p.dtype), params, updates)
        metrics = {"loss": loss_acc / accum,
                   **{k: v / accum for k, v in m_acc.items()}}
        return new_params, new_opt, step + 1, metrics

    if n_dev == 1:
        return jax.jit(device_step, donate_argnums=(0, 1))
    rep = NamedSharding(mesh, Pspec())
    batch_sh = NamedSharding(mesh, Pspec(None, axis))
    return jax.jit(device_step,
                   in_shardings=(rep, rep, rep, {"input_ids": batch_sh}),
                   out_shardings=(rep, rep, rep, rep),
                   donate_argnums=(0, 1))


# --------------------------------------------------------------------------
# Trainer
# --------------------------------------------------------------------------
class MLMTrainer:
    def __init__(self, cfg: MLMConfig, model, params, rows: np.ndarray,
                 tokenizer, mesh=None):
        import jax
        from splade_tpu.parallel.mesh import make_mesh
        from splade_tpu.train.state import create_optimizer, TrainState
        from splade_tpu.utils.logging import MetricWriter
        from splade_tpu.utils.metrics import MetricsTracker
        import jax.numpy as jnp

        self.cfg = cfg
        self.model = model
        self.tokenizer = tokenizer
        self.mesh = mesh or make_mesh()
        n_dev = int(self.mesh.devices.size)
        self.global_batch = cfg.batch_size * n_dev
        self.accum = cfg.grad_accum

        n_val = max(int(len(rows) * cfg.val_fraction), 0)
        # the packed tail row (only padded row) goes to val when there is one
        self.val_rows = rows[len(rows) - n_val:] if n_val else rows[:0]
        self.train_rows = rows[:len(rows) - n_val]
        rows_per_step = self.global_batch * self.accum
        if len(self.train_rows) < rows_per_step:
            raise ValueError(
                f"corpus too small: {len(self.train_rows)} packed rows < one "
                f"optimizer step of {rows_per_step}")
        self.steps_per_epoch = len(self.train_rows) // rows_per_step
        self.total_steps = self.steps_per_epoch * cfg.epochs
        if cfg.max_steps:
            self.total_steps = min(self.total_steps, cfg.max_steps)

        # No-remat activation memory grows as L*B*S*H; at 22L/768H the
        # measured compile-time requirement is ~28 GB for B=32,S=512 (OOM on
        # a 16 GB v5e) vs ~7 GB for B=32,S=128 (fits). Warn before the user
        # pays a multi-minute compile that is guaranteed to fail.
        if not cfg.remat:
            mc = model.config if hasattr(model, "config") else None
            L = getattr(mc, "num_hidden_layers", 22)
            H = getattr(mc, "hidden_size", 768)
            est_gb = (L * cfg.batch_size * cfg.max_length * H * 96) / 2**30
            if est_gb > 14.0:
                logger.warning(
                    "estimated no-remat activation footprint ~%.0f GB exceeds "
                    "a 16 GB v5e chip (B=%d, S=%d, L=%d): set MLM_REMAT=1 or "
                    "reduce batch/max_length", est_gb, cfg.batch_size,
                    cfg.max_length, L)

        tcfg = _as_training_cfg(cfg)
        tx, _ = create_optimizer(tcfg, self.total_steps)
        self.state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                                opt_state=tx.init(params), tx=tx)

        special_ids = np.asarray(sorted(set(tokenizer.all_special_ids)), np.int32)
        loss_fn = make_mlm_loss_fn(
            model, tokenizer.mask_token_id, len(tokenizer), special_ids,
            tokenizer.pad_token_id or 0, cfg.mlm_probability, cfg.max_length)
        self.eval_loss_fn = None  # built lazily (jit) in evaluate()
        self._raw_loss_fn = loss_fn
        self.step_fn = make_mlm_train_step(
            model, self.mesh, tx, self.accum, loss_fn, cfg.seed)

        if n_dev > 1:
            from jax.sharding import NamedSharding, PartitionSpec as Pspec

            self.state = jax.device_put(
                self.state, NamedSharding(self.mesh, Pspec()))
            self.batch_sharding = NamedSharding(
                self.mesh, Pspec(None, self.mesh.axis_names[0]))
        else:
            self.batch_sharding = None

        self.writer = MetricWriter(f"{cfg.output_dir}/tb")
        self.tracker = MetricsTracker(cfg.output_dir, best_metric="loss")
        self.start_epoch = 1
        self._preempted = False

    def install_preemption_handler(self) -> None:
        from splade_tpu.train.preemption import install_preemption_handler

        install_preemption_handler(self)

    def _epoch_batches(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng(self.cfg.seed + epoch)
        order = rng.permutation(len(self.train_rows))
        rows_per_step = self.global_batch * self.accum
        for i in range(self.steps_per_epoch):
            sel = order[i * rows_per_step:(i + 1) * rows_per_step]
            ids = self.train_rows[sel].reshape(
                self.accum, self.global_batch, -1)
            yield {"input_ids": ids}

    def evaluate(self) -> Dict[str, float]:
        """Masked-LM loss/accuracy on held-out rows with a fixed mask RNG."""
        import jax
        import jax.numpy as jnp

        if not len(self.val_rows):
            return {}
        if self.eval_loss_fn is None:
            self.eval_loss_fn = jax.jit(self._raw_loss_fn)
        B = self.cfg.batch_size
        losses, accs = [], []
        rng = jax.random.PRNGKey(0)
        n_val = len(self.val_rows)
        if n_val < B:
            # a held-out set smaller than one batch would silently never
            # evaluate (the rows were still carved out of training!) —
            # run it as one small batch instead; the one extra compile
            # shape is paid once per run at eval cadence
            loss, m = self.eval_loss_fn(
                self.state.params,
                {"input_ids": jnp.asarray(self.val_rows)}, rng)
            losses.append(float(loss))
            accs.append(float(m["mlm_acc"]))
        for i in range(0, n_val - B + 1, B):
            chunk = self.val_rows[i:i + B]
            loss, m = self.eval_loss_fn(
                self.state.params, {"input_ids": jnp.asarray(chunk)}, rng)
            losses.append(float(loss))
            accs.append(float(m["mlm_acc"]))
        if not losses:
            return {}
        mean_loss = float(np.mean(losses))
        return {"mlm_loss": mean_loss, "mlm_acc": float(np.mean(accs)),
                "perplexity": float(np.exp(min(mean_loss, 20.0)))}

    def train(self):
        import jax

        cfg = self.cfg
        logger.info(
            "MLM pretraining: %d epochs x %d steps (global batch %d x accum %d,"
            " seq %d, %d packed rows) on %d devices",
            cfg.epochs, self.steps_per_epoch, self.global_batch, self.accum,
            cfg.max_length, len(self.train_rows), self.mesh.devices.size)
        t0 = time.time()
        run_start_step = int(self.state.step)  # exclude pre-resume steps
        tokens_per_step = self.global_batch * self.accum * cfg.max_length
        from splade_tpu.train.checkpoint import save_checkpoint
        from splade_tpu.train.preemption import HangWatchdog

        # Same wedged-transport watchdog as the V33 trainer (see
        # trainer.py train / preemption.HangWatchdog).
        self._watchdog = HangWatchdog(cfg.watchdog_timeout_s, name="mlm")

        self._last_epoch = self.start_epoch
        # Host-side step mirror (same fix as trainer.py train_epoch):
        # reading the device step array every iteration blocks the host on
        # each step's completion, serializing the next batch's H2D +
        # dispatch behind compute. The step increments exactly once per
        # call, so mirror it on host and touch device data only on
        # log/eval/save steps.
        gstep = int(self.state.step)
        try:
            self._train_epochs(cfg, gstep, tokens_per_step, run_start_step,
                               t0, save_checkpoint)
            # final save still fetches device params — keep the watchdog
            # armed through it (a wedge here is exactly the hang it
            # exists to catch)
            save_checkpoint(self.cfg.output_dir, self.state, self.cfg,
                            epoch=self._last_epoch,
                            best=self.tracker.best_value)
        finally:
            # An exception (non-finite loss, failed eval/save) must not
            # leave the armed watchdog alive: a caller that catches the
            # error would later be os._exit(17)'d by the stale thread, and
            # exit 17 tells the restart supervisor to resume a run that
            # deliberately aborted.
            self._watchdog.stop()
        self.tracker.summary()
        self.writer.close()
        return self.state

    def _train_epochs(self, cfg, gstep, tokens_per_step, run_start_step,
                      t0, save_checkpoint) -> None:
        import jax

        for epoch in range(self.start_epoch, cfg.epochs + 1):
            # Exact mid-epoch resume: batch order is a pure function of
            # (seed, epoch) and masking RNG is step-folded, so skipping the
            # consumed steps reproduces the uninterrupted run bitwise.
            done_in_epoch = gstep - (epoch - 1) * self.steps_per_epoch
            for i, batch in enumerate(self._epoch_batches(epoch)):
                if i < done_in_epoch:
                    continue
                if self._preempted or (cfg.max_steps and gstep >= cfg.max_steps):
                    break
                device_batch = ({"input_ids": jax.device_put(
                    batch["input_ids"], self.batch_sharding)}
                    if self.batch_sharding is not None else batch)
                params, opt, step, metrics = self.step_fn(
                    self.state.params, self.state.opt_state,
                    self.state.step, device_batch)
                self.state = self.state.replace(
                    params=params, opt_state=opt, step=step)
                gstep += 1
                from splade_tpu.train.preemption import heartbeat_if_due

                heartbeat_if_due(self._watchdog, metrics["loss"])
                if gstep % cfg.logging_steps == 0 or gstep == 1:
                    host = {k: float(v) for k, v in metrics.items()}
                    self._watchdog.beat()  # float() proved a completed step
                    if not np.isfinite(host["loss"]):
                        raise FloatingPointError(
                            f"non-finite MLM loss at step {gstep}")
                    host["epoch"] = epoch
                    host["tokens_per_sec"] = (
                        tokens_per_step * (gstep - run_start_step)
                        / max(time.time() - t0, 1e-9))
                    self.tracker.log(gstep, host)
                    self.writer.scalars(host, gstep, prefix="train/")
                    logger.info(
                        "epoch %d step %d/%d loss %.4f acc %.3f %.0f tok/s",
                        epoch, gstep, self.total_steps, host["loss"],
                        host["mlm_acc"], host["tokens_per_sec"])
                if cfg.eval_steps and gstep % cfg.eval_steps == 0:
                    scores = self.evaluate()
                    if scores:
                        self.writer.scalars(scores, gstep, prefix="eval/")
                        logger.info("eval @ step %d: %s", gstep, scores)
                        # beat only when eval resolved device work (empty
                        # val set returns {} without touching the device)
                        self._watchdog.beat()
                if cfg.save_steps and gstep % cfg.save_steps == 0:
                    save_checkpoint(cfg.output_dir, self.state, self.cfg,
                                    epoch=epoch,
                                    best=self.tracker.best_value)
                    self._watchdog.beat()  # so is a checkpoint write
            self._last_epoch = epoch
            if self._preempted or (cfg.max_steps and gstep >= cfg.max_steps):
                break


def _as_training_cfg(cfg: MLMConfig):
    from splade_tpu.config.v33 import V33TrainingConfig

    return V33TrainingConfig(
        num_epochs=cfg.epochs, learning_rate=cfg.lr,
        weight_decay=cfg.weight_decay, warmup_ratio=cfg.warmup_ratio,
        gradient_accumulation_steps=cfg.grad_accum, seed=cfg.seed,
        output_dir=cfg.output_dir, max_steps=cfg.max_steps)


# --------------------------------------------------------------------------
# CLI
# --------------------------------------------------------------------------
def main(argv: Optional[list] = None) -> int:
    import argparse

    p = argparse.ArgumentParser("splade-tpu MLM pretrainer")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--data-dir", type=str, default=None)
    p.add_argument("--output-dir", type=str, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--tokenizer", type=str, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--distributed", action="store_true")
    args = p.parse_args(argv)

    overrides = {k: v for k, v in {
        "data_dir": args.data_dir, "output_dir": args.output_dir,
        "epochs": args.epochs, "batch_size": args.batch_size,
        "lr": args.lr, "max_steps": args.max_steps,
        "tokenizer_path": args.tokenizer,
    }.items() if v is not None}
    cfg = MLMConfig.load(args.config, overrides)

    if args.distributed:
        import jax

        jax.distributed.initialize()
    import jax
    import jax.numpy as jnp

    from splade_tpu.models.modernbert import ModernBertConfig, ModernBertForMaskedLM
    from splade_tpu.train.checkpoint import (
        find_latest_checkpoint, load_checkpoint, save_final_model)
    from splade_tpu.utils.logging import setup_logging
    from splade_tpu.utils.tokenizer import create_tokenizer

    setup_logging(os.path.join(cfg.output_dir, "training.log"),
                  is_main_process=jax.process_index() == 0)
    Path(cfg.output_dir).mkdir(parents=True, exist_ok=True)
    (Path(cfg.output_dir) / "resolved_config.json").write_text(
        json.dumps(cfg.to_dict(), indent=2))

    tokenizer = create_tokenizer(cfg.tokenizer_path or cfg.model_name)
    logger.info("packing corpus from %s ...", cfg.data_dir)
    rows = pack_corpus(read_corpus(cfg.data_dir), tokenizer, cfg.max_length)
    logger.info("packed %d rows of %d tokens", len(rows), cfg.max_length)

    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    mconfig = ModernBertConfig(vocab_size=len(tokenizer), dtype=dtype,
                               remat=cfg.remat,
                               attention_impl=cfg.attention_impl,
                               pad_token_id=tokenizer.pad_token_id)
    model = ModernBertForMaskedLM(mconfig)
    sample = jnp.zeros((1, cfg.max_length), jnp.int32)
    params = model.init(jax.random.PRNGKey(cfg.seed), sample,
                        jnp.ones_like(sample))["params"]
    logger.info("params: %.1fM",
                sum(x.size for x in jax.tree_util.tree_leaves(params)) / 1e6)

    trainer = MLMTrainer(cfg, model, params, rows, tokenizer)
    trainer.install_preemption_handler()
    ckpt = args.checkpoint
    if args.resume and not ckpt:
        ckpt = find_latest_checkpoint(cfg.output_dir)
    if ckpt:
        trainer.state, meta = load_checkpoint(ckpt, trainer.state)
        if meta["full_resume"]:
            trainer.start_epoch = min(
                int(trainer.state.step) // trainer.steps_per_epoch + 1,
                cfg.epochs)
        logger.info("restored %s (full_resume=%s, start_epoch=%d)",
                    ckpt, meta["full_resume"], trainer.start_epoch)

    t0 = time.time()
    state = trainer.train()
    logger.info("MLM pretraining done in %.1f min", (time.time() - t0) / 60)
    # Wrap as {"mlm": tree} so the V33 SPLADE trainer loads it directly.
    save_final_model(cfg.output_dir, {"mlm": state.params}, tokenizer)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
