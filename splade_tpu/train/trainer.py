"""SPMD train step + epoch-loop Trainer.

Reference counterpart: the DDP trainer (reference:
src/train/cli/train_v33_ddp.py:289-448 train_epoch, :451-736 main). TPU-native
restructuring:

- one jitted GSPMD step over a data mesh replaces 8 DDP processes;
- gradient accumulation is a ``lax.scan`` over micro-batches *inside* the
  step, so the cross-chip gradient reduction (pmean over ICI) happens once
  per optimizer step — the reference all-reduces every micro-batch because it
  never uses ``no_sync()`` (train_v33_ddp.py:363-374);
- positives and hard negatives share one doc-tower forward ([B*(1+k), S]) to
  keep the MXU busy with one big matmul stream instead of two;
- the λ schedule is a traced function of the step, so there is no host
  round-trip per step.
"""

from __future__ import annotations

import logging
import time
from typing import Any, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from splade_tpu.config.v33 import V33Config
from splade_tpu.losses.v33 import v33_loss
from splade_tpu.parallel.mesh import make_mesh
from splade_tpu.train.state import TrainState, create_train_state
from splade_tpu.utils.logging import MetricWriter
from splade_tpu.utils.metrics import MetricsTracker, MovingAverage, compute_throughput

logger = logging.getLogger(__name__)

# Batch keys that enter the device step ([accum, B, ...] after stacking).
TENSOR_KEYS = (
    "query_input_ids", "query_attention_mask",
    "positive_input_ids", "positive_attention_mask",
    "negative_input_ids", "negative_attention_mask",
    "teacher_pos_scores", "teacher_neg_scores", "teacher_scores",
)


def stack_microbatches(micro_batches: List[Dict[str, Any]]) -> Dict[str, np.ndarray]:
    """[accum] list of collated batches -> dict of [accum, ...] arrays.

    Length-bucketed collation can give micro-batches different sequence
    lengths; they are right-padded to the group max (mask 0, id 0 — padded
    positions are masked out of every reduction)."""
    out = {}
    for k in TENSOR_KEYS:
        present = [k in mb for mb in micro_batches]
        if not any(present):
            continue
        if not all(present):
            # teacher-score keys appear only when a micro-batch's EVERY row
            # carries complete scores; with mixed datasets one macro group
            # can have them in some micros and not others — indexing
            # micro_batches[0] alone used to KeyError mid-epoch (or flip
            # the jit pytree structure). Drop the key for this macro step:
            # partially-labeled KD for one step is worse than none.
            logger.warning(
                "dropping %s for this step: present in %d/%d micro-batches "
                "(dataset mixes teacher-scored and unscored rows)",
                k, sum(present), len(micro_batches))
            continue
        arrs = [np.asarray(mb[k]) for mb in micro_batches]
        if arrs[0].ndim == 2 and len({a.shape[1] for a in arrs}) > 1:
            S = max(a.shape[1] for a in arrs)
            arrs = [np.pad(a, ((0, 0), (0, S - a.shape[1]))) for a in arrs]
        out[k] = np.stack(arrs)
    return out


class DevicePrefetcher:
    """Background-thread H2D pipeline: ``device_put`` batch N+1..N+depth
    while step N computes.

    The host data pipeline is ~5x faster than the device step
    (769 t/s vs 151.7, docs/TRAINING_DYNAMICS.md), yet e2e throughput ran
    25% below the pure step rate: with numpy batches the H2D transfer
    happens at dispatch time, on the loop thread, serialized against the
    previous step through the (high-RTT tunnel) transport. Issuing the
    transfer from a worker thread overlaps it with device compute —
    the XLA async dispatch equivalent of the reference DataLoader's
    pin_memory+non_blocking prefetch (reference:
    src/train/data/dataloader.py:167-240).

    ``transfer`` maps a host batch to device arrays (e.g. device_put with
    a sharding); exceptions propagate to the consumer. close() unblocks
    and joins the worker without draining the source iterator.
    """

    _END = object()

    def __init__(self, batches: Iterable, transfer, depth: int = 2):
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
        self._stop = threading.Event()
        self._queue_mod = queue
        self._src = batches

        def worker():
            try:
                for b in batches:
                    item = ("ok", transfer(b))
                    if not self._put(item):
                        return
                self._put(("end", None))
            except BaseException as e:  # noqa: BLE001 - relayed to consumer
                self._put(("err", e))

        self._thread = threading.Thread(target=worker, daemon=True,
                                        name="device-prefetch")
        self._thread.start()

    def _put(self, item) -> bool:
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.2)
                return True
            except self._queue_mod.Full:
                continue
        return False

    def __iter__(self):
        while True:
            kind, val = self._q.get()
            if kind == "ok":
                yield val
            elif kind == "end":
                return
            else:
                raise val

    def close(self) -> None:
        """Stop the worker (consumer exited early: preemption/max_steps)."""
        self._stop.set()
        while True:  # drain so a blocked put() observes the stop flag
            try:
                self._q.get_nowait()
            except self._queue_mod.Empty:
                break
        self._thread.join(timeout=10.0)
        # Close the abandoned source generator AFTER the worker has
        # returned (a generator cannot be closed while executing): its
        # finally propagates the stop to the dataloader's own prefetch
        # producer, which would otherwise keep collating — and tokenizing
        # — until its queue filled, racing the final eval's tokenization
        # on the shared HF fast tokenizer (observed: "Already borrowed"
        # at max_steps finalization, round 5).
        if not self._thread.is_alive():
            try:
                close = getattr(self._src, "close", None)
                if close is not None:
                    close()
            except Exception:  # noqa: BLE001 - best-effort hygiene
                pass


def make_loss_fn(model, loss_cfg, num_blocks: int, packed_query: bool = False):
    def loss_fn(params, micro: Dict[str, jnp.ndarray], step: jnp.ndarray):
        B, Sq = micro["query_input_ids"].shape
        doc_ids = jnp.concatenate(
            [micro["positive_input_ids"], micro["negative_input_ids"]])
        doc_mask = jnp.concatenate(
            [micro["positive_attention_mask"], micro["negative_attention_mask"]])
        Sd = doc_ids.shape[1]
        if packed_query and Sd % Sq == 0 and Sd > Sq:
            # One uniform [R, Sd] forward: docs + sequence-packed queries
            # (see SpladeEncoder.forward_packed_qd). Shapes are static, so
            # this branch resolves at trace time.
            (q_repr, _), (doc_repr, _) = model.apply(
                {"params": params},
                micro["query_input_ids"], micro["query_attention_mask"],
                doc_ids, doc_mask, method="forward_packed_qd")
        else:
            q_repr, _ = model.apply({"params": params},
                                    micro["query_input_ids"],
                                    micro["query_attention_mask"])
            doc_repr, _ = model.apply({"params": params}, doc_ids, doc_mask)
        p_repr = doc_repr[:B]
        n_repr = doc_repr[B:].reshape(B, -1, doc_repr.shape[-1])
        loss, metrics = v33_loss(
            q_repr, p_repr, n_repr, step, loss_cfg,
            teacher_scores=micro.get("teacher_scores"),
            teacher_pos_scores=micro.get("teacher_pos_scores"),
            teacher_neg_scores=micro.get("teacher_neg_scores"),
            num_blocks=num_blocks,
        )
        return loss, metrics

    return loss_fn


def make_train_step(model, cfg: V33Config, mesh: Mesh, tx):
    """Build the jitted SPMD train step (GSPMD: sharding via jit constraints,
    XLA inserts all collectives — measured ~20x faster to compile than the
    equivalent shard_map formulation on the TPU backend).

    Signature: (params, opt_state, step, batch[accum, B_global, ...])
             -> (params, opt_state, step+1, metrics dict of scalars)

    The loss is written over the global batch with ``num_blocks =
    mesh size`` so per-device semantics (reference DDP parity) hold exactly;
    the doc-tower batch axis is sharded, params replicated, and the gradient
    reduction XLA inserts is one psum per optimizer step.
    """
    axis = mesh.axis_names[0]
    n_dev = int(mesh.devices.size)
    accum = cfg.training.gradient_accumulation_steps
    loss_fn = make_loss_fn(model, cfg.loss, num_blocks=n_dev,
                           packed_query=cfg.model.packed_query_tower)

    def device_step(params, opt_state, step, batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def micro_step(carry, mb):
            g_acc, loss_acc, m_acc = carry
            if n_dev > 1:
                mb = jax.lax.with_sharding_constraint(
                    mb, NamedSharding(mesh, P(axis)))
            (loss, metrics), grads = grad_fn(params, mb, step)
            g_acc = jax.tree_util.tree_map(jnp.add, g_acc, grads)
            m_acc = jax.tree_util.tree_map(jnp.add, m_acc, metrics)
            return (g_acc, loss_acc + loss, m_acc), None

        g0 = jax.tree_util.tree_map(lambda p: jnp.zeros_like(p, jnp.float32), params)
        first = jax.tree_util.tree_map(lambda x: x[0], batch)
        _, m0 = jax.eval_shape(lambda: loss_fn(params, first, step))
        m0 = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, jnp.float32), m0)
        (g_acc, loss_acc, m_acc), _ = jax.lax.scan(
            micro_step, (g0, jnp.float32(0.0), m0), batch)
        grads = jax.tree_util.tree_map(lambda g: g / accum, g_acc)
        loss = loss_acc / accum
        metrics = jax.tree_util.tree_map(lambda m: m / accum, m_acc)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: (p + u.astype(p.dtype)), params, updates)
        out_metrics = {"loss": loss, **metrics.as_dict()}
        out_metrics["grad_norm"] = jax.lax.stop_gradient(
            jnp.sqrt(sum(jnp.sum(jnp.square(g))
                         for g in jax.tree_util.tree_leaves(grads))))
        return new_params, new_opt, step + 1, out_metrics

    if n_dev == 1:
        # Single chip: plain jit. Mesh-annotated jit routes through the SPMD
        # partitioner, which is ~10x slower at run time and pathologically
        # slow to compile on the remote-compile TPU backend.
        return jax.jit(device_step, donate_argnums=(0, 1))
    rep = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(None, axis))
    return jax.jit(
        device_step,
        in_shardings=(rep, rep, rep, batch_sh),
        out_shardings=(rep, rep, rep, rep),
        donate_argnums=(0, 1),
    )


class Trainer:
    """Epoch loop: data sharding, logging, eval, checkpointing.

    Reference flow: train_v33_ddp.py:451-736.
    """

    def __init__(
        self,
        cfg: V33Config,
        model,
        params,
        train_data,
        collator,
        mesh: Optional[Mesh] = None,
        val_data=None,
        evaluator=None,
        output_dir: Optional[str] = None,
    ):
        from splade_tpu.data.pipeline import create_dataloader

        self.cfg = cfg
        self.model = model
        self.mesh = mesh or make_mesh(cfg.mesh.num_data, cfg.mesh.data_axis)
        self.output_dir = output_dir or cfg.training.output_dir
        if evaluator is None and val_data is not None:
            from splade_tpu.train.eval import MidTrainingEvaluator

            evaluator = MidTrainingEvaluator(list(val_data), collator)
        self.evaluator = evaluator

        if (jax.process_count() > 1
                and getattr(collator, "length_buckets", None)):
            # bucket choice depends on each host's LOCAL batch content, so
            # per-process shapes would diverge and break global-array
            # assembly — pad to max on pods
            logger.warning("multi-host run: disabling length bucketing "
                           "(content-dependent shapes diverge across hosts)")
            collator.length_buckets = None
        n_dev = self.mesh.devices.size
        self.global_batch = cfg.data.batch_size * n_dev
        self.accum = cfg.training.gradient_accumulation_steps
        # Each host loads 1/P of the batch; with one host this is the whole
        # global batch (device sharding happens at device_put).
        n_proc = jax.process_count()
        self.loader = create_dataloader(
            train_data, collator, self.global_batch // n_proc,
            shuffle=True, seed=cfg.training.seed, drop_last=True,
            process_index=jax.process_index(), process_count=n_proc,
            prefetch_depth=cfg.data.prefetch_depth,
        )
        steps_per_epoch = max(len(self.loader) // self.accum, 1)
        self.total_steps = steps_per_epoch * cfg.training.num_epochs
        if cfg.training.max_steps:
            self.total_steps = min(self.total_steps, cfg.training.max_steps)
        self.steps_per_epoch = steps_per_epoch

        self.state = create_train_state(params, cfg.training, self.total_steps)
        if n_dev > 1:
            self.state = jax.device_put(self.state, NamedSharding(self.mesh, P()))
            self.batch_sharding = NamedSharding(
                self.mesh, P(None, self.mesh.axis_names[0]))
        else:
            self.batch_sharding = None
        self.step_fn = make_train_step(model, cfg, self.mesh, self.state.tx)

        # Rank-0-only metric sinks: on a pod every host runs this loop, but
        # only process 0 may append to the shared output_dir (reference
        # logs rank-0 only, train_v33_ddp.py:377-442).
        is_main = jax.process_index() == 0
        self.writer = MetricWriter(f"{self.output_dir}/tb", enabled=is_main)
        self.tracker = MetricsTracker(self.output_dir, best_metric="loss",
                                      enabled=is_main)
        self.ema_nonzero_q = MovingAverage(0.9)
        self.ema_nonzero_d = MovingAverage(0.9)
        self.start_epoch = 1
        self._preempted = False

    def install_preemption_handler(self) -> None:
        from splade_tpu.train.preemption import install_preemption_handler

        install_preemption_handler(self)

    def _macro_batches(self, epoch: int,
                       skip_macros: int = 0) -> Iterable[Dict[str, np.ndarray]]:
        self.loader.set_epoch(epoch, skip_batches=skip_macros * self.accum)
        bucket: List[Dict[str, Any]] = []
        for mb in self.loader:
            bucket.append(mb)
            if len(bucket) == self.accum:
                yield stack_microbatches(bucket)
                bucket = []

    def _shard_batch(self, macro: Dict[str, np.ndarray]):
        """Host batch -> device batch. Single host: device_put against the
        (batch-axis) sharding. Multi host: each process holds only its 1/P
        slice, and device_put with a GLOBAL sharding would treat the local
        slice as the whole batch (dropping data) — assemble the global
        array from per-process shards instead."""
        if self.batch_sharding is None:
            # plain placement (a NamedSharding here would route the jit
            # through the SPMD partitioner — ~10x slower on 1 device);
            # explicit device_put so the prefetch thread, not the dispatch
            # path, pays the transfer
            return jax.device_put(macro)
        if jax.process_count() > 1:
            return jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(
                    self.batch_sharding, np.asarray(x)), macro)
        return jax.device_put(macro, self.batch_sharding)

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        t0 = time.time()
        # Exact mid-epoch resume: the loader order is a pure function of
        # (seed, epoch) and the step is RNG-free, so skipping the macros
        # already consumed (per the restored step counter) reproduces the
        # uninterrupted run bitwise. The reference can only resume at epoch
        # boundaries (train_v33_ddp.py:604-619).
        # Host-side step mirror: reading the DEVICE step array every
        # iteration (int(self.state.step)) would block the host on each
        # step's completion, serializing the next batch's H2D + dispatch
        # behind the current compute (measured 29% e2e slowdown vs the pure
        # step on the tunneled dev chip). The step increments exactly once
        # per call, so mirror it on host and only touch device data on log
        # steps.
        gstep = int(self.state.step)
        done_in_epoch = max(0, gstep - (epoch - 1) * self.steps_per_epoch)
        macros = self._macro_batches(epoch, skip_macros=done_in_epoch)
        depth = self.cfg.data.device_prefetch_depth
        prefetcher = None
        if depth > 0:
            prefetcher = DevicePrefetcher(macros, self._shard_batch,
                                          depth=depth)
            batches: Iterable = prefetcher
        else:
            batches = map(self._shard_batch, macros)
        try:
            last = self._run_steps(batches, epoch, gstep, t0)
        finally:
            if prefetcher is not None:
                prefetcher.close()
        return last

    def _run_steps(self, batches: Iterable, epoch: int, gstep: int,
                   t0: float) -> Dict[str, float]:
        cfg = self.cfg.training
        last: Dict[str, float] = {}
        samples = 0
        for device_batch in batches:
            if self._preempted or (cfg.max_steps and gstep >= cfg.max_steps):
                break
            params, opt_state, step, metrics = self.step_fn(
                self.state.params, self.state.opt_state, self.state.step,
                device_batch)
            self.state = self.state.replace(
                params=params, opt_state=opt_state, step=step)
            samples += self.global_batch * self.accum
            gstep += 1
            wd = getattr(self, "_watchdog", None)
            from splade_tpu.train.preemption import heartbeat_if_due

            heartbeat_if_due(wd, metrics["loss"])
            if gstep % cfg.log_every_n_steps == 0 or gstep == 1:
                host = {k: float(v) for k, v in metrics.items()}
                # float() above blocked until this step actually finished
                # on device — completed compute, the watchdog's heartbeat.
                if wd is not None:
                    wd.beat()
                if not np.isfinite(host["loss"]):
                    raise FloatingPointError(
                        f"non-finite loss at step {gstep}: {host} — "
                        "stopping before the checkpoint is poisoned")
                host["epoch"] = epoch
                host["samples_per_sec"] = compute_throughput(samples, time.time() - t0)
                self.ema_nonzero_q.update(host["nonzero_q"])
                self.ema_nonzero_d.update(host["nonzero_d"])
                host["nonzero_q_ema"] = self.ema_nonzero_q.get()
                host["nonzero_d_ema"] = self.ema_nonzero_d.get()
                self.tracker.log(gstep, host)
                self.writer.scalars(host, gstep, prefix="train/")
                logger.info(
                    "epoch %d step %d loss %.4f infonce %.4f nnz(q/d) %.0f/%.0f %.0f samp/s",
                    epoch, gstep, host["loss"], host["infonce"],
                    host["nonzero_q"], host["nonzero_d"], host["samples_per_sec"])
                last = host
        return last

    def train(self) -> TrainState:
        cfg = self.cfg.training
        logger.info(
            "training: %d epochs x %d steps (global batch %d x accum %d) on %d devices",
            cfg.num_epochs, self.steps_per_epoch, self.global_batch, self.accum,
            self.mesh.devices.size)
        # Run hyperparameters into TB/JSONL once (reference: log_hparams,
        # utils/logging.py:241-254).
        flat = {}
        for section, vals in self.cfg.to_dict().items():
            if isinstance(vals, dict):
                flat.update({f"{section}.{k}": v for k, v in vals.items()
                             if isinstance(v, (int, float, str, bool))})
        flat["devices"] = int(self.mesh.devices.size)
        flat["global_batch"] = self.global_batch
        self.writer.hparams(flat)
        from splade_tpu.train.checkpoint import (
            save_checkpoint, wait_for_pending_saves)
        from splade_tpu.train.preemption import HangWatchdog

        # Hang watchdog: trips (hard exit for the restart supervisor) when
        # no step COMPLETES within the window — catches a wedged device
        # transport that no exception or signal ever reports.
        self._watchdog = HangWatchdog(cfg.watchdog_timeout_s)
        try:
            for epoch in range(self.start_epoch, cfg.num_epochs + 1):
                t0 = time.time()
                self.train_epoch(epoch)
                logger.info("epoch %d done in %.1fs", epoch, time.time() - t0)
                if self._preempted:
                    save_checkpoint(self.output_dir, self.state, self.cfg,
                                    epoch=epoch, best=self.tracker.best_value)
                    logger.warning("preemption checkpoint written; exiting")
                    break
                if (self.evaluator is not None
                        and epoch % self.cfg.training.eval_every_n_epochs == 0):
                    scores = self.evaluator.evaluate(self.model, self.state.params)
                    self.writer.scalars(scores, int(self.state.step), prefix="eval/")
                    logger.info("eval @ epoch %d: %s", epoch, scores)
                    if scores:
                        # only a non-empty eval actually resolved device
                        # work — an unconditional beat would reset the hang
                        # window on pure host-side progress
                        self._watchdog.beat()
                if epoch % cfg.save_every_n_epochs == 0 or epoch == cfg.num_epochs:
                    save_checkpoint(self.output_dir, self.state, self.cfg,
                                    epoch=epoch, best=self.tracker.best_value,
                                    async_write=epoch != cfg.num_epochs)
                    self._watchdog.beat()  # save fetched device params
                if cfg.max_steps and int(self.state.step) >= cfg.max_steps:
                    break
            # Final drains still touch the device (pending async saves) —
            # keep the watchdog armed through them: a transport wedge
            # during the final save is exactly the hang it exists to catch.
            wait_for_pending_saves()
        finally:
            self._watchdog.stop()
        self.tracker.summary()
        self.writer.close()
        return self.state
