"""Training CLI.

Usage (reference counterpart: ``torchrun -m src.train.cli.train_v33_ddp``):

    python -m splade_tpu.train v33 --config configs/train_v33.yaml \
        [--epochs N] [--batch-size B] [--lr LR] [--output-dir DIR]
        [--lambda-q X] [--lambda-d X] [--grad-accum N] [--seed S]
        [--debug] [--resume] [--checkpoint PATH] [--max-samples N]

CLI flags override env which overrides YAML which overrides defaults
(reference: train_v33_ddp.py:123-156). On TPU pods, run one process per host;
``jax.distributed.initialize`` replaces torchrun/NCCL rendezvous.
"""

from __future__ import annotations

import argparse
import logging
import os
import time
from typing import Any, Dict, Optional

logger = logging.getLogger(__name__)


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("splade-tpu v33 trainer")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--output-dir", type=str, default=None)
    p.add_argument("--lambda-q", type=float, default=None)
    p.add_argument("--lambda-d", type=float, default=None)
    p.add_argument("--grad-accum", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--debug", action="store_true",
                   help="cap at 100 steps / 1 epoch (reference --debug)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--max-samples", type=int, default=0)
    p.add_argument("--tokenizer", type=str, default=None)
    p.add_argument("--distributed", action="store_true",
                   help="call jax.distributed.initialize() (multi-host pods)")
    return p


def overrides_from_args(args: argparse.Namespace) -> Dict[str, Any]:
    ov: Dict[str, Dict[str, Any]] = {"model": {}, "loss": {}, "data": {}, "training": {}}
    if args.epochs is not None:
        ov["training"]["num_epochs"] = args.epochs
    if args.batch_size is not None:
        ov["data"]["batch_size"] = args.batch_size
    if args.lr is not None:
        ov["training"]["learning_rate"] = args.lr
    if args.output_dir is not None:
        ov["training"]["output_dir"] = args.output_dir
    if args.lambda_q is not None:
        ov["loss"]["lambda_q"] = args.lambda_q
    if args.lambda_d is not None:
        ov["loss"]["lambda_d"] = args.lambda_d
    if args.grad_accum is not None:
        ov["training"]["gradient_accumulation_steps"] = args.grad_accum
    if args.seed is not None:
        ov["training"]["seed"] = args.seed
    if args.tokenizer is not None:
        ov["data"]["tokenizer_path"] = args.tokenizer
    if args.debug:
        ov["training"]["num_epochs"] = 1
        ov["training"]["max_steps"] = 100
    return {k: v for k, v in ov.items() if v}


def main(argv: Optional[list] = None) -> int:
    args = build_arg_parser().parse_args(argv)
    if args.distributed:
        import jax

        jax.distributed.initialize()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from splade_tpu.utils.runtime import setup_jax_cache

    setup_jax_cache()

    from splade_tpu.config import load_config, save_config
    from splade_tpu.data import TripletCollator, load_training_data
    from splade_tpu.models.modernbert import ModernBertConfig
    from splade_tpu.models.splade import SpladeEncoder
    from splade_tpu.train.checkpoint import (
        find_latest_checkpoint, load_checkpoint, save_final_model)
    from splade_tpu.train.eval import MidTrainingEvaluator
    from splade_tpu.train.trainer import Trainer
    from splade_tpu.utils.logging import setup_logging
    from splade_tpu.utils.tokenizer import create_tokenizer, resolve_tokenizer_path

    cfg = load_config(args.config, overrides=overrides_from_args(args))
    out_dir = cfg.training.output_dir
    setup_logging(os.path.join(out_dir, "training.log"),
                  is_main_process=jax.process_index() == 0)
    save_config(cfg, os.path.join(out_dir, "resolved_config.yaml"))
    logger.info("devices: %s", jax.devices())

    tokenizer = create_tokenizer(cfg.data.tokenizer_path or cfg.model.name)
    train_data = load_training_data(cfg.data.train_files, max_samples=args.max_samples)
    collator = TripletCollator(
        tokenizer,
        query_max_length=cfg.data.query_max_length,
        doc_max_length=cfg.data.doc_max_length,
        num_hard_negatives=cfg.data.num_hard_negatives,
        length_buckets=cfg.data.length_buckets or None,
    )

    dtype = jnp.bfloat16 if cfg.model.dtype == "bfloat16" else jnp.float32
    mconfig = ModernBertConfig(
        vocab_size=len(tokenizer), dtype=dtype, remat=cfg.model.remat,
        remat_policy=cfg.model.remat_policy,
        attention_impl=cfg.model.attention_impl,
        pad_token_id=tokenizer.pad_token_id,
    )
    pool_mapping = {"auto": "streamed", "fused": "pallas", "xla": "logits"}
    if cfg.model.fused_splade_head not in pool_mapping:
        raise ValueError(
            f"model.fused_splade_head: {cfg.model.fused_splade_head!r} "
            f"(choose from {sorted(pool_mapping)})")
    pool_impl = pool_mapping[cfg.model.fused_splade_head]
    model = SpladeEncoder(mconfig, pool_impl=pool_impl,
                          with_token_weights=False)
    rng = jax.random.PRNGKey(cfg.training.seed)
    sample = jnp.zeros((1, cfg.data.query_max_length), jnp.int32)
    params = model.init(rng, sample, jnp.ones_like(sample))["params"]
    logger.info("params: %.1fM",
                sum(x.size for x in jax.tree_util.tree_leaves(params)) / 1e6)

    evaluator = None
    try:
        val_data = load_training_data(cfg.data.val_files)
        evaluator = MidTrainingEvaluator(list(val_data), collator)
    except FileNotFoundError:
        logger.info("no val files; mid-training eval disabled")

    trainer = Trainer(cfg, model, params, train_data, collator,
                      evaluator=evaluator, output_dir=out_dir)
    trainer.install_preemption_handler()

    ckpt = args.checkpoint
    if args.resume and not ckpt:
        ckpt = find_latest_checkpoint(out_dir)
    if jax.process_count() > 1:
        # Checkpoints are written by process 0 only; every process restores
        # them itself, which is only sound on a shared filesystem. If hosts
        # disagree on what (or whether) to restore, params diverge silently
        # under the replicated sharding — fail loudly instead.
        from jax.experimental import multihost_utils

        local = np.frombuffer(
            f"{ckpt or ''}".encode()[:256].ljust(256), np.uint8)
        if not np.array_equal(
                multihost_utils.broadcast_one_to_all(local), local):
            raise RuntimeError(
                f"resume checkpoint mismatch across hosts (process "
                f"{jax.process_index()} sees {ckpt!r}): output_dir must be "
                "a shared filesystem for multi-host resume")
    if ckpt:
        trainer.state, meta = load_checkpoint(ckpt, trainer.state)
        if meta["full_resume"]:
            # Position from the step counter (mid-epoch exact resume — a
            # preemption checkpoint does not skip the rest of its epoch).
            trainer.start_epoch = min(
                int(trainer.state.step) // trainer.steps_per_epoch + 1,
                cfg.training.num_epochs)
        logger.info("restored %s (full_resume=%s, start_epoch=%d)",
                    ckpt, meta["full_resume"], trainer.start_epoch)

    t0 = time.time()
    state = trainer.train()
    logger.info("training done in %.1f min", (time.time() - t0) / 60)
    save_final_model(out_dir, state.params, tokenizer)
    return 0
