"""Checkpoint save/load with the reference's dual resume semantics.

Layout (reference: src/train/cli/train_v33_ddp.py:192-286):

    {output_dir}/checkpoint_epoch{E}_step{S}/
        model.msgpack          — params pytree only
        training_state.msgpack — opt_state + step + epoch + best_metric
        config.json            — resolved run config
    {output_dir}/final_model/model.msgpack (+ tokenizer files)

- ``--resume``: find latest by step suffix, restore params + optimizer.
- ``--checkpoint PATH`` on a model-only dir: load params, start fresh at
  epoch 1 (how V34/V35 fine-tune from V33's final model).

Serialization is flax msgpack (single-writer; process 0). Arrays are pulled
to host first, so this works for replicated params on any mesh.
"""

from __future__ import annotations

import json
import logging
import os
import re
import threading
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

logger = logging.getLogger(__name__)

_pending_writes: list = []  # async writer threads still in flight
_pending_errors: list = []  # exceptions raised inside async writers


def _to_host(tree: Any) -> Any:
    # np.array (NOT np.asarray): asarray can alias the device buffer on
    # some backends (CPU), and the train step DONATES params/opt_state —
    # an async writer serializing an aliased view would race the next
    # optimizer step and mix values from two steps in one checkpoint.
    return jax.tree_util.tree_map(
        lambda x: np.array(x) if hasattr(x, "shape") else x, tree)


def _shape_template(tree: Any) -> Any:
    """Host-side zeros with matching structure/shape/dtype — a msgpack
    restore template that costs no device->host transfer."""
    return jax.tree_util.tree_map(
        lambda x: (np.zeros(x.shape, x.dtype)
                   if hasattr(x, "shape") else x), tree)


def _atomic_write(path: Path, data: bytes) -> None:
    """Write via temp-file + rename so a crash/preemption mid-write never
    leaves a truncated checkpoint that resume would then pick up."""
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(data)
    os.replace(tmp, path)


def save_checkpoint(
    output_dir: str,
    state,
    cfg=None,
    epoch: int = 0,
    best: Optional[float] = None,
    name: Optional[str] = None,
    async_write: bool = False,
) -> str:
    """async_write=True: the device->host transfer is synchronous (the step
    donates and invalidates the old buffers), but msgpack serialization +
    disk IO happen on a writer thread so training resumes immediately —
    the reference blocks all ranks at a barrier for the whole save
    (train_v33_ddp.py:698-713)."""
    step = int(state.step)
    ckpt_name = name or f"checkpoint_epoch{epoch}_step{step}"
    path = Path(output_dir) / ckpt_name
    if jax.process_index() != 0:
        return str(path)
    path.mkdir(parents=True, exist_ok=True)
    host_params = _to_host(state.params)
    train_state = {
        "opt_state": _to_host(state.opt_state),
        "step": step,
        "epoch": epoch,
        "best_metric": float(best) if best is not None else 0.0,
    }

    def write():
        _atomic_write(path / "model.msgpack",
                      serialization.to_bytes(host_params))
        _atomic_write(path / "training_state.msgpack",
                      serialization.to_bytes(train_state))
        if cfg is not None:
            (path / "config.json").write_text(json.dumps(cfg.to_dict(), indent=2))
        logger.info("saved checkpoint %s%s", path,
                    " (async)" if async_write else "")

    if async_write:
        def guarded() -> None:
            try:
                write()
            except BaseException as e:  # noqa: BLE001 — surface at join
                _pending_errors.append(e)
                logger.exception("async checkpoint write failed")

        t = threading.Thread(target=guarded, name=f"ckpt-write-{step}",
                             daemon=False)
        _pending_writes.append(t)
        t.start()
    else:
        write()
    return str(path)


def wait_for_pending_saves() -> None:
    """Join in-flight async checkpoint writers (call before process exit).

    Raises the first writer failure: a serialization/disk error (ENOSPC)
    swallowed in the thread would otherwise let the run exit 0 with the
    checkpoint silently missing — discovered only when --resume finds
    nothing after a preemption."""
    while _pending_writes:
        _pending_writes.pop().join()
    if _pending_errors:
        err = _pending_errors[0]
        _pending_errors.clear()
        raise RuntimeError("async checkpoint write failed") from err


def save_final_model(output_dir: str, params, tokenizer=None) -> str:
    """Final artifact (reference: train_v33_ddp.py:721-730)."""
    path = Path(output_dir) / "final_model"
    if jax.process_index() == 0:
        path.mkdir(parents=True, exist_ok=True)
        (path / "model.msgpack").write_bytes(
            serialization.to_bytes(_to_host(params)))
        if tokenizer is not None:
            tokenizer.save_pretrained(str(path))
    return str(path)


def load_params(ckpt_dir: str, params_template) -> Any:
    data = (Path(ckpt_dir) / "model.msgpack").read_bytes()
    return serialization.from_bytes(params_template, data)


def load_checkpoint(
    ckpt_dir: str, state
) -> Tuple[Any, Dict[str, Any]]:
    """Restore (new_state, meta). Model-only dirs restore params and leave
    the optimizer fresh (meta['full_resume'] False)."""
    import jax.numpy as jnp

    d = Path(ckpt_dir)
    params = load_params(ckpt_dir, _shape_template(state.params))
    ts_path = d / "training_state.msgpack"
    if not ts_path.exists():
        return state.replace(params=params), {"full_resume": False, "epoch": 0, "step": 0}
    template = {
        "opt_state": _shape_template(state.opt_state),
        "step": 0,
        "epoch": 0,
        "best_metric": 0.0,
    }
    ts = serialization.from_bytes(template, ts_path.read_bytes())
    new_state = state.replace(
        params=params,
        opt_state=ts["opt_state"],
        step=jnp.asarray(ts["step"], jnp.int32),
    )
    meta = {"full_resume": True, "epoch": int(ts["epoch"]),
            "step": int(ts["step"]), "best_metric": ts["best_metric"]}
    return new_state, meta


def find_latest_checkpoint(output_dir: str) -> Optional[str]:
    """Latest by trailing step number (reference: train_v33_ddp.py:276-286)."""
    root = Path(output_dir)
    if not root.exists():
        return None
    best_step, best_path = -1, None
    for p in root.glob("checkpoint_*"):
        m = re.search(r"step(\d+)$", p.name)
        # Skip checkpoints a crash/preemption left incomplete (model written
        # but training_state missing): resuming one would silently restart
        # the optimizer at epoch 1.
        if not (p / "model.msgpack").exists() or not (
                p / "training_state.msgpack").exists():
            continue
        if m and int(m.group(1)) > best_step:
            best_step, best_path = int(m.group(1)), p
    return str(best_path) if best_path else None
