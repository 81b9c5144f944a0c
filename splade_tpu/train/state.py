"""Train state + optimizer: AdamW with no-decay groups and warmup-cosine LR.

Reference semantics (src/train/cli/train_v33_ddp.py:560-592):
- AdamW, weight decay applied to everything except biases and LayerNorm
  weights;
- HF-style schedule: linear warmup over ``warmup_ratio * total_steps`` then
  cosine decay to 0;
- gradient clipping by global norm (``:367-370``).

All of it is one optax chain so the update lives inside the jitted step.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from splade_tpu.config.v33 import V33TrainingConfig


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

def decay_mask(params: Any) -> Any:
    """True where weight decay APPLIES: everything except LayerNorm scales,
    biases, and the decoder bias (reference: train_v33_ddp.py:560-581).
    This is optax.adamw's mask convention (decay where True)."""

    def decide(path, _):
        names = {getattr(k, "key", getattr(k, "name", "")) for k in path}
        return not (
            "scale" in names or "bias" in names or "decoder_bias" in names
        )

    return jax.tree_util.tree_map_with_path(decide, params)


# The old name read as "True where decay is SKIPPED" — the inverse of what
# the function returns. Kept as an alias for existing callers.
no_decay_mask = decay_mask


def warmup_cosine_schedule(
    learning_rate: float, total_steps: int, warmup_ratio: float = 0.06
) -> optax.Schedule:
    warmup = max(int(total_steps * warmup_ratio), 1)
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=learning_rate,
        warmup_steps=warmup,
        decay_steps=max(total_steps, warmup + 1),
        end_value=0.0,
    )


def create_optimizer(
    cfg: V33TrainingConfig, total_steps: int
) -> tuple[optax.GradientTransformation, optax.Schedule]:
    sched = warmup_cosine_schedule(cfg.learning_rate, total_steps, cfg.warmup_ratio)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.gradient_clip),
        optax.adamw(
            learning_rate=sched,
            b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=cfg.weight_decay,
            mask=decay_mask,
        ),
    )
    return tx, sched


def create_train_state(
    params: Any, cfg: V33TrainingConfig, total_steps: int
) -> TrainState:
    tx, _ = create_optimizer(cfg, total_steps)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        tx=tx,
    )
