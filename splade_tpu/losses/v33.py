"""V33 SPLADE training loss — pure JAX functions.

Reference semantics: src/model/losses.py:14-301 (SPLADELossV33).

    L = InfoNCE + λ_q(t)·FLOPS(q) + λ_d(t)·FLOPS(p) + λ_neg(t)·FLOPS(n)
        [+ λ_kd·KL + λ_mmse·MarginMSE]

TPU-native differences from the reference:
- pure functions of (representations, step, config) — the λ schedule is a
  traced function of the step scalar, so the whole loss lives inside one
  jitted train step;
- hard negatives always carry an explicit k axis [B, k, V] (static shapes;
  the reference branches on dim at runtime, losses.py:158-177);
- the whole loss is written over the GLOBAL batch and compiled under GSPMD
  jit (XLA inserts the collectives). The reference's *per-rank* negative
  scope (losses.py:152-181) and per-rank FLOPS means are reproduced exactly
  by ``num_blocks = num_devices``: InfoNCE candidates are masked to the
  caller's contiguous block and FLOPS means are taken per block then
  averaged — identical math to DDP's per-rank losses averaged by the
  gradient all-reduce. ``num_blocks=1`` (with
  ``global_in_batch_negatives=True``) gives the upgraded global-candidate
  mode (BASELINE north star). Two shard_map-era helpers (``axis_name``)
  remain for explicit-collective callers.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from splade_tpu.config.v33 import V33LossConfig


class LossMetrics(NamedTuple):
    """Scalars logged per step (reference: losses.py:283-297)."""

    infonce: jnp.ndarray
    flops_q: jnp.ndarray
    flops_d: jnp.ndarray
    flops_neg: jnp.ndarray
    lambda_q: jnp.ndarray
    lambda_d: jnp.ndarray
    lambda_neg: jnp.ndarray
    kd: jnp.ndarray
    margin_mse: jnp.ndarray
    nonzero_q: jnp.ndarray
    nonzero_d: jnp.ndarray

    def as_dict(self) -> Dict[str, jnp.ndarray]:
        return self._asdict()


def flops_loss(sparse_repr: jnp.ndarray, num_blocks: int = 1) -> jnp.ndarray:
    """FLOPS regularizer (SPLADE-v2 Eq. 4; reference: losses.py:57-73).

    sum_j (mean_i w_ij)^2 over a [N, V] batch of representations.

    num_blocks > 1 reproduces data-parallel per-device semantics on a global
    batch: the mean is taken within each contiguous N/num_blocks block and
    the block losses are averaged (= DDP's per-rank FLOPS averaged by the
    gradient all-reduce).
    """
    x = sparse_repr.astype(jnp.float32)
    if num_blocks > 1:
        N, V = x.shape
        x = x.reshape(num_blocks, N // num_blocks, V)
        mean_act = jnp.mean(x, axis=1)  # [blocks, V]
        return jnp.mean(jnp.sum(mean_act * mean_act, axis=-1))
    mean_act = jnp.mean(x, axis=0)
    return jnp.sum(mean_act * mean_act)


def lambda_schedule(
    step: jnp.ndarray,
    target: float,
    warmup_steps: int,
    initial_ratio: float = 0.1,
) -> jnp.ndarray:
    """Quadratic λ warmup with a floor (reference: losses.py:75-90).

    λ(t) = target · (r0 + (1−r0) · min(1, t/T)²)
    """
    t = jnp.minimum(step.astype(jnp.float32) / max(warmup_steps, 1), 1.0)
    return jnp.float32(target) * (initial_ratio + (1.0 - initial_ratio) * t * t)


def _ensure_neg_k(negative: jnp.ndarray) -> jnp.ndarray:
    """[B, V] -> [B, 1, V]; [B, k, V] unchanged."""
    return negative[:, None, :] if negative.ndim == 2 else negative


def infonce_loss(
    anchor: jnp.ndarray,
    positive: jnp.ndarray,
    negative: jnp.ndarray,
    temperature: float = 1.0,
    axis_name: Optional[str] = None,
    num_blocks: int = 1,
) -> jnp.ndarray:
    """InfoNCE over in-batch positives + explicit hard negatives.

    Reference: losses.py:136-181. scores = [q·p_j / τ  |  q·n_k / τ], label =
    own positive's column.

    num_blocks > 1: the candidate set for row i is masked to its contiguous
    B/num_blocks block — the reference's per-rank negative scope expressed
    on the global batch (GSPMD-friendly: no collectives in user code).
    axis_name: legacy shard_map path — all_gather positives over that axis
    so candidates span the global batch.
    """
    anchor = anchor.astype(jnp.float32)
    positive = positive.astype(jnp.float32)
    negative = _ensure_neg_k(negative).astype(jnp.float32)
    B = anchor.shape[0]
    if axis_name is not None:
        gathered = jax.lax.all_gather(positive, axis_name)  # [D, B, V]
        candidates = gathered.reshape(-1, positive.shape[-1])  # [D*B, V]
        labels = jax.lax.axis_index(axis_name) * B + jnp.arange(B)
    else:
        candidates = positive  # [B, V]
        labels = jnp.arange(B)
    in_batch = jnp.dot(anchor, candidates.T,
                       preferred_element_type=jnp.float32) / temperature
    if axis_name is None and num_blocks > 1:
        if B % num_blocks:
            # a remainder would silently form a phantom extra block with a
            # smaller candidate set (and num_blocks > B divides by zero) —
            # fail loudly like flops_loss's reshape does
            raise ValueError(
                f"batch {B} not divisible by num_blocks={num_blocks}")
        block = B // num_blocks
        row_blk = jnp.arange(B)[:, None] // block
        col_blk = jnp.arange(B)[None, :] // block
        in_batch = jnp.where(row_blk == col_blk, in_batch, -jnp.inf)
    hard = jnp.einsum("bv,bkv->bk", anchor, negative) / temperature
    scores = jnp.concatenate([in_batch, hard], axis=1)  # [B, C+k]
    logz = jax.nn.logsumexp(scores, axis=1)
    gold = jnp.take_along_axis(scores, labels[:, None], axis=1)[:, 0]
    return jnp.mean(logz - gold)


def margin_mse_loss(
    anchor: jnp.ndarray,
    positive: jnp.ndarray,
    negative: jnp.ndarray,
    teacher_pos: jnp.ndarray,
    teacher_neg: jnp.ndarray,
) -> jnp.ndarray:
    """MarginMSE KD (TAS-B; reference: losses.py:92-134), multi-neg aware."""
    anchor = anchor.astype(jnp.float32)
    negative = _ensure_neg_k(negative).astype(jnp.float32)
    teacher_neg = teacher_neg[:, None] if teacher_neg.ndim == 1 else teacher_neg
    s_pos = jnp.sum(anchor * positive.astype(jnp.float32), axis=-1)  # [B]
    s_neg = jnp.einsum("bv,bkv->bk", anchor, negative)  # [B, k]
    s_margin = s_pos[:, None] - s_neg
    t_margin = teacher_pos[:, None] - teacher_neg
    return jnp.mean((s_margin - t_margin.astype(jnp.float32)) ** 2)


def kl_kd_loss(
    anchor: jnp.ndarray,
    positive: jnp.ndarray,
    teacher_scores: jnp.ndarray,
    kd_temperature: float = 1.0,
    num_blocks: int = 1,
) -> jnp.ndarray:
    """KL KD over the in-batch score matrix (reference: losses.py:239-253).

    KL(teacher softmax || student log-softmax), batchmean reduction.
    num_blocks > 1 masks BOTH softmaxes to contiguous B/num_blocks blocks —
    the reference's per-rank KD scope on a global batch, same semantics as
    infonce_loss's block masking (without it, the student distribution
    would span cross-device candidates the reference never sees).
    """
    student = jnp.dot(anchor.astype(jnp.float32), positive.astype(jnp.float32).T,
                      preferred_element_type=jnp.float32) / kd_temperature
    teacher = teacher_scores.astype(jnp.float32) / kd_temperature
    if num_blocks > 1:
        B = student.shape[0]
        if B % num_blocks:
            raise ValueError(
                f"batch {B} not divisible by num_blocks={num_blocks}")
        block = B // num_blocks
        same = (jnp.arange(B)[:, None] // block
                == jnp.arange(B)[None, :] // block)
        student = jnp.where(same, student, -jnp.inf)
        teacher = jnp.where(same, teacher, -jnp.inf)
    t_logp = jax.nn.log_softmax(teacher, axis=-1)
    t_prob = jnp.exp(t_logp)
    s_logp = jax.nn.log_softmax(student, axis=-1)
    # -inf - -inf would be NaN on masked columns; their probability is 0,
    # so zero the contribution explicitly
    contrib = jnp.where(t_prob > 0, t_prob * (t_logp - s_logp), 0.0)
    return jnp.mean(jnp.sum(contrib, axis=-1))


def v33_loss(
    anchor: jnp.ndarray,
    positive: jnp.ndarray,
    negative: jnp.ndarray,
    step: jnp.ndarray,
    cfg: V33LossConfig,
    teacher_scores: Optional[jnp.ndarray] = None,
    teacher_pos_scores: Optional[jnp.ndarray] = None,
    teacher_neg_scores: Optional[jnp.ndarray] = None,
    num_blocks: int = 1,
) -> tuple[jnp.ndarray, LossMetrics]:
    """Full V33 loss (reference: losses.py:183-297).

    Args:
        anchor/positive: [B, V] over the GLOBAL batch; negative: [B, V] or
            [B, k, V].
        step: global optimizer step (traced scalar) for the λ schedule.
        num_blocks: number of data-parallel blocks. With
            cfg.global_in_batch_negatives=False (reference parity), InfoNCE
            candidates and FLOPS means are per-block (= the reference's
            per-rank semantics); FLOPS stays per-block in both modes (the
            reference never globalizes it).
    """
    negative = _ensure_neg_k(negative)
    nce_blocks = 1 if cfg.global_in_batch_negatives else num_blocks
    infonce = infonce_loss(anchor, positive, negative, cfg.temperature,
                           num_blocks=nce_blocks)
    f_q = flops_loss(anchor, num_blocks)
    f_d = flops_loss(positive, num_blocks)
    f_n = flops_loss(negative.reshape(-1, negative.shape[-1]), num_blocks)
    lam_neg_target = cfg.lambda_neg if cfg.lambda_neg > 0 else cfg.lambda_d
    lam_q = lambda_schedule(step, cfg.lambda_q, cfg.flops_warmup_steps, cfg.lambda_initial_ratio)
    lam_d = lambda_schedule(step, cfg.lambda_d, cfg.flops_warmup_steps, cfg.lambda_initial_ratio)
    lam_n = lambda_schedule(step, lam_neg_target, cfg.flops_warmup_steps, cfg.lambda_initial_ratio)
    loss = infonce + lam_q * f_q + lam_d * f_d + lam_n * f_n

    kd = jnp.float32(0.0)
    if cfg.lambda_kd > 0 and teacher_scores is not None:
        kd = kl_kd_loss(anchor, positive, teacher_scores, cfg.kd_temperature,
                        num_blocks=nce_blocks)
        loss = loss + cfg.lambda_kd * kd
    mmse = jnp.float32(0.0)
    if (cfg.lambda_margin_mse > 0 and teacher_pos_scores is not None
            and teacher_neg_scores is not None):
        mmse = margin_mse_loss(anchor, positive, negative,
                               teacher_pos_scores, teacher_neg_scores)
        loss = loss + cfg.lambda_margin_mse * mmse

    nonzero_q = jnp.mean(jnp.sum((anchor > 0).astype(jnp.float32), axis=-1))
    nonzero_d = jnp.mean(jnp.sum((positive > 0).astype(jnp.float32), axis=-1))
    metrics = LossMetrics(
        infonce=infonce, flops_q=f_q, flops_d=f_d, flops_neg=f_n,
        lambda_q=lam_q, lambda_d=lam_d, lambda_neg=lam_n,
        kd=kd, margin_mse=mmse,
        nonzero_q=jax.lax.stop_gradient(nonzero_q),
        nonzero_d=jax.lax.stop_gradient(nonzero_d),
    )
    return loss, metrics
