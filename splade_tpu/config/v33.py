"""V33 configuration dataclasses for the TPU-native SPLADE framework.

Mirrors the knobs of the reference V33 recipe (reference:
src/train/config/v33.py:21-132) and adds TPU-specific sections (mesh layout,
global in-batch negatives, fused-head selection) that have no CUDA
counterpart.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List


@dataclass
class V33ModelConfig:
    """Model/backbone knobs (reference: src/train/config/v33.py:24-29)."""

    name: str = "skt/A.X-Encoder-base"
    dropout: float = 0.1
    # TPU additions -------------------------------------------------------
    dtype: str = "bfloat16"
    """Compute dtype for activations (params are always float32)."""
    remat: bool = True
    """Rematerialize encoder layers (jax.checkpoint) to trade FLOPs for HBM."""
    remat_policy: str = "dots_no_batch"
    """'dots_no_batch' (default: save dense-projection outputs, recompute
    attention internals — frees the f32 [B,N,S,S] residuals and measures
    FASTER than no-remat on v5e, docs/TRAIN_VARIANTS.json) | 'full'
    (recompute whole layers — max memory savings)."""
    fused_splade_head: str = "auto"
    """'auto' | 'fused' | 'xla': how to compute the 50K-vocab projection +
    masked max-pool. 'auto' = the XLA-streamed vocab-tile path (never
    materializes the [B, S, V] logits tensor; measured equal to the hand
    Pallas kernel on v5e — docs/ARCHITECTURE.md §1); 'fused' = the Pallas
    kernel; 'xla' = the naive reference-shaped path for parity testing."""
    attention_impl: str = "sdpa"
    """'sdpa' | 'splash': 'splash' uses the Pallas splash-attention kernel
    (flash-style, block-sparse sliding window + segment ids — never
    materializes [B, N, S, S] in HBM). TPU-only; silently falls back to
    sdpa off-TPU or when seq % 128 != 0. Same math as sdpa up to bf16
    rounding (docs/SPLASH_PARITY.json)."""
    packed_query_tower: bool = True
    """Pack doc_len//query_len queries per doc-shaped row (segment-masked
    attention, per-segment RoPE) and run queries + docs as ONE backbone
    forward per micro-batch — the seq-64 query tower alone underutilizes the
    MXU (docs/STEP_BREAKDOWN.json). Same math as the unpacked path
    (tests/test_packed_query.py); auto-falls back when doc_max_length is not
    a multiple of query_max_length."""


@dataclass
class V33LossConfig:
    """Loss knobs (reference: src/train/config/v33.py:32-62)."""

    lambda_q: float = 1e-2
    lambda_d: float = 3e-3
    temperature: float = 1.0
    flops_warmup_steps: int = 20000
    lambda_kd: float = 0.0
    kd_temperature: float = 1.0
    lambda_margin_mse: float = 0.0
    lambda_initial_ratio: float = 0.1
    lambda_neg: float = 0.0
    """0 = fall back to lambda_d (reference: src/model/losses.py:50)."""
    # TPU additions -------------------------------------------------------
    global_in_batch_negatives: bool = False
    """If True, all_gather positives across the data mesh axis so InfoNCE
    sees the global batch as negatives. The reference is per-rank only
    (reference: src/model/losses.py:152-181); False reproduces that."""


@dataclass
class V33DataConfig:
    """Data knobs (reference: src/train/config/v33.py:65-86)."""

    train_files: List[str] = field(default_factory=lambda: ["data/v29.0/train_*.jsonl"])
    val_files: List[str] = field(default_factory=lambda: ["data/v29.0/val.jsonl"])
    batch_size: int = 64
    """Per-device batch size (reference per-GPU batch)."""
    query_max_length: int = 64
    doc_max_length: int = 256
    num_workers: int = 4
    num_hard_negatives: int = 1
    # TPU additions -------------------------------------------------------
    tokenizer_path: str = ""
    """HF tokenizer dir/name. Empty = resolve via SPLADE_TOKENIZER_PATH env
    or the model name."""
    length_buckets: List[float] = field(default_factory=list)
    """Optional sequence-length buckets as fractions of max (e.g.
    [0.25, 0.5, 1.0]): each batch pads to the smallest fitting bucket
    instead of always max_length — the static-shape counterpart of the
    reference's dynamic padding. Empty = always pad to max."""
    prefetch_depth: int = 2
    """Host-side collation prefetch depth for the input pipeline."""
    device_prefetch_depth: int = 2
    """H2D double-buffering: device_put the next N macro batches from a
    background thread while the current step computes (0 disables). This
    is what closes the e2e-vs-pure-step throughput gap on high-RTT
    transports (docs/TRAINING_DYNAMICS.md)."""


@dataclass
class V33TrainingConfig:
    """Trainer knobs (reference: src/train/config/v33.py:89-104)."""

    num_epochs: int = 25
    learning_rate: float = 5e-5
    weight_decay: float = 0.01
    warmup_ratio: float = 0.06
    gradient_clip: float = 1.0
    gradient_accumulation_steps: int = 4
    mixed_precision: str = "bf16"
    output_dir: str = "outputs/train_v33"
    log_every_n_steps: int = 50
    save_every_n_epochs: int = 5
    seed: int = 42
    eval_every_n_epochs: int = 5
    max_steps: int = 0
    """0 = no cap; >0 caps total optimizer steps (debug/smoke runs)."""
    watchdog_timeout_s: float = 0.0
    """>0 arms a hang watchdog: if no training step COMPLETES within this
    many seconds (a wedged device transport blocks forever with no
    exception or signal), the process exits hard with code 17 so the
    restart supervisor (scripts/train_with_restart.sh) relaunches with
    --resume from the latest checkpoint. Size it above the first-step
    compile time plus the longest eval/checkpoint pause (e.g. 1800);
    log_every_n_steps does NOT constrain it — the loop forces one
    completed-step heartbeat per half-window even between log steps."""


@dataclass
class V33MeshConfig:
    """TPU mesh layout — no reference counterpart (DDP handled this)."""

    data_axis: str = "data"
    num_data: int = -1
    """-1 = use all visible devices on the data axis."""


@dataclass
class V33Config:
    """Top-level V33 config (reference: src/train/config/v33.py:107-132)."""

    model: V33ModelConfig = field(default_factory=V33ModelConfig)
    loss: V33LossConfig = field(default_factory=V33LossConfig)
    data: V33DataConfig = field(default_factory=V33DataConfig)
    training: V33TrainingConfig = field(default_factory=V33TrainingConfig)
    mesh: V33MeshConfig = field(default_factory=V33MeshConfig)

    def __post_init__(self) -> None:
        for name, cls in (
            ("model", V33ModelConfig),
            ("loss", V33LossConfig),
            ("data", V33DataConfig),
            ("training", V33TrainingConfig),
            ("mesh", V33MeshConfig),
        ):
            val = getattr(self, name)
            if isinstance(val, dict):
                known = {f.name for f in dataclasses.fields(cls)}
                unknown = set(val) - known
                if unknown:
                    # reference semantics: unknown keys are dropped, not a
                    # crash — but say so (typo'd env vars land here)
                    import logging

                    logging.getLogger(__name__).warning(
                        "config section %r: ignoring unknown keys %s",
                        name, sorted(unknown))
                setattr(self, name,
                        cls(**{k: v for k, v in val.items() if k in known}))

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "V33Config":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})
