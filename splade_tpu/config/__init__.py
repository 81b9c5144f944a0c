"""Config system: typed dataclasses + YAML + env overrides + CLI overrides.

Precedence (lowest to highest), mirroring the reference semantics
(reference: src/train/config/loader.py:22-160, src/train/cli/train_v33_ddp.py:123-156):
    dataclass defaults < YAML file < TRAIN_SECTION__KEY env vars < explicit overrides
"""

from splade_tpu.config.v33 import (
    V33Config,
    V33DataConfig,
    V33LossConfig,
    V33MeshConfig,
    V33ModelConfig,
    V33TrainingConfig,
)
from splade_tpu.config.loader import load_config, save_config, apply_env_overrides

__all__ = [
    "V33Config",
    "V33ModelConfig",
    "V33LossConfig",
    "V33DataConfig",
    "V33TrainingConfig",
    "V33MeshConfig",
    "load_config",
    "save_config",
    "apply_env_overrides",
]
