"""Test env: force CPU with 8 virtual devices so mesh/collective logic is
exercised without a TPU pod (SURVEY.md §4 implication).

Note: this host's sitecustomize imports jax and registers the TPU plugin in
every python process, so env vars alone are too late — we must override via
jax.config and clear any created backends.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

import jax

jax.config.update("jax_platforms", "cpu")
try:
    import jax.extend.backend as _jeb

    _jeb.clear_backends()
except Exception:
    pass
# XLA-CPU's default matmul uses a reduced-precision fastmath path (~bf16);
# parity tests need true float32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
