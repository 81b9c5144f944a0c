"""Process-level JAX runtime setup shared by all entry points."""

from __future__ import annotations

import os
from pathlib import Path


def force_cpu_if_requested() -> None:
    """Honor JAX_PLATFORMS=cpu even though this host's sitecustomize imports
    jax (and registers the TPU plugin) before any script code runs — the env
    var alone is too late, so override via jax.config and drop any created
    backends (same dance as tests/conftest.py)."""
    if os.environ.get("JAX_PLATFORMS", "").lower() != "cpu":
        return
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        import jax.extend.backend as _jeb

        _jeb.clear_backends()
    except Exception:
        pass


def setup_jax_cache(cache_dir: str | None = None) -> None:
    """Optionally enable the persistent XLA compilation cache.

    OPT-IN via $SPLADE_JAX_CACHE: on remote-compile TPU backends the cache
    serialization path can stall executable loading (observed: encode jobs
    that ran in ~4min cold hung indefinitely with the cache on), so it is
    only enabled when the user explicitly sets a directory.
    """
    import jax

    path = cache_dir or os.environ.get("SPLADE_JAX_CACHE")
    if not path:
        return
    Path(path).mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
