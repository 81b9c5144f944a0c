"""Process-level JAX runtime setup shared by all entry points."""

from __future__ import annotations

import logging
import os
from pathlib import Path

logger = logging.getLogger(__name__)


def force_cpu_if_requested() -> None:
    """Honor JAX_PLATFORMS=cpu even though this host's sitecustomize imports
    jax (and registers the TPU plugin) before any script code runs — the env
    var alone is too late, so override via jax.config and drop any created
    backends (same dance as tests/conftest.py).

    Guards (each learned from a real failure):
    - no-op without jax installed (the package stays importable);
    - no-op when ``jax.distributed`` is live: clearing a
      distributed-initialized CPU backend re-registers its
      ``cpu:global_topology/cpu`` key with the coordination service ->
      ALREADY_EXISTS -> every worker dies (broke tests/test_multihost.py
      when this hook ran at package import after the worker's
      ``jax.distributed.initialize``);
    - ``clear_backends`` only when a non-CPU backend was actually
      instantiated — the hazard this hook exists for. A fresh process just
      needs the config update, and an existing CPU-only backend set must be
      left alone.
    """
    if os.environ.get("JAX_PLATFORMS", "").lower() != "cpu":
        return
    try:
        import jax
    except ImportError:
        return

    try:
        from jax._src import distributed as _dist

        if getattr(_dist.global_state, "client", None) is not None:
            return  # live multi-process runtime: backends already correct
    except Exception:
        pass

    jax.config.update("jax_platforms", "cpu")

    try:
        from jax._src import xla_bridge as _xb

        existing = list(getattr(_xb, "_backends", {}))
    except Exception:
        existing = None  # can't inspect: fall through to the clear attempt

    if existing == [] or existing == ["cpu"]:
        return  # nothing to repair
    try:
        import jax.extend.backend as _jeb

        _jeb.clear_backends()
    except Exception as e:
        if existing and any(p != "cpu" for p in existing):
            # The exact hazard this hook prevents — a non-CPU backend is
            # live and we could not drop it. Say so instead of silently
            # keeping the chip (ADVICE r3).
            logger.warning(
                "JAX_PLATFORMS=cpu requested but clear_backends failed with "
                "non-CPU backends alive (%s): %s — this process may still "
                "use the TPU", existing, e)


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
