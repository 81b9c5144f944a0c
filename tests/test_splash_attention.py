"""attention_impl='splash' contract on non-TPU backends.

The splash path (Pallas flash-style kernel) is TPU-only; everywhere else —
and whenever seq % 128 != 0 — the model must silently take the sdpa path
with BIT-IDENTICAL results, so configs carrying attention_impl='splash'
remain portable. On-chip numerics evidence (22L/768H/50K, fwd + packed +
grads vs sdpa) lives in docs/SPLASH_PARITY.json via
scripts/verify_splash_parity.py.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from splade_tpu.models.modernbert import ModernBertConfig
from splade_tpu.models.splade import SpladeEncoder


def test_splash_falls_back_to_sdpa_off_tpu():
    assert jax.default_backend() != "tpu"  # conftest forces CPU
    cfg = ModernBertConfig.tiny(local_attention=8)
    m_sdpa = SpladeEncoder(cfg, pool_impl="streamed", pool_tile=128)
    m_splash = SpladeEncoder(dataclasses.replace(cfg, attention_impl="splash"),
                             pool_impl="streamed", pool_tile=128)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, 100, (4, 16)), jnp.int32)
    mask = jnp.asarray((np.arange(16)[None] < rng.integers(4, 17, (4, 1))
                        ).astype(np.int32))
    params = m_sdpa.init(jax.random.PRNGKey(0), ids, mask)["params"]
    a, _ = m_sdpa.apply({"params": params}, ids, mask)
    b, _ = m_splash.apply({"params": params}, ids, mask)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_splash_config_roundtrips_through_v33_config():
    from splade_tpu.config.v33 import V33Config

    cfg = V33Config.from_dict({"model": {"attention_impl": "splash"}})
    assert cfg.model.attention_impl == "splash"
    d = ModernBertConfig.from_hf_dict(
        {"hidden_size": 64, "num_hidden_layers": 2, "num_attention_heads": 2,
         "intermediate_size": 96, "vocab_size": 128},
        attention_impl="splash")
    assert d.attention_impl == "splash"
