"""Splash-attention numerics evidence at the FULL flagship size (TPU).

Compares attention_impl='splash' (Pallas flash-style kernel: block-sparse
sliding window + segment ids, no [B,N,S,S] in HBM) against the default
'sdpa' path on the 22L/768H/50K-vocab model with the same parameters:

  1. plain doc-tower forward (seq 256, random lengths)
  2. packed query+doc forward (SpladeEncoder.forward_packed_qd)
  3. gradient of a scalar loss through the packed forward

Writes docs/SPLASH_PARITY.json. Expected magnitudes: bf16 rounding only
(sparse activations ~1e-2 absolute on O(1)-scale log1p values; relative
grad norm diff ~1e-3). Reference for the attention semantics being
preserved: huggingface ModernBERT alternating local/global attention
(SURVEY.md §7 hard part 1).
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import dataclasses
import json
import time
from pathlib import Path

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from splade_tpu.models.modernbert import ModernBertConfig
    from splade_tpu.models.splade import SpladeEncoder

    assert jax.default_backend() == "tpu", "parity evidence must run on TPU"

    B, Sq, Sd = 4, 64, 256
    cfg = ModernBertConfig(dtype=jnp.bfloat16, remat=False)
    m_sdpa = SpladeEncoder(cfg, pool_impl="streamed", with_token_weights=False)
    m_splash = SpladeEncoder(dataclasses.replace(cfg, attention_impl="splash"),
                             pool_impl="streamed", with_token_weights=False)

    rng = np.random.default_rng(0)

    def tok(n, L):
        ids = rng.integers(3, cfg.vocab_size - 2, size=(n, L)).astype(np.int32)
        lengths = rng.integers(L // 2, L + 1, size=(n,))
        mask = (np.arange(L)[None] < lengths[:, None]).astype(np.int32)
        return (jnp.asarray(np.where(mask > 0, ids, cfg.pad_token_id)),
                jnp.asarray(mask))

    ids0 = jnp.zeros((1, 16), jnp.int32)
    params = jax.device_put(
        m_sdpa.init(jax.random.PRNGKey(0), ids0, jnp.ones_like(ids0))["params"])

    qi, qm = tok(B, Sq)
    di, dm = tok(2 * B, Sd)

    results = {"config": "22L/768H/50K flagship, bf16, B=4, seq 64/256"}

    t0 = time.time()
    fwd_a = jax.jit(lambda p: m_sdpa.apply({"params": p}, di, dm)[0])
    fwd_b = jax.jit(lambda p: m_splash.apply({"params": p}, di, dm)[0])
    a = np.asarray(fwd_a(params), np.float32)
    b = np.asarray(fwd_b(params), np.float32)
    results["doc_fwd_max_abs_diff"] = float(np.max(np.abs(a - b)))
    results["doc_fwd_mean_abs"] = float(np.mean(np.abs(a)))
    nz_a, nz_b = set(zip(*np.nonzero(a > 0.5))), set(zip(*np.nonzero(b > 0.5)))
    results["doc_fwd_strong_activation_jaccard"] = (
        len(nz_a & nz_b) / max(len(nz_a | nz_b), 1))

    def packed(m, p):
        (q, _), (d, _) = m.apply({"params": p}, qi, qm, di, dm,
                                 method="forward_packed_qd")
        return q, d

    qa, da = jax.jit(lambda p: packed(m_sdpa, p))(params)
    qb, db = jax.jit(lambda p: packed(m_splash, p))(params)
    results["packed_q_max_abs_diff"] = float(jnp.max(jnp.abs(qa - qb)))
    results["packed_d_max_abs_diff"] = float(jnp.max(jnp.abs(da - db)))

    def loss(m):
        def f(p):
            q, d = packed(m, p)
            return jnp.sum(q * q) + jnp.sum(jnp.abs(d))
        return f

    ga = jax.jit(jax.grad(loss(m_sdpa)))(params)
    gb = jax.jit(jax.grad(loss(m_splash)))(params)
    from jax.flatten_util import ravel_pytree

    fa, _ = ravel_pytree(ga)
    fb, _ = ravel_pytree(gb)
    na = float(jnp.linalg.norm(fa))
    results["grad_norm_sdpa"] = na
    results["grad_rel_l2_diff"] = float(jnp.linalg.norm(fa - fb)) / max(na, 1e-9)
    results["wall_s"] = round(time.time() - t0, 1)

    print(json.dumps(results, indent=2))
    out = Path(__file__).resolve().parent.parent / "docs" / "SPLASH_PARITY.json"
    out.write_text(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
