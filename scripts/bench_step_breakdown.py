"""Decompose the V33 train step's time: backbone vs head vs backward vs
optimizer (VERDICT r1 item 5 — profile-based ceiling analysis).

Times separately-jitted pieces at the bench configuration (micro-batch 16,
seq 64/256/256) and writes docs/STEP_BREAKDOWN.json:

  - backbone_fwd: ModernBERT encode of the 3 towers (no head)
  - head_fwd: MLM transform + streamed SPLADE pool from hidden states
  - full_fwd: loss forward (3 towers + pool + V33 loss)
  - fwd_bwd: value_and_grad of the same
  - optimizer: AdamW update alone
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import json
import time
from pathlib import Path

import numpy as np


def timeit(fn, *a, warmup=1, iters=6):
    import jax

    for _ in range(warmup):
        out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--remat", default="dots",
                   choices=["none", "full", "dots"])
    p.add_argument("--out", default="docs/STEP_BREAKDOWN.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from splade_tpu.config.v33 import V33Config
    from splade_tpu.losses.v33 import v33_loss
    from splade_tpu.models.modernbert import ModernBertConfig
    from splade_tpu.models.splade import SpladeEncoder
    from splade_tpu.train.state import create_train_state

    B = args.batch
    cfg = V33Config.from_dict({"data": {"batch_size": B}})
    mcfg = ModernBertConfig(
        dtype=jnp.bfloat16, remat=args.remat != "none",
        remat_policy="dots_no_batch" if args.remat == "dots" else "full")
    model = SpladeEncoder(mcfg, pool_impl="streamed", with_token_weights=False)
    ids0 = jnp.zeros((1, 16), jnp.int32)
    params = jax.device_put(
        model.init(jax.random.PRNGKey(0), ids0, jnp.ones_like(ids0))["params"])

    rng = np.random.default_rng(0)

    def tok(n, L):
        ids = rng.integers(3, mcfg.vocab_size - 2, size=(n, L)).astype(np.int32)
        lengths = rng.integers(L // 2, L + 1, size=(n,))
        mask = (np.arange(L)[None] < lengths[:, None]).astype(np.int32)
        return (jnp.asarray(np.where(mask > 0, ids, mcfg.pad_token_id)),
                jnp.asarray(mask))

    qi, qm = tok(B, 64)
    di, dm = tok(2 * B, 256)

    @jax.jit
    def backbone_fwd(p, ids, mask):
        return model.apply({"params": p}, ids, mask,
                           method=lambda m, i, a: m.mlm.encode(i, a))

    hidden = backbone_fwd(params, di, dm)

    @jax.jit
    def head_fwd(p, h, mask):
        def go(m, h_, a):
            from splade_tpu.ops.splade_pool import splade_pool_streamed

            t = m.mlm.head_transform(h_)
            emb, bias = m.mlm.decoder_weights()
            return splade_pool_streamed(t, emb, bias, a, tile=6250,
                                        with_token_weights=False)[0]
        return model.apply({"params": p}, h, mask, method=go)

    def loss_fn(p, qi_, qm_, di_, dm_):
        q_repr, _ = model.apply({"params": p}, qi_, qm_)
        d_repr, _ = model.apply({"params": p}, di_, dm_)
        p_repr = d_repr[:B]
        n_repr = d_repr[B:].reshape(B, -1, d_repr.shape[-1])
        loss, _ = v33_loss(q_repr, p_repr, n_repr, jnp.int32(100), cfg.loss)
        return loss

    full_fwd = jax.jit(loss_fn)
    fwd_bwd = jax.jit(lambda p, *a: jax.value_and_grad(loss_fn)(p, *a))

    state = create_train_state(params, cfg.training, total_steps=100)
    grads = jax.tree_util.tree_map(lambda x: jnp.zeros_like(x, jnp.float32),
                                   params)

    @jax.jit
    def opt_update(g, o, p_):
        updates, o2 = state.tx.update(g, o, p_)
        return jax.tree_util.tree_map(lambda a, u: a + u.astype(a.dtype),
                                      p_, updates), o2

    results = {}
    results["backbone_fwd_doc_ms"] = round(
        timeit(backbone_fwd, params, di, dm) * 1000, 1)
    results["backbone_fwd_query_ms"] = round(
        timeit(backbone_fwd, params, qi, qm) * 1000, 1)
    results["head_fwd_doc_ms"] = round(
        timeit(head_fwd, params, hidden, dm) * 1000, 1)
    results["full_fwd_ms"] = round(
        timeit(full_fwd, params, qi, qm, di, dm) * 1000, 1)
    results["fwd_bwd_ms"] = round(
        timeit(fwd_bwd, params, qi, qm, di, dm) * 1000, 1)
    results["optimizer_ms"] = round(
        timeit(opt_update, grads, state.opt_state, params) * 1000, 1)
    results["config"] = {"micro_batch": B, "remat": args.remat}

    # derived shares
    fb = results["fwd_bwd_ms"]
    results["derived"] = {
        "bwd_over_fwd": round(fb / max(results["full_fwd_ms"], 1e-9), 2),
        "head_share_of_fwd": round(
            results["head_fwd_doc_ms"] / max(results["full_fwd_ms"], 1e-9), 2),
        "note": "head_fwd covers the doc tower only; query-head is ~1/4 "
                "of it (seq 64 vs 256, batch B vs 2B)",
    }
    print(json.dumps(results, indent=2))
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
