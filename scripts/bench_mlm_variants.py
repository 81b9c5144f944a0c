"""MLM pre-training step throughput sweep (packed tokens/s/chip).

The V33 train-step grid lives in scripts/bench_train_variants.py; this is
the same methodology for the MLM surface (splade_tpu/train/mlm.py), where
longer sequences (512) make the attention-memory tradeoffs different:
sdpa materializes f32 [B, N, S, S] score residuals (1 GB per layer-buffer
at B=32, S=512), so no-remat OOMs and remat pays recompute — while
attention_impl='splash' never materializes them in fwd OR bwd.

Writes docs/MLM_VARIANTS.json. Usage:
    python scripts/bench_mlm_variants.py [--only a,b] [--steps 6]
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import json
import time
from pathlib import Path


# name: (batch, seq, accum, remat: False|"full"|"dots", attention_impl)
VARIANTS = {
    "sdpa_dots_16x512": (16, 512, 2, "dots", "sdpa"),
    "sdpa_full_16x512": (16, 512, 2, "full", "sdpa"),
    "splash_nore_16x512": (16, 512, 2, False, "splash"),
    "splash_dots_16x512": (16, 512, 2, "dots", "splash"),
    "sdpa_dots_32x512": (32, 512, 2, "dots", "sdpa"),
    "splash_nore_32x512": (32, 512, 2, False, "splash"),
    "sdpa_nore_32x128": (32, 128, 2, False, "sdpa"),   # MLM_RUN.json recipe
    "splash_nore_32x128": (32, 128, 2, False, "splash"),
}


def run_variant(name, B, S, accum, remat, attention_impl, steps=6):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from splade_tpu.models.modernbert import (
        ModernBertConfig, ModernBertForMaskedLM)
    from splade_tpu.parallel.mesh import make_mesh
    from splade_tpu.train.mlm import make_mlm_loss_fn, make_mlm_train_step
    from splade_tpu.train.state import create_train_state
    from splade_tpu.config.v33 import V33Config

    mesh = make_mesh(devices=jax.devices())
    n_chips = int(mesh.devices.size)
    mcfg = ModernBertConfig(
        dtype=jnp.bfloat16, remat=bool(remat),
        remat_policy="dots_no_batch" if remat == "dots" else "full",
        attention_impl=attention_impl)
    model = ModernBertForMaskedLM(mcfg)
    ids0 = jnp.zeros((1, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids0,
                        jnp.ones_like(ids0))["params"]
    tcfg = V33Config().training
    state = create_train_state(params, tcfg, total_steps=1000)
    loss_fn = make_mlm_loss_fn(
        model, mask_token_id=4, vocab_size=mcfg.vocab_size,
        special_ids=np.array([0, 1, 4]), pad_id=mcfg.pad_token_id,
        mlm_prob=0.15, max_length=S)
    step_fn = make_mlm_train_step(model, mesh, state.tx, accum=accum,
                                  loss_fn=loss_fn, seed=0)

    rng = np.random.default_rng(0)
    ids = rng.integers(5, mcfg.vocab_size - 2,
                       size=(accum, B * n_chips, S)).astype(np.int32)
    batch = {"input_ids": jax.device_put(jnp.asarray(ids))}

    params, opt_state, step = state.params, state.opt_state, state.step
    t0 = time.time()
    params, opt_state, step, metrics = step_fn(params, opt_state, step, batch)
    jax.block_until_ready(metrics["loss"])
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(steps):
        params, opt_state, step, metrics = step_fn(params, opt_state, step, batch)
    jax.block_until_ready(metrics["loss"])
    dt = time.time() - t0
    tok_s = steps * B * n_chips * accum * S / dt / n_chips
    print(f"{name:22s} {tok_s:9.0f} tok/s/chip  "
          f"(step {dt/steps*1000:.0f}ms, compile {compile_s:.0f}s)", flush=True)
    return {"tokens_per_sec_per_chip": round(tok_s),
            "step_ms": round(dt / steps * 1000, 1),
            "compile_s": round(compile_s, 1),
            "batch": B, "seq": S, "accum": accum, "remat": remat,
            "attention_impl": attention_impl}


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--only", default=None)
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--out", default="docs/MLM_VARIANTS.json")
    args = p.parse_args()

    names = args.only.split(",") if args.only else list(VARIANTS)
    out_path = Path(args.out)
    results = json.loads(out_path.read_text()) if out_path.exists() else {}
    for name in names:
        try:
            results[name] = run_variant(name, *VARIANTS[name], steps=args.steps)
        except Exception as e:  # OOM etc. — record and continue
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            results[name] = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
        out_path.parent.mkdir(parents=True, exist_ok=True)
        out_path.write_text(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
