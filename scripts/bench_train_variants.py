"""Train-step throughput sweep (VERDICT r1 item 5: push per-chip MFU).

Measures triplets/s/chip for a grid of (micro-batch, accum, remat,
with_token_weights, pool_tile) variants of the V33 step on the local
device. Writes docs/TRAIN_VARIANTS.json.

Each variant pays a full compile through the tunnel (~2-4 min) — budget
accordingly; run variants=... subsets via --only.
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import json
import time
from pathlib import Path


VARIANTS = {
    # name: (micro_B, accum, remat: False|"full"|"dots", token_weights, pool_tile)
    "base_16x4": (16, 4, False, True, 6250),
    "no_tw_16x4": (16, 4, False, False, 6250),
    "no_tw_24x3": (24, 3, False, False, 6250),
    "no_tw_32x2": (32, 2, False, False, 6250),
    "no_tw_32x2_remat": (32, 2, "full", False, 6250),
    "no_tw_16x4_tile12500": (16, 4, False, False, 12500),
    "no_tw_48x2_remat": (48, 2, "full", False, 6250),
    # selective remat: keep dense-projection outputs, recompute attention —
    # frees the f32 [B,N,S,S] residuals that OOM'd no_tw_32x2
    "no_tw_16x4_dots": (16, 4, "dots", False, 6250),
    "no_tw_32x2_dots": (32, 2, "dots", False, 6250),
    "no_tw_48x2_dots": (48, 2, "dots", False, 6250),
    "no_tw_64x1_dots": (64, 1, "dots", False, 6250),
    # head-tile width (scan trip count 8/4/2 over the 50K vocab)
    "dots_tile12500": (16, 4, "dots", False, 12500),
    "dots_tile25000": (16, 4, "dots", False, 25000),
    # accum 8 at micro 16 = 128 triplets/chip/opt-step — matches the
    # reference recipe's per-chip effective batch on a v5e-16 slice
    "dots_16x8": (16, 8, "dots", False, 6250),
    "dots_12x4": (12, 4, "dots", False, 6250),
    "dots_8x4": (8, 4, "dots", False, 6250),
    "dots_10x4": (10, 4, "dots", False, 6250),
    "dots_14x4": (14, 4, "dots", False, 6250),
    "dots_8x8": (8, 8, "dots", False, 6250),
    "dots_12x8": (12, 8, "dots", False, 6250),
    "nodots_12x4": (12, 4, False, False, 6250),
    # pallas fused pool under the dots remat (custom-VJP head: residual is
    # only the [B,V] maxima)
    "dots_12x4_pallas": (12, 4, "dots", False, "pallas"),
    "dots_10x8": (10, 8, "dots", False, 6250),
    "dots_10x16": (10, 16, "dots", False, 6250),
    "dots_9x8": (9, 8, "dots", False, 6250),
    "dots_11x8": (11, 8, "dots", False, 6250),
    "dots_10x8_pallas": (10, 8, "dots", False, "pallas"),
    "dots_10x6": (10, 6, "dots", False, 6250),
    "dots_10x8_tile12500": (10, 8, "dots", False, 12500),
    # packed query tower (model.packed_query_tower): 4 seq-64 queries per
    # doc-shaped row, queries+docs in ONE forward. micro_b % 4 == 0 packs
    # with zero wasted segments.
    "pack_8x8": (8, 8, "dots", False, 6250, True),
    "pack_12x4": (12, 4, "dots", False, 6250, True),
    "pack_12x8": (12, 8, "dots", False, 6250, True),
    "pack_16x4": (16, 4, "dots", False, 6250, True),
    "pack_10x8": (10, 8, "dots", False, 6250, True),
    "pack_16x8": (16, 8, "dots", False, 6250, True),
    # round-2 follow-up sweep around the pack_8x8 winner
    "pack_8x12": (8, 12, "dots", False, 6250, True),
    "pack_8x16": (8, 16, "dots", False, 6250, True),
    "pack_4x16": (4, 16, "dots", False, 6250, True),
    "pack_4x8": (4, 8, "dots", False, 6250, True),
    "pack_8x8_tile12500": (8, 8, "dots", False, 12500, True),
    "pack_8x8_pallas": (8, 8, "dots", False, "pallas", True),
    "pack_8x8_nodots": (8, 8, False, False, 6250, True),
    "pack_8x8_fullremat": (8, 8, "full", False, 6250, True),
    # splash attention (Pallas flash-style kernel: no [B,N,S,S] in HBM)
    "splash_8x8": (8, 8, "dots", False, 6250, True, "splash"),
    "splash_8x16": (8, 16, "dots", False, 6250, True, "splash"),
    "splash_12x8": (12, 8, "dots", False, 6250, True, "splash"),
    "splash_16x8": (16, 8, "dots", False, 6250, True, "splash"),
    "splash_8x16_nodots": (8, 16, False, False, 6250, True, "splash"),
    "splash_16x8_nodots": (16, 8, False, False, 6250, True, "splash"),
}


def run_variant(name, micro_b, accum, remat, token_weights, pool_tile,
                packed=False, attention_impl="sdpa", steps=8, tiny=False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from splade_tpu.config.v33 import V33Config
    from splade_tpu.models.modernbert import ModernBertConfig
    from splade_tpu.models.splade import SpladeEncoder
    from splade_tpu.parallel.mesh import make_mesh
    from splade_tpu.train.state import create_train_state
    from splade_tpu.train.trainer import make_train_step, stack_microbatches

    devices = jax.devices()
    n_chips = len(devices)
    mesh = make_mesh(devices=devices)
    B = micro_b * n_chips
    cfg = V33Config.from_dict({
        "data": {"batch_size": micro_b},
        "training": {"gradient_accumulation_steps": accum},
        "model": {"packed_query_tower": packed},
    })
    if tiny:
        mcfg = ModernBertConfig.tiny(
            remat=bool(remat),
            remat_policy="dots_no_batch" if remat == "dots" else "full",
            attention_impl=attention_impl)
    else:
        mcfg = ModernBertConfig(
            dtype=jnp.bfloat16, remat=bool(remat),
            remat_policy="dots_no_batch" if remat == "dots" else "full",
            attention_impl=attention_impl)
    if pool_tile == "pallas":
        model = SpladeEncoder(mcfg, pool_impl="pallas",
                              with_token_weights=token_weights)
    else:
        model = SpladeEncoder(mcfg, pool_impl="streamed", pool_tile=pool_tile,
                              with_token_weights=token_weights)
    ids0 = jnp.zeros((1, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids0, jnp.ones_like(ids0))["params"]
    state = create_train_state(params, cfg.training, total_steps=1000)
    step_fn = make_train_step(model, cfg, mesh, state.tx)

    rng = np.random.default_rng(0)

    def tok(n, L):
        ids = rng.integers(3, mcfg.vocab_size - 2, size=(n, L)).astype(np.int32)
        lengths = rng.integers(L // 2, L + 1, size=(n,))
        mask = (np.arange(L)[None] < lengths[:, None]).astype(np.int32)
        return np.where(mask > 0, ids, mcfg.pad_token_id), mask

    micro = []
    for _ in range(accum):
        qi, qm = tok(B, 64)
        pi, pm = tok(B, 256)
        ni, nm = tok(B, 256)
        micro.append({
            "query_input_ids": qi, "query_attention_mask": qm,
            "positive_input_ids": pi, "positive_attention_mask": pm,
            "negative_input_ids": ni, "negative_attention_mask": nm,
        })
    batch = stack_microbatches(micro)
    if n_chips > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch = jax.device_put(batch, NamedSharding(mesh, P(None, mesh.axis_names[0])))
    else:
        batch = jax.device_put(batch)

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
    per_chip = steps * B * accum / dt / n_chips
    print(f"{name:24s} {per_chip:7.1f} triplets/s/chip  "
          f"(step {dt/steps*1000:.0f}ms, compile {compile_s:.0f}s)", flush=True)
    return {"triplets_per_sec_per_chip": round(per_chip, 1),
            "step_ms": round(dt / steps * 1000, 1),
            "compile_s": round(compile_s, 1),
            "micro_batch": micro_b, "accum": accum, "remat": remat,
            "with_token_weights": token_weights, "pool_tile": pool_tile,
            "packed_query": packed, "attention_impl": attention_impl}


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--only", default=None,
                   help="comma-separated variant names (default: all)")
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--out", default="docs/TRAIN_VARIANTS.json")
    p.add_argument("--tiny", action="store_true",
                   help="CPU-testable mode: tiny model, 2 timed steps — "
                        "exercises the variant plumbing and the JSON "
                        "schema, not the numbers")
    args = p.parse_args()
    if args.tiny:
        import os
        import re

        # tiny mode is a single-device schema/plumbing smoke: under the
        # test env's XLA_FLAGS=--xla_force_host_platform_device_count=8
        # the variant step would jit through the GSPMD partitioner with an
        # 8x batch on one CPU core (observed: 540s timeout vs 65s plain)
        flags = os.environ.get("XLA_FLAGS", "")
        stripped = re.sub(
            r"--xla_force_host_platform_device_count=\d+", "", flags).strip()
        if stripped != flags:
            os.environ["XLA_FLAGS"] = stripped
        from splade_tpu.utils.runtime import force_cpu_if_requested

        force_cpu_if_requested()
        args.steps = min(args.steps, 2)

    names = (args.only.split(",") if args.only else list(VARIANTS))
    out_path = Path(args.out)
    results = {}
    if out_path.exists():
        results = json.loads(out_path.read_text())
    for name in names:
        spec = VARIANTS[name]
        try:
            results[name] = run_variant(name, *spec, steps=args.steps,
                                        tiny=args.tiny)
        except Exception as e:  # OOM etc. — record and continue
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
            results[name] = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
        out_path.parent.mkdir(parents=True, exist_ok=True)
        out_path.write_text(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
