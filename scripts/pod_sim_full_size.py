"""Production-width pod simulation: one V33 train step on a virtual mesh.

The driver's dryrun_multichip validates the SPMD path on a tiny config;
this runs the GSPMD train step at FULL FLAGSHIP SIZE — 22 layers, 768
hidden, 50K vocab, the dimensions that shape every collective (the
[B, 50000] global-negatives all_gather, the full-tree grad psum) — on a
virtual CPU mesh with the packed query tower. XLA-CPU terminates
collectives whose participants don't all arrive within 40s — on a 1-core
host the 8 device threads' serialized compute at full depth exceeds
that, so the script raises --xla_cpu_collective_call_*_timeout_seconds
(a rendezvous watchdog for wedged jobs, not a correctness bound; round-2
runs that predate this were depth-limited to 4L by it). Results merge
into docs/POD_SIM.json keyed by (layers, devices).

    JAX_PLATFORMS=cpu python scripts/pod_sim_full_size.py [--devices N]
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import json
import os
import time
from pathlib import Path


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--micro-batch", type=int, default=1,
                   help="per-device micro batch (CPU compute is the limit)")
    p.add_argument("--accum", type=int, default=1)
    p.add_argument("--layers", type=int, default=22,
                   help="transformer depth (default: full flagship 22)")
    p.add_argument("--seq", type=int, default=64, help="doc seq (query = seq//4)")
    p.add_argument("--out", default="docs/POD_SIM.json")
    args = p.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags += f" --xla_force_host_platform_device_count={args.devices}"
    if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
        # XLA-CPU's collective rendezvous watchdog kills the step when the
        # device threads don't all arrive within 40s — at full depth on a
        # 1-core host their serialized compute legitimately takes longer
        flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=7200"
                  " --xla_cpu_collective_call_warn_stuck_timeout_seconds=1200")
    os.environ["XLA_FLAGS"] = flags.strip()
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        import jax.extend.backend as _jeb

        _jeb.clear_backends()
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from splade_tpu.config.v33 import V33Config
    from splade_tpu.models.modernbert import ModernBertConfig
    from splade_tpu.models.splade import SpladeEncoder
    from splade_tpu.parallel.mesh import make_mesh
    from splade_tpu.train.state import create_train_state
    from splade_tpu.train.trainer import make_train_step, stack_microbatches

    devices = jax.devices()
    assert len(devices) >= args.devices, (len(devices), args.devices)
    mesh = make_mesh(num_data=args.devices, devices=devices)

    cfg = V33Config.from_dict({
        "data": {"batch_size": args.micro_batch},
        "loss": {"flops_warmup_steps": 100,
                 "global_in_batch_negatives": True},
        "training": {"gradient_accumulation_steps": args.accum},
    })
    # Production width always; depth/seq scaled to the host (see --layers).
    mcfg = ModernBertConfig(dtype=jnp.bfloat16, remat=True,
                            num_hidden_layers=args.layers)
    model = SpladeEncoder(mcfg, pool_impl="streamed", with_token_weights=False)
    ids0 = jnp.zeros((1, 16), jnp.int32)
    t0 = time.time()
    params = model.init(jax.random.PRNGKey(0), ids0,
                        jnp.ones_like(ids0))["params"]
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    init_s = time.time() - t0
    state = create_train_state(params, cfg.training, total_steps=100)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    step_fn = make_train_step(model, cfg, mesh, state.tx)

    B = args.micro_batch * args.devices
    rng = np.random.default_rng(0)

    def tok(n, L):
        ids = rng.integers(3, mcfg.vocab_size - 2, size=(n, L)).astype(np.int32)
        lengths = rng.integers(L // 2, L + 1, size=(n,))
        mask = (np.arange(L)[None] < lengths[:, None]).astype(np.int32)
        return np.where(mask > 0, ids, mcfg.pad_token_id), mask

    micro = []
    for _ in range(args.accum):
        qi, qm = tok(B, args.seq // 4)
        pi, pm = tok(B, args.seq)
        ni, nm = tok(B, args.seq)
        micro.append({
            "query_input_ids": qi, "query_attention_mask": qm,
            "positive_input_ids": pi, "positive_attention_mask": pm,
            "negative_input_ids": ni, "negative_attention_mask": nm,
        })
    batch = jax.device_put(
        stack_microbatches(micro),
        NamedSharding(mesh, P(None, mesh.axis_names[0])))

    t0 = time.time()
    new_params, new_opt, step, metrics = step_fn(
        state.params, state.opt_state, state.step, batch)
    loss = float(metrics["loss"])
    step_s = time.time() - t0

    results = {
        "what": ("ONE V33 train step at FULL FLAGSHIP SIZE (22L/768/50K — "
                 "the dims that shape every collective: the [B,V] "
                 "global-negatives all_gather, the full-tree grad psum) on "
                 "a virtual-device CPU mesh; XLA-CPU's 40s collective-"
                 "rendezvous watchdog is raised because 8 device threads' "
                 "serialized full-depth compute on this 1-core host "
                 "legitimately exceeds it"),
        "layers": args.layers,
        "seq": args.seq,
        "devices": args.devices,
        "params_m": round(n_params / 1e6, 1),
        "global_batch_per_micro": B,
        "accum": args.accum,
        "loss": loss,
        "infonce": float(metrics["infonce"]),
        "nonzero_q": float(metrics["nonzero_q"]),
        "step_int": int(step),
        "init_s": round(init_s, 1),
        "compile_plus_step_s": round(step_s, 1),
        "finite": bool(np.isfinite(loss)),
    }
    assert results["finite"], results
    assert results["step_int"] == 1
    print(json.dumps(results, indent=2))
    out = Path(args.out)
    prior = {}
    if out.exists():
        prior = json.loads(out.read_text())
        if "layers" in prior:  # migrate the old single-entry format
            prior = {f"{prior['layers']}L_{prior['devices']}dev": prior}
    prior[f"{args.layers}L_{args.devices}dev"] = results
    out.write_text(json.dumps(prior, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
