"""Full-size (flagship) architecture parity evidence.

VERDICT r1 item 2: parity vs HF torch was proven only at a 4-layer/64-dim toy
config; the 22-layer/768-hidden/50K-vocab flagship
(/root/reference/huggingface/v33/config.json) is exactly where the
scan-block/tail decomposition (models/modernbert.py) could silently break.

This script:
  1. random-inits an HF torch ``ModernBertForMaskedLM`` at the flagship
     architecture (22 layers, 768 hidden, 1152 intermediate, 12 heads,
     50K vocab, global-attn every 3, local window 128, dual RoPE),
  2. ports it with ``port_hf_state_dict`` and compares logits at seq 64 and
     seq 256 (covering both the purely-local and the local+global regime),
  3. exports the Flax params to HF safetensors, reloads through
     ``SparseEncoderV33.from_hf_dir``, and checks the sparse vectors match,
  4. writes the measured max-abs diffs to docs/FULL_SIZE_PARITY.json.

Run: python scripts/full_size_parity.py [--layers 22] [--out docs/FULL_SIZE_PARITY.json]
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # run without install

import argparse
import json
import time
from pathlib import Path

import numpy as np


FLAGSHIP = dict(
    vocab_size=50000, hidden_size=768, intermediate_size=1152,
    num_hidden_layers=22, num_attention_heads=12,
    global_attn_every_n_layers=3, local_attention=128,
    global_rope_theta=160000.0, local_rope_theta=10000.0,
    pad_token_id=49999,
)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=22)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="docs/FULL_SIZE_PARITY.json")
    p.add_argument("--export-dir", default=None,
                   help="where to write the HF export (default: tmp)")
    args = p.parse_args()

    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import torch
    from transformers import ModernBertConfig as HFConfig
    from transformers.models.modernbert.modeling_modernbert import (
        ModernBertForMaskedLM as HFModel,
    )

    from splade_tpu.models.hf_port import port_hf_state_dict
    from splade_tpu.models.modernbert import ModernBertConfig, ModernBertForMaskedLM
    from splade_tpu.models.splade import SpladeEncoder

    arch = dict(FLAGSHIP, num_hidden_layers=args.layers)
    hf_cfg = HFConfig(
        **{k: v for k, v in arch.items()},
        max_position_embeddings=16384,
        attn_implementation="sdpa", reference_compile=False)
    print(f"[1/4] random-init HF torch flagship ({args.layers} layers)...")
    torch.manual_seed(args.seed)
    t0 = time.time()
    hf_model = HFModel(hf_cfg).eval()
    n_params = sum(p_.numel() for p_ in hf_model.parameters())
    print(f"      {n_params/1e6:.1f}M params in {time.time()-t0:.1f}s")

    cfg = ModernBertConfig(**arch)
    params = port_hf_state_dict(hf_model.state_dict(), cfg)
    model = ModernBertForMaskedLM(cfg)

    report = {
        "architecture": arch, "n_params": int(n_params), "seed": args.seed,
        "matmul_precision": "highest", "logit_parity": {},
    }

    rng = np.random.default_rng(args.seed)
    for seq in (64, 256):
        batch = 2
        ids = rng.integers(0, arch["vocab_size"] - 1,
                           size=(batch, seq)).astype(np.int32)
        lengths = np.array([seq, max(seq // 2, 2)])
        mask = (np.arange(seq)[None, :] < lengths[:, None]).astype(np.int32)
        ids = np.where(mask.astype(bool), ids, arch["pad_token_id"])

        t0 = time.time()
        with torch.no_grad():
            hf_logits = hf_model(
                input_ids=torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask, dtype=torch.long),
            ).logits.float().numpy()
        t_torch = time.time() - t0
        t0 = time.time()
        logits = np.asarray(model.apply(
            {"params": params}, jnp.asarray(ids), jnp.asarray(mask)),
            dtype=np.float32)
        t_jax = time.time() - t0
        valid = mask.astype(bool)
        diff = np.abs(logits - hf_logits)[valid]
        denom = np.maximum(np.abs(hf_logits[valid]), 1.0)
        rel = (np.abs(logits - hf_logits)[valid] / denom).max()
        entry = {
            "batch": batch, "max_abs_diff": float(diff.max()),
            "mean_abs_diff": float(diff.mean()), "max_rel_diff": float(rel),
            "torch_fwd_s": round(t_torch, 2), "jax_fwd_s": round(t_jax, 2),
        }
        report["logit_parity"][f"seq{seq}"] = entry
        print(f"[2/4] seq={seq}: max|Δlogit|={entry['max_abs_diff']:.2e} "
              f"mean={entry['mean_abs_diff']:.2e}")
        assert entry["max_abs_diff"] < 1e-2, "full-size logit parity FAILED"

    # ---- export -> reload -> identical sparse vectors
    print("[3/4] export to HF safetensors and reload via from_hf_dir...")
    import tempfile

    from safetensors.numpy import save_file

    from splade_tpu.export.hf_export import _hf_config_dict
    from splade_tpu.models.hf_port import export_to_hf_state_dict, load_hf_checkpoint

    out_dir = args.export_dir or tempfile.mkdtemp(prefix="hf_export_")
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    state = export_to_hf_state_dict(params, cfg)
    state.pop("decoder.weight", None)  # tied to embeddings; port re-ties
    save_file({k: np.ascontiguousarray(v) for k, v in state.items()},
              str(out / "model.safetensors"), metadata={"format": "pt"})
    (out / "config.json").write_text(json.dumps(_hf_config_dict(cfg), indent=2))

    cfg2, params2 = load_hf_checkpoint(str(out))
    seq = 64
    ids = rng.integers(0, arch["vocab_size"] - 1, size=(2, seq)).astype(np.int32)
    mask = np.ones_like(ids)
    enc1 = SpladeEncoder(cfg, pool_impl="streamed")
    enc2 = SpladeEncoder(cfg2, pool_impl="streamed")
    v1 = np.asarray(enc1.apply({"params": {"mlm": params}},
                               jnp.asarray(ids), jnp.asarray(mask))[0])
    v2 = np.asarray(enc2.apply({"params": {"mlm": params2}},
                               jnp.asarray(ids), jnp.asarray(mask))[0])
    rt = float(np.abs(v1 - v2).max())
    nnz = int((v1 > 0).sum(axis=1).mean())
    report["export_roundtrip"] = {
        "sparse_vec_max_abs_diff": rt, "mean_nnz_per_vec": nnz,
        "export_dir": str(out),
        "note": "random-init weights: near-full nnz is expected (sparsity "
                "comes from FLOPS training, not architecture)",
    }
    print(f"      roundtrip sparse max|Δ|={rt:.2e} (mean nnz/vec {nnz})")
    assert rt < 1e-5, "export->reload sparse vectors diverged"

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(report, indent=2))
    print(f"[4/4] wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
