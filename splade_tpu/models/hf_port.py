"""Port HuggingFace ModernBertForMaskedLM weights into the Flax model.

The reference consumes the HF checkpoint directly
(reference: src/model/splade_modern.py:40 ``AutoModelForMaskedLM.from_pretrained``);
we instead translate its state dict into our parameter pytree once, then run
pure JAX. Also provides the reverse direction for HF export
(reference: scripts/export_v33_hf.py:17-40).

Param layout note: our model runs the repeating [local, local, global]
3-layer unit as a ``flax.linen.scan`` (compile-time), so HF layers 3b+1,
3b+2, 3b+3 are STACKED along a leading blocks axis under
``blocks/{local_a,local_b,global_c}``; HF layer 0 maps to ``layer0`` and any
remainder layers map to ``tail_{i}``.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import numpy as np

from splade_tpu.models.modernbert import ModernBertConfig


def _t(x) -> np.ndarray:
    """torch tensor / np array -> float32 numpy."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _layer_from_hf(state: Mapping[str, Any], i: int, attn_norm: bool) -> Dict[str, Any]:
    pre = f"model.layers.{i}."
    layer: Dict[str, Any] = {
        "attn": {
            "Wqkv": {"kernel": _t(state[pre + "attn.Wqkv.weight"]).T},
            "Wo": {"kernel": _t(state[pre + "attn.Wo.weight"]).T},
        },
        "mlp_norm": {"scale": _t(state[pre + "mlp_norm.weight"])},
        "mlp": {
            "Wi": {"kernel": _t(state[pre + "mlp.Wi.weight"]).T},
            "Wo": {"kernel": _t(state[pre + "mlp.Wo.weight"]).T},
        },
    }
    if attn_norm:
        layer["attn_norm"] = {"scale": _t(state[pre + "attn_norm.weight"])}
    return layer


def _stack_trees(trees):
    import jax

    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *trees)


def port_hf_state_dict(
    state: Mapping[str, Any], config: ModernBertConfig
) -> Dict[str, Any]:
    """HF ModernBertForMaskedLM state dict -> flax params for our model.

    Linear kernels are transposed (torch stores [out, in], flax [in, out]).
    The decoder weight is tied to the embedding, so only its bias is read.
    """
    p: Dict[str, Any] = {
        "tok_embeddings": {"embedding": _t(state["model.embeddings.tok_embeddings.weight"])},
        "emb_norm": {"scale": _t(state["model.embeddings.norm.weight"])},
        "final_norm": {"scale": _t(state["model.final_norm.weight"])},
        "head_dense": {"kernel": _t(state["head.dense.weight"]).T},
        "head_norm": {"scale": _t(state["head.norm.weight"])},
    }
    if config.decoder_bias:
        p["decoder_bias"] = _t(state["decoder.bias"])
    L = config.num_hidden_layers
    p["layer0"] = _layer_from_hf(state, 0, attn_norm=False)
    nb = (L - 1) // 3
    if nb:
        p["blocks"] = {
            "local_a": _stack_trees([_layer_from_hf(state, 3 * b + 1, True) for b in range(nb)]),
            "local_b": _stack_trees([_layer_from_hf(state, 3 * b + 2, True) for b in range(nb)]),
            "global_c": _stack_trees([_layer_from_hf(state, 3 * b + 3, True) for b in range(nb)]),
        }
    for i in range(1 + 3 * nb, L):
        p[f"tail_{i}"] = _layer_from_hf(state, i, attn_norm=True)
    return p


def _layer_to_hf(out: Dict[str, np.ndarray], layer: Mapping[str, Any], i: int) -> None:
    pre = f"model.layers.{i}."

    def g(*path):
        node: Any = layer
        for k in path:
            node = node[k]
        return np.asarray(node, dtype=np.float32)

    out[pre + "attn.Wqkv.weight"] = g("attn", "Wqkv", "kernel").T
    out[pre + "attn.Wo.weight"] = g("attn", "Wo", "kernel").T
    out[pre + "mlp_norm.weight"] = g("mlp_norm", "scale")
    out[pre + "mlp.Wi.weight"] = g("mlp", "Wi", "kernel").T
    out[pre + "mlp.Wo.weight"] = g("mlp", "Wo", "kernel").T
    if "attn_norm" in layer:
        out[pre + "attn_norm.weight"] = g("attn_norm", "scale")


def export_to_hf_state_dict(params: Mapping[str, Any], config: ModernBertConfig) -> Dict[str, np.ndarray]:
    """Flax params -> HF ModernBertForMaskedLM state dict (numpy, float32)."""
    import jax

    def g(*path):
        node: Any = params
        for k in path:
            node = node[k]
        return np.asarray(node, dtype=np.float32)

    emb = g("tok_embeddings", "embedding")
    out: Dict[str, np.ndarray] = {
        "model.embeddings.tok_embeddings.weight": emb,
        "model.embeddings.norm.weight": g("emb_norm", "scale"),
        "model.final_norm.weight": g("final_norm", "scale"),
        "head.dense.weight": g("head_dense", "kernel").T,
        "head.norm.weight": g("head_norm", "scale"),
        "decoder.weight": emb,  # tied
    }
    if config.decoder_bias:
        out["decoder.bias"] = g("decoder_bias")
    L = config.num_hidden_layers
    _layer_to_hf(out, params["layer0"], 0)
    nb = (L - 1) // 3
    if nb:
        for role, off in (("local_a", 1), ("local_b", 2), ("global_c", 3)):
            stacked = params["blocks"][role]
            for b in range(nb):
                layer = jax.tree_util.tree_map(
                    lambda x, b=b: np.asarray(x)[b], stacked)
                _layer_to_hf(out, layer, 3 * b + off)
    for i in range(1 + 3 * nb, L):
        _layer_to_hf(out, params[f"tail_{i}"], i)
    return out


def load_hf_checkpoint(
    model_dir: str, config: Optional[ModernBertConfig] = None, **config_over: Any
):
    """Load an HF ModernBERT dir (config.json + safetensors/bin) -> (config, params).

    Works without torch if the checkpoint is safetensors.
    """
    import json
    from pathlib import Path

    d = Path(model_dir)
    if config is None:
        hf_cfg = json.loads((d / "config.json").read_text())
        config = ModernBertConfig.from_hf_dict(hf_cfg, **config_over)
    state: Dict[str, Any] = {}
    st_files = sorted(d.glob("*.safetensors"))
    if st_files:
        from safetensors.numpy import load_file

        for f in st_files:
            state.update(load_file(str(f)))
    else:
        import torch

        for f in sorted(d.glob("pytorch_model*.bin")) + sorted(d.glob("model*.pt")):
            state.update(torch.load(str(f), map_location="cpu", weights_only=True))
    if not state:
        raise FileNotFoundError(f"no weight files under {model_dir}")
    # Strip optional wrapper prefixes (e.g. a SPLADE wrapper's 'model.').
    if not any(k.startswith("model.") for k in state):
        state = {f"model.{k}" if not k.startswith(("head.", "decoder.")) else k: v
                 for k, v in state.items()}
    return config, port_hf_state_dict(state, config)
