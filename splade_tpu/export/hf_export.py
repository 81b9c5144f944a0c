"""Export a trained checkpoint to HuggingFace ModernBertForMaskedLM format.

Reference: scripts/export_v33_hf.py:17-40 — load the training checkpoint,
save the inner MLM model as safetensors + tokenizer so the OpenSearch
ecosystem path (client-side encoding from a HF dir) keeps working.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Optional

logger = logging.getLogger(__name__)


def _hf_config_dict(config) -> dict:
    return {
        "architectures": ["ModernBertForMaskedLM"],
        "model_type": "modernbert",
        "vocab_size": config.vocab_size,
        "hidden_size": config.hidden_size,
        "intermediate_size": config.intermediate_size,
        "num_hidden_layers": config.num_hidden_layers,
        "num_attention_heads": config.num_attention_heads,
        "global_attn_every_n_layers": config.global_attn_every_n_layers,
        "local_attention": config.local_attention,
        "global_rope_theta": config.global_rope_theta,
        "local_rope_theta": config.local_rope_theta,
        "norm_eps": config.norm_eps,
        "layer_norm_eps": config.norm_eps,
        "norm_bias": False,
        "attention_bias": False,
        "mlp_bias": False,
        "classifier_bias": False,
        "decoder_bias": config.decoder_bias,
        "hidden_activation": "gelu",
        "classifier_activation": "gelu",
        "max_position_embeddings": config.max_position_embeddings,
        "pad_token_id": config.pad_token_id,
        "position_embedding_type": "absolute",
        "sparse_prediction": False,
        "dtype": "float32",
    }


def export_checkpoint_to_hf(
    ckpt_dir: str,
    output_dir: str,
    tokenizer_path: Optional[str] = None,
) -> str:
    """model.msgpack checkpoint dir -> HF dir (config.json, model.safetensors,
    tokenizer files)."""
    import numpy as np
    from safetensors.numpy import save_file

    from splade_tpu.models.hf_port import export_to_hf_state_dict
    from splade_tpu.models.modernbert import ModernBertConfig
    from splade_tpu.utils.tokenizer import create_tokenizer

    tokenizer = create_tokenizer(tokenizer_path)
    config = ModernBertConfig(vocab_size=len(tokenizer),
                              pad_token_id=tokenizer.pad_token_id)

    # Load params from msgpack with a shape-only template.
    import jax
    import jax.numpy as jnp

    from splade_tpu.models.splade import SpladeEncoder
    from splade_tpu.train.checkpoint import load_params

    model = SpladeEncoder(config)
    ids = jnp.zeros((1, 8), jnp.int32)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), ids, jnp.ones_like(ids)))
    template = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), shapes["params"])
    params = load_params(ckpt_dir, template)

    state = export_to_hf_state_dict(params["mlm"], config)
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    # safetensors forbids shared memory: decoder.weight is tied to the
    # embedding, so persist the convention HF uses (drop the tied copy).
    state.pop("decoder.weight", None)
    save_file({k: np.ascontiguousarray(v) for k, v in state.items()},
              str(out / "model.safetensors"),
              metadata={"format": "pt"})
    (out / "config.json").write_text(json.dumps(_hf_config_dict(config), indent=2))
    tokenizer.save_pretrained(str(out))
    logger.info("exported %s -> %s", ckpt_dir, out)
    return str(out)
