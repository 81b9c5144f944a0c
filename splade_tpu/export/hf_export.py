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
    num_attention_heads: Optional[int] = None,
) -> str:
    """model.msgpack checkpoint dir -> HF dir (config.json, model.safetensors,
    tokenizer files)."""
    import numpy as np
    from safetensors.numpy import save_file

    from splade_tpu.models.hf_port import export_to_hf_state_dict
    from splade_tpu.models.modernbert import ModernBertConfig
    from splade_tpu.utils.tokenizer import create_tokenizer

    tokenizer = create_tokenizer(tokenizer_path)

    # Restore the raw msgpack tree WITHOUT a shape template (a template
    # built from default ModernBertConfig would reject any non-default
    # architecture), then derive the architecture from the weights.
    from flax import serialization

    params = serialization.msgpack_restore(
        (Path(ckpt_dir) / "model.msgpack").read_bytes())
    mlm = params["mlm"]
    emb = mlm["tok_embeddings"]["embedding"]
    n_groups = next(                      # blocks are [n_groups, ...] scan-stacked
        x.shape[0] for x in
        __import__("jax").tree_util.tree_leaves(mlm["blocks"]))
    # layer0 + [local,local,global]*n_groups + unrolled tail_{i} layers
    # (depths not of the form 1+3k keep their extras as tail_* — counting
    # only the scan blocks would silently export a shallower network)
    n_tail = sum(1 for k in mlm if k.startswith("tail_"))
    config = ModernBertConfig(
        vocab_size=emb.shape[0],
        hidden_size=emb.shape[1],
        num_hidden_layers=1 + 3 * n_groups + n_tail,
        intermediate_size=(
            mlm["layer0"]["mlp"]["Wi"]["kernel"].shape[1] // 2),  # GeGLU 2x
        # heads are not recoverable from fused qkv weights; pass
        # num_attention_heads for non-default checkpoints (metadata only —
        # the exported WEIGHTS are head-count-agnostic)
        **({"num_attention_heads": num_attention_heads}
           if num_attention_heads else {}),
        pad_token_id=tokenizer.pad_token_id,
    )
    if config.vocab_size != len(tokenizer):
        logger.warning("checkpoint vocab %d != tokenizer vocab %d",
                       config.vocab_size, len(tokenizer))

    state = export_to_hf_state_dict(mlm, config)
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
