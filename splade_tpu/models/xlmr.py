"""XLM-RoBERTa encoder in Flax — the BGE-M3 teacher backbone.

Reference: src/model/teachers/bge_m3.py:22-275 wraps the BGE-M3
sentence-transformer (an XLM-RoBERTa-large encoder whose CLS output is the
1024-d dense embedding). We reimplement the encoder natively (post-LN BERT
layout, learned positions with the RoBERTa padding offset) and port HF
weights, so teacher scoring runs as batched on-device matmuls instead of a
separate torch process pool.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclass(frozen=True)
class XlmRobertaConfig:
    vocab_size: int = 250002
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    max_position_embeddings: int = 8194
    type_vocab_size: int = 1
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def from_hf_dict(cls, d: Dict[str, Any], **over: Any) -> "XlmRobertaConfig":
        keys = {f.name for f in dataclasses.fields(cls)} - {"dtype"}
        kw = {k: d[k] for k in keys if k in d}
        kw.update(over)
        return cls(**kw)

    @classmethod
    def tiny(cls, **over: Any) -> "XlmRobertaConfig":
        base = dict(vocab_size=256, hidden_size=32, intermediate_size=64,
                    num_hidden_layers=2, num_attention_heads=4,
                    max_position_embeddings=66, pad_token_id=1)
        base.update(over)
        return cls(**base)


def roberta_position_ids(input_ids: jnp.ndarray, pad_token_id: int) -> jnp.ndarray:
    """RoBERTa convention: positions count non-pad tokens, offset by pad+1."""
    mask = (input_ids != pad_token_id).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + pad_token_id


class XlmrLayer(nn.Module):
    config: XlmRobertaConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_bias: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        B, S, H = x.shape
        n, d = cfg.num_attention_heads, cfg.head_dim
        q = nn.Dense(H, dtype=cfg.dtype, name="query")(x).reshape(B, S, n, d)
        k = nn.Dense(H, dtype=cfg.dtype, name="key")(x).reshape(B, S, n, d)
        v = nn.Dense(H, dtype=cfg.dtype, name="value")(x).reshape(B, S, n, d)
        scores = jnp.einsum("bqnd,bknd->bnqk", q, k).astype(jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(d)) + attn_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(cfg.dtype)
        ctx = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(B, S, H)
        attn_out = nn.Dense(H, dtype=cfg.dtype, name="attn_out")(ctx)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, use_fast_variance=False,
                         dtype=cfg.dtype, name="attn_norm")(x + attn_out)
        inter = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype, name="intermediate")(x)
        inter = nn.gelu(inter, approximate=False)
        out = nn.Dense(H, dtype=cfg.dtype, name="output")(inter)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, use_fast_variance=False,
                            dtype=cfg.dtype, name="out_norm")(x + out)


class XlmRobertaEncoder(nn.Module):
    """Embeddings + post-LN transformer stack -> last hidden states."""

    config: XlmRobertaConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        words = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype,
                         param_dtype=jnp.float32, name="word_embeddings")(input_ids)
        pos_ids = roberta_position_ids(input_ids, cfg.pad_token_id)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       dtype=cfg.dtype, param_dtype=jnp.float32,
                       name="position_embeddings")(pos_ids)
        toktype = nn.Embed(cfg.type_vocab_size, cfg.hidden_size, dtype=cfg.dtype,
                           param_dtype=jnp.float32, name="token_type_embeddings")(
            jnp.zeros_like(input_ids))
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, use_fast_variance=False,
                         dtype=cfg.dtype, name="emb_norm")(words + pos + toktype)
        bias = jnp.where(attention_mask[:, None, None, :].astype(bool),
                         0.0, jnp.float32(-1e30))
        for i in range(cfg.num_hidden_layers):
            x = XlmrLayer(cfg, name=f"layer_{i}")(x, bias)
        return x

    def encode_cls(self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
        """BGE-M3 dense embedding: L2-normalized CLS hidden state."""
        hidden = self(input_ids, attention_mask)
        cls = hidden[:, 0, :].astype(jnp.float32)
        return cls / jnp.maximum(jnp.linalg.norm(cls, axis=-1, keepdims=True), 1e-9)


def port_xlmr_state_dict(state: Mapping[str, Any], config: XlmRobertaConfig) -> Dict[str, Any]:
    """HF XLMRobertaModel state dict -> flax params for XlmRobertaEncoder."""

    def t(key):
        x = state[key]
        if hasattr(x, "detach"):
            x = x.detach().cpu().numpy()
        return np.asarray(x, np.float32)

    def lin(key):
        return {"kernel": t(key + ".weight").T, "bias": t(key + ".bias")}

    def ln(key):
        return {"scale": t(key + ".weight"), "bias": t(key + ".bias")}

    pre = "roberta." if any(k.startswith("roberta.") for k in state) else ""
    p: Dict[str, Any] = {
        "word_embeddings": {"embedding": t(pre + "embeddings.word_embeddings.weight")},
        "position_embeddings": {"embedding": t(pre + "embeddings.position_embeddings.weight")},
        "token_type_embeddings": {"embedding": t(pre + "embeddings.token_type_embeddings.weight")},
        "emb_norm": ln(pre + "embeddings.LayerNorm"),
    }
    for i in range(config.num_hidden_layers):
        lp = f"{pre}encoder.layer.{i}."
        p[f"layer_{i}"] = {
            "query": lin(lp + "attention.self.query"),
            "key": lin(lp + "attention.self.key"),
            "value": lin(lp + "attention.self.value"),
            "attn_out": lin(lp + "attention.output.dense"),
            "attn_norm": ln(lp + "attention.output.LayerNorm"),
            "intermediate": lin(lp + "intermediate.dense"),
            "output": lin(lp + "output.dense"),
            "out_norm": ln(lp + "output.LayerNorm"),
        }
    return p
