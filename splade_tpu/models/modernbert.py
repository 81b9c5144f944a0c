"""ModernBERT encoder + MLM head in Flax (TPU-native reimplementation).

Architecture parity target: HuggingFace ``ModernBertForMaskedLM`` as used by
the reference SPLADE model (reference: src/model/splade_modern.py:19-97 loads
``skt/A.X-Encoder-base``; architecture hyperparameters in
huggingface/v33/config.json): 22 pre-norm layers, GeGLU MLPs, fused QKV,
RoPE with alternating local (sliding-window 128, theta 10000) and global
(every 3rd layer, theta 160000) attention, biasless LayerNorm (eps 1e-5),
tied MLM decoder with bias.

TPU-first choices:
- attention is plain batched sdpa with an additive mask — at seq<=256 the
  sliding window is a mask, not a kernel problem (SURVEY.md §5.7);
- params live in float32, activations in bfloat16 (config.dtype);
- per-layer rematerialization via ``flax.linen.remat`` when config.remat;
- the MLM decoder is expressed as ``nn.Embed.attend`` so weights are tied by
  construction, and the head transform / vocab projection are exposed as
  separate methods so the SPLADE pooling can fuse the 50K projection with the
  seq-max reduction without materializing [B, S, V] logits.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclass(frozen=True)
class ModernBertConfig:
    vocab_size: int = 50000
    hidden_size: int = 768
    intermediate_size: int = 1152
    num_hidden_layers: int = 22
    num_attention_heads: int = 12
    global_attn_every_n_layers: int = 3
    local_attention: int = 128  # full window width; half-window each side
    global_rope_theta: float = 160000.0
    local_rope_theta: float = 10000.0
    norm_eps: float = 1e-5
    pad_token_id: int = 49999
    max_position_embeddings: int = 16384
    decoder_bias: bool = True
    dtype: Any = jnp.float32
    remat: bool = False
    #: remat granularity when remat=True:
    #:   "full"          — recompute the whole layer in backward (max memory
    #:                     savings, ~10% step cost at B=16);
    #:   "dots_no_batch" — save dense-projection outputs (no-batch-dim dots)
    #:                     but recompute attention internals: frees the
    #:                     f32 [B, N, S, S] score/prob residuals (the HBM
    #:                     hog — 1.3 GB per saved buffer at doc-batch 64)
    #:                     at the cost of re-running the cheap S^2 attention
    #:                     math, the flash-attention tradeoff expressed as
    #:                     an XLA remat policy. Default: measured FASTER
    #:                     than both no-remat and full remat on v5e
    #:                     (docs/TRAIN_VARIANTS.json).
    remat_policy: str = "dots_no_batch"
    #: attention math:
    #:   "sdpa"   — batched einsum + additive-mask softmax (default; runs
    #:              everywhere, used by all parity tests);
    #:   "splash" — Pallas splash-attention kernel (block-local mask +
    #:              segment ids, flash-style: never materializes the
    #:              f32 [B, N, S, S] score/prob tensors in HBM). TPU-only;
    #:              automatically falls back to sdpa when S % 128 != 0 or
    #:              the backend is not a TPU. Numerics vs sdpa are bf16
    #:              rounding only (tests/test_splash_attention.py).
    attention_impl: str = "sdpa"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    def is_global_layer(self, layer_id: int) -> bool:
        return layer_id % self.global_attn_every_n_layers == 0

    @classmethod
    def from_hf_dict(cls, d: Dict[str, Any], **over: Any) -> "ModernBertConfig":
        keys = {f.name for f in dataclasses.fields(cls)} - {
            "dtype", "remat", "remat_policy", "attention_impl"}
        kw = {k: d[k] for k in keys if k in d}
        kw.update(over)
        return cls(**kw)

    @classmethod
    def tiny(cls, **over: Any) -> "ModernBertConfig":
        """Small config for unit tests."""
        base = dict(
            vocab_size=512, hidden_size=64, intermediate_size=96,
            num_hidden_layers=4, num_attention_heads=4, local_attention=8,
            pad_token_id=511,
        )
        base.update(over)
        return cls(**base)


def rope_cos_sin(
    seq_len: int, head_dim: int, theta: float, dtype: Any = jnp.float32
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables, HF rotate-half convention: emb = concat(freqs, freqs)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    pos = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = jnp.outer(pos, inv_freq)  # [S, D/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [S, D]
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: [B, S, N, D]; cos/sin: [S, D] (shared) or [B, S, D] (per-row
    positions — the packed-sequence path). HF rotate_half convention."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    if cos.ndim == 2:
        c = cos[None, :, None, :]
        s = sin[None, :, None, :]
    else:
        c = cos[:, :, None, :]
        s = sin[:, :, None, :]
    return x * c + rotated * s


# Large finite negative for additive masks. -inf would NaN fully-masked rows
# (padded queries whose whole sliding window is padding) and the NaN leaks
# into valid rows via 0 * NaN in the attention value matmul.
MASK_NEG = jnp.float32(-1e30)


def sliding_window_bias(seq_len: int, half_window: int) -> jnp.ndarray:
    """[S, S] additive bias: 0 where |i-j| <= half_window else ~-inf."""
    idx = jnp.arange(seq_len)
    dist = jnp.abs(idx[:, None] - idx[None, :])
    return jnp.where(dist <= half_window, 0.0, MASK_NEG).astype(jnp.float32)


def _splash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      seg: jnp.ndarray, half_window: int) -> jnp.ndarray:
    """Flash-style attention via the Pallas splash kernel.

    q/k/v: [B, N, S, D] (RoPE already applied); seg: [B, S] int32 segment
    ids — tokens attend only within their own segment (padding must carry
    ids that never match real tokens). half_window > 0 applies the
    ModernBERT sliding-window mask block-sparsely; 0 = full attention.
    Never materializes [B, N, S, S] in HBM (fwd or bwd: the kernel carries
    its own flash-style VJP). Returns [B, S, N, D] in q.dtype.
    """
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as _sk,
        splash_attention_mask as _sm,
    )

    B, n, S, d = q.shape
    if half_window > 0:
        m = _sm.LocalMask((S, S), (half_window, half_window), 0)
    else:
        m = _sm.FullMask((S, S))
    blk = 256 if S % 256 == 0 else 128
    bs = _sk.BlockSizes(
        block_q=blk, block_kv=blk, block_kv_compute=blk,
        block_q_dkv=blk, block_kv_dkv=blk, block_kv_dkv_compute=blk,
        block_q_dq=blk, block_kv_dq=blk)
    kernel = _sk.make_splash_mha(
        _sm.MultiHeadMask([m] * n), head_shards=1, q_seq_shards=1,
        block_sizes=bs)
    scale = 1.0 / (float(d) ** 0.5)

    def per_row(q_, k_, v_, s_):
        return kernel(q_ * scale, k_, v_,
                      segment_ids=_sk.SegmentIds(s_, s_))

    out = jax.vmap(per_row)(q, k, v, seg)  # [B, N, S, D] f32
    return out.astype(q.dtype).transpose(0, 2, 1, 3)


class ModernBertAttention(nn.Module):
    config: ModernBertConfig
    layer_id: int
    local: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_bias: Optional[jnp.ndarray],
                 cos: jnp.ndarray, sin: jnp.ndarray,
                 seg: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        cfg = self.config
        B, S, H = x.shape
        n, d = cfg.num_attention_heads, cfg.head_dim
        qkv = nn.Dense(3 * H, use_bias=False, dtype=cfg.dtype, name="Wqkv")(x)
        qkv = qkv.reshape(B, S, 3, n, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if seg is not None:
            # Splash path: seg carries padding + packing; attn_bias unused.
            half_w = cfg.local_attention // 2 if self.local else 0
            out = _splash_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), seg, half_w).reshape(B, S, H)
            return nn.Dense(H, use_bias=False, dtype=cfg.dtype, name="Wo")(out)
        # [B, N, S, S] logits in f32 for a stable softmax.
        scores = jnp.einsum("bqnd,bknd->bnqk", q, k).astype(jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(d))
        scores = scores + attn_bias  # [B, 1, S, S] additive mask
        probs = jax.nn.softmax(scores, axis=-1).astype(cfg.dtype)
        out = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(B, S, H)
        return nn.Dense(H, use_bias=False, dtype=cfg.dtype, name="Wo")(out)


class ModernBertMLP(nn.Module):
    """GeGLU MLP: Wi -> split(input, gate) -> gelu(input) * gate -> Wo."""

    config: ModernBertConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        wi = nn.Dense(2 * cfg.intermediate_size, use_bias=False, dtype=cfg.dtype,
                      name="Wi")(x)
        inp, gate = jnp.split(wi, 2, axis=-1)
        h = nn.gelu(inp, approximate=False) * gate
        return nn.Dense(cfg.hidden_size, use_bias=False, dtype=cfg.dtype, name="Wo")(h)


class ModernBertLayer(nn.Module):
    config: ModernBertConfig
    layer_id: int
    local: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_bias: Optional[jnp.ndarray],
                 cos: jnp.ndarray, sin: jnp.ndarray,
                 seg: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        cfg = self.config
        if self.layer_id == 0:
            # Layer 0 has no attention pre-norm (embedding norm covers it).
            normed = x
        else:
            normed = nn.LayerNorm(epsilon=cfg.norm_eps, use_bias=False, use_fast_variance=False,
                                  dtype=cfg.dtype, name="attn_norm")(x)
        x = x + ModernBertAttention(cfg, self.layer_id, self.local, name="attn")(
            normed, attn_bias, cos, sin, seg)
        mlp_in = nn.LayerNorm(epsilon=cfg.norm_eps, use_bias=False, use_fast_variance=False,
                              dtype=cfg.dtype, name="mlp_norm")(x)
        return x + ModernBertMLP(cfg, name="mlp")(mlp_in)


class ModernBertBlock(nn.Module):
    """The repeating [local, local, global] 3-layer unit (layers 3b+1..3b+3).

    The 22-layer stack is layer0(global) + 7 such blocks; expressing the
    blocks as a ``flax.linen.scan`` makes XLA trace/compile ONE block body
    instead of 21 unrolled layers — an order-of-magnitude compile-time win
    with identical math.
    """

    config: ModernBertConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, biases) -> tuple[jnp.ndarray, None]:
        pad_bias, local_bias, g_cos, g_sin, l_cos, l_sin, seg = biases
        cfg = self.config
        # layer_id=1 stands for "any non-first layer" (has attn_norm).
        x = ModernBertLayer(cfg, 1, True, name="local_a")(x, local_bias, l_cos, l_sin, seg)
        x = ModernBertLayer(cfg, 1, True, name="local_b")(x, local_bias, l_cos, l_sin, seg)
        x = ModernBertLayer(cfg, 1, False, name="global_c")(x, pad_bias, g_cos, g_sin, seg)
        return x, None


class ModernBertForMaskedLM(nn.Module):
    """Backbone + MLM head with tied decoder.

    Methods are factored so callers can stop at ``head_transform`` and fuse
    the vocab projection themselves (see splade_tpu.ops.splade_pool).
    """

    config: ModernBertConfig

    def setup(self) -> None:
        cfg = self.config
        self.tok_embeddings = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype,
            param_dtype=jnp.float32, name="tok_embeddings")
        self.emb_norm = nn.LayerNorm(epsilon=cfg.norm_eps, use_bias=False, use_fast_variance=False,
                                     dtype=cfg.dtype, name="emb_norm")
        # layer0 (global, no attn_norm) + scanned [local,local,global] blocks
        # + an unrolled tail for layer counts not of the form 1 + 3k.
        remat_kw = {}
        if cfg.remat and cfg.remat_policy == "dots_no_batch":
            remat_kw["policy"] = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        layer0_cls = (nn.remat(ModernBertLayer, **remat_kw) if cfg.remat
                      else ModernBertLayer)
        self.layer0 = layer0_cls(cfg, 0, name="layer0")
        n_rest = cfg.num_hidden_layers - 1
        if cfg.num_hidden_layers > 1 and cfg.global_attn_every_n_layers != 3:
            # the scanned block hardcodes [local, local, global]; silently
            # applying it to a checkpoint with a different cadence would
            # put the wrong attention pattern on most layers
            raise ValueError(
                f"global_attn_every_n_layers="
                f"{cfg.global_attn_every_n_layers} is not supported: the "
                "layer stack is built as [local, local, global] blocks "
                "(cadence 3, matching skt/A.X-Encoder-base)")
        self.num_blocks = n_rest // 3
        if self.num_blocks:
            block_cls = (nn.remat(ModernBertBlock, prevent_cse=False, **remat_kw)
                         if cfg.remat else ModernBertBlock)
            self.blocks = nn.scan(
                block_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=nn.broadcast,
                length=self.num_blocks,
            )(cfg, name="blocks")
        self.tail = [
            layer0_cls(cfg, i, not cfg.is_global_layer(i), name=f"tail_{i}")
            for i in range(1 + 3 * self.num_blocks, cfg.num_hidden_layers)
        ]
        self.final_norm = nn.LayerNorm(epsilon=cfg.norm_eps, use_bias=False, use_fast_variance=False,
                                       dtype=cfg.dtype, name="final_norm")
        self.head_dense = nn.Dense(cfg.hidden_size, use_bias=False,
                                   dtype=cfg.dtype, name="head_dense")
        self.head_norm = nn.LayerNorm(epsilon=cfg.norm_eps, use_bias=False, use_fast_variance=False,
                                      dtype=cfg.dtype, name="head_norm")
        if cfg.decoder_bias:
            self.decoder_bias = self.param(
                "decoder_bias", nn.initializers.zeros, (cfg.vocab_size,), jnp.float32)

    def encode(
        self,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        positions: Optional[jnp.ndarray] = None,
        segment_ids: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Backbone: [B, S] ids -> [B, S, H] final-normed hidden states.

        positions / segment_ids enable *sequence packing* (several logical
        sequences per row — e.g. four seq-64 queries in one seq-256 row so
        the query tower runs at doc-tower MXU efficiency; see
        SpladeEncoder.forward_packed_qd):
        - positions [B, S] int32: per-token RoPE position (None = arange(S)).
        - segment_ids [B, S] int32: tokens may only attend within their own
          segment (None = one segment per row). The sliding-window bias uses
          absolute row offsets, which equal within-segment offsets because
          segments are contiguous.
        """
        cfg = self.config
        S = input_ids.shape[1]
        x = self.emb_norm(self.tok_embeddings(input_ids))
        use_splash = (cfg.attention_impl == "splash" and S % 128 == 0
                      and jax.default_backend() == "tpu")
        if use_splash:
            # Padding + packing both ride the splash kernel's segment ids:
            # padded tokens get ids offset past any packing segment so they
            # never match a real token (they still match each other, which
            # keeps their softmax rows finite; pooling discards them).
            base = (segment_ids if segment_ids is not None
                    else jnp.zeros_like(input_ids))
            seg = jnp.where(attention_mask.astype(bool), base,
                            base + jnp.int32(1_000_000))
            pad_bias = local_bias = None
        else:
            seg = None
            if segment_ids is None:
                # Additive padding mask [B, 1, 1, S]: -inf at padded keys.
                pad_bias = jnp.where(attention_mask[:, None, None, :].astype(bool),
                                     0.0, MASK_NEG).astype(jnp.float32)
            else:
                same_seg = segment_ids[:, :, None] == segment_ids[:, None, :]
                key_ok = attention_mask[:, None, :].astype(bool) & same_seg
                pad_bias = jnp.where(key_ok[:, None], 0.0, MASK_NEG).astype(jnp.float32)
            local_bias = pad_bias + sliding_window_bias(S, cfg.local_attention // 2)[None, None]
        g_cos, g_sin = rope_cos_sin(S, cfg.head_dim, cfg.global_rope_theta, cfg.dtype)
        l_cos, l_sin = rope_cos_sin(S, cfg.head_dim, cfg.local_rope_theta, cfg.dtype)
        if positions is not None:
            g_cos, g_sin = g_cos[positions], g_sin[positions]
            l_cos, l_sin = l_cos[positions], l_sin[positions]
        x = self.layer0(x, pad_bias, g_cos, g_sin, seg)
        if self.num_blocks:
            x, _ = self.blocks(x, (pad_bias, local_bias, g_cos, g_sin, l_cos, l_sin, seg))
        for i, layer in zip(range(1 + 3 * self.num_blocks, cfg.num_hidden_layers),
                            self.tail):
            if cfg.is_global_layer(i):
                x = layer(x, pad_bias, g_cos, g_sin, seg)
            else:
                x = layer(x, local_bias, l_cos, l_sin, seg)
        return self.final_norm(x)

    def head_transform(self, hidden: jnp.ndarray) -> jnp.ndarray:
        """MLM prediction head (dense -> gelu -> norm), pre-projection."""
        return self.head_norm(nn.gelu(self.head_dense(hidden), approximate=False))

    def decoder_weights(self) -> tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """(embedding [V, H], bias [V] or None) — the tied vocab projection."""
        bias = self.decoder_bias if self.config.decoder_bias else None
        return self.tok_embeddings.embedding, bias

    def project_vocab(self, transformed: jnp.ndarray) -> jnp.ndarray:
        """Tied decoder: [..., H] -> [..., V] logits."""
        logits = self.tok_embeddings.attend(transformed)
        if self.config.decoder_bias:
            logits = logits + self.decoder_bias.astype(logits.dtype)
        return logits

    def __call__(self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
        """Full MLM forward: [B, S] -> [B, S, V] logits."""
        return self.project_vocab(self.head_transform(self.encode(input_ids, attention_mask)))
