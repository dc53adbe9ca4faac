"""Wan-style video DiT — TPU-native functional implementation.

Behavioural reference: mova/diffusion/models/wan_video_dit.py:333-471 (WanModel)
and :257-291 (DiTBlock). Design differences from the reference (deliberate,
TPU-first):
  - pure functions over a param pytree; the block stack is STACKED along a
    leading axis and driven by `lax.scan` (fast compiles, remat-friendly,
    trivially shardable with GSPMD);
  - Conv3d patchify with stride==kernel is a reshape+matmul (MXU-direct);
  - RoPE tables precomputed host-side in float64 (numpy), applied in fp32;
  - attention via the Pallas flash kernel (ops/flash_attention.py).

The DiT block here is shared by the audio tower (the reference reuses the same
class, wan_audio_dit.py:15).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from dualforce_tpu import nn
from dualforce_tpu.config import VideoDiTConfig
from dualforce_tpu.ops import attention, apply_rope_interleaved
from dualforce_tpu.ops.rope import build_video_freqs, precompute_freqs_3d
from dualforce_tpu.registry import MODELS


# ---------------------------------------------------------------------------
# DiT block (shared video/audio)
# ---------------------------------------------------------------------------

def attn_qkv_init(key, dim: int, kv_dim: Optional[int] = None, dtype=jnp.float32):
    kv_dim = kv_dim or dim
    ks = jax.random.split(key, 4)
    return {
        "q": nn.linear_init(ks[0], dim, dim, dtype),
        "k": nn.linear_init(ks[1], kv_dim, dim, dtype),
        "v": nn.linear_init(ks[2], kv_dim, dim, dtype),
        "o": nn.linear_init(ks[3], dim, dim, dtype),
        "norm_q": nn.rms_norm_init(dim, dtype),
        "norm_k": nn.rms_norm_init(dim, dtype),
    }


def self_attention(p, x, rope, num_heads: int, eps: float, attn_impl: str = "auto"):
    """RMS-normed qk, interleaved RoPE, flash attention (wan_video_dit.py:164-189)."""
    b, s, dim = x.shape
    d = dim // num_heads
    q = nn.rms_norm(nn.linear(p["q"], x), p["norm_q"], eps).reshape(b, s, num_heads, d)
    k = nn.rms_norm(nn.linear(p["k"], x), p["norm_k"], eps).reshape(b, s, num_heads, d)
    v = nn.linear(p["v"], x).reshape(b, s, num_heads, d)
    cos, sin = rope
    # the int8 path quantizes q/k right after rotation — fp32 rope there only
    # costs HBM (3.4 GB/tensor at 720p), its precision is below the int8 floor
    rope_dtype = jnp.bfloat16 if attn_impl == "sage" else jnp.float32
    q = apply_rope_interleaved(q, cos, sin, compute_dtype=rope_dtype)
    k = apply_rope_interleaved(k, cos, sin, compute_dtype=rope_dtype)
    out = attention(q, k, v, impl=attn_impl).reshape(b, s, dim)
    return nn.linear(p["o"], out)


def cross_attention(p, x, ctx, num_heads: int, eps: float, attn_impl: str = "auto",
                    ctx_valid_len: Optional[jnp.ndarray] = None):
    """Text cross-attention, no RoPE (wan_video_dit.py:211-247)."""
    b, s, dim = x.shape
    sk = ctx.shape[1]
    d = dim // num_heads
    q = nn.rms_norm(nn.linear(p["q"], x), p["norm_q"], eps).reshape(b, s, num_heads, d)
    k = nn.rms_norm(nn.linear(p["k"], ctx), p["norm_k"], eps).reshape(b, sk, num_heads, d)
    v = nn.linear(p["v"], ctx).reshape(b, sk, num_heads, d)
    out = attention(q, k, v, kv_valid_len=ctx_valid_len, impl=attn_impl).reshape(b, s, dim)
    return nn.linear(p["o"], out)


def dit_block_init(key, dim: int, ffn_dim: int, dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    return {
        "self_attn": attn_qkv_init(ks[0], dim, dtype=dtype),
        "cross_attn": attn_qkv_init(ks[1], dim, dtype=dtype),
        "norm3": nn.layer_norm_init(dim, dtype),
        "ffn": {
            "fc1": nn.linear_init(ks[2], dim, ffn_dim, dtype),
            "fc2": nn.linear_init(ks[3], ffn_dim, dim, dtype),
        },
        "modulation": (jax.random.normal(ks[4], (1, 6, dim), jnp.float32) / dim**0.5).astype(dtype),
    }


def dit_block_apply(p, x, ctx, t_mod, rope, *, num_heads: int, eps: float,
                    attn_impl: str = "auto", ctx_valid_len=None,
                    cross_attn_impl=None):
    """AdaLN-modulated block (wan_video_dit.py:275-291).

    t_mod: [B, 6, dim] in compute dtype; modulation param added then chunked.
    `cross_attn_impl` lets sequence-parallel callers keep text cross-attention
    LOCAL (context replicated) while self-attention runs on a ring.
    """
    if cross_attn_impl is None:
        cross_attn_impl = attn_impl if not callable(attn_impl) else "auto"
    mod = p["modulation"].astype(t_mod.dtype) + t_mod  # [B, 6, dim]
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = [
        mod[:, i][:, None, :] for i in range(6)
    ]
    h = nn.layer_norm(x, eps) * (1 + scale_msa) + shift_msa
    x = x + gate_msa * self_attention(p["self_attn"], h, rope, num_heads, eps, attn_impl)
    h = nn.layer_norm(x, eps, p["norm3"])
    x = x + cross_attention(p["cross_attn"], h, ctx, num_heads, eps,
                            cross_attn_impl, ctx_valid_len)
    h = nn.layer_norm(x, eps) * (1 + scale_mlp) + shift_mlp
    x = x + gate_mlp * nn.linear(p["ffn"]["fc2"], nn.gelu_tanh(nn.linear(p["ffn"]["fc1"], h)))
    return x


def head_init(key, dim: int, out_features: int, dtype=jnp.float32):
    ks = jax.random.split(key, 2)
    return {
        "head": nn.linear_init(ks[0], dim, out_features, dtype),
        "modulation": (jax.random.normal(ks[1], (1, 2, dim), jnp.float32) / dim**0.5).astype(dtype),
    }


def head_apply(p, x, t, eps: float):
    """Final modulated projection (wan_video_dit.py:314-330; t is the [B, dim]
    time embedding, NOT t_mod)."""
    mod = p["modulation"].astype(t.dtype) + t[:, None, :]  # [B, 2, dim]
    shift, scale = mod[:, 0][:, None, :], mod[:, 1][:, None, :]
    return nn.linear(p["head"], nn.layer_norm(x, eps) * (1 + scale) + shift)


# ---------------------------------------------------------------------------
# video tower
# ---------------------------------------------------------------------------

def init(key, cfg: VideoDiTConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 7 + cfg.num_layers)
    pt, ph, pw = cfg.patch_size
    blocks = [
        dit_block_init(ks[6 + i], cfg.dim, cfg.ffn_dim, dtype)
        for i in range(cfg.num_layers)
    ]
    return {
        "patch_embedding": nn.patch_embed_3d_init(ks[0], cfg.in_dim, cfg.dim,
                                                  cfg.patch_size, dtype),
        "text_embedding": {
            "fc1": nn.linear_init(ks[1], cfg.text_dim, cfg.dim, dtype),
            "fc2": nn.linear_init(ks[2], cfg.dim, cfg.dim, dtype),
        },
        "time_embedding": {
            "fc1": nn.linear_init(ks[3], cfg.freq_dim, cfg.dim, dtype),
            "fc2": nn.linear_init(ks[4], cfg.dim, cfg.dim, dtype),
        },
        "time_projection": {"fc": nn.linear_init(ks[5], cfg.dim, cfg.dim * 6, dtype)},
        "blocks": nn.stack_params(blocks),
        # fresh key: reusing the parent `key` would duplicate ks[0]/ks[1]'s
        # streams (jax.random.split(key, 2) is a prefix of split(key, N))
        "head": head_init(ks[6 + cfg.num_layers], cfg.dim,
                          cfg.out_dim * pt * ph * pw, dtype),
    }


def time_embeds(params, cfg: VideoDiTConfig, timestep: jnp.ndarray):
    """fp32 time embedding + 6-way projection (reference runs these under a
    float32 autocast — pipeline_mova.py:536-547). Returns (t [B,dim], t_mod
    [B,6,dim]) in float32; caller casts to compute dtype."""
    emb = nn.sinusoidal_embedding_1d(cfg.freq_dim, timestep.astype(jnp.float32))
    te = params["time_embedding"]
    t = nn.linear(nn.cast_tree(te["fc2"], jnp.float32),
                  nn.silu(nn.linear(nn.cast_tree(te["fc1"], jnp.float32), emb)))
    tp = nn.cast_tree(params["time_projection"]["fc"], jnp.float32)
    t_mod = nn.linear(tp, nn.silu(t)).reshape(t.shape[0], 6, cfg.dim)
    return t, t_mod


def embed_text(params, context: jnp.ndarray):
    """text_dim -> dim MLP with tanh-GELU (wan_video_dit.py:371-375)."""
    p = params["text_embedding"]
    return nn.linear(p["fc2"], nn.gelu_tanh(nn.linear(p["fc1"], context)))


def rope_tables(cfg: VideoDiTConfig):
    return precompute_freqs_3d(cfg.head_dim, end=cfg.rope_max_len)


def run_blocks(params_blocks, x, ctx, t_mod, rope, cfg: VideoDiTConfig,
               attn_impl: str = "auto", remat: bool = False,
               start: int = 0, stop: Optional[int] = None):
    """Scan a [start, stop) slice of the stacked block params over x."""
    body = functools.partial(dit_block_apply, num_heads=cfg.num_heads, eps=cfg.eps,
                             attn_impl=attn_impl)
    if remat:
        body = jax.checkpoint(body)

    def step(carry, bp):
        return body(bp, carry, ctx, t_mod, rope), None

    sl = jax.tree.map(lambda a: a[start:stop], params_blocks)
    x, _ = jax.lax.scan(step, x, sl)
    return x


@MODELS.register_module(name="VideoDiT")
def forward(params, cfg: VideoDiTConfig, x, timestep, context,
            attn_impl: str = "auto", remat: bool = False,
            compute_dtype=jnp.bfloat16):
    """Standalone single-tower forward (WanModel.forward parity,
    wan_video_dit.py:418-471). x: [B, C, F, H, W] -> [B, out, F, H, W]."""
    t, t_mod = time_embeds(params, cfg, timestep)
    t = t.astype(compute_dtype)
    t_mod = t_mod.astype(compute_dtype)
    ctx = embed_text(params, context.astype(compute_dtype))
    tokens, grid = nn.patch_embed_3d(params["patch_embedding"], x.astype(compute_dtype),
                                     cfg.patch_size)
    cos, sin = build_video_freqs(rope_tables(cfg), grid)
    tokens = run_blocks(params["blocks"], tokens, ctx, t_mod,
                        (jnp.asarray(cos), jnp.asarray(sin)), cfg, attn_impl, remat)
    out = head_apply(params["head"], tokens, t, cfg.eps)
    return nn.unpatchify_3d(out, grid, cfg.patch_size, cfg.out_dim)
