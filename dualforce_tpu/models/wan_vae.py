"""Wan 3D-causal video VAE (z=16, spatial /8, temporal /4) in JAX.

Behavioural reference: the diffusers `AutoencoderKLWan` used by the pipeline
(pipeline_mova.py:15,68; config fields in SURVEY.md — base_dim 96,
dim_mult (1,2,4,4), num_res_blocks 2, temperal_downsample (F,T,T)).

The reference ALWAYS runs with a streaming feature cache (chunked over time,
first frame handled specially). This implementation reproduces those cached
semantics in closed form over the full sequence:

  - causal time convs: zero-pad 2 frames at the front (k=3);
  - temporal downsample (stride-2 k=3 time conv, no padding): output frame 0
    is a passthrough of input frame 0; remaining outputs are conv windows
    starting at input frame 0 — matching the cache recursion where the first
    1-frame chunk bypasses the conv;
  - temporal upsample (k=3 causal time conv to 2C, interleave): input frame 0
    bypasses (1 output frame); frames 1.. are conv'ed with ZERO history (the
    'Rep' cache state) and each yields 2 output frames.

Frame counts: encode T -> (T-1)/4 + 1; decode F -> (F-1)*4 + 1.

Layout: [B, T, H, W, C] (channels-last, TPU-native). Weights convert from
torch [out, in, kt, kh, kw] -> [kt, kh, kw, in, out].
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from dualforce_tpu.config import WanVAEConfig
from dualforce_tpu.registry import MODELS

CACHE_T = 2


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _conv3d(x, w, b, stride=(1, 1, 1), padding="VALID"):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return y + b


def causal_conv3d(p, x, stride=(1, 1, 1)):
    """CausalConv3d: zero-pad (kt-1) front in time, symmetric in space.
    Padding rides inside conv_general_dilated (zero-fill is identical to an
    explicit jnp.pad but skips materializing the padded activation — pads
    were 8% of the 360p decode trace)."""
    w = p["kernel"]
    kt, kh, kw = w.shape[0], w.shape[1], w.shape[2]
    return _conv3d(x, w, p["bias"], stride,
                   padding=((kt - 1, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)))


def conv3d_init(key, in_dim, out_dim, kernel: Tuple[int, int, int], dtype=jnp.float32):
    kt, kh, kw = kernel
    fan_in = in_dim * kt * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    k1, k2 = jax.random.split(key)
    return {
        "kernel": jax.random.uniform(k1, (kt, kh, kw, in_dim, out_dim),
                                     minval=-bound, maxval=bound, dtype=jnp.float32).astype(dtype),
        "bias": jax.random.uniform(k2, (out_dim,), minval=-bound, maxval=bound,
                                   dtype=jnp.float32).astype(dtype),
    }


def rms_norm_ch(p, x, eps: float = 1e-12):
    """Wan RMS_norm: F.normalize over channels * sqrt(dim) * gamma (+bias)."""
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.sum(jnp.square(xf), axis=-1, keepdims=True) + eps)
    y = n * math.sqrt(x.shape[-1]) * p["gamma"].astype(jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def rms_norm_ch_init(dim, dtype=jnp.float32, bias: bool = False):
    p = {"gamma": jnp.ones((dim,), dtype)}
    if bias:
        p["bias"] = jnp.zeros((dim,), dtype)
    return p


def residual_block_init(key, in_dim, out_dim, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": rms_norm_ch_init(in_dim, dtype),
        "conv1": conv3d_init(ks[0], in_dim, out_dim, (3, 3, 3), dtype),
        "norm2": rms_norm_ch_init(out_dim, dtype),
        "conv2": conv3d_init(ks[1], out_dim, out_dim, (3, 3, 3), dtype),
    }
    if in_dim != out_dim:
        p["shortcut"] = conv3d_init(ks[2], in_dim, out_dim, (1, 1, 1), dtype)
    return p


def residual_block(p, x):
    h = causal_conv3d(p["conv1"], jax.nn.silu(rms_norm_ch(p["norm1"], x)))
    h = causal_conv3d(p["conv2"], jax.nn.silu(rms_norm_ch(p["norm2"], h)))
    sc = causal_conv3d(p["shortcut"], x) if "shortcut" in p else x
    return sc + h


def attention_block_init(key, dim, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "norm": rms_norm_ch_init(dim, dtype),
        "to_qkv": conv3d_init(k1, dim, dim * 3, (1, 1, 1), dtype),
        "proj": conv3d_init(k2, dim, dim, (1, 1, 1), dtype),
    }


def attention_block(p, x):
    """Single-head per-frame spatial self-attention (Wan AttentionBlock)."""
    b, t, h, w, c = x.shape
    identity = x
    xn = rms_norm_ch(p["norm"], x)
    qkv = causal_conv3d(p["to_qkv"], xn)  # 1x1x1 conv
    q, k, v = jnp.split(qkv.reshape(b * t, h * w, 3 * c), 3, axis=-1)
    logits = jnp.einsum("bqc,bkc->bqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * (c ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bqk,bkc->bqc", probs, v.astype(jnp.float32)).astype(x.dtype)
    o = o.reshape(b, t, h, w, c)
    return identity + causal_conv3d(p["proj"], o)


# --- resampling -------------------------------------------------------------

def downsample2d_init(key, dim, dtype=jnp.float32):
    return {"conv": conv3d_init(key, dim, dim, (1, 3, 3), dtype)}


def downsample_spatial(p, x):
    """ZeroPad2d((0,1,0,1)) + Conv2d k3 s2 per frame."""
    return _conv3d(x, p["conv"]["kernel"], p["conv"]["bias"], (1, 2, 2),
                   padding=((0, 0), (0, 1), (0, 1)))


def downsample3d_init(key, dim, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "conv": conv3d_init(k1, dim, dim, (1, 3, 3), dtype),
        "time_conv": conv3d_init(k2, dim, dim, (3, 1, 1), dtype),
    }


def downsample_temporal(p, x):
    """Cached-equivalent stride-2 time conv: frame 0 passthrough + windows
    starting at frame 0 (see module docstring)."""
    first = x[:, :1]
    y = _conv3d(x, p["time_conv"]["kernel"], p["time_conv"]["bias"], (2, 1, 1))
    return jnp.concatenate([first, y], axis=1)


def upsample2d_init(key, dim, out_dim, dtype=jnp.float32):
    return {"conv": conv3d_init(key, dim, out_dim, (1, 3, 3), dtype)}


def upsample_spatial(p, x):
    """nearest 2x + Conv2d k3 (dim -> dim//2 in the decoder)."""
    x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
    return _conv3d(x, p["conv"]["kernel"], p["conv"]["bias"],
                   padding=((0, 0), (1, 1), (1, 1)))


def upsample3d_init(key, dim, out_dim, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "conv": conv3d_init(k1, dim, out_dim, (1, 3, 3), dtype),
        "time_conv": conv3d_init(k2, dim, dim * 2, (3, 1, 1), dtype),
    }


def upsample_temporal(p, x):
    """Cached-equivalent temporal doubling: frame 0 bypasses; frames 1..T-1
    run the 2C time conv with ZERO history ('Rep' semantics) and interleave."""
    b, t, h, w, c = x.shape
    first = x[:, :1]
    if t == 1:
        return first
    rest = x[:, 1:]
    # causal zero-pad 2 on the REST ONLY (frame 0 never feeds the conv)
    y = _conv3d(rest, p["time_conv"]["kernel"], p["time_conv"]["bias"],
                padding=((2, 0), (0, 0), (0, 0)))  # [B,T-1,H,W,2C]
    y = y.reshape(b, t - 1, h, w, 2, c).transpose(0, 1, 4, 2, 3, 5).reshape(
        b, 2 * (t - 1), h, w, c)
    return jnp.concatenate([first, y], axis=1)


# ---------------------------------------------------------------------------
# encoder / decoder
# ---------------------------------------------------------------------------

def encoder_init(key, cfg: WanVAEConfig, dtype=jnp.float32):
    dims = [cfg.base_dim * u for u in (1,) + tuple(cfg.dim_mult)]
    ks = iter(jax.random.split(key, 64))
    p = {"conv1": conv3d_init(next(ks), 3, dims[0], (3, 3, 3), dtype)}
    stages = []
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        blocks = []
        d = din
        for _ in range(cfg.num_res_blocks):
            blocks.append(residual_block_init(next(ks), d, dout, dtype))
            d = dout
        stage = {"blocks": blocks}
        if i != len(cfg.dim_mult) - 1:
            stage["down"] = (downsample3d_init(next(ks), dout, dtype)
                             if cfg.temperal_downsample[i]
                             else downsample2d_init(next(ks), dout, dtype))
        stages.append(stage)
    p["stages"] = stages
    out = dims[-1]
    p["mid"] = {
        "rb1": residual_block_init(next(ks), out, out, dtype),
        "attn": attention_block_init(next(ks), out, dtype),
        "rb2": residual_block_init(next(ks), out, out, dtype),
    }
    p["head_norm"] = rms_norm_ch_init(out, dtype)
    p["head_conv"] = conv3d_init(next(ks), out, cfg.z_dim * 2, (3, 3, 3), dtype)
    return p


def encoder_apply(p, cfg: WanVAEConfig, x):
    """x: [B, T, H, W, 3] -> moments [B, F, H/8, W/8, 2*z]."""
    h = causal_conv3d(p["conv1"], x)
    for i, stage in enumerate(p["stages"]):
        for bp in stage["blocks"]:
            h = residual_block(bp, h)
        if "down" in stage:
            h = downsample_spatial(stage["down"], h)
            if cfg.temperal_downsample[i]:
                h = downsample_temporal(stage["down"], h)
    h = residual_block(p["mid"]["rb1"], h)
    h = attention_block(p["mid"]["attn"], h)
    h = residual_block(p["mid"]["rb2"], h)
    h = jax.nn.silu(rms_norm_ch(p["head_norm"], h))
    return causal_conv3d(p["head_conv"], h)


def decoder_init(key, cfg: WanVAEConfig, dtype=jnp.float32):
    mult = tuple(cfg.dim_mult)
    dims = [cfg.base_dim * u for u in (mult[-1],) + tuple(reversed(mult))]
    temperal_upsample = tuple(reversed(cfg.temperal_downsample))
    ks = iter(jax.random.split(key, 64))
    p = {"conv1": conv3d_init(next(ks), cfg.z_dim, dims[0], (3, 3, 3), dtype)}
    p["mid"] = {
        "rb1": residual_block_init(next(ks), dims[0], dims[0], dtype),
        "attn": attention_block_init(next(ks), dims[0], dtype),
        "rb2": residual_block_init(next(ks), dims[0], dims[0], dtype),
    }
    stages = []
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        if i in (1, 2, 3):
            din = din // 2  # previous stage's upsampler halved channels
        blocks = []
        d = din
        for _ in range(cfg.num_res_blocks + 1):
            blocks.append(residual_block_init(next(ks), d, dout, dtype))
            d = dout
        stage = {"blocks": blocks}
        if i != len(mult) - 1:
            stage["up"] = (upsample3d_init(next(ks), dout, dout // 2, dtype)
                           if temperal_upsample[i]
                           else upsample2d_init(next(ks), dout, dout // 2, dtype))
        stages.append(stage)
    p["stages"] = stages
    p["head_norm"] = rms_norm_ch_init(dims[-1], dtype)
    p["head_conv"] = conv3d_init(next(ks), dims[-1], 3, (3, 3, 3), dtype)
    return p


def decoder_apply(p, cfg: WanVAEConfig, z):
    """z: [B, F, H/8, W/8, z] -> video [B, T, H, W, 3]."""
    h = causal_conv3d(p["conv1"], z)
    h = residual_block(p["mid"]["rb1"], h)
    h = attention_block(p["mid"]["attn"], h)
    h = residual_block(p["mid"]["rb2"], h)
    temperal_upsample = tuple(reversed(cfg.temperal_downsample))
    for i, stage in enumerate(p["stages"]):
        for bp in stage["blocks"]:
            h = residual_block(bp, h)
        if "up" in stage:
            if temperal_upsample[i]:
                h = upsample_temporal(stage["up"], h)
            h = upsample_spatial(stage["up"], h)
    h = jax.nn.silu(rms_norm_ch(p["head_norm"], h))
    return causal_conv3d(p["head_conv"], h)


# ---------------------------------------------------------------------------
# full VAE
# ---------------------------------------------------------------------------

@MODELS.register_module(name="WanVAE")
def init(key, cfg: WanVAEConfig, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "encoder": encoder_init(k1, cfg, dtype),
        "decoder": decoder_init(k2, cfg, dtype),
        "quant_conv": conv3d_init(k3, cfg.z_dim * 2, cfg.z_dim * 2, (1, 1, 1), dtype),
        "post_quant_conv": conv3d_init(k4, cfg.z_dim, cfg.z_dim, (1, 1, 1), dtype),
    }


def encode_moments(params, cfg: WanVAEConfig, video):
    """video: [B, T, H, W, 3] in [-1, 1] -> (mean, logvar), each [B,F,h,w,z]."""
    moments = causal_conv3d(params["quant_conv"],
                            encoder_apply(params["encoder"], cfg, video))
    mean, logvar = jnp.split(moments, 2, axis=-1)
    return mean, logvar


def encode_mode(params, cfg: WanVAEConfig, video):
    """Deterministic encode (sample_mode='argmax', pipeline_mova.py:236-240)."""
    mean, _ = encode_moments(params, cfg, video)
    return mean


def encode_sample(params, cfg: WanVAEConfig, video, key):
    mean, logvar = encode_moments(params, cfg, video)
    std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)


def decode(params, cfg: WanVAEConfig, z):
    """z: [B, F, h, w, z] -> video [B, T, H, W, 3]."""
    z = causal_conv3d(params["post_quant_conv"], z)
    return decoder_apply(params["decoder"], cfg, z)


def normalize_latents(z, cfg: WanVAEConfig):
    """(z - mean) / std with per-channel config stats (pipeline_mova.py:151-160);
    channels-last layout."""
    mean = jnp.asarray(cfg.latents_mean, z.dtype)
    std = jnp.asarray(cfg.latents_std, z.dtype)
    return (z - mean) / std


def denormalize_latents(z, cfg: WanVAEConfig):
    mean = jnp.asarray(cfg.latents_mean, z.dtype)
    std = jnp.asarray(cfg.latents_std, z.dtype)
    return z * std + mean


# ---------------------------------------------------------------------------
# streaming (chunked) decode — lax.scan over latent frames with conv caches
# ---------------------------------------------------------------------------
#
# The reference decodes latent frames ONE at a time with a feature cache
# (CACHE_T=2 input frames per causal conv) so full-resolution activations
# never materialize for the whole clip. Here the same recursion is a
# lax.scan: latent frame 0 runs standalone (it produces 1 output frame and
# primes the caches), then frames 1..F-1 scan with identical shapes (each
# yields `scale_factor_temporal` output frames). Streaming output is
# bit-identical to `decode` (tested) because the full-sequence ops above were
# DERIVED from this cache recursion.


class _CacheCtx:
    """Deterministic-order cache threading through the conv traversal."""

    def __init__(self, caches=None):
        self.read = caches  # None => zeros (first chunk)
        self.written = []
        self.cursor = 0

    def next(self, x, kt_minus_1):
        if self.read is None:
            b, _, h, w, c = x.shape
            cache = jnp.zeros((b, kt_minus_1, h, w, c), x.dtype)
        else:
            cache = self.read[self.cursor]
        self.cursor += 1
        return cache

    def push(self, new_cache):
        self.written.append(new_cache)


def _cc3d_stream(p, x, ctx: "_CacheCtx"):
    """causal_conv3d with a carried input-history cache (kt-1 frames)."""
    w = p["kernel"]
    kt, kh, kw = w.shape[0], w.shape[1], w.shape[2]
    if kt == 1:
        return causal_conv3d(p, x)
    cache = ctx.next(x, kt - 1)
    xin = jnp.concatenate([cache, x], axis=1)
    ctx.push(xin[:, -(kt - 1):])
    return _conv3d(xin, w, p["bias"],
                   padding=((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)))


def _residual_block_stream(p, x, ctx):
    h = _cc3d_stream(p["conv1"], jax.nn.silu(rms_norm_ch(p["norm1"], x)), ctx)
    h = _cc3d_stream(p["conv2"], jax.nn.silu(rms_norm_ch(p["norm2"], h)), ctx)
    sc = causal_conv3d(p["shortcut"], x) if "shortcut" in p else x
    return sc + h


def _upsample_temporal_stream(p, x, ctx, is_first: bool):
    """Streaming counterpart of upsample_temporal. First chunk bypasses the
    time conv ('Rep'); later chunks conv [cache(2), x] and interleave."""
    b, t, h, w, c = x.shape
    cache = ctx.next(x, 2)
    if is_first:
        # frame 0 never enters the time conv; cache stays zeros
        ctx.push(cache)
        return x
    xin = jnp.concatenate([cache, x], axis=1)
    ctx.push(xin[:, -2:])
    y = _conv3d(xin, p["time_conv"]["kernel"], p["time_conv"]["bias"])
    y = y.reshape(b, t, h, w, 2, c).transpose(0, 1, 4, 2, 3, 5).reshape(
        b, 2 * t, h, w, c)
    return y


def _decoder_stream_chunk(p, cfg: WanVAEConfig, z_chunk, caches, is_first: bool):
    """One latent chunk through the decoder with cache threading.
    Returns (video_chunk, new_caches)."""
    ctx = _CacheCtx(caches)
    temperal_upsample = tuple(reversed(cfg.temperal_downsample))
    h = _cc3d_stream(p["conv1"], z_chunk, ctx)
    h = _residual_block_stream(p["mid"]["rb1"], h, ctx)
    h = attention_block(p["mid"]["attn"], h)
    h = _residual_block_stream(p["mid"]["rb2"], h, ctx)
    for i, stage in enumerate(p["stages"]):
        for bp in stage["blocks"]:
            h = _residual_block_stream(bp, h, ctx)
        if "up" in stage:
            if temperal_upsample[i]:
                h = _upsample_temporal_stream(stage["up"], h, ctx, is_first)
            h = upsample_spatial(stage["up"], h)
    h = jax.nn.silu(rms_norm_ch(p["head_norm"], h))
    h = _cc3d_stream(p["head_conv"], h, ctx)
    return h, ctx.written


def decode_streaming(params, cfg: WanVAEConfig, z, chunk: int | None = None):
    """Memory-bounded decode: z [B, F, h, w, z] -> [B, T, H, W, 3], identical
    to `decode` but with peak activation memory O(`chunk` latent frames).

    `chunk` latent frames go through the decoder per scan step (the cache
    recursion is chunk-size-generic) — larger chunks amortize the per-step
    fixed costs (cache concats, layout churn) at proportionally higher peak
    memory. Falls back to per-frame stepping when (F-1) % chunk != 0.

    chunk=None auto-selects from the output geometry against a measured v5e
    budget: chunk=4 at 360p (6.63 s vs 6.91 s per 193-frame clip; chunk=8
    OOMs), chunk=1 at 720p (29.5 s; chunk>=2 fails to compile in 16 GB)."""
    F = z.shape[1]
    if chunk is None:
        out_px = (z.shape[2] * 8) * (z.shape[3] * 8)
        budget = max(1, min((4 * 352 * 640) // max(out_px, 1), max(F - 1, 1)))
        # largest divisor of F-1 within the memory budget
        chunk = next((k for k in range(budget, 0, -1) if (F - 1) % k == 0), 1)
    z = causal_conv3d(params["post_quant_conv"], z)
    dec = params["decoder"]
    first_out, caches = _decoder_stream_chunk(dec, cfg, z[:, :1], None, True)
    if F == 1:
        return first_out
    if (F - 1) % chunk:
        chunk = 1

    def step(caches, z_frames):
        out, new_caches = _decoder_stream_chunk(dec, cfg, z_frames,
                                                caches, False)
        return new_caches, out

    # scan over remaining latent frames in chunks: [(F-1)/k, B, k, h, w, z]
    b = z.shape[0]
    frames = jnp.moveaxis(z[:, 1:], 1, 0).reshape(
        (F - 1) // chunk, chunk, b, *z.shape[2:]).swapaxes(1, 2)
    _, outs = jax.lax.scan(step, caches, frames)
    # outs: [(F-1)/k, B, k*st, H, W, 3] -> [B, (F-1)*st, H, W, 3]
    rest = jnp.moveaxis(outs, 1, 0).reshape(b, -1, *outs.shape[3:])
    return jnp.concatenate([first_out, rest], axis=1)


# ---------------------------------------------------------------------------
# streaming (chunked) ENCODE — lax.scan over input-frame chunks
# ---------------------------------------------------------------------------
#
# The reference encodes with the SAME feature cache it decodes with
# (AutoencoderKLWan chunks the input over time: first chunk 1 frame, then
# 4-frame chunks, each later chunk yielding one latent frame; consumed at
# pipeline_mova.py:236-240). Without this, the full-sequence encoder's first
# conv materializes ~68 GB of bf16 activations at 720p/193f — it cannot run
# in a 16 GB chip. Streaming output is bit-identical to `encode_moments` by
# the same cache-recursion argument as `decode_streaming`.
#
# Per-op streaming semantics (derived from the closed forms above):
#   - causal time convs: carried (kt-1)-frame input-history cache, zeros on
#     the first chunk (== the causal zero pad);
#   - temporal downsample (stride-2 VALID k=3 time conv): out[0] is a
#     passthrough of frame 0; out[j] = w . x[2j-2 : 2j+1]. A chunk with an
#     EVEN frame count n at this stage's input needs exactly ONE history
#     frame: conv([cache(1), chunk(n)]) stride-2 VALID emits n/2 outputs
#     whose last window ends on the chunk's last frame -> new cache is that
#     frame. First chunk: passthrough, cache = frame 0.
# Hence the raw-frame chunk must be a multiple of 2^(#temporal downsamples)
# so every downsample stage sees an even chunk.


def _downsample_temporal_stream(p, x, ctx: "_CacheCtx", is_first: bool):
    """Streaming counterpart of downsample_temporal (1-frame history cache)."""
    cache = ctx.next(x, 1)
    if is_first:
        del cache  # frame 0 bypasses the conv; prime the cache with it
        ctx.push(x[:, -1:])
        return x
    xin = jnp.concatenate([cache, x], axis=1)
    ctx.push(xin[:, -1:])
    return _conv3d(xin, p["time_conv"]["kernel"], p["time_conv"]["bias"],
                   (2, 1, 1))


def _encoder_stream_chunk(p, cfg: WanVAEConfig, x_chunk, caches, is_first: bool):
    """One raw-frame chunk through the encoder with cache threading.
    Returns (moments_chunk [B,f,h,w,2z] pre-quant_conv, new_caches)."""
    ctx = _CacheCtx(caches)
    h = _cc3d_stream(p["conv1"], x_chunk, ctx)
    for i, stage in enumerate(p["stages"]):
        for bp in stage["blocks"]:
            h = _residual_block_stream(bp, h, ctx)
        if "down" in stage:
            h = downsample_spatial(stage["down"], h)
            if cfg.temperal_downsample[i]:
                h = _downsample_temporal_stream(stage["down"], h, ctx, is_first)
    h = _residual_block_stream(p["mid"]["rb1"], h, ctx)
    h = attention_block(p["mid"]["attn"], h)
    h = _residual_block_stream(p["mid"]["rb2"], h, ctx)
    h = jax.nn.silu(rms_norm_ch(p["head_norm"], h))
    h = _cc3d_stream(p["head_conv"], h, ctx)
    return h, ctx.written


def encode_moments_streaming(params, cfg: WanVAEConfig, video,
                             chunk: int | None = None, compute_dtype=None):
    """Memory-bounded encode: video [B,T,H,W,3] -> (mean, logvar), identical
    to `encode_moments` but with peak activation memory O(`chunk` raw frames).

    `chunk` counts RAW input frames per scan step and must be a multiple of
    2^(#temporal downsamples) (4 for the shipped config) so each temporal
    downsample stage sees an even chunk; non-divisible (T-1) % chunk falls
    back to that minimum. chunk=None scales a 16-frames-at-360p activation
    budget by the input pixel count (=> 4 at 720p).

    `compute_dtype` runs the ENCODER (params, activations, carried caches) in
    that dtype — at 720p the minimum-chunk f32 pass needs ~18 GB HBM (5 GB of
    f32 caches + 10.7 GB body temps, measured), over a 16 GB v5e; bf16 halves
    all of it and fits. The tiny quant_conv stays in the params' dtype, so
    the returned moments keep full precision at the head. None = params
    dtype (exact parity with `encode_moments`)."""
    if compute_dtype is not None:
        params = dict(params,
                      encoder=jax.tree.map(lambda x: x.astype(compute_dtype),
                                           params["encoder"]))
        video = video.astype(compute_dtype)
    T = video.shape[1]
    st = 2 ** sum(bool(t) for t in cfg.temperal_downsample)
    if (T - 1) % st:
        raise ValueError(f"num_frames-1 must be divisible by {st}, got T={T}")
    if chunk is None:
        px = video.shape[2] * video.shape[3]
        budget = max(st, (16 * 352 * 640) // max(px, 1) // st * st)
        budget = min(budget, max(T - 1, st))
        # largest multiple of st within budget that divides T-1 (st always does)
        chunk = next(k for k in range(budget, 0, -st) if (T - 1) % k == 0)
    enc = params["encoder"]
    first_out, caches = _encoder_stream_chunk(enc, cfg, video[:, :1], None, True)
    if T == 1:
        moments = first_out
    else:
        if chunk % st or (T - 1) % chunk:
            chunk = st

        def step(caches, frames):
            out, new_caches = _encoder_stream_chunk(enc, cfg, frames,
                                                    caches, False)
            return new_caches, out

        # [(T-1)/k, B, k, H, W, 3]
        b = video.shape[0]
        frames = jnp.moveaxis(video[:, 1:], 1, 0).reshape(
            (T - 1) // chunk, chunk, b, *video.shape[2:]).swapaxes(1, 2)
        _, outs = jax.lax.scan(step, caches, frames)
        rest = jnp.moveaxis(outs, 1, 0).reshape(b, -1, *outs.shape[3:])
        moments = jnp.concatenate([first_out, rest], axis=1)
    moments = causal_conv3d(params["quant_conv"],
                            moments.astype(params["quant_conv"]["kernel"].dtype))
    mean, logvar = jnp.split(moments, 2, axis=-1)
    return mean, logvar


def encode_mode_streaming(params, cfg: WanVAEConfig, video,
                          chunk: int | None = None, compute_dtype=None):
    """Deterministic streaming encode (sample_mode='argmax')."""
    mean, _ = encode_moments_streaming(params, cfg, video, chunk,
                                       compute_dtype)
    return mean


def encode_sample_streaming(params, cfg: WanVAEConfig, video, key,
                            chunk: int | None = None, compute_dtype=None):
    mean, logvar = encode_moments_streaming(params, cfg, video, chunk,
                                            compute_dtype)
    std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)
