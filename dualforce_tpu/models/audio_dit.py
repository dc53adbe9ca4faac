"""Wan-style audio DiT (behavioural reference: mova/diffusion/models/wan_audio_dit.py:105-250).

Reuses the video DiT block (the reference shares the same DiTBlock class,
wan_audio_dit.py:15,159-162); differs only in 1D patchify (Conv1d -> matmul)
and 1D RoPE ("dac" full-dim variant or "oobleck" legacy tps-rescaled variant).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from dualforce_tpu import nn
from dualforce_tpu.config import AudioDiTConfig
from dualforce_tpu.models.video_dit import (
    dit_block_init,
    head_apply,
    head_init,
    run_blocks as _run_blocks_generic,
)
from dualforce_tpu.models import video_dit
from dualforce_tpu.ops.rope import build_audio_freqs, precompute_freqs_1d
from dualforce_tpu.registry import MODELS


def init(key, cfg: AudioDiTConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 7 + cfg.num_layers)
    blocks = [
        dit_block_init(ks[6 + i], cfg.dim, cfg.ffn_dim, dtype)
        for i in range(cfg.num_layers)
    ]
    return {
        "patch_embedding": nn.patch_embed_1d_init(ks[0], cfg.in_dim, cfg.dim,
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
        # fresh key (parent `key` would duplicate ks[0]/ks[1]'s streams)
        "head": head_init(ks[6 + cfg.num_layers], cfg.dim,
                          cfg.out_dim * cfg.patch_size, dtype),
    }


# the audio tower shares the video tower's embedding heads (the reference
# reuses the same modules, wan_audio_dit.py:15) — alias rather than copy so
# numerics fixes stay in one place
time_embeds = video_dit.time_embeds
embed_text = video_dit.embed_text


def rope_tables(cfg: AudioDiTConfig):
    return precompute_freqs_1d(cfg.head_dim, end=cfg.rope_max_len, variant=cfg.vae_type)


def run_blocks(params_blocks, x, ctx, t_mod, rope, cfg: AudioDiTConfig,
               attn_impl: str = "auto", remat: bool = False,
               start: int = 0, stop: Optional[int] = None):
    return _run_blocks_generic(params_blocks, x, ctx, t_mod, rope, cfg,  # type: ignore[arg-type]
                               attn_impl, remat, start, stop)


@MODELS.register_module(name="AudioDiT")
def forward(params, cfg: AudioDiTConfig, x, timestep, context,
            attn_impl: str = "auto", remat: bool = False,
            compute_dtype=jnp.bfloat16):
    """Standalone forward (wan_audio_dit.py:197-250). x: [B, C, T] -> [B, out, T]."""
    t, t_mod = time_embeds(params, cfg, timestep)
    t = t.astype(compute_dtype)
    t_mod = t_mod.astype(compute_dtype)
    ctx = embed_text(params, context.astype(compute_dtype))
    tokens, f = nn.patch_embed_1d(params["patch_embedding"], x.astype(compute_dtype),
                                  cfg.patch_size)
    cos, sin = build_audio_freqs(rope_tables(cfg), f)
    tokens = run_blocks(params["blocks"], tokens, ctx, t_mod,
                        (jnp.asarray(cos), jnp.asarray(sin)), cfg, attn_impl, remat)
    out = head_apply(params["head"], tokens, t, cfg.eps)
    return nn.unpatchify_1d(out, cfg.patch_size, cfg.out_dim)
