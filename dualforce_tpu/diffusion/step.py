"""Single dual-tower denoise step (inference_single_step equivalent,
pipeline_mova.py:500-609): fp32 time embeds -> per-tower text embeds ->
patchify + RoPE -> interleaved dual-tower forward -> heads -> unpatchify.

All RoPE/cross-RoPE tables depend only on static generation geometry; build
them once with `make_rope_pack` and pass as jit ARGUMENTS (embedding ~90 MB
of tables as XLA constants makes lowering pathologically slow).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax.numpy as jnp

from dualforce_tpu import nn
from dualforce_tpu.config import AudioDiTConfig, BridgeConfig, VideoDiTConfig
from dualforce_tpu.models import audio_dit, video_dit
from dualforce_tpu.models.dual_tower import forward_dual_tower
from dualforce_tpu.ops.rope import (
    build_aligned_cross_rope,
    build_audio_freqs,
    build_video_freqs,
)


@functools.lru_cache(maxsize=8)
def _video_tables(cfg: VideoDiTConfig):
    return video_dit.rope_tables(cfg)


@functools.lru_cache(maxsize=8)
def _audio_tables(cfg: AudioDiTConfig):
    return audio_dit.rope_tables(cfg)


def make_rope_pack(
    vcfg: VideoDiTConfig,
    acfg: AudioDiTConfig,
    bcfg: BridgeConfig,
    grid: Tuple[int, int, int],
    audio_tokens: int,
    video_fps: float = 24.0,
):
    """Host-side RoPE tables for a generation geometry, as a pytree of arrays.

    Pass this as an ARGUMENT to jitted step/denoise functions: at 360p the
    tables total ~90 MB and embedding them as XLA constants makes
    trace/lower pathologically slow (minutes); as runtime args they transfer
    once and compile instantly.
    """
    v_cos, v_sin = build_video_freqs(_video_tables(vcfg), grid)
    a_cos, a_sin = build_audio_freqs(_audio_tables(acfg), audio_tokens)
    pack = {
        "v": (jnp.asarray(v_cos), jnp.asarray(v_sin)),
        "a": (jnp.asarray(a_cos), jnp.asarray(a_sin)),
    }
    if bcfg.apply_cross_rope:
        (cv, sv), (ca, sa) = build_aligned_cross_rope(
            video_fps=video_fps, grid=grid, audio_steps=audio_tokens,
            audio_fps=bcfg.audio_fps, head_dim=bcfg.head_dim,
            theta=bcfg.rope_theta,
            first_frame_bias=bcfg.apply_first_frame_bias_in_rope)
        pack["cross"] = ((jnp.asarray(cv), jnp.asarray(sv)),
                         (jnp.asarray(ca), jnp.asarray(sa)))
    return pack


def dual_tower_step(
    video_params,
    audio_params,
    bridge_params,
    vcfg: VideoDiTConfig,
    acfg: AudioDiTConfig,
    bcfg: BridgeConfig,
    visual_latents: jnp.ndarray,   # [B, C_in, F, H, W] (noisy z + mask + cond)
    audio_latents: jnp.ndarray,    # [B, C_a, T]
    context: jnp.ndarray,          # [B, 512, text_dim]
    timestep: jnp.ndarray,         # [B]
    audio_timestep: Optional[jnp.ndarray] = None,
    video_fps: float = 24.0,
    condition_scale: Optional[float] = None,
    a2v_condition_scale: Optional[float] = None,
    v2a_condition_scale: Optional[float] = None,
    compute_dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    remat: bool = False,
    ctx_valid_len=None,
    rope_pack=None,
    sp_mesh=None,
    sp_axis: str = "cp",
    sp_data_axis: Optional[str] = "data",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    if audio_timestep is None:
        audio_timestep = timestep

    # fp32 time embeds, cast down for the towers (pipeline_mova.py:536-547)
    v_t, v_t_mod = video_dit.time_embeds(video_params, vcfg, timestep)
    a_t, a_t_mod = audio_dit.time_embeds(audio_params, acfg, audio_timestep)
    v_t, v_t_mod = v_t.astype(compute_dtype), v_t_mod.astype(compute_dtype)
    a_t, a_t_mod = a_t.astype(compute_dtype), a_t_mod.astype(compute_dtype)

    ctx = context.astype(compute_dtype)
    visual_ctx = video_dit.embed_text(video_params, ctx)
    audio_ctx = audio_dit.embed_text(audio_params, ctx)

    visual_x, grid = nn.patch_embed_3d(
        video_params["patch_embedding"], visual_latents.astype(compute_dtype),
        vcfg.patch_size)
    audio_x, f = nn.patch_embed_1d(
        audio_params["patch_embedding"], audio_latents.astype(compute_dtype),
        acfg.patch_size)

    if rope_pack is None:
        rope_pack = make_rope_pack(vcfg, acfg, bcfg, grid, f, video_fps)
    (v_cos, v_sin) = rope_pack["v"]
    (a_cos, a_sin) = rope_pack["a"]
    cross_rope = rope_pack.get("cross")

    if sp_mesh is not None and sp_mesh.shape.get(sp_axis, 1) > 1:
        # PRODUCTION sequence parallelism: the block stack runs inside a
        # shard_map over `cp` — ring/gather-KV/LSE-combined attention per
        # shard (parallel/sp.py) instead of GSPMD hints around an opaque
        # Pallas custom call (reference USP path, wan_video_dit.py:192-208,
        # pipeline_mova.py:653-706)
        from dualforce_tpu.parallel.sp import sp_forward_blocks

        visual_x, audio_x = sp_forward_blocks(
            sp_mesh, video_params["blocks"], audio_params["blocks"],
            bridge_params, vcfg, acfg, bcfg,
            visual_x, audio_x, visual_ctx, audio_ctx, v_t_mod, a_t_mod,
            (jnp.asarray(v_cos), jnp.asarray(v_sin)),
            (jnp.asarray(a_cos), jnp.asarray(a_sin)),
            cross_rope=cross_rope,
            condition_scale=condition_scale,
            a2v_condition_scale=a2v_condition_scale,
            v2a_condition_scale=v2a_condition_scale,
            attn_impl=attn_impl, remat=remat, ctx_valid_len=ctx_valid_len,
            axis=sp_axis, data_axis=sp_data_axis, video_grid=grid,
        )
    else:
        visual_x, audio_x = forward_dual_tower(
            video_params["blocks"], audio_params["blocks"], bridge_params,
            vcfg, acfg, bcfg,
            visual_x, audio_x, visual_ctx, audio_ctx, v_t_mod, a_t_mod,
            (jnp.asarray(v_cos), jnp.asarray(v_sin)),
            (jnp.asarray(a_cos), jnp.asarray(a_sin)),
            cross_rope=cross_rope,
            condition_scale=condition_scale,
            a2v_condition_scale=a2v_condition_scale,
            v2a_condition_scale=v2a_condition_scale,
            attn_impl=attn_impl, remat=remat, ctx_valid_len=ctx_valid_len,
            video_grid=grid,
        )

    visual_out = video_dit.head_apply(video_params["head"], visual_x, v_t, vcfg.eps)
    visual_out = nn.unpatchify_3d(visual_out, grid, vcfg.patch_size, vcfg.out_dim)
    audio_out = audio_dit.head_apply(audio_params["head"], audio_x, a_t, acfg.eps)
    audio_out = nn.unpatchify_1d(audio_out, acfg.patch_size, acfg.out_dim)
    return visual_out, audio_out
