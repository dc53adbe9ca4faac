"""Interleaved dual-tower forward — the hottest loop of the framework.

Behavioural reference: MOVA.forward_dual_tower_dit + inference_single_step
(mova/diffusion/pipelines/pipeline_mova.py:500-711). Per shared layer:
bridge (a2v + v2a cross-attn) -> video DiT block -> audio DiT block; then the
remaining video-only blocks.

TPU-first design: when every shared layer interacts (the shipped "full"
strategy), the whole interleave is ONE `lax.scan` over stacked
(bridge_a2v, bridge_v2a, video_block, audio_block) params, followed by a
second scan over the video-only tail — two compiled loop bodies total,
remat-compatible for training.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from dualforce_tpu import nn
from dualforce_tpu.config import AudioDiTConfig, BridgeConfig, VideoDiTConfig
from dualforce_tpu.models import bridge as bridge_mod
from dualforce_tpu.models.video_dit import dit_block_apply
from dualforce_tpu.parallel.hints import constrain


def forward_dual_tower(
    video_blocks,          # stacked video DiT block params [Lv, ...]
    audio_blocks,          # stacked audio DiT block params [La, ...]
    bridge_params,         # {'a2v': [I, ...], 'v2a': [I, ...], opt condition_scale}
    vcfg: VideoDiTConfig,
    acfg: AudioDiTConfig,
    bcfg: BridgeConfig,
    visual_x: jnp.ndarray,     # [B, Lv_tok, V]
    audio_x: jnp.ndarray,      # [B, La_tok, A]
    visual_ctx: jnp.ndarray,
    audio_ctx: jnp.ndarray,
    visual_t_mod: jnp.ndarray,
    audio_t_mod: jnp.ndarray,
    visual_rope: Tuple[jnp.ndarray, jnp.ndarray],
    audio_rope: Tuple[jnp.ndarray, jnp.ndarray],
    cross_rope=None,           # ((cos_v, sin_v), (cos_a, sin_a)) or None
    condition_scale: Optional[float] = None,
    a2v_condition_scale: Optional[float] = None,
    v2a_condition_scale: Optional[float] = None,
    attn_impl: str = "auto",
    remat: bool = False,
    ctx_valid_len=None,
    sp_axis: Optional[str] = None,
    sp_video_valid: Optional[int] = None,
    sp_audio_valid: Optional[int] = None,
    video_grid=None,
    layer_param_map=None,
    shared_layers: Optional[int] = None,
    interact_override: Optional[list] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """layer_param_map(kind, tree): optional per-layer param transform
    applied to each layer's sliced params inside the scan body — the
    sequence-parallel path injects the explicit ZeRO-3 all-gather here
    (weights stay fsdp-sharded in HBM; one layer is gathered at a time and
    freed after use, re-gathered in the remat backward).

    shared_layers/interact_override: run a SLICE of the stack — the group
    streamed-offload path (diffusion/streamed.py) calls this per layer group
    with `shared_layers` = the group's shared depth and `interact_override` =
    the group-LOCAL indices of interacting layers (indices into the passed
    bridge stacks). Defaults recover the full-stack behavior from bcfg."""
    min_layers = bcfg.min_layers if shared_layers is None else shared_layers
    interact = (bcfg.interaction_layers() if interact_override is None
                else list(interact_override))
    visual_x = constrain(visual_x, "video_tokens")
    audio_x = constrain(audio_x, "audio_tokens")
    vis_freqs = cross_rope[0] if cross_rope is not None else None
    aud_freqs = cross_rope[1] if cross_rope is not None else None

    a2v_scale = bridge_mod.resolve_condition_scale(
        bridge_params, bcfg,
        a2v_condition_scale if a2v_condition_scale is not None else condition_scale)
    v2a_scale = bridge_mod.resolve_condition_scale(
        bridge_params, bcfg,
        v2a_condition_scale if v2a_condition_scale is not None else condition_scale)

    v_self_impl = a_self_impl = attn_impl
    cross_impl = None
    if sp_axis is not None:
        from dualforce_tpu.parallel.ring_attention import (
            gather_kv_attention, inner_for_impl, ring_attention)

        ring_inner = inner_for_impl(attn_impl)

        def v_self_impl(q, k, v, kv_valid_len=None):  # noqa: F811 — SP override
            # 43k-token video self-attn: ring over ICI, pad tail masked
            return ring_attention(q, k, v, sp_axis, inner=ring_inner,
                                  global_valid_len=sp_video_valid)

        def a_self_impl(q, k, v, kv_valid_len=None):  # noqa: F811 — SP override
            # 403-token audio self-attn: gather the ~1 MB K/V once instead of
            # a launch-bound ring; exact pad masking
            return gather_kv_attention(q, k, v, sp_axis,
                                       global_valid_len=sp_audio_valid,
                                       impl=attn_impl)

        cross_impl = attn_impl  # text context replicated -> local attention

    vblock = functools.partial(dit_block_apply, num_heads=vcfg.num_heads, eps=vcfg.eps,
                               attn_impl=v_self_impl, ctx_valid_len=ctx_valid_len,
                               cross_attn_impl=cross_impl)
    ablock = functools.partial(dit_block_apply, num_heads=acfg.num_heads, eps=acfg.eps,
                               attn_impl=a_self_impl, ctx_valid_len=ctx_valid_len,
                               cross_attn_impl=cross_impl)

    def shared_layer(vx, ax, a2v_p, v2a_p, vb_p, ab_p, do_interact: bool):
        if layer_param_map is not None:
            a2v_p = layer_param_map("a2v", a2v_p)
            v2a_p = layer_param_map("v2a", v2a_p)
            vb_p = layer_param_map("video", vb_p)
            ab_p = layer_param_map("audio", ab_p)
        if do_interact:
            if sp_axis is not None:
                if bcfg.pooled_adaln and video_grid is None:
                    raise ValueError(
                        "pooled_adaln under sequence parallelism requires "
                        "video_grid (pass it through sp_forward_blocks)")
                vx, ax = bridge_mod.layer_apply_sp(
                    a2v_p, v2a_p, vx, ax, vis_freqs, aud_freqs, bcfg, sp_axis,
                    a2v_scale, v2a_scale, attn_impl,
                    video_valid=sp_video_valid, audio_valid=sp_audio_valid,
                    video_grid=video_grid)
            else:
                vx, ax = bridge_mod.layer_apply(
                    a2v_p, v2a_p, vx, ax, vis_freqs, aud_freqs, bcfg,
                    a2v_scale, v2a_scale, attn_impl, video_grid=video_grid)
        vx = vblock(vb_p, vx, visual_ctx, visual_t_mod, visual_rope)
        ax = ablock(ab_p, ax, audio_ctx, audio_t_mod, audio_rope)
        return vx, ax

    if interact == list(range(min_layers)):
        # Fast path: single fused scan over the shared depth. The per-layer
        # params are DYNAMIC-SLICED from the full stacked trees inside the
        # body (index xs) instead of passing pre-sliced `[:min_layers]`
        # copies as scan xs: XLA materializes those static slices as HLO
        # temps — ~3.5 GB of pure duplication at flagship scale (measured
        # in the round-5 int4-resident OOM dump), while a per-iteration
        # dynamic slice reads the original buffer exactly like scan's own
        # xs indexing.
        def step(carry, i):
            vx, ax = carry
            out = shared_layer(vx, ax,
                               nn.index_params(bridge_params["a2v"], i),
                               nn.index_params(bridge_params["v2a"], i),
                               nn.index_params(video_blocks, i),
                               nn.index_params(audio_blocks, i), True)
            return out, None

        body = jax.checkpoint(step) if remat else step
        (visual_x, audio_x), _ = jax.lax.scan(
            body, (visual_x, audio_x), jnp.arange(min_layers))
    else:
        # General path: unrolled python loop with sparse bridge lookups
        # (non-"full" strategies are small research configs).
        bridge_idx = {layer: i for i, layer in enumerate(interact)}
        layer_fn = (jax.checkpoint(shared_layer, static_argnums=(6,))
                    if remat else shared_layer)
        for layer in range(min_layers):
            i = bridge_idx.get(layer)
            visual_x, audio_x = layer_fn(
                visual_x, audio_x,
                nn.index_params(bridge_params["a2v"], i) if i is not None else None,
                nn.index_params(bridge_params["v2a"], i) if i is not None else None,
                nn.index_params(video_blocks, layer),
                nn.index_params(audio_blocks, layer),
                i is not None,
            )

    # video-only tail (pipeline_mova.py:698-702)
    num_video_layers = jax.tree.leaves(video_blocks)[0].shape[0]
    if num_video_layers > min_layers:
        def vstep(vx, i):
            vb_p = nn.index_params(video_blocks, i)
            if layer_param_map is not None:
                vb_p = layer_param_map("video", vb_p)
            return vblock(vb_p, vx, visual_ctx, visual_t_mod, visual_rope), None

        vbody = jax.checkpoint(vstep) if remat else vstep
        visual_x, _ = jax.lax.scan(vbody, visual_x,
                                   jnp.arange(min_layers, num_video_layers))

    visual_x = constrain(visual_x, "video_tokens")
    audio_x = constrain(audio_x, "audio_tokens")
    return visual_x, audio_x
