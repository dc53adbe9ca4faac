"""Sequence-parallel (context-parallel) dual-tower forward.

Replaces the reference's 2-level USP scheme (outer `_sp_split_tensor` chunking
+ inner yunchang Ulysses×Ring attention, SURVEY.md §5.7) with a single
`shard_map` over the mesh's `cp` axis:

  - video/audio token chunks (and their RoPE slices) live per-rank;
  - self-attention = ring attention over ICI (`lax.ppermute`);
  - text cross-attention is fully local (context replicated);
  - bridge a2v gathers the tiny audio K/V; v2a LSE-combines partials
    (models/bridge.layer_apply_sp);
  - the epilogue all-gathers both modalities (reference `_sp_all_gather_avg`).

Padding: token counts are zero-padded to cp multiples. Unlike the reference
(whose zero-pad K/V rows leak into softmax denominators, functional.py:55-95),
padded rows here DO also participate as ring/bridge K/V — equivalence with
cp=1 therefore holds exactly when Lv and La divide cp, which the 360p/720p
geometries satisfy (43120 % 8 == 0) after choosing the audio pad at the plan
level. Tests pin the divisible case.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from dualforce_tpu.config import AudioDiTConfig, BridgeConfig, VideoDiTConfig
from dualforce_tpu.models.dual_tower import forward_dual_tower


def _pad_tokens(x: jnp.ndarray, cp: int) -> Tuple[jnp.ndarray, int]:
    pad = -x.shape[1] % cp
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    return x, pad


def _pad_axis(x: jnp.ndarray, pad: int, axis: int) -> jnp.ndarray:
    if not pad:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def sp_forward_blocks(
    mesh: Mesh,
    video_blocks,
    audio_blocks,
    bridge_params,
    vcfg: VideoDiTConfig,
    acfg: AudioDiTConfig,
    bcfg: BridgeConfig,
    visual_x: jnp.ndarray,     # [B, Lv, V] full
    audio_x: jnp.ndarray,      # [B, La, A] full
    visual_ctx: jnp.ndarray,
    audio_ctx: jnp.ndarray,
    visual_t_mod: jnp.ndarray,
    audio_t_mod: jnp.ndarray,
    visual_rope,               # (cos, sin) [Lv, d/2] full
    audio_rope,                # (cos, sin) [La, d/2] full
    cross_rope=None,           # ((cos_v, sin_v), (cos_a, sin_a)) [1, L, head_dim]
    condition_scale: Optional[float] = None,
    attn_impl: str = "auto",
    remat: bool = False,
    axis: str = "cp",
):
    """Run the interleaved block stack sequence-parallel over `axis`;
    returns FULL (gathered, unpadded) sequences."""
    cp = mesh.shape[axis]
    lv, la = visual_x.shape[1], audio_x.shape[1]
    visual_x, vpad = _pad_tokens(visual_x, cp)
    audio_x, apad = _pad_tokens(audio_x, cp)
    if vpad or apad:
        # the reference zero-pads the tail rank the same way
        # (functional.py:60-71): padded rows DO enter the ring/bridge softmax
        # as near-zero keys, a small approximation. Surface it rather than
        # degrade silently; pick cp dividing the token counts to avoid it.
        import warnings

        warnings.warn(
            f"sequence lengths (video {lv}, audio {la}) are not divisible by "
            f"cp={cp}; zero-padded tokens participate in attention "
            "(reference-parity behavior, but cp=1 equivalence is then only "
            "approximate)", stacklevel=2)

    visual_rope = tuple(jnp.asarray(_pad_axis(jnp.asarray(r), vpad, 0))
                        for r in visual_rope)
    audio_rope = tuple(jnp.asarray(_pad_axis(jnp.asarray(r), apad, 0))
                       for r in audio_rope)
    has_cross = cross_rope is not None
    if has_cross:
        cross_vis = tuple(_pad_axis(jnp.asarray(r), vpad, 1) for r in cross_rope[0])
        cross_aud = tuple(_pad_axis(jnp.asarray(r), apad, 1) for r in cross_rope[1])

    seq = P(None, axis, None)
    rope_seq = P(axis, None)
    cross_v_spec = P(None, axis, None)
    rep = P()

    def inner(video_blocks, audio_blocks, bridge_params, vx, ax, vctx, actx,
              vtm, atm, v_rope, a_rope, *cross_args):
        cross = None
        if has_cross:
            c_vis, c_aud = cross_args
            cross = (c_vis, c_aud)  # local video slices, FULL audio tables
        return forward_dual_tower(
            video_blocks, audio_blocks, bridge_params, vcfg, acfg, bcfg,
            vx, ax, vctx, actx, vtm, atm, v_rope, a_rope,
            cross_rope=cross, condition_scale=condition_scale,
            attn_impl=attn_impl, remat=remat, sp_axis=axis)

    in_specs = [rep, rep, rep, seq, seq, rep, rep, rep, rep,
                (rope_seq, rope_seq), (rope_seq, rope_seq)]
    args = [video_blocks, audio_blocks, bridge_params, visual_x, audio_x,
            visual_ctx, audio_ctx, visual_t_mod, audio_t_mod,
            visual_rope, audio_rope]
    if has_cross:
        in_specs += [(cross_v_spec, cross_v_spec), (rep, rep)]
        args += [cross_vis, cross_aud]

    fn = shard_map(inner, mesh=mesh, in_specs=tuple(in_specs),
                   out_specs=(seq, seq))
    vx_full, ax_full = fn(*args)
    return vx_full[:, :lv], ax_full[:, :la]
