"""Sequence-parallel (context-parallel) dual-tower forward.

Replaces the reference's 2-level USP scheme (outer `_sp_split_tensor` chunking
+ inner yunchang Ulysses×Ring attention, SURVEY.md §5.7) with a single
`shard_map` over the mesh's `cp` axis:

  - video/audio token chunks (and their RoPE slices) live per-rank;
  - video self-attention = ring attention over ICI (`lax.ppermute`);
  - audio self-attention = gather-K/V (the 403-token side is ~1 MB);
  - text cross-attention is fully local (context replicated);
  - bridge a2v gathers the tiny audio K/V; v2a LSE-combines partials
    (models/bridge.layer_apply_sp);
  - outputs come back cp-sharded (out_specs keep the token dim on `cp`);
    downstream per-token ops (head, unpatchify, sigma updates) stay sharded
    under GSPMD — no per-step full-sequence gather.

The shard_map is FULL-MANUAL over all mesh axes. Weights enter with their
real fsdp PartitionSpecs (sharding.param_pspecs) and are all-gathered
EXPLICITLY one layer at a time inside the scan body (the layer_param_map
hook in models/dual_tower.py) — explicit ZeRO-3: HBM holds only the shard,
one layer's dense weights exist at a time, and the transpose of the gather
reduce-scatters the weight grads. (A partial-manual shard_map with `fsdp`
left as an auto GSPMD axis would be the tidier spelling, but bf16 params +
grad through it crash this XLA's operand-upcaster — see r2 notes.)

Padding exactness: token counts are zero-padded to cp multiples and the pad
tails are MASKED out of every softmax (ring chunks, gathered audio K/V,
both bridge directions) via static valid lengths — unlike the reference,
whose zero-pad K/V rows leak into softmax denominators (functional.py:55-95).
cp=1 vs cp=N equivalence is exact for ANY (Lv, La), including the real
(43120, 403) geometry where 403 % cp != 0.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from dualforce_tpu.config import AudioDiTConfig, BridgeConfig, VideoDiTConfig
from dualforce_tpu.models.dual_tower import forward_dual_tower
from dualforce_tpu.parallel.hints import sharding_hints as _shadow_hints


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
    a2v_condition_scale: Optional[float] = None,
    v2a_condition_scale: Optional[float] = None,
    attn_impl: str = "auto",
    remat: bool = False,
    ctx_valid_len=None,
    axis: str = "cp",
    data_axis: Optional[str] = "data",
    video_grid=None,
):
    """Run the interleaved block stack sequence-parallel over `axis`;
    returns FULL-shape (unpadded; cp-sharded under GSPMD) sequences.

    data_axis: when set and present in the mesh with size dividing the batch,
    the batch dim is ALSO manual over it (so the Pallas attention custom call
    never needs GSPMD batch partitioning); otherwise batch stays auto."""
    cp = mesh.shape[axis]
    lv, la = visual_x.shape[1], audio_x.shape[1]
    b = visual_x.shape[0]
    visual_x, vpad = _pad_tokens(visual_x, cp)
    audio_x, apad = _pad_tokens(audio_x, cp)
    video_valid = lv if vpad else None
    audio_valid = la if apad else None

    visual_rope = tuple(jnp.asarray(_pad_axis(jnp.asarray(r), vpad, 0))
                        for r in visual_rope)
    audio_rope = tuple(jnp.asarray(_pad_axis(jnp.asarray(r), apad, 0))
                       for r in audio_rope)
    has_cross = cross_rope is not None
    if has_cross:
        cross_vis = tuple(_pad_axis(jnp.asarray(r), vpad, 1) for r in cross_rope[0])
        cross_aud = tuple(_pad_axis(jnp.asarray(r), apad, 1) for r in cross_rope[1])

    dax = None
    if ctx_valid_len is not None:
        data_axis = None  # per-batch valid lens are closure-captured
                          # (replicated); keep batch replicated so they line up
    if (data_axis is not None and data_axis in mesh.shape
            and mesh.shape[data_axis] > 1 and b % mesh.shape[data_axis] == 0):
        dax = data_axis

    fsdp_axis = "fsdp" if mesh.shape.get("fsdp", 1) > 1 else None
    fsdp_size = mesh.shape.get("fsdp", 1)
    from dualforce_tpu.parallel.sharding import param_pspecs

    is_spec = lambda x: x is None or isinstance(x, P)

    def _no_layer_shard(spec):
        # Dim 0 of every stacked leaf here is the scan/LAYER dim. _leaf_spec
        # can land fsdp there (2-D leaf whose last dim doesn't divide fsdp);
        # as a shard_map in_spec that would make each rank scan a different
        # layer subset (_gather_leaf only restores dims 1+) — silently wrong.
        # Replicate such leaves instead (they are the small ones).
        if spec is not None and len(spec) > 0 and tuple(spec)[0] == "fsdp":
            return P()
        return spec

    vb_specs = jax.tree.map(_no_layer_shard,
                            param_pspecs(video_blocks, fsdp_size),
                            is_leaf=is_spec)
    ab_specs = jax.tree.map(_no_layer_shard,
                            param_pspecs(audio_blocks, fsdp_size),
                            is_leaf=is_spec)
    br_specs = jax.tree.map(_no_layer_shard,
                            param_pspecs(bridge_params, fsdp_size),
                            is_leaf=is_spec)
    spec_by_kind = {"video": vb_specs, "audio": ab_specs,
                    "a2v": br_specs.get("a2v"), "v2a": br_specs.get("v2a")}

    layer_param_map = None
    if fsdp_axis is not None:
        def _gather_leaf(x, spec):
            # spec indexes the STACKED leaf's dims; the per-layer slice
            # dropped the leading (layer) dim -> shift entries left by one
            for d, ax_name in enumerate(tuple(spec)[1:]):
                if ax_name == fsdp_axis:
                    x = jax.lax.all_gather(x, fsdp_axis, axis=d, tiled=True)
            return x

        def layer_param_map(kind, tree):  # noqa: F811
            if tree is None:
                return None
            return jax.tree.map(_gather_leaf, tree, spec_by_kind[kind])

    seq = P(dax, axis, None)
    rope_seq = P(axis, None)
    cross_v_spec = P(None, axis, None)   # leading dim is 1 — never data-sharded
    batch_rep = P(dax, None, None)
    rep = P()

    def inner(video_blocks, audio_blocks, bridge_params, vx, ax, vctx, actx,
              vtm, atm, v_rope, a_rope, *cross_args):
        cross = None
        if has_cross:
            c_vis, c_aud = cross_args
            cross = (c_vis, c_aud)  # local video slices, FULL audio tables
        # shadow any outer GSPMD activation hints: with_sharding_constraint
        # on the manual `cp` axis is meaningless inside the shard_map body
        with _shadow_hints():
            return forward_dual_tower(
                video_blocks, audio_blocks, bridge_params, vcfg, acfg, bcfg,
                vx, ax, vctx, actx, vtm, atm, v_rope, a_rope,
                cross_rope=cross, condition_scale=condition_scale,
                a2v_condition_scale=a2v_condition_scale,
                v2a_condition_scale=v2a_condition_scale,
                attn_impl=attn_impl, remat=remat, ctx_valid_len=ctx_valid_len,
                sp_axis=axis, sp_video_valid=video_valid,
                sp_audio_valid=audio_valid, video_grid=video_grid,
                layer_param_map=layer_param_map)

    in_specs = [vb_specs, ab_specs, br_specs, seq, seq, batch_rep, batch_rep,
                batch_rep, batch_rep, (rope_seq, rope_seq), (rope_seq, rope_seq)]
    args = [video_blocks, audio_blocks, bridge_params, visual_x, audio_x,
            visual_ctx, audio_ctx, visual_t_mod, audio_t_mod,
            visual_rope, audio_rope]
    if has_cross:
        in_specs += [(cross_v_spec, cross_v_spec), (rep, rep)]
        args += [cross_vis, cross_aud]

    # gathered weights are vma-"varying" over fsdp even though numerically
    # identical across its ranks; there is no pcast-to-invariant, so the
    # replication check must be off when fsdp participates (grad correctness
    # is pinned by the cp=1-equivalence tests incl. fsdp>1 meshes)
    fn = jax.shard_map(inner, mesh=mesh, in_specs=tuple(in_specs),
                       out_specs=(seq, seq),
                       check_vma=(fsdp_axis is None))
    vx_full, ax_full = fn(*args)
    return vx_full[:, :lv], ax_full[:, :la]
