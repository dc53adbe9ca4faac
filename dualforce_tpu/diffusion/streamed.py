"""Layer-group streamed denoise — the reference's `--offload group` mode
(README.md "Layerwise (group offload)" row: 12 GB VRAM class vs 48 GB for
component offload; group_offload consumed in inference_single.py via
`--offload group`).

Reference semantics: only a sliding window of DiT layer groups is resident
in accelerator memory; the rest of the 14B tower stays in host RAM and is
streamed in group-by-group each forward pass. This is what lets the full
flagship run 720p on one 16 GB v5e: weights alone (14 GB fp8) exceed HBM
once activations are counted, so HBM holds just {audio tower + bridge +
tower periphery + 2 layer groups (double-buffered) + activations}.

TPU-first design: instead of torch-style module hooks swapping buffers, the
pass is split into three compiled programs — `_pre` (time/text/patch
embeds), a per-group block program (the SAME stacked-`lax.scan` body as the
resident path, via forward_dual_tower's shared_layers/interact_override),
and `_head`. The host loop `jax.device_put`s group g+1 while group g's
compute is in flight (async dispatch overlaps the PCIe/tunnel transfer with
MXU work), then drops group g's buffers. The denoise loop itself runs in
Python (one jitted Euler update per step) — with per-step host transfers in
the loop anyway, a fused-XLA-program loop buys nothing.

Numerics are identical to the resident path by construction (same layer
body, same order) — tested in tests/test_streamed_offload.py.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dualforce_tpu import nn
from dualforce_tpu.config import (
    AudioDiTConfig,
    BridgeConfig,
    MOVAConfig,
    VideoDiTConfig,
)
from dualforce_tpu.models import audio_dit, video_dit
from dualforce_tpu.models.dual_tower import forward_dual_tower


# --------------------------------------------------------------------------
# group partitioning
# --------------------------------------------------------------------------

def plan_groups(bcfg: BridgeConfig, num_video_layers: int,
                group_size: int) -> List[Dict[str, Any]]:
    """Split the interleaved stack into host-sliceable groups.

    Returns a list of specs: {"v": (s0, s1), "a": (s0, s1), "b": (b0, b1),
    "shared": int, "interact": tuple} — video/audio/bridge slice bounds into
    the stacked param arrays, the group's shared depth, and the group-local
    interacting layer indices. Shared depth is grouped first, then the
    video-only tail; a group never spans the shared/tail boundary (the two
    regions compile to different programs anyway)."""
    if group_size <= 0:
        raise ValueError(f"group_size must be positive, got {group_size}")
    shared = min(bcfg.min_layers, num_video_layers)
    interact = bcfg.interaction_layers()
    groups: List[Dict[str, Any]] = []
    for s0 in range(0, shared, group_size):
        s1 = min(s0 + group_size, shared)
        local = [l - s0 for l in interact if s0 <= l < s1]
        # bridge stacks are ordered by `interact`; the group's entries are a
        # contiguous run in that ordering
        bpos = [i for i, l in enumerate(interact) if s0 <= l < s1]
        b0, b1 = (bpos[0], bpos[-1] + 1) if bpos else (0, 0)
        groups.append({"v": (s0, s1), "a": (s0, s1), "b": (b0, b1),
                       "shared": s1 - s0, "interact": tuple(local)})
    for s0 in range(shared, num_video_layers, group_size):
        s1 = min(s0 + group_size, num_video_layers)
        groups.append({"v": (s0, s1), "a": (shared, shared), "b": (0, 0),
                       "shared": 0, "interact": ()})
    return groups


def _slice_group(video_blocks, audio_blocks, bridge_params, spec):
    """Host-side zero-copy slice of one group's params (numpy views)."""
    v0, v1 = spec["v"]
    a0, a1 = spec["a"]
    b0, b1 = spec["b"]
    g = {
        "v": jax.tree.map(lambda x: x[v0:v1], video_blocks),
        "a": jax.tree.map(lambda x: x[a0:a1], audio_blocks),
        "b": {k: jax.tree.map(lambda x: x[b0:b1], bridge_params[k])
              for k in ("a2v", "v2a")},
    }
    # scalar bridge extras (e.g. trainable condition_scale) ride along
    for k, v in bridge_params.items():
        if k not in ("a2v", "v2a"):
            g["b"][k] = v
    return g


# --------------------------------------------------------------------------
# the three compiled programs
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("vcfg", "acfg", "compute_dtype"))
def _pre(video_periph, audio_periph, vcfg: VideoDiTConfig,
         acfg: AudioDiTConfig, visual_latents, audio_latents, context,
         timestep, audio_timestep, compute_dtype):
    """Embeds + patchify (the resident path's dual_tower_step prologue)."""
    v_t, v_t_mod = video_dit.time_embeds(video_periph, vcfg, timestep)
    a_t, a_t_mod = audio_dit.time_embeds(audio_periph, acfg, audio_timestep)
    v_t, v_t_mod = v_t.astype(compute_dtype), v_t_mod.astype(compute_dtype)
    a_t, a_t_mod = a_t.astype(compute_dtype), a_t_mod.astype(compute_dtype)
    ctx = context.astype(compute_dtype)
    visual_ctx = video_dit.embed_text(video_periph, ctx)
    audio_ctx = audio_dit.embed_text(audio_periph, ctx)
    visual_x, grid = nn.patch_embed_3d(
        video_periph["patch_embedding"], visual_latents.astype(compute_dtype),
        vcfg.patch_size)
    audio_x, f = nn.patch_embed_1d(
        audio_periph["patch_embedding"], audio_latents.astype(compute_dtype),
        acfg.patch_size)
    return (visual_x, audio_x, visual_ctx, audio_ctx,
            v_t, v_t_mod, a_t, a_t_mod)


@functools.partial(
    jax.jit,
    static_argnames=("vcfg", "acfg", "bcfg", "shared", "interact",
                     "attn_impl", "a2v_scale_static", "v2a_scale_static",
                     "video_grid"))
def _group_forward(group, vcfg, acfg, bcfg, visual_x, audio_x, visual_ctx,
                   audio_ctx, v_t_mod, a_t_mod, v_rope, a_rope, cross_rope,
                   ctx_valid_len, shared: int, interact: tuple,
                   attn_impl: str, a2v_scale_static, v2a_scale_static,
                   video_grid):
    return forward_dual_tower(
        group["v"], group["a"], group["b"], vcfg, acfg, bcfg,
        visual_x, audio_x, visual_ctx, audio_ctx, v_t_mod, a_t_mod,
        v_rope, a_rope, cross_rope=cross_rope,
        a2v_condition_scale=a2v_scale_static,
        v2a_condition_scale=v2a_scale_static,
        attn_impl=attn_impl, ctx_valid_len=ctx_valid_len,
        video_grid=video_grid,
        shared_layers=shared, interact_override=list(interact))


@functools.partial(jax.jit, static_argnames=("vcfg", "acfg", "grid"))
def _head(video_periph, audio_periph, vcfg: VideoDiTConfig,
          acfg: AudioDiTConfig, visual_x, audio_x, v_t, a_t, grid):
    visual_out = video_dit.head_apply(video_periph["head"], visual_x, v_t,
                                      vcfg.eps)
    visual_out = nn.unpatchify_3d(visual_out, grid, vcfg.patch_size,
                                  vcfg.out_dim)
    audio_out = audio_dit.head_apply(audio_periph["head"], audio_x, a_t,
                                     acfg.eps)
    audio_out = nn.unpatchify_1d(audio_out, acfg.patch_size, acfg.out_dim)
    return visual_out, audio_out


# --------------------------------------------------------------------------
# one streamed forward pass
# --------------------------------------------------------------------------

def streamed_pass_multi(
    video_periph,                  # device: video params sans "blocks"
    audio_periph,                  # device: audio params sans "blocks"
    host_groups: List[Any],        # host param slices from plan/slice
    group_specs: List[Dict[str, Any]],
    cfg: MOVAConfig,
    visual_latents, audio_latents,
    programs: List[Dict[str, Any]],  # per pass: {context, ctx_valid_len,
                                     #            condition_scale}
    timestep, audio_timestep,
    rope_pack,
    *,
    compute_dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    resident: Optional[Tuple[Any, Any]] = None,
) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
    """Run SEVERAL forward passes over ONE host->HBM staging sweep.

    The CFG positive/negative (and dual-CFG) passes of a step share
    identical latents and timestep — they differ only in text context and
    bridge condition scale. Staging each layer group once and running every
    program's group-forward on it divides the dominant cost of offload mode
    (the per-pass weight restream: ~14 GiB over PCIe or tunnel for the
    flagship video tower) by the number of programs, for +one activation
    set (~2 GiB at 720p) per extra program. Activations stay batch-1 —
    unlike cfg_batch, which doubles every intermediate."""
    vcfg, acfg, bcfg = cfg.video_dit, cfg.audio_dit, cfg.bridge
    (visual_x, audio_x, visual_ctx0, audio_ctx0, v_t, v_t_mod, a_t, a_t_mod
     ) = _pre(video_periph, audio_periph, vcfg, acfg,
              visual_latents, audio_latents, programs[0]["context"],
              timestep, audio_timestep, compute_dtype)
    # tower states per program: same patchified latents, per-program ctx
    states = [[visual_x, audio_x, visual_ctx0, audio_ctx0]]
    for prog in programs[1:]:
        ctx = prog["context"].astype(compute_dtype)
        states.append([visual_x, audio_x,
                       video_dit.embed_text(video_periph, ctx),
                       audio_dit.embed_text(audio_periph, ctx)])
    pt, ph, pw = vcfg.patch_size
    grid = (visual_latents.shape[2] // pt, visual_latents.shape[3] // ph,
            visual_latents.shape[4] // pw)
    v_rope = rope_pack["v"]
    a_rope = rope_pack["a"]
    cross_rope = rope_pack.get("cross")

    def _assemble(g, spec):
        """Join a streamed video-group slice with on-device audio/bridge
        slices when those towers are HBM-resident (resident_small mode)."""
        if resident is None:
            return g
        a_blocks, b_tree = resident
        a0, a1 = spec["a"]
        b0, b1 = spec["b"]
        out = dict(g)
        out["a"] = jax.tree.map(lambda x: x[a0:a1], a_blocks)
        out["b"] = {k: jax.tree.map(lambda x: x[b0:b1], b_tree[k])
                    for k in ("a2v", "v2a")}
        for k, v in b_tree.items():
            if k not in ("a2v", "v2a"):
                out["b"][k] = v
        return out

    cur = _assemble(jax.device_put(host_groups[0]), group_specs[0])
    for gi, spec in enumerate(group_specs):
        # start group g+1's host->HBM transfer BEFORE dispatching group g's
        # compute: both dispatches are async, so the copy rides alongside
        # the MXU work instead of serializing after it
        nxt = (_assemble(jax.device_put(host_groups[gi + 1]),
                         group_specs[gi + 1])
               if gi + 1 < len(group_specs) else None)
        for st, prog in zip(states, programs):
            cscale = prog.get("condition_scale")
            st[0], st[1] = _group_forward(
                cur, vcfg, acfg, bcfg, st[0], st[1], st[2], st[3],
                v_t_mod, a_t_mod, v_rope, a_rope, cross_rope,
                prog.get("ctx_valid_len"),
                spec["shared"], spec["interact"], attn_impl,
                cscale, cscale, grid)
        # FLOW CONTROL: bound in-flight host staging to two groups. Without
        # this the async dispatch races arbitrarily far ahead and every
        # pending device_put pins a host copy of its group — observed live
        # as a ~30 GB/step RSS climb and an OOM kill at step 3 of the 360p
        # e2e run. Group g+1's transfer was issued above, so it still
        # overlaps group g's compute; only group g+2's staging waits.
        jax.block_until_ready(states[-1][0])
        cur = nxt  # drop the last reference; HBM frees once compute retires

    return [_head(video_periph, audio_periph, vcfg, acfg, st[0], st[1],
                  v_t, a_t, grid) for st in states]


def streamed_pass(
    video_periph, audio_periph, host_groups, group_specs, cfg,
    visual_latents, audio_latents, context, timestep, audio_timestep,
    rope_pack,
    *,
    compute_dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    condition_scale: Optional[float] = None,
    ctx_valid_len=None,
    resident: Optional[Tuple[Any, Any]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-program wrapper over streamed_pass_multi."""
    return streamed_pass_multi(
        video_periph, audio_periph, host_groups, group_specs, cfg,
        visual_latents, audio_latents,
        [{"context": context, "ctx_valid_len": ctx_valid_len,
          "condition_scale": condition_scale}],
        timestep, audio_timestep, rope_pack,
        compute_dtype=compute_dtype, attn_impl=attn_impl,
        resident=resident)[0]


# --------------------------------------------------------------------------
# the streamed denoise loop (python-driven; per-step jitted Euler update)
# --------------------------------------------------------------------------

@jax.jit
def _euler(lat, alat, v_pred, a_pred, dsv, dsa):
    return lat + v_pred * dsv, alat + a_pred * dsa


@functools.partial(jax.jit, static_argnames=("scale",))
def _cfg_combine(pos, neg, scale: float):
    v = neg[0] + scale * (pos[0].astype(jnp.float32) - neg[0])
    a = neg[1] + scale * (pos[1].astype(jnp.float32) - neg[1])
    return v, a


def denoise_streamed(
    video_params,                  # HOST tree of the active tower
    audio_params,                  # HOST tree
    bridge_params,                 # HOST tree
    cfg: MOVAConfig,
    latents, condition, audio_latents, ctx_pos, ctx_neg,
    plan,                          # SamplePlan
    start: int, stop: int,
    *,
    group_size: int = 8,
    cfg_scale: float = 5.0,
    video_fps: float = 24.0,
    cfg_batch: bool = False,
    compute_dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    rope_pack=None,
    cfg_cache_interval: int = 1,
    cfg_scale_bridge: float = 0.0,
    ctx_len_pos=None,
    ctx_len_neg=None,
    progress_fn=None,
    resident_small: bool = False,
    resident_video_groups: int = 0,
    neg_cache: Optional[Tuple[Any, Any]] = None,
    return_neg_cache: bool = False,
):
    """Steps [start, stop) with the active tower's blocks streamed from host
    RAM in layer groups. Semantics (CFG, negative-cache, dual CFG, Euler
    updates) mirror sampler.denoise_loop exactly; the loop runs in Python so
    the negative-pass cache is plain host control flow.

    `neg_cache` seeds the CFG negative-prediction cache (the (v, a) pair a
    previous [.., start) range returned via `return_neg_cache=True`) so a
    range split at an arbitrary step reproduces the unsplit run bit-for-bit —
    without it the first step of the range forces a cache refresh (correct at
    a tower switch, where the cache from the other expert must not leak)."""
    use_cfg = (cfg_scale != 1.0) and (ctx_neg is not None)
    use_dual = cfg_scale_bridge != 0.0
    if use_cfg and cfg_batch and cfg_cache_interval > 1:
        # same contract as sampler.denoise_loop
        raise ValueError("cfg_cache_interval > 1 requires cfg_batch=False "
                         "(the cache replaces the second pass entirely)")
    b = latents.shape[0]

    num_v = jax.tree.leaves(video_params["blocks"])[0].shape[0]
    specs = plan_groups(cfg.bridge, num_v, group_size)
    resident = None
    if resident_small:
        # The audio tower + bridge together are ~4 GB fp8 — a fraction of
        # the 14 GB video tower. Pinning them in HBM removes ~22% of the
        # per-pass host->HBM traffic; only the video groups stream. Their
        # per-group slices are taken on-device inside the pass loop
        # (transient sub-GB copies), so HBM holds one extra copy of at most
        # one group's audio+bridge slice at a time.
        resident = (jax.device_put(audio_params["blocks"]),
                    jax.device_put(bridge_params))
        host_groups = [{"v": jax.tree.map(
            lambda x, s=s: x[s["v"][0]:s["v"][1]], video_params["blocks"])}
            for s in specs]
    else:
        host_groups = [
            _slice_group(video_params["blocks"], audio_params["blocks"],
                         bridge_params, s) for s in specs]
    if resident_video_groups > 0:
        # Partial residency: pin the first K video layer groups in HBM for
        # the whole range — streamed_pass's jax.device_put is an identity on
        # already-committed device arrays, so pinned groups cost zero h2d on
        # every pass after the first. Cuts per-pass host->HBM traffic by
        # K/num_groups of the video tower (the dominant stream) at K x
        # group-bytes of HBM; size K to the HBM left after activations.
        for gi in range(min(resident_video_groups, len(host_groups))):
            host_groups[gi] = jax.device_put(host_groups[gi])
    video_periph = jax.device_put(
        {k: v for k, v in video_params.items() if k != "blocks"})
    audio_periph = jax.device_put(
        {k: v for k, v in audio_params.items() if k != "blocks"})

    if rope_pack is None:
        from dualforce_tpu.diffusion.step import make_rope_pack

        pt, ph, pw = cfg.video_dit.patch_size
        grid = (latents.shape[2] // pt, latents.shape[3] // ph,
                latents.shape[4] // pw)
        rope_pack = make_rope_pack(
            cfg.video_dit, cfg.audio_dit, cfg.bridge, grid,
            audio_latents.shape[2] // cfg.audio_dit.patch_size, video_fps)

    if ctx_len_pos is not None:
        ctx_len_pos = jnp.asarray(ctx_len_pos, jnp.int32).reshape(b)
    if ctx_len_neg is not None:
        ctx_len_neg = jnp.asarray(ctx_len_neg, jnp.int32).reshape(b)
    if use_cfg and cfg_batch:
        ctx_both = jnp.concatenate([ctx_pos, ctx_neg], axis=0)
        len_both = (jnp.concatenate([ctx_len_pos, ctx_len_neg])
                    if ctx_len_pos is not None and ctx_len_neg is not None
                    else None)

    def run(ctx, mi, al, tt, att, bridge_scale=None, ctx_len=None):
        return streamed_pass(
            video_periph, audio_periph, host_groups, specs, cfg,
            mi, al, ctx, tt, att, rope_pack,
            compute_dtype=compute_dtype, attn_impl=attn_impl,
            condition_scale=bridge_scale, ctx_valid_len=ctx_len,
            resident=resident)

    def run_multi(progs, mi, al, tt, att):
        # one staging sweep, several passes (pos/neg/dual share latents)
        return streamed_pass_multi(
            video_periph, audio_periph, host_groups, specs, cfg,
            mi, al, progs, tt, att, rope_pack,
            compute_dtype=compute_dtype, attn_impl=attn_impl,
            resident=resident)

    pair_t = plan.pair_timesteps
    sig_v, sig_a = plan.sigmas_visual, plan.sigmas_audio
    lat, alat = latents, audio_latents
    v_negc, a_negc = neg_cache if neg_cache is not None else (None, None)

    for i in range(start, stop):
        t = jnp.full((b,), float(pair_t[i, 0]), jnp.float32)
        at = jnp.full((b,), float(pair_t[i, 1]), jnp.float32)
        model_in = jnp.concatenate([lat, condition], axis=1)

        # compose this step's passes into ONE staging sweep (pos, neg on
        # refresh, dual-CFG) — they share latents/timestep, so the weight
        # restream is paid once instead of per pass
        dual_prog = {"context": ctx_pos, "ctx_valid_len": ctx_len_pos,
                     "condition_scale": 0.0}
        if not use_cfg:
            progs = [{"context": ctx_pos, "ctx_valid_len": ctx_len_pos,
                      "condition_scale": None}]
            if use_dual:
                progs.append(dual_prog)
            outs = run_multi(progs, model_in, alat, t, at)
            v, a = outs[0]
            v_pos = v_pred = v.astype(jnp.float32)
            a_pos = a_pred = a.astype(jnp.float32)
        elif cfg_batch:
            mi2 = jnp.concatenate([model_in, model_in], axis=0)
            al2 = jnp.concatenate([alat, alat], axis=0)
            v, a = run(ctx_both, mi2, al2, jnp.tile(t, 2), jnp.tile(at, 2),
                       ctx_len=len_both)
            v_pos, a_pos = v[:b].astype(jnp.float32), a[:b].astype(jnp.float32)
            v_pred, a_pred = _cfg_combine(
                (v_pos, a_pos),
                (v[b:].astype(jnp.float32), a[b:].astype(jnp.float32)),
                cfg_scale)
            if use_dual:
                vnb, anb = run(ctx_pos, model_in, alat, t, at,
                               bridge_scale=0.0, ctx_len=ctx_len_pos)
                outs = [(vnb, anb)]  # consumed by the shared dual tail
                progs = [dual_prog]
        else:
            # refresh cadence matches sampler.denoise_loop's predict_cached:
            # global-step modulus; the phase-start refresh falls out of the
            # empty cache (callers pass neg_cache=None at a tower switch)
            refresh = (v_negc is None or cfg_cache_interval <= 1
                       or i % cfg_cache_interval == 0)
            progs = [{"context": ctx_pos, "ctx_valid_len": ctx_len_pos,
                      "condition_scale": None}]
            if refresh:
                progs.append({"context": ctx_neg,
                              "ctx_valid_len": ctx_len_neg,
                              "condition_scale": None})
            if use_dual:
                progs.append(dual_prog)
            outs = run_multi(progs, model_in, alat, t, at)
            v, a = outs[0]
            v_pos, a_pos = v.astype(jnp.float32), a.astype(jnp.float32)
            if refresh:
                vn, an = outs[1]
                v_negc = vn.astype(jnp.float32)
                a_negc = an.astype(jnp.float32)
            v_pred, a_pred = _cfg_combine((v_pos, a_pos), (v_negc, a_negc),
                                          cfg_scale)
        if use_dual:
            vnb, anb = outs[len(progs) - 1]
            v_pred = v_pred + cfg_scale_bridge * (
                v_pos - vnb.astype(jnp.float32))
            a_pred = a_pred + cfg_scale_bridge * (
                a_pos - anb.astype(jnp.float32))

        lat, alat = _euler(lat, alat, v_pred, a_pred,
                           float(sig_v[i + 1] - sig_v[i]),
                           float(sig_a[i + 1] - sig_a[i]))
        if progress_fn is not None:
            progress_fn(i + 1, plan.num_steps)
    if return_neg_cache:
        return lat, alat, (v_negc, a_negc)
    return lat, alat
