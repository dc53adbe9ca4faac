"""Jit-compiled flow-matching denoise loop for the dual-tower model.

Behavioural reference: MOVA.__call__'s diffusion loop
(pipeline_mova.py:400-482): paired (visual, audio) timesteps, two-stage
high/low-noise expert switch at boundary_ratio*num_train_timesteps, text CFG
via a negative-prompt pass, per-modality `step_from_to` Euler updates on
independent sigma columns.

TPU-first differences:
  - the sigma schedule is static per generation config, so the boundary is a
    STATIC step index: the loop compiles as two `lax.fori_loop`s (one per
    expert) with no data-dependent branching on params;
  - per-step sigma deltas are gathered from precomputed tables (no host sync,
    no nearest-timestep search at runtime);
  - CFG runs either as a second pass (memory-lean, reference behavior) or
    batched along the batch axis in a single pass (`cfg_batch=True`, better
    MXU utilization — the reference's unimplemented `cfg_merge`);
  - DUAL CFG (`cfg_scale_bridge` = the paper's s_B; the reference accepts
    cfg_mode="dual" but raises NotImplementedError, pipeline_mova.py:461-462):
    a third pass with the cross-modal bridge disabled (condition_scale=0)
    yields a guidance direction toward cross-modal agreement:
        pred = neg + s_T*(pos - neg) + s_B*(pos - pos_nobridge)
    With s_B=0 this reduces exactly to text CFG.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dualforce_tpu.config import MOVAConfig
from dualforce_tpu.diffusion.flow_match import FlowMatchPairScheduler
from dualforce_tpu.diffusion.step import dual_tower_step


@dataclass(frozen=True)
class SamplePlan:
    """Static per-generation tables (host-side numpy)."""

    pair_timesteps: np.ndarray   # [N, 2] (visual, audio) timesteps
    sigmas_visual: np.ndarray    # [N+1] incl. terminal sigma
    sigmas_audio: np.ndarray     # [N+1]
    boundary_step: int           # first step index where visual t < boundary

    @property
    def num_steps(self) -> int:
        return self.pair_timesteps.shape[0]


def build_plan(
    scheduler: FlowMatchPairScheduler,
    boundary_ratio: float,
) -> SamplePlan:
    """Derive the static sampling plan from a configured scheduler."""
    pairs = scheduler.get_pairs("timesteps")
    sig_v, sig_a = scheduler.pair_sigma_columns()
    boundary = boundary_ratio * scheduler.num_train_timesteps
    below = np.nonzero(pairs[:, 0] < boundary)[0]
    boundary_step = int(below[0]) if len(below) else pairs.shape[0]
    return SamplePlan(
        pair_timesteps=pairs.astype(np.float32),
        sigmas_visual=sig_v, sigmas_audio=sig_a,
        boundary_step=boundary_step,
    )


def denoise_range(
    video_params,                # the ONE tower active in [start, stop)
    audio_params,
    bridge_params,
    cfg: MOVAConfig,
    latents: jnp.ndarray,        # [B, 16, F, H, W] fp32
    condition: jnp.ndarray,      # [B, 20, F, H, W] (4 mask + 16 cond latents)
    audio_latents: jnp.ndarray,  # [B, 128, T] fp32
    ctx_pos: jnp.ndarray,        # [B, 512, text_dim]
    ctx_neg: Optional[jnp.ndarray],
    plan: SamplePlan,
    start: int,
    stop: int,
    cfg_scale: float = 5.0,
    video_fps: float = 24.0,
    cfg_batch: bool = False,
    compute_dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    rope_pack=None,
    cfg_cache_interval: int = 1,
    cfg_scale_bridge: float = 0.0,
    sp_mesh=None,
    progress_fn=None,
    ctx_len_pos: Optional[jnp.ndarray] = None,
    ctx_len_neg: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Steps [start, stop) of the paired flow-match loop with a single video
    expert. The component-offload path runs the two expert phases as separate
    jitted calls so only one 14B tower is HBM-resident at a time (the
    reference's `remove_video_dit` / offload behavior, pipeline_mova.py:403-419)."""
    return denoise_loop(
        video_params, None, audio_params, bridge_params, cfg, latents,
        condition, audio_latents, ctx_pos, ctx_neg, plan,
        cfg_scale=cfg_scale, video_fps=video_fps, cfg_batch=cfg_batch,
        compute_dtype=compute_dtype, attn_impl=attn_impl, rope_pack=rope_pack,
        cfg_cache_interval=cfg_cache_interval,
        cfg_scale_bridge=cfg_scale_bridge, sp_mesh=sp_mesh,
        progress_fn=progress_fn, ctx_len_pos=ctx_len_pos,
        ctx_len_neg=ctx_len_neg, _range=(start, stop))


def denoise_loop(
    video_params_high,
    video_params_low,      # may be None (single-tower model)
    audio_params,
    bridge_params,
    cfg: MOVAConfig,
    latents: jnp.ndarray,        # [B, 16, F, H, W] fp32
    condition: jnp.ndarray,      # [B, 20, F, H, W] (4 mask + 16 cond latents)
    audio_latents: jnp.ndarray,  # [B, 128, T] fp32
    ctx_pos: jnp.ndarray,        # [B, 512, text_dim]
    ctx_neg: Optional[jnp.ndarray],
    plan: SamplePlan,
    cfg_scale: float = 5.0,
    video_fps: float = 24.0,
    cfg_batch: bool = False,
    compute_dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    rope_pack=None,
    cfg_cache_interval: int = 1,
    cfg_scale_bridge: float = 0.0,
    sp_mesh=None,
    progress_fn=None,
    ctx_len_pos: Optional[jnp.ndarray] = None,
    ctx_len_neg: Optional[jnp.ndarray] = None,
    _range: Optional[Tuple[int, int]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """progress_fn(step, total): host callback fired per denoise step from
    INSIDE the compiled loop (jax.debug.callback — async, no device sync);
    the serving layer surfaces it as task progress. Must be a stable
    function object: it is baked into the traced program.

    ctx_len_pos/ctx_len_neg: optional [B] int32 per-item valid context
    lengths. When given, cross-attention masks KV beyond each length via the
    kernel's per-batch kv mask instead of attending to zero-pads. OPT-IN
    deviation from the reference (which attends the zero-padded 512,
    wan_video_dit.py:232-245); pipeline flag mask_ctx_pad wires it."""
    pair_t = jnp.asarray(plan.pair_timesteps)     # [N, 2]
    sig_v = jnp.asarray(plan.sigmas_visual)       # [N+1]
    sig_a = jnp.asarray(plan.sigmas_audio)
    use_cfg = (cfg_scale != 1.0) and (ctx_neg is not None)
    use_dual = cfg_scale_bridge != 0.0
    b = latents.shape[0]
    cache_neg = use_cfg and cfg_cache_interval > 1
    if cache_neg and cfg_batch:
        raise ValueError("cfg_cache_interval > 1 requires cfg_batch=False "
                         "(the cache replaces the second pass entirely)")

    if ctx_len_pos is not None:
        ctx_len_pos = ctx_len_pos.astype(jnp.int32).reshape(b)
    if ctx_len_neg is not None:
        ctx_len_neg = ctx_len_neg.astype(jnp.int32).reshape(b)
    if use_cfg and cfg_batch:
        ctx_both = jnp.concatenate([ctx_pos, ctx_neg], axis=0)
        len_both = (jnp.concatenate([ctx_len_pos, ctx_len_neg])
                    if ctx_len_pos is not None and ctx_len_neg is not None
                    else None)

    def run_tower(video_params, ctx, mi, al, tt, att, bridge_scale=None,
                  ctx_len=None):
        return dual_tower_step(
            video_params, audio_params, bridge_params,
            cfg.video_dit, cfg.audio_dit, cfg.bridge,
            mi, al, ctx, tt, att,
            video_fps=video_fps, compute_dtype=compute_dtype,
            attn_impl=attn_impl, rope_pack=rope_pack,
            condition_scale=bridge_scale, sp_mesh=sp_mesh,
            ctx_valid_len=ctx_len)

    def bridge_guidance(video_params, model_in, alat, t, at, v_pos, a_pos):
        """s_B * (pos - pos_with_bridge_off): the direction the bridge pulls
        each modality, amplified — guidance toward cross-modal agreement."""
        v_nb, a_nb = run_tower(video_params, ctx_pos, model_in, alat, t, at,
                               bridge_scale=0.0, ctx_len=ctx_len_pos)
        return (cfg_scale_bridge * (v_pos - v_nb.astype(jnp.float32)),
                cfg_scale_bridge * (a_pos - a_nb.astype(jnp.float32)))

    def predict(video_params, lat, alat, t, at):
        model_in = jnp.concatenate([lat, condition], axis=1)
        if not use_cfg:
            v, a = run_tower(video_params, ctx_pos, model_in, alat, t, at,
                             ctx_len=ctx_len_pos)
            v_pos, a_pos = v.astype(jnp.float32), a.astype(jnp.float32)
            v_pred, a_pred = v_pos, a_pos
        else:
            if cfg_batch:
                mi2 = jnp.concatenate([model_in, model_in], axis=0)
                al2 = jnp.concatenate([alat, alat], axis=0)
                v, a = run_tower(video_params, ctx_both, mi2, al2,
                                 jnp.tile(t, 2), jnp.tile(at, 2),
                                 ctx_len=len_both)
                v_pos, v_neg = v[:b].astype(jnp.float32), v[b:].astype(jnp.float32)
                a_pos, a_neg = a[:b].astype(jnp.float32), a[b:].astype(jnp.float32)
            else:
                v_pos, a_pos = run_tower(video_params, ctx_pos, model_in, alat,
                                         t, at, ctx_len=ctx_len_pos)
                v_neg, a_neg = run_tower(video_params, ctx_neg, model_in, alat,
                                         t, at, ctx_len=ctx_len_neg)
                v_pos, a_pos = v_pos.astype(jnp.float32), a_pos.astype(jnp.float32)
                v_neg, a_neg = v_neg.astype(jnp.float32), a_neg.astype(jnp.float32)
            v_pred = v_neg + cfg_scale * (v_pos - v_neg)
            a_pred = a_neg + cfg_scale * (a_pos - a_neg)
        if use_dual:
            v_g, a_g = bridge_guidance(video_params, model_in, alat, t, at,
                                       v_pos, a_pos)
            v_pred, a_pred = v_pred + v_g, a_pred + a_g
        return v_pred, a_pred

    def predict_cached(video_params, lat, alat, t, at, i, phase_start,
                       v_negc, a_negc):
        """CFG with a cached negative pass: the unconditional prediction
        varies smoothly along the trajectory, so recompute it only every
        `cfg_cache_interval` steps and reuse in between — cuts per-step
        compute toward 1 pass instead of 2 (serving accelerator; the
        positive pass always runs)."""
        model_in = jnp.concatenate([lat, condition], axis=1)
        v_pos, a_pos = run_tower(video_params, ctx_pos, model_in, alat, t, at,
                                 ctx_len=ctx_len_pos)
        v_pos, a_pos = v_pos.astype(jnp.float32), a_pos.astype(jnp.float32)

        refresh = jnp.logical_or(i % cfg_cache_interval == 0, i == phase_start)

        def compute_neg(_):
            v, a = run_tower(video_params, ctx_neg, model_in, alat, t, at,
                             ctx_len=ctx_len_neg)
            return v.astype(jnp.float32), a.astype(jnp.float32)

        v_neg, a_neg = jax.lax.cond(
            refresh, compute_neg, lambda _: (v_negc, a_negc), None)
        v_pred = v_neg + cfg_scale * (v_pos - v_neg)
        a_pred = a_neg + cfg_scale * (a_pos - a_neg)
        if use_dual:
            v_g, a_g = bridge_guidance(video_params, model_in, alat, t, at,
                                       v_pos, a_pos)
            v_pred, a_pred = v_pred + v_g, a_pred + a_g
        return v_pred, a_pred, v_neg, a_neg

    def make_body(video_params, phase_start):
        def body(i, carry):
            # the negative-cache buffers exist in the carry ONLY when the
            # cache is on — otherwise two latents-sized dead buffers would
            # ride through the whole loop
            if cache_neg:
                lat, alat, v_negc, a_negc = carry
            else:
                lat, alat = carry
            t = jnp.full((b,), pair_t[i, 0], jnp.float32)
            at = jnp.full((b,), pair_t[i, 1], jnp.float32)
            if cache_neg:
                v_pred, a_pred, v_negc, a_negc = predict_cached(
                    video_params, lat, alat, t, at, i, phase_start,
                    v_negc, a_negc)
            else:
                v_pred, a_pred = predict(video_params, lat, alat, t, at)
            lat = lat + v_pred * (sig_v[i + 1] - sig_v[i])
            alat = alat + a_pred * (sig_a[i + 1] - sig_a[i])
            if progress_fn is not None:
                jax.debug.callback(progress_fn, i + 1, plan.num_steps)
            return ((lat, alat, v_negc, a_negc) if cache_neg else (lat, alat))

        return body

    carry = (latents, audio_latents)
    if cache_neg:
        carry = carry + (jnp.zeros_like(latents), jnp.zeros_like(audio_latents))
    if _range is not None:
        start, stop = _range
        if stop > start:
            carry = jax.lax.fori_loop(start, stop,
                                      make_body(video_params_high, start), carry)
        return carry[0], carry[1]
    n = plan.num_steps
    split = plan.boundary_step if video_params_low is not None else n
    if split > 0:
        carry = jax.lax.fori_loop(0, split, make_body(video_params_high, 0), carry)
    if split < n:
        # the cached negative came from the OTHER expert; force a refresh
        carry = jax.lax.fori_loop(split, n,
                                  make_body(video_params_low, split), carry)
    return carry[0], carry[1]

