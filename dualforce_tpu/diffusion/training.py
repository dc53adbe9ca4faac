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


def sample_timestep_id(key, tables: TrainTables, expert: int) -> jnp.ndarray:
    """Uniform id in the expert's boundary range (mova_train.py:1380-1399;
    expert 0 = high-noise ids [0, boundary_id), expert 1 = [boundary_id, N)).

    Degenerate boundaries (boundary_id 0 or N — one expert's range empty)
    clamp to the nearest valid id, like the reference's clamp-with-warning."""
    n = len(tables.timesteps_visual)
    if expert == 0:
        lo, hi = 0, max(tables.boundary_id, 1)
    else:
        lo, hi = min(tables.boundary_id, n - 1), n
    return jax.random.randint(key, (), lo, hi)


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

    video_latents = wan_vae.encode_mode(params["video_vae"], vcfg, video)
    video_latents = wan_vae.normalize_latents(video_latents, vcfg)
    video_latents = jnp.transpose(video_latents, (0, 4, 1, 2, 3))  # [B,16,F,h,w]

    first = jnp.concatenate(
        [video[:, :1], jnp.zeros_like(video[:, 1:])], axis=1)
    y = wan_vae.encode_mode(params["video_vae"], vcfg, first)
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
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Loss for one step. Differentiate wrt `trainable_lora` (LoRA mode) or
    `full_finetune_params` (full-FT mode, merged over `params`)."""
    k_t, k_vn, k_an = jax.random.split(rng, 3)

    if trainable_lora is not None:
        eff = lora_mod.merge_pipeline_lora(params, trainable_lora, alpha=lora_alpha)
    elif full_finetune_params is not None:
        eff = {**params, **full_finetune_params}
    else:
        eff = params

    tid = sample_timestep_id(k_t, tables, expert)
    t_vis = jnp.asarray(tables.timesteps_visual)[tid]
    t_aud = jnp.asarray(tables.timesteps_audio)[tid]
    sig_vis = jnp.asarray(tables.sigmas_visual)[tid]
    sig_aud = jnp.asarray(tables.sigmas_audio)[tid]

    x_v = encoded["video_latents"]
    x_a = encoded["audio_latents"]
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
        attn_impl=attn_impl, remat=remat, rope_pack=rope_pack)

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
                         attn_impl: str = "auto"):
    """Returns jitted (lora, opt_state, params, encoded, rng) -> updated, one
    compiled variant per static expert index."""

    @partial(jax.jit, static_argnums=(5,), donate_argnums=(0, 1))
    def step(lora, opt_state, params, encoded, rng, expert, rope_pack=None):
        (loss, metrics), grads = jax.value_and_grad(
            training_loss, has_aux=True)(
                lora, params, cfg, tables, encoded, rng, expert,
                lora_alpha=lora_alpha, video_fps=video_fps,
                compute_dtype=compute_dtype, remat=remat, attn_impl=attn_impl,
                rope_pack=rope_pack)
        updates, opt_state = optimizer.update(grads, opt_state, lora)
        import optax

        lora = optax.apply_updates(lora, updates)
        metrics = {**metrics, "loss": loss,
                   "grad_norm": optax.global_norm(grads)}
        return lora, opt_state, metrics

    return step
