"""Param-tree factory for the full MOVA pipeline (random init; real weights
come from convert/torch_import.py applied to the released checkpoints)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dualforce_tpu.config import MOVAConfig
from dualforce_tpu.models import audio_dit, bridge, dac_vae, umt5, video_dit, wan_vae


def init_pipeline_params(key, cfg: MOVAConfig, dtype=jnp.float32, *,
                         with_vaes: bool = True, with_text: bool = True,
                         two_video_towers: bool | None = None):
    if two_video_towers is None:
        two_video_towers = cfg.two_video_towers
    ks = jax.random.split(key, 7)
    params = {
        "video_dit": video_dit.init(ks[0], cfg.video_dit, dtype),
        "audio_dit": audio_dit.init(ks[2], cfg.audio_dit, dtype),
        "bridge": bridge.init(ks[3], cfg.bridge, dtype),
    }
    if two_video_towers:
        params["video_dit_2"] = video_dit.init(ks[1], cfg.video_dit, dtype)
    if with_vaes:
        params["video_vae"] = wan_vae.init(ks[4], cfg.video_vae)
        params["audio_vae"] = dac_vae.init(ks[5], cfg.audio_vae)
    if with_text:
        params["text_encoder"] = umt5.init(ks[6], cfg.text_encoder, dtype)
    return params
