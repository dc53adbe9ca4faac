"""LoRA trainer.

Behavioural reference: AccelerateTrainer (accelerate_trainer.py:136-533) and
LowResourceTrainer (low_resource_trainer.py:94-479). One trainer covers both
roles here: the mesh decides the regime (single chip == "low resource" — no
offload hacks needed since weights are bf16 HBM-resident; multi-chip ==
FSDP×CP via GSPMD shardings on the same code path).

Loop: alternate high/low-noise experts per global step
(mova_train.py:1390-1417), accumulate, clip, step, log, checkpoint with
auto-resume.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dualforce_tpu.config import MOVAConfig
from dualforce_tpu.diffusion.flow_match import FlowMatchPairScheduler
from dualforce_tpu.diffusion.training import (
    TrainTables,
    build_train_tables,
    encode_batch,
    make_lora_train_step,
)
from dualforce_tpu.engine import lora as lora_mod
from dualforce_tpu.engine.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)
from dualforce_tpu.engine.logging import build_logger
from dualforce_tpu.engine.optim import adamw, warmup_schedule  # noqa: F401 (registers)
from dualforce_tpu.registry import OPTIMIZERS


@dataclass
class TrainerConfig:
    lr: float = 1e-4
    weight_decay: float = 1e-2
    betas: tuple = (0.9, 0.999)
    max_grad_norm: float = 1.0
    warmup_steps: int = 100
    max_steps: int = 1000
    lr_schedule: str = "cosine"
    lora_rank: int = 16
    lora_alpha: float = 16.0
    log_interval: int = 10
    save_interval: int = 500
    save_dir: str = "./checkpoints"
    logger: str = "tensorboard"
    seed: int = 0
    video_fps: float = 24.0
    remat: bool = True
    compute_dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"
    optimizer: str = "AdamW"   # OPTIMIZERS registry name (e.g. "AdamW8bit")


class LoRATrainer:
    def __init__(self, cfg: MOVAConfig, params: Dict[str, Any],
                 tcfg: TrainerConfig, is_main: bool = True):
        self.cfg = cfg
        self.params = params
        self.tcfg = tcfg
        self.scheduler = FlowMatchPairScheduler(cfg.scheduler)
        self.scheduler.set_timesteps(cfg.scheduler.num_train_timesteps, training=True)
        self.tables = build_train_tables(self.scheduler, cfg.boundary_ratio)

        key = jax.random.PRNGKey(tcfg.seed)
        self.rng, k_lora = jax.random.split(key)
        self.lora = lora_mod.init_pipeline_lora(k_lora, params, rank=tcfg.lora_rank)

        schedule = warmup_schedule(tcfg.lr, tcfg.warmup_steps, tcfg.max_steps,
                                   tcfg.lr_schedule)
        self._schedule = schedule
        # registry dispatch: "AdamW" (default) or "AdamW8bit" (block-wise
        # int8 moments, the bnb low-resource setup) — trainer.optimizer in
        # configs (accelerate_train.py's OPTIMIZERS registry equivalent)
        opt_factory = OPTIMIZERS.get(tcfg.optimizer)
        opt_kwargs = dict(lr=tcfg.lr, betas=tcfg.betas,
                          weight_decay=tcfg.weight_decay,
                          max_grad_norm=tcfg.max_grad_norm, schedule=schedule)
        try:
            self.optimizer = opt_factory(**opt_kwargs)
        except TypeError:
            # non-Adam-family optimizers (SGD, RMSprop, ...) reject `betas`
            # like torch.optim does; retry without it
            opt_kwargs.pop("betas")
            self.optimizer = opt_factory(**opt_kwargs)
        self.opt_state = self.optimizer.init(self.lora)
        self.global_step = 0
        self.logger = build_logger(tcfg.logger, tcfg.save_dir, is_main)
        self._step_fn = make_lora_train_step(
            cfg, self.tables, self.optimizer, lora_alpha=tcfg.lora_alpha,
            video_fps=tcfg.video_fps, compute_dtype=tcfg.compute_dtype,
            remat=tcfg.remat, attn_impl=tcfg.attn_impl)

        self._maybe_resume()

    # --- checkpointing ------------------------------------------------------
    def _state(self):
        return {"lora": self.lora, "opt_state": self.opt_state, "rng": self.rng}

    def _maybe_resume(self):
        step = latest_step(self.tcfg.save_dir)
        if step is None:
            return
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), self._state())
        state, meta = restore_checkpoint(self.tcfg.save_dir, abstract, step)
        self.lora, self.opt_state, self.rng = (
            state["lora"], state["opt_state"], state["rng"])
        self.global_step = meta["global_step"]
        print(f"[trainer] resumed from step {self.global_step}")

    def save(self):
        save_checkpoint(self.tcfg.save_dir, self.global_step, self._state())
        lora_mod.save_lora(
            jax.tree.map(np.asarray, self.lora),
            f"{self.tcfg.save_dir}/step-{self.global_step}/lora_weights.npz"
            .replace(".npz", ""),
            alpha=self.tcfg.lora_alpha, rank=self.tcfg.lora_rank)

    def _rope_pack(self, encoded):
        from dualforce_tpu.diffusion.step import make_rope_pack

        vl = encoded["video_latents"]
        pt, ph, pw = self.cfg.video_dit.patch_size
        grid = (vl.shape[2] // pt, vl.shape[3] // ph, vl.shape[4] // pw)
        f = encoded["audio_latents"].shape[2] // self.cfg.audio_dit.patch_size
        # memoize per geometry: the tables are ~90 MB at 360p and the dataset
        # emits fixed-geometry clips — rebuilding + re-uploading per step
        # would tax the hot loop for nothing
        cache = getattr(self, "_rope_cache", None)
        if cache is None:
            cache = self._rope_cache = {}
        key = (grid, f)
        if key not in cache:
            cache[key] = make_rope_pack(self.cfg.video_dit, self.cfg.audio_dit,
                                        self.cfg.bridge, grid, f,
                                        self.tcfg.video_fps)
        return cache[key]

    # --- training loop ------------------------------------------------------
    def train(self, data_iter: Iterable[Dict[str, Any]]):
        t0 = time.time()
        for batch in data_iter:
            if self.global_step >= self.tcfg.max_steps:
                break
            expert = self.global_step % 2
            if "video_dit_2" not in self.params:
                expert = 0
            encoded = encode_batch(self.params, self.cfg, batch,
                                   compute_dtype=self.tcfg.compute_dtype)
            rope_pack = self._rope_pack(encoded)
            self.rng, step_key = jax.random.split(self.rng)
            self.lora, self.opt_state, metrics = self._step_fn(
                self.lora, self.opt_state, self.params, encoded, step_key, expert,
                rope_pack)
            self.global_step += 1

            if self.global_step % self.tcfg.log_interval == 0:
                m = {k: float(v) for k, v in metrics.items()}
                m["lr"] = float(self._schedule(self.global_step))
                m["step_time"] = (time.time() - t0) / self.tcfg.log_interval
                t0 = time.time()
                self.logger.log_scalars(m, self.global_step)
            if self.global_step % self.tcfg.save_interval == 0:
                self.save()
        self.save()
        return self.global_step
