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
from dataclasses import dataclass
from typing import Any, Dict, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from dualforce_tpu.config import MOVAConfig
from dualforce_tpu.diffusion.flow_match import FlowMatchPairScheduler
from dualforce_tpu.diffusion.training import (
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
    # with remat: save flash-attention residuals (q,k,v,o,lse) across the
    # jax.checkpoint boundary instead of re-running the O(L^2) fwd kernel in
    # the backward — trades ~5*S*D bf16 per layer of HBM for the recompute
    remat_save_attention: bool = False
    compute_dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"
    optimizer: str = "AdamW"   # OPTIMIZERS registry name (e.g. "AdamW8bit")
    # "lora" (both reference trainers' shipped regime) or "full" — full
    # fine-tune of whole module subtrees (mova_train.py:1452-1514)
    mode: str = "lora"
    trainable_modules: tuple = ("video_dit", "video_dit_2", "audio_dit", "bridge")
    # gradient accumulation: k micro-batches per optimizer step (counterpart
    # of accelerator.accumulate / the low-resource manual loop)
    grad_accum_steps: int = 1
    # "component" = host-staged frozen base weights (the low-resource
    # trainer's FP8-CPU-offload niche, low_resource_trainer.py:228-251 /
    # mova_train.py:190-827): base params live in host RAM (store them fp8
    # by loading with --weight_dtype fp8), only the ACTIVE expert + audio +
    # bridge are HBM-resident, encoders are staged per encode and freed.
    # The two 14B experts never coexist on device.
    offload: str = "none"
    # with offload: re-stage the other 14B expert only every K optimizer
    # steps instead of per step (amortizes the host->HBM transfer; K=1 is
    # exact reference parity of the per-step alternation)
    expert_switch_interval: int = 1
    # SD3 timestep-density sampling (mova_train.py TimestepConfig):
    # "uniform" (the reference trainer's shipped setting) | "logit_normal" | "mode"
    weighting_scheme: str = "uniform"
    logit_mean: float = 0.0
    logit_std: float = 1.0
    mode_scale: float = 1.0


class LoRATrainer:
    def __init__(self, cfg: MOVAConfig, params: Dict[str, Any],
                 tcfg: TrainerConfig, is_main: bool = True, mesh=None):
        """mesh: optional (data, fsdp, cp) Mesh — enables the multi-chip
        regime: LoRA/optimizer state fsdp-sharded, batch sharded over `data`,
        the block stack sequence-parallel over `cp` (parallel/sp.py) and
        activation hints opened around the traced step. Single-chip (None)
        is the low-resource regime."""
        self.cfg = cfg
        self.params = params
        self.tcfg = tcfg
        self.mesh = mesh
        self.scheduler = FlowMatchPairScheduler(cfg.scheduler)
        self.scheduler.set_timesteps(cfg.scheduler.num_train_timesteps, training=True)
        self.tables = build_train_tables(self.scheduler, cfg.boundary_ratio)

        if tcfg.mode not in ("lora", "full"):
            raise ValueError(f"unknown trainer mode {tcfg.mode!r}")
        if tcfg.offload not in ("none", "component"):
            raise ValueError(f"unknown trainer offload {tcfg.offload!r}")
        if tcfg.offload == "component":
            if mesh is not None:
                raise ValueError("offload='component' is the single-chip "
                                 "low-resource regime; use the fsdp mesh "
                                 "axis to shard across chips instead")
            if tcfg.mode == "full":
                raise ValueError("offload='component' trains LoRA only "
                                 "(full-FT params must be device-resident "
                                 "for the optimizer)")
            # base params live on host; modules are staged to HBM per phase
            self.params = params = jax.tree.map(np.asarray, params)
            self._device_cache: Dict[str, Any] = {}
        key = jax.random.PRNGKey(tcfg.seed)
        self.rng, k_lora = jax.random.split(key)
        if tcfg.mode == "full":
            # trainable = whole module subtrees; the frozen remainder stays
            # in self.params (encoders for encode_batch + anything untrained)
            self.lora = {m: params[m] for m in tcfg.trainable_modules
                         if m in params}
            self.params = {k: v for k, v in params.items()
                           if k not in self.lora}
        else:
            self.lora = lora_mod.init_pipeline_lora(k_lora, params,
                                                    rank=tcfg.lora_rank)
        if mesh is not None:
            from dualforce_tpu.parallel.sharding import shard_params

            self.lora = shard_params(self.lora, mesh)

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

        from dualforce_tpu.diffusion.training import TimestepConfig
        tconf = TimestepConfig(weighting_scheme=tcfg.weighting_scheme,
                               logit_mean=tcfg.logit_mean,
                               logit_std=tcfg.logit_std,
                               mode_scale=tcfg.mode_scale)
        sp_mesh = hints = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            if mesh.shape.get("cp", 1) > 1:
                sp_mesh = mesh
            tok = NamedSharding(mesh, P("data", "cp", None))
            hints = dict(video_tokens=tok, audio_tokens=tok)
        from dualforce_tpu.ops.flash_attention import remat_save_attention

        # trace-time switch: must be set before the step fns are traced
        remat_save_attention(tcfg.remat_save_attention)
        step_kwargs = dict(lora_alpha=tcfg.lora_alpha,
                           video_fps=tcfg.video_fps,
                           compute_dtype=tcfg.compute_dtype, remat=tcfg.remat,
                           attn_impl=tcfg.attn_impl, sp_mesh=sp_mesh,
                           hints=hints, timestep_config=tconf)
        if tcfg.mode == "full":
            from dualforce_tpu.diffusion.training import (
                make_full_ft_accum_fns, make_full_ft_step)

            step_kwargs.pop("lora_alpha")
            if tcfg.grad_accum_steps > 1:
                self._grad_fn, self._accum_fn, self._apply_fn = \
                    make_full_ft_accum_fns(cfg, self.tables, self.optimizer,
                                           tcfg.grad_accum_steps,
                                           **step_kwargs)
                self._step_fn = None
            else:
                self._step_fn = make_full_ft_step(
                    cfg, self.tables, self.optimizer, **step_kwargs)
        elif tcfg.grad_accum_steps > 1:
            from dualforce_tpu.diffusion.training import make_lora_accum_fns

            self._grad_fn, self._accum_fn, self._apply_fn = make_lora_accum_fns(
                cfg, self.tables, self.optimizer, tcfg.grad_accum_steps,
                **step_kwargs)
            self._step_fn = None
        else:
            self._step_fn = make_lora_train_step(
                cfg, self.tables, self.optimizer, **step_kwargs)

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
        step_dir = f"{self.tcfg.save_dir}/step-{self.global_step}"
        if self.tcfg.mode == "full":
            # per-module HF-layout export (accelerate_trainer.py:473-513):
            # trained weights load back through load_pipeline_params AND into
            # the torch reference
            from dualforce_tpu.config import MOVAConfig  # noqa: F401
            from dualforce_tpu.convert.torch_export import \
                export_trained_modules

            export_trained_modules(
                jax.tree.map(np.asarray, self.lora), self.cfg, step_dir)
        else:
            lora_np = jax.tree.map(np.asarray, self.lora)
            lora_mod.save_lora(
                lora_np, f"{step_dir}/lora_weights.npz".replace(".npz", ""),
                alpha=self.tcfg.lora_alpha, rank=self.tcfg.lora_rank)
            # also write the reference's torch on-disk format so LoRAs trained
            # here round-trip into the torch ecosystem
            # (lora_utils.py:259-308; re-importable via convert/lora_import.py).
            # torch is optional at train time — the npz above is the canonical
            # artifact; never let a missing torch abort a training run at its
            # first checkpoint
            try:
                from dualforce_tpu.convert.lora_export import \
                    save_reference_lora

                save_reference_lora(lora_np, self.cfg, step_dir,
                                    alpha=self.tcfg.lora_alpha,
                                    rank=self.tcfg.lora_rank)
            except ImportError as e:
                print(f"[trainer] torch-format LoRA export skipped ({e}); "
                      f"npz checkpoint written")

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

    # --- component staging (offload mode) -----------------------------------
    def _stage(self, *names):
        out = {}
        for n in names:
            if self.params.get(n) is None:
                continue
            if n not in self._device_cache:
                self._device_cache[n] = jax.device_put(self.params[n])
            out[n] = self._device_cache[n]
        return out

    def _evict(self, *names):
        for n in names:
            tree = self._device_cache.pop(n, None)
            if tree is not None:
                for leaf in jax.tree.leaves(tree):
                    if hasattr(leaf, "delete"):
                        leaf.delete()

    def _encode(self, batch):
        if self.mesh is not None:
            from dualforce_tpu.parallel.sharding import shard_batch

            batch = shard_batch(batch, self.mesh)
        if self.tcfg.offload == "component":
            enc = self._stage("text_encoder", "video_vae", "audio_vae")
            try:
                return encode_batch({**self.params, **enc}, self.cfg, batch,
                                    compute_dtype=self.tcfg.compute_dtype)
            finally:
                self._evict("text_encoder", "video_vae", "audio_vae")
        return encode_batch(self.params, self.cfg, batch,
                            compute_dtype=self.tcfg.compute_dtype)

    # --- training loop ------------------------------------------------------
    def train(self, data_iter: Iterable[Dict[str, Any]]):
        t0 = time.time()
        accum = max(self.tcfg.grad_accum_steps, 1)
        grad_acc = None
        micro = 0
        for batch in data_iter:
            if self.global_step >= self.tcfg.max_steps:
                break
            # expert alternates per MICRO-batch, matching the reference whose
            # global_step advances once per training_step call even inside an
            # accumulate window (accelerate_trainer.py:393-431) — so with
            # accumulation BOTH experts collect grads within one window.
            # In offload mode the alternation period is expert_switch_interval
            # optimizer steps instead, so the 14B host->HBM restage amortizes.
            if self.tcfg.offload == "component":
                period = max(self.tcfg.expert_switch_interval, 1)
                expert = (self.global_step // period) % 2
            else:
                expert = (self.global_step * accum + micro) % 2
            if ("video_dit_2" not in self.params
                    and "video_dit_2" not in self.lora):  # full-FT keeps
                expert = 0                                # towers in lora
            encoded = self._encode(batch)
            rope_pack = self._rope_pack(encoded)
            self.rng, step_key = jax.random.split(self.rng)

            if self.tcfg.offload == "component":
                tower = "video_dit" if expert == 0 else "video_dit_2"
                other = "video_dit_2" if expert == 0 else "video_dit"
                self._evict(other)  # the two experts never coexist on device
                step_params = self._stage(tower, "audio_dit", "bridge")
            else:
                step_params = self.params

            if accum > 1:
                grads, metrics = self._grad_fn(
                    self.lora, step_params, encoded, step_key, expert, rope_pack)
                if grad_acc is None:
                    grad_acc = jax.tree.map(
                        lambda g: jnp.zeros_like(g), grads)
                grad_acc = self._accum_fn(grad_acc, grads)
                micro += 1
                if micro < accum:
                    continue
                self.lora, self.opt_state, gnorm = self._apply_fn(
                    self.lora, self.opt_state, grad_acc)
                metrics = {**metrics, "grad_norm": gnorm}
                grad_acc, micro = None, 0
            else:
                self.lora, self.opt_state, metrics = self._step_fn(
                    self.lora, self.opt_state, step_params, encoded, step_key,
                    expert, rope_pack)
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
