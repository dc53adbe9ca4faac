"""MOVA TI2VA inference pipeline — TPU-native.

Behavioural reference: MOVA.__call__ (pipeline_mova.py:321-494): prompt clean
-> UMT5 embed (pad to 512) -> prepare video latents (first-frame VAE encode +
4-channel temporal mask) -> prepare audio latents -> paired flow-match denoise
loop with two-expert switch + text CFG -> bf16 video VAE decode + fp32 DAC
decode.

Differences (TPU-first): the whole denoise loop is ONE jitted XLA program
(diffusion/sampler.py); weights live HBM-resident (optionally GSPMD-sharded)
instead of CPU-offloaded; generation geometry is static per (H, W, frames)
bucket so recompiles only happen per bucket.
"""

from __future__ import annotations

import contextlib
import html
import re
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dualforce_tpu.config import MOVAConfig
from dualforce_tpu.diffusion.flow_match import FlowMatchPairScheduler
from dualforce_tpu.diffusion.sampler import (SamplePlan, build_plan,
                                             denoise_loop, denoise_range)
from dualforce_tpu.diffusion.step import make_rope_pack
from dualforce_tpu.models import dac_vae, umt5, wan_vae
from dualforce_tpu.registry import DIFFUSION_PIPELINES


def basic_clean(text: str) -> str:
    try:
        import ftfy  # optional; not in this image

        text = ftfy.fix_text(text)
    except ImportError:
        pass
    return html.unescape(html.unescape(text)).strip()


def prompt_clean(text: str) -> str:
    return re.sub(r"\s+", " ", basic_clean(text)).strip()


def _arg_sig(args) -> Tuple:
    """Shape/dtype signature of a call's array leaves (warmup dispatch key)."""
    return tuple((tuple(x.shape), str(x.dtype))
                 for x in jax.tree.leaves(args) if hasattr(x, "shape"))


@dataclass
class GenerationResult:
    video: np.ndarray   # [T, H, W, 3] uint8
    audio: np.ndarray   # [S] float32 in [-1, 1]
    sample_rate: int
    fps: float


@DIFFUSION_PIPELINES.register_module(name="MOVAPipeline")
class MOVAPipeline:
    """Holds params + configs; drives tokenization, encode, denoise, decode.

    params keys: video_dit, video_dit_2 (optional), audio_dit, bridge,
    video_vae, audio_vae, text_encoder.
    """

    def __init__(self, cfg: MOVAConfig, params: Dict[str, Any], tokenizer=None,
                 compute_dtype=jnp.bfloat16, attn_impl: str = "auto",
                 offload: str = "none", mesh=None, quantize: str = "none",
                 mask_ctx_pad: bool = False, offload_group_size: int = 8,
                 offload_resident_small: bool = False,
                 offload_resident_video_groups: int = 0,
                 vae_encode_dtype: Optional[str] = None):
        """offload: "none" (weights HBM-resident, the TPU-native default),
        "component" — the escape hatch for chips whose HBM can't hold the
        full pipeline (reference's enable_model_cpu_offload +
        remove_video_dit, inference_single.py:81-97): params stay on host,
        each module is staged to HBM for its phase and freed after, and the
        two video experts are never device-resident simultaneously —
        or "group": layerwise group streaming (the reference's `--offload
        group`, README "Layerwise (group offload)" 12 GB-VRAM row). Beyond
        component offload, the ACTIVE tower's blocks also stay in host RAM;
        each denoise pass streams them through HBM `offload_group_size`
        layers at a time, double-buffered (diffusion/streamed.py). This is
        what fits flagship 720p inference on one 16 GB v5e: weights alone
        (14 GB fp8) leave no room for 176k-token activations.

        quantize: "none", "int8" or "int4". int8 pre-quantizes the
        DiT/bridge projection kernels (w8a8 on the MXU, per-out-channel
        weight scales + dynamic per-token activation scales;
        nn.quantize_tree_int8) — a compute win. int4 packs the same kernels
        to 0.5 byte/param with grouped scales and dequantizes at use
        (nn.quantize_tree_int4) — an HBM win that makes a 14.3B video
        tower fully resident on one 16 GB v5e (offload="component" then
        bulk-stages towers instead of group-streaming layers). Lossy and
        inference-only, like attn_impl="sage" — they compose; VAEs, text
        encoder, norms, modulation and heads stay full precision."""
        if quantize not in ("none", "int8", "int4"):
            raise ValueError(f"unknown quantize mode {quantize!r}")
        if quantize in ("int8", "int4"):
            from dualforce_tpu import nn as _nn

            # int8: w8a8 MXU serving mode (compute win). int4: packed
            # weights-only storage (HBM win — a 14.3B video tower fits
            # fully resident in ~7.2 GB; see nn.quantize_linear_int4)
            qfn = (_nn.quantize_tree_int8 if quantize == "int8"
                   else _nn.quantize_tree_int4)
            towers = {k for k in ("video_dit", "video_dit_2", "audio_dit",
                                  "bridge") if params.get(k) is not None}
            if offload != "none":
                # Quantize one tower at a time and pull it straight to host:
                # quantizing everything first would hold every expert's
                # quantized kernels in HBM simultaneously — the exact peak
                # component offload exists to avoid.
                out = dict(params)
                for k in towers:
                    q = qfn(params[k])
                    out[k] = jax.tree.map(
                        lambda x: np.asarray(jax.device_get(x)), q)
                    del q  # frees this tower's device buffers before the next
                params = out
            else:
                params = {k: (qfn(v) if k in towers else v)
                          for k, v in params.items()}
        self.quantize = quantize
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.compute_dtype = compute_dtype
        self.attn_impl = attn_impl
        if offload not in ("none", "component", "group"):
            raise ValueError(f"unknown offload mode {offload!r}")
        self.offload = offload
        self.offload_group_size = int(offload_group_size)
        # group mode: keep the ~4 GB audio tower + bridge HBM-resident and
        # stream only the active video tower (cuts per-pass host->HBM bytes
        # ~22%; needs the extra HBM headroom, so opt-in)
        self.offload_resident_small = bool(offload_resident_small)
        # group mode: additionally pin the first K video layer groups in
        # HBM across passes (partial residency — zero h2d for those groups
        # after the first pass; size K to spare HBM)
        self.offload_resident_video_groups = int(offload_resident_video_groups)
        # vae_encode_dtype: run the streaming VAE encoder in bf16 ("bf16") —
        # required at 720p where the minimum-chunk f32 encode needs ~18 GB
        # HBM (measured); None/"fp32" keeps the checkpoint's f32 for exact
        # reference parity. Conditioning tolerance is far above bf16 noise.
        _dt = {None: None, "fp32": None, "f32": None, "float32": None,
               "bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16}
        if vae_encode_dtype not in _dt:
            raise ValueError(f"unknown vae_encode_dtype {vae_encode_dtype!r}")
        self.vae_encode_dtype = _dt[vae_encode_dtype]
        if offload == "group" and mesh is not None and \
                getattr(mesh, "shape", {}).get("cp", 1) > 1:
            raise ValueError("offload='group' is a single-chip escape hatch; "
                             "use cp/fsdp sharding instead of offload on a "
                             "multi-chip mesh")
        # mask_ctx_pad: cross-attend only each prompt's valid tokens via the
        # kernel's per-batch kv mask instead of the reference's attend-the-
        # zero-pads semantics (wan_video_dit.py:232-245). OPT-IN: changes
        # numerics vs the reference (typically helpful for near-empty
        # negative prompts under cfg_batch); default off for exact parity.
        self.mask_ctx_pad = mask_ctx_pad
        # mesh: enables the cp/data activation-sharding hints during tracing
        # — without them a cp mesh replicates the sequence (parallel/hints.py)
        self.mesh = mesh
        self.scheduler = FlowMatchPairScheduler(cfg.scheduler)
        self._denoise_cache: Dict[Tuple, Any] = {}
        # per-step progress: a STABLE trampoline is traced into the denoise
        # program (jax.debug.callback); swap the target at runtime without
        # retracing by assigning pipe.progress_cb = fn(step, total)
        self.progress_cb = None
        from dualforce_tpu.utils.misc import host_callbacks_supported

        # the axon tunnel PJRT rejects host callbacks entirely — compiling
        # one in would fail EVERY generation there, so probe once
        self._progress_supported = host_callbacks_supported()

    @property
    def _traced_progress_fn(self):
        return self._progress_fn if self._progress_supported else None

    def _progress_fn(self, step, total):
        cb = self.progress_cb
        if cb is not None:
            try:
                cb(int(step), int(total))
            except Exception:  # noqa: BLE001 — progress must never kill a run
                pass

    def _sp_mesh(self):
        """Mesh to run the block stack sequence-parallel over (cp axis) —
        the production ring/Ulysses-equivalent path (parallel/sp.py)."""
        if self.mesh is not None and self.mesh.shape.get("cp", 1) > 1:
            return self.mesh
        return None

    def _sharding_hints(self):
        if self.mesh is None or getattr(self.mesh, "shape", {}).get("cp", 1) == 1:
            return contextlib.nullcontext()
        from jax.sharding import NamedSharding, PartitionSpec as P

        from dualforce_tpu.parallel.hints import sharding_hints

        tok = NamedSharding(self.mesh, P("data", "cp", None))
        return sharding_hints(video_tokens=tok, audio_tokens=tok)

    # --- component offload staging -------------------------------------------
    @contextlib.contextmanager
    def _staged(self, *names: str):
        """Yield a params view with `names` staged on device; in offload mode
        the staged copies are freed on exit (host master copy untouched)."""
        if self.offload == "none":
            yield self.params
            return
        staged = {n: jax.device_put(self.params[n]) for n in names
                  if self.params.get(n) is not None}
        try:
            yield {**self.params, **staged}
        finally:
            for n, tree in staged.items():
                # device_put is a no-op when the master already lives on the
                # target device (e.g. CPU-only runs) — deleting the "staged"
                # leaf would then destroy the master copy
                masters = jax.tree.leaves(self.params[n])
                for leaf, master in zip(jax.tree.leaves(tree), masters):
                    if leaf is not master and hasattr(leaf, "delete"):
                        leaf.delete()

    # --- text ---------------------------------------------------------------
    def encode_prompt(self, prompts: List[str], max_len: int = 512,
                      params: Optional[Dict[str, Any]] = None,
                      return_len: bool = False):
        """UMT5 embed + zero-pad to max_len (pipeline_mova.py:280-319).
        return_len=True also returns the per-prompt valid token counts
        ([B] int32, from the tokenizer attention mask) for mask_ctx_pad."""
        params = params if params is not None else self.params
        prompts = [prompt_clean(p) for p in prompts]
        tok = self.tokenizer(
            prompts, padding="max_length", max_length=max_len, truncation=True,
            add_special_tokens=True, return_attention_mask=True, return_tensors="np",
        )
        ids, mask = tok["input_ids"], tok["attention_mask"]
        emb = umt5.encode(params["text_encoder"], self.cfg.text_encoder,
                          jnp.asarray(ids), jnp.asarray(mask),
                          compute_dtype=self.compute_dtype)
        # zero out positions beyond each prompt's length (reference re-pads
        # with zeros rather than keeping encoder outputs at pad positions)
        emb = emb * jnp.asarray(mask)[:, :, None].astype(emb.dtype)
        if return_len:
            # clamp to >= 1: the kernel's kv mask is undefined for len 0
            lens = np.maximum(np.asarray(mask).sum(axis=1), 1).astype(np.int32)
            return emb, jnp.asarray(lens)
        return emb

    # --- latents ------------------------------------------------------------
    def prepare_latents(
        self,
        first_frame: np.ndarray,   # [H, W, 3] float in [-1, 1]
        height: int, width: int, num_frames: int,
        key: jax.Array,
        params: Optional[Dict[str, Any]] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (noise latents [1,16,F,h,w], condition [1,20,F,h,w]) in the
        reference's channel-first layout (pipeline_mova.py:190-259)."""
        return self.prepare_latents_batch([first_frame], height, width,
                                          num_frames, [key], params=params)

    def prepare_latents_batch(
        self,
        first_frames: List[np.ndarray],
        height: int, width: int, num_frames: int,
        keys: List[jax.Array],
        params: Optional[Dict[str, Any]] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Batched prepare_latents: ONE VAE encode for the whole request batch
        (first frames stacked along batch), per-item noise keys so each item
        stays bit-identical to its single-request result for its seed."""
        params = params if params is not None else self.params
        vcfg = self.cfg.video_vae
        st, ss = vcfg.scale_factor_temporal, vcfg.scale_factor_spatial
        if height % (ss * 2) or width % (ss * 2):
            raise ValueError(f"height/width must be divisible by {ss * 2}")
        if (num_frames - 1) % st:
            raise ValueError(f"num_frames-1 must be divisible by {st}")
        F = (num_frames - 1) // st + 1
        lh, lw = height // ss, width // ss
        b = len(first_frames)

        latents = jnp.concatenate(
            [jax.random.normal(k, (1, vcfg.z_dim, F, lh, lw), jnp.float32)
             for k in keys], axis=0)

        # encode [first_frame, zeros...] deterministically (argmax mode).
        # Built ON DEVICE from the first frames alone: all later frames are
        # zeros, so shipping a [b,T,H,W,3] host array (2.1 GB f32 at 720p)
        # over PCIe/tunnel would be pure waste.
        enc_dt = self.vae_encode_dtype or jnp.float32
        ff = jnp.asarray(np.stack(first_frames).astype(np.float32),
                         dtype=enc_dt)[:, None]
        video_condition = jnp.pad(
            ff, ((0, 0), (0, num_frames - 1), (0, 0), (0, 0), (0, 0)))
        # streaming encode (reference encodes with the same feature cache it
        # decodes with, pipeline_mova.py:236-240) — required at 720p where the
        # full-sequence encoder activations exceed HBM
        cond = wan_vae.encode_mode_streaming(
            params["video_vae"], vcfg, video_condition,
            compute_dtype=self.vae_encode_dtype)
        cond = wan_vae.normalize_latents(cond, vcfg)          # [b,F,lh,lw,16]
        cond = jnp.transpose(cond, (0, 4, 1, 2, 3)).astype(jnp.float32)

        # 4-channel first-frame mask (pipeline_mova.py:246-257); identical per
        # item, broadcast over the batch
        mask = np.ones((1, 1, num_frames, lh, lw), np.float32)
        mask[:, :, 1:] = 0.0
        first = np.repeat(mask[:, :, 0:1], st, axis=2)
        mask = np.concatenate([first, mask[:, :, 1:]], axis=2)   # [1,1,st+T-1,lh,lw]
        mask = mask.reshape(1, F, st, lh, lw).transpose(0, 2, 1, 3, 4)  # [1,st,F,lh,lw]
        mask = np.broadcast_to(mask, (b,) + mask.shape[1:])

        condition = jnp.concatenate([jnp.asarray(mask), cond], axis=1)  # [b,20,F,lh,lw]
        return latents, condition

    def prepare_audio_latents(self, num_frames: int, video_fps: float, key) -> jnp.ndarray:
        acfg = self.cfg.audio_vae
        num_samples = int(acfg.sample_rate * num_frames / video_fps)
        latent_t = (num_samples - 1) // acfg.hop_length + 1
        return jax.random.normal(key, (1, acfg.latent_dim, latent_t), jnp.float32)

    # --- denoise ------------------------------------------------------------
    def _get_denoise(self, plan: SamplePlan, cfg_scale: float, video_fps: float,
                     cfg_batch: bool, phase: Optional[Tuple[int, int]] = None,
                     cfg_cache_interval: int = 1, cfg_scale_bridge: float = 0.0):
        key = (plan.num_steps, plan.boundary_step, cfg_scale, video_fps, cfg_batch,
               phase, cfg_cache_interval, cfg_scale_bridge,
               tuple(np.asarray(plan.pair_timesteps).ravel().tolist()),
               tuple(np.asarray(plan.sigmas_visual).tolist()),
               tuple(np.asarray(plan.sigmas_audio).tolist()))
        if key not in self._denoise_cache:
            if phase is None:
                def run(video_hi, video_lo, audio_params, bridge_params,
                        latents, condition, audio_latents, ctx_pos, ctx_neg,
                        ctx_len_pos, ctx_len_neg, rope_pack):
                    return denoise_loop(
                        video_hi, video_lo, audio_params, bridge_params,
                        self.cfg, latents, condition, audio_latents, ctx_pos, ctx_neg,
                        plan, cfg_scale=cfg_scale, video_fps=video_fps,
                        cfg_batch=cfg_batch, compute_dtype=self.compute_dtype,
                        attn_impl=self.attn_impl, rope_pack=rope_pack,
                        cfg_cache_interval=cfg_cache_interval,
                        cfg_scale_bridge=cfg_scale_bridge,
                        sp_mesh=self._sp_mesh(),
                        ctx_len_pos=ctx_len_pos, ctx_len_neg=ctx_len_neg,
                        progress_fn=self._traced_progress_fn)
            else:
                start, stop = phase

                def run(video_params, audio_params, bridge_params,
                        latents, condition, audio_latents, ctx_pos, ctx_neg,
                        ctx_len_pos, ctx_len_neg, rope_pack):
                    return denoise_range(
                        video_params, audio_params, bridge_params,
                        self.cfg, latents, condition, audio_latents, ctx_pos, ctx_neg,
                        plan, start, stop, cfg_scale=cfg_scale, video_fps=video_fps,
                        cfg_batch=cfg_batch, compute_dtype=self.compute_dtype,
                        attn_impl=self.attn_impl, rope_pack=rope_pack,
                        cfg_cache_interval=cfg_cache_interval,
                        cfg_scale_bridge=cfg_scale_bridge,
                        sp_mesh=self._sp_mesh(),
                        ctx_len_pos=ctx_len_pos, ctx_len_neg=ctx_len_neg,
                        progress_fn=self._traced_progress_fn)

            jit_fn = jax.jit(run)
            warm: Dict[Tuple, Any] = {}

            def dispatch(*args, _jit=jit_fn, _warm=warm):
                c = _warm.get(_arg_sig(args))
                return c(*args) if c is not None else _jit(*args)

            dispatch._jit = jit_fn
            dispatch._warm = warm
            self._denoise_cache[key] = dispatch
        return self._denoise_cache[key]

    # --- serving warmup -------------------------------------------------------
    def warmup(self, height: int = 352, width: int = 640, num_frames: int = 193,
               num_inference_steps: int = 50, sigma_shift: float = 5.0,
               cfg_scale: float = 5.0, video_fps: float = 24.0,
               batch_size: int = 1, cfg_batch: bool = False,
               cfg_cache_interval: int = 1,
               cfg_scale_bridge: float = 0.0) -> None:
        """AOT-compile the denoise program for a geometry bucket WITHOUT
        running it (serving startup; first request then executes the cached
        executable instead of paying a multi-minute compile)."""
        if self.offload != "none":
            return  # offload path compiles per phase on first use
        self.scheduler.set_timesteps(num_inference_steps, shift=sigma_shift)
        # postprocess state may be left over from a shifted generate(); the
        # warmed bucket must match the PLAIN plan or the cache never hits
        self.scheduler.set_pair_postprocess_by_name(None)
        plan = build_plan(self.scheduler, self.cfg.boundary_ratio)
        vcfg, acfg = self.cfg.video_dit, self.cfg.audio_vae
        st = self.cfg.video_vae.scale_factor_temporal
        ss = self.cfg.video_vae.scale_factor_spatial
        F = (num_frames - 1) // st + 1
        lh, lw = height // ss, width // ss
        la = (int(acfg.sample_rate * num_frames / video_fps) - 1) // acfg.hop_length + 1
        b = batch_size

        # ctx embeddings come out of encode_prompt in COMPUTE dtype — compiling
        # for any other dtype would make the warmed program unreachable
        ctx_dtype = jnp.dtype(self.compute_dtype)
        rep = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(self.mesh, P())  # matches _denoise's pinning

        def st_(shape, dtype=jnp.float32):
            if rep is not None:
                return jax.ShapeDtypeStruct(shape, dtype, sharding=rep)
            return jax.ShapeDtypeStruct(shape, dtype)

        abstract = dict(
            latents=st_((b, self.cfg.video_vae.z_dim, F, lh, lw)),
            condition=st_((b, self.cfg.video_vae.z_dim + st, F, lh, lw)),
            audio_latents=st_((b, acfg.latent_dim, la)),
            ctx_pos=st_((b, 512, self.cfg.text_encoder.d_model), ctx_dtype),
            ctx_neg=(st_((b, 512, self.cfg.text_encoder.d_model), ctx_dtype)
                     if cfg_scale != 1.0 else None),
        )
        grid = (F // vcfg.patch_size[0], lh // vcfg.patch_size[1],
                lw // vcfg.patch_size[2])
        rope_pack = make_rope_pack(vcfg, self.cfg.audio_dit, self.cfg.bridge,
                                   grid, la // self.cfg.audio_dit.patch_size,
                                   video_fps)
        rope_abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), rope_pack)
        def _abstract_param(x):
            # carry the REAL (fsdp-sharded) layouts into the AOT compile —
            # an executable compiled for replicated params would reject the
            # sharded arrays at call time
            sh = getattr(x, "sharding", None)
            if sh is not None and getattr(x, "committed", False):
                return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh)
            return jax.ShapeDtypeStruct(x.shape, x.dtype)

        params_abstract = jax.tree.map(_abstract_param, self.params)
        run = self._get_denoise(plan, cfg_scale, video_fps, cfg_batch,
                                cfg_cache_interval=cfg_cache_interval,
                                cfg_scale_bridge=cfg_scale_bridge)
        # lens abstracts only when mask_ctx_pad (None otherwise — the traced
        # signature must match what generate() passes)
        len_pos = st_((b,), jnp.int32) if self.mask_ctx_pad else None
        len_neg = (st_((b,), jnp.int32)
                   if self.mask_ctx_pad and cfg_scale != 1.0 else None)
        args = (params_abstract["video_dit"], params_abstract.get("video_dit_2"),
                params_abstract["audio_dit"], params_abstract["bridge"],
                abstract["latents"], abstract["condition"],
                abstract["audio_latents"], abstract["ctx_pos"],
                abstract["ctx_neg"], len_pos, len_neg, rope_abstract)
        # register the executable with the dispatcher: jit's own cache is NOT
        # populated by lower().compile(), so the first real call would retrace
        with self._sharding_hints():
            run._warm[_arg_sig(args)] = run._jit.lower(*args).compile()

    # --- batched generation (serving path) -----------------------------------
    def generate(
        self,
        prompts: List[str],
        images: List[np.ndarray],     # each [H, W, 3] in [-1, 1]
        negative_prompts: Optional[List[str]] = None,
        seeds: Optional[List[int]] = None,
        height: int = 352,
        width: int = 640,
        num_frames: int = 193,
        video_fps: float = 24.0,
        num_inference_steps: int = 50,
        sigma_shift: float = 5.0,
        visual_shift: Optional[float] = None,
        audio_shift: Optional[float] = None,
        cfg_scale: float = 5.0,
        cfg_batch: bool = False,
        cfg_cache_interval: int = 1,
        cfg_scale_bridge: float = 0.0,
    ) -> List[GenerationResult]:
        """Batch of same-geometry requests through ONE denoise program — the
        serving-side continuous-batching unit (the jitted sampler is batch-
        polymorphic; per-request prompts, negatives and seeds differ freely).
        """
        state = self.prepare_state(
            prompts, images, negative_prompts=negative_prompts, seeds=seeds,
            height=height, width=width, num_frames=num_frames,
            video_fps=video_fps, num_inference_steps=num_inference_steps,
            sigma_shift=sigma_shift, visual_shift=visual_shift,
            audio_shift=audio_shift, cfg_scale=cfg_scale, cfg_batch=cfg_batch,
            cfg_cache_interval=cfg_cache_interval,
            cfg_scale_bridge=cfg_scale_bridge)
        state = self.denoise_state(state)
        return self.finalize_state(state)

    # --- resumable generation (checkpointable denoise state) -----------------
    #
    # The three pieces generate() is made of, exposed so a driver can run the
    # denoise in bounded chunks with the state saved to disk between
    # processes (e.g. to bound per-process host RSS when every host->HBM
    # transfer pins memory, as the tunneled-TPU client does), or to resume a
    # preempted generation. State is a plain dict of arrays + a settings
    # dict; chunked group-offload denoise reproduces the unchunked run
    # bit-for-bit (negative-CFG cache carried in the state).

    def prepare_state(
        self,
        prompts: List[str],
        images: List[np.ndarray],
        negative_prompts: Optional[List[str]] = None,
        seeds: Optional[List[int]] = None,
        height: int = 352,
        width: int = 640,
        num_frames: int = 193,
        video_fps: float = 24.0,
        num_inference_steps: int = 50,
        sigma_shift: float = 5.0,
        visual_shift: Optional[float] = None,
        audio_shift: Optional[float] = None,
        cfg_scale: float = 5.0,
        cfg_batch: bool = False,
        cfg_cache_interval: int = 1,
        cfg_scale_bridge: float = 0.0,
    ) -> Dict[str, Any]:
        """Everything before the denoise loop: prompt encode, latent init,
        VAE encode of the first frames. Returns the denoise state dict."""
        bsz = len(prompts)
        negative_prompts = negative_prompts or [""] * bsz
        seeds = seeds or [42] * bsz

        item_keys = [jax.random.split(jax.random.PRNGKey(s)) for s in seeds]
        with self._staged("video_vae") as p:
            latents, condition = self.prepare_latents_batch(
                images, height, width, num_frames,
                [k[0] for k in item_keys], params=p)
        audio_latents = jnp.concatenate(
            [self.prepare_audio_latents(num_frames, video_fps, k[1])
             for k in item_keys], axis=0)

        ctx_len_pos = ctx_len_neg = None
        with self._staged("text_encoder") as p:
            if self.mask_ctx_pad:
                ctx_pos, ctx_len_pos = self.encode_prompt(prompts, params=p,
                                                          return_len=True)
                ctx_neg = None
                if cfg_scale != 1.0:
                    ctx_neg, ctx_len_neg = self.encode_prompt(
                        negative_prompts, params=p, return_len=True)
            else:
                ctx_pos = self.encode_prompt(prompts, params=p)
                ctx_neg = (self.encode_prompt(negative_prompts, params=p)
                           if cfg_scale != 1.0 else None)

        return {
            "step": 0,
            "settings": dict(
                num_frames=num_frames, video_fps=video_fps,
                num_inference_steps=num_inference_steps,
                sigma_shift=sigma_shift, visual_shift=visual_shift,
                audio_shift=audio_shift, cfg_scale=cfg_scale,
                cfg_batch=cfg_batch, cfg_cache_interval=cfg_cache_interval,
                cfg_scale_bridge=cfg_scale_bridge),
            "latents": latents, "condition": condition,
            "audio_latents": audio_latents,
            "ctx_pos": ctx_pos, "ctx_neg": ctx_neg,
            "ctx_len_pos": ctx_len_pos, "ctx_len_neg": ctx_len_neg,
            "neg_cache_v": None, "neg_cache_a": None,
        }

    def _plan_for(self, s: Dict[str, Any]):
        """Rebuild the (deterministic) sample plan from state settings."""
        self.scheduler.set_timesteps(s["num_inference_steps"],
                                     shift=s["sigma_shift"])
        if s["visual_shift"] is not None or s["audio_shift"] is not None:
            self.scheduler.set_pair_postprocess_by_name(
                "dual_sigma_shift",
                visual_shift=(s["visual_shift"] if s["visual_shift"]
                              is not None else s["sigma_shift"]),
                audio_shift=(s["audio_shift"] if s["audio_shift"]
                             is not None else s["sigma_shift"]))
        else:
            # the postprocess is scheduler state: clear it so a request with
            # shifts doesn't leak its sigma columns into later plain requests
            self.scheduler.set_pair_postprocess_by_name(None)
        return build_plan(self.scheduler, self.cfg.boundary_ratio)

    def denoise_state(self, state: Dict[str, Any],
                      max_steps: Optional[int] = None) -> Dict[str, Any]:
        """Advance the denoise by up to `max_steps` scheduler steps (all
        remaining when None). Partial ranges require offload='group' (the
        resident/component paths compile the whole phase into one XLA loop
        whose CFG cache can't be checkpointed mid-program)."""
        s = state["settings"]
        plan = self._plan_for(s)
        n = plan.num_steps
        start = int(state["step"])
        stop = n if max_steps is None else min(n, start + int(max_steps))
        if start >= stop:
            return state
        if self.offload != "group" and (start != 0 or stop != n):
            raise ValueError("partial denoise_state ranges require "
                             "offload='group'")
        neg_cache = None
        if state.get("neg_cache_v") is not None:
            neg_cache = (jnp.asarray(state["neg_cache_v"]),
                         jnp.asarray(state["neg_cache_a"]))
        out = self._denoise(
            plan, jnp.asarray(state["latents"]),
            jnp.asarray(state["condition"]),
            jnp.asarray(state["audio_latents"]),
            state["ctx_pos"] if state["ctx_pos"] is None
            else jnp.asarray(state["ctx_pos"]),
            state["ctx_neg"] if state["ctx_neg"] is None
            else jnp.asarray(state["ctx_neg"]),
            s["cfg_scale"], s["video_fps"], s["cfg_batch"],
            s["cfg_cache_interval"], s["cfg_scale_bridge"],
            ctx_len_pos=state["ctx_len_pos"], ctx_len_neg=state["ctx_len_neg"],
            step_range=(start, stop), neg_cache=neg_cache)
        latents, audio_latents, neg_cache = out
        state = dict(state, step=stop, latents=latents,
                     audio_latents=audio_latents)
        state["neg_cache_v"] = None if neg_cache is None else neg_cache[0]
        state["neg_cache_a"] = None if neg_cache is None else neg_cache[1]
        return state

    def finalize_state(self, state: Dict[str, Any]) -> List[GenerationResult]:
        """VAE/DAC decode + AV-duration trim (generate()'s epilogue)."""
        s = state["settings"]
        if int(state["step"]) < s["num_inference_steps"]:
            raise ValueError(f"denoise incomplete: step {state['step']} of "
                             f"{s['num_inference_steps']}")
        latents = jnp.asarray(state["latents"])
        audio_latents = jnp.asarray(state["audio_latents"])
        bsz = latents.shape[0]
        results = []
        # exact AV duration: the audio latent length was rounded UP to the
        # hop grid (prepare_audio_latents), so trim the decoded waveform to
        # sr * T / fps samples — keeps the muxed audio track the same length
        # as the video
        num_samples = int(self.cfg.audio_vae.sample_rate * s["num_frames"]
                          / s["video_fps"])
        # stage the VAEs ONCE around the whole batch (offload mode would
        # otherwise pay host->HBM weight transfers per item)
        with self._staged("video_vae", "audio_vae") as p:
            p = self._cast_video_vae(p)
            for i in range(bsz):
                video, audio = self._decode_with(
                    p, latents[i:i + 1], audio_latents[i:i + 1])
                results.append(GenerationResult(
                    video=video, audio=audio[:num_samples],
                    sample_rate=self.cfg.audio_vae.sample_rate,
                    fps=s["video_fps"]))
        return results

    def _denoise(self, plan, latents, condition, audio_latents, ctx_pos,
                 ctx_neg, cfg_scale, video_fps, cfg_batch, cfg_cache_interval,
                 cfg_scale_bridge=0.0, ctx_len_pos=None, ctx_len_neg=None,
                 step_range=None, neg_cache=None):
        """Returns (latents, audio_latents, neg_cache_out). step_range
        restricts to scheduler steps [a, b) (group offload only); neg_cache
        seeds the CFG negative cache when resuming mid-phase."""
        rng_a, rng_b = step_range if step_range is not None \
            else (0, plan.num_steps)
        vcfg = self.cfg.video_dit
        pt, ph, pw = vcfg.patch_size
        grid = (latents.shape[2] // pt, latents.shape[3] // ph,
                latents.shape[4] // pw)
        rope_pack = make_rope_pack(
            vcfg, self.cfg.audio_dit, self.cfg.bridge, grid,
            audio_latents.shape[2] // self.cfg.audio_dit.patch_size, video_fps)

        if self.mesh is not None:
            # pin the per-request data args to a canonical replicated layout:
            # the encoders leave them GSPMD-sharded in whatever way the mesh
            # suggested, which would miss the AOT-warmed executable's
            # compiled-for shardings (they're small — condition ~14 MB at
            # 360p — and the denoise program re-shards internally)
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(self.mesh, P())
            latents, condition, audio_latents, ctx_pos = (
                jax.device_put(x, rep)
                for x in (latents, condition, audio_latents, ctx_pos))
            if ctx_neg is not None:
                ctx_neg = jax.device_put(ctx_neg, rep)
        if self.offload == "none":
            run = self._get_denoise(plan, cfg_scale, video_fps, cfg_batch,
                                    cfg_cache_interval=cfg_cache_interval,
                                    cfg_scale_bridge=cfg_scale_bridge)
            with self._sharding_hints():
                latents, audio_latents = run(
                    self.params["video_dit"], self.params.get("video_dit_2"),
                    self.params["audio_dit"], self.params["bridge"],
                    latents, condition, audio_latents, ctx_pos, ctx_neg,
                    ctx_len_pos, ctx_len_neg, rope_pack)
            return latents, audio_latents, None

        # two expert phases as separate jitted programs; only the active
        # 14B tower is HBM-resident (pipeline_mova.py:403-419 behavior)
        n = plan.num_steps
        split = plan.boundary_step if self.params.get("video_dit_2") is not None else n
        phases = [("video_dit", 0, split), ("video_dit_2", split, n)]
        if self.offload == "group":
            # layerwise group streaming: not even the active tower's blocks
            # are fully HBM-resident (reference --offload group)
            from dualforce_tpu.diffusion.streamed import denoise_streamed

            cache_out = None
            for tower, p0, p1 in phases:
                start, stop = max(p0, rng_a), min(p1, rng_b)
                if stop <= start:
                    continue
                # the incoming cache applies only when resuming MID-phase:
                # at a tower switch (start == p0) the other expert's
                # predictions must not seed this one's CFG cache
                carry = neg_cache if (start == rng_a and start > p0) else None
                latents, audio_latents, cache_out = denoise_streamed(
                    self.params[tower], self.params["audio_dit"],
                    self.params["bridge"], self.cfg,
                    latents, condition, audio_latents, ctx_pos, ctx_neg,
                    plan, start, stop,
                    group_size=self.offload_group_size,
                    cfg_scale=cfg_scale, video_fps=video_fps,
                    cfg_batch=cfg_batch, compute_dtype=self.compute_dtype,
                    attn_impl=self.attn_impl, rope_pack=rope_pack,
                    cfg_cache_interval=cfg_cache_interval,
                    cfg_scale_bridge=cfg_scale_bridge,
                    ctx_len_pos=ctx_len_pos, ctx_len_neg=ctx_len_neg,
                    progress_fn=self._progress_fn,
                    resident_small=self.offload_resident_small,
                    resident_video_groups=self.offload_resident_video_groups,
                    neg_cache=carry, return_neg_cache=True)
            if cache_out is not None and cache_out[0] is None:
                cache_out = None
            return latents, audio_latents, cache_out
        with self._staged("audio_dit", "bridge") as shared:
            for tower, start, stop in phases:
                if stop <= start:
                    continue
                with self._staged(tower) as p:
                    run = self._get_denoise(plan, cfg_scale, video_fps,
                                            cfg_batch, phase=(start, stop),
                                            cfg_cache_interval=cfg_cache_interval,
                                            cfg_scale_bridge=cfg_scale_bridge)
                    latents, audio_latents = run(
                        p[tower], shared["audio_dit"], shared["bridge"],
                        latents, condition, audio_latents, ctx_pos,
                        ctx_neg, ctx_len_pos, ctx_len_neg, rope_pack)
        return latents, audio_latents, None

    # --- full generation ----------------------------------------------------
    def __call__(
        self,
        prompt: str,
        image: np.ndarray,            # [H, W, 3] in [-1, 1]
        negative_prompt: str = "",
        seed: int = 42,
        height: int = 352,
        width: int = 640,
        num_frames: int = 193,
        video_fps: float = 24.0,
        num_inference_steps: int = 50,
        sigma_shift: float = 5.0,
        visual_shift: Optional[float] = None,
        audio_shift: Optional[float] = None,
        cfg_scale: float = 5.0,
        cfg_batch: bool = False,
        cfg_cache_interval: int = 1,
        cfg_scale_bridge: float = 0.0,
    ) -> GenerationResult:
        return self.generate(
            [prompt], [image], negative_prompts=[negative_prompt], seeds=[seed],
            height=height, width=width, num_frames=num_frames,
            video_fps=video_fps, num_inference_steps=num_inference_steps,
            sigma_shift=sigma_shift, visual_shift=visual_shift,
            audio_shift=audio_shift, cfg_scale=cfg_scale, cfg_batch=cfg_batch,
            cfg_cache_interval=cfg_cache_interval,
            cfg_scale_bridge=cfg_scale_bridge)[0]

    def decode(self, latents: jnp.ndarray, audio_latents: jnp.ndarray):
        """latents [1,16,F,h,w] -> uint8 video; audio latents -> waveform."""
        with self._staged("video_vae", "audio_vae") as p:
            return self._decode_with(self._cast_video_vae(p), latents,
                                     audio_latents)

    def _cast_video_vae(self, params):
        """Cast the video VAE to compute dtype ONCE per staged context (the
        per-item decode loop would otherwise re-materialize the cast tree)."""
        if self.compute_dtype == jnp.float32:
            return params
        return {**params, "video_vae": jax.tree.map(
            lambda x: x.astype(self.compute_dtype), params["video_vae"])}

    def _decode_with(self, params, latents, audio_latents):
        # Replicate denoise outputs before decoding: the loop leaves an
        # accidental partitioning on the latents (e.g. [1,2,2,2,1] over a
        # fsdp x cp mesh), and XLA's SPMD conv partitioning of the 3D-causal
        # decoder on such inputs measurably DIVERGES from the replicated
        # decode (maxdiff 75/255 on the CPU backend, same values, verified
        # decode(sharded) != decode(replicated copy)). The latents are tiny
        # (~11 MB at 360p) — a host round-trip is free next to the decode.
        latents = jnp.asarray(np.asarray(latents))
        audio_latents = jnp.asarray(np.asarray(audio_latents))
        vcfg = self.cfg.video_vae
        z = jnp.transpose(latents, (0, 2, 3, 4, 1))        # channels-last
        z = wan_vae.denormalize_latents(z, vcfg)
        # streaming decode (bit-identical to the full decode — tested): the
        # one-shot decoder's upsample intermediates exceed a v5e's 16 GB HBM
        # at real 360p (18.2 GB broadcast measured on-chip); the frame-scan
        # keeps peak memory O(1 latent frame). bf16 = reference parity.
        video = wan_vae.decode_streaming(params["video_vae"], vcfg,
                                         z.astype(self.compute_dtype))
        video = np.asarray(video[0].astype(jnp.float32))   # [T, H, W, 3] in [-1, 1]
        video = ((np.clip(video, -1, 1) + 1) * 127.5).round().astype(np.uint8)

        audio = dac_vae.decode(params["audio_vae"], self.cfg.audio_vae,
                               audio_latents)              # fp32 decode
        audio = np.asarray(audio[0, 0])
        return video, audio
