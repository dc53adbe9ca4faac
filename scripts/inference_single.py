"""Single-clip TI2VA inference CLI.

Flag-for-flag counterpart of the reference scripts/inference_single.py:24-46.
TPU notes: the default memory strategy is HBM-resident weights (GSPMD-sharded
when cp_size/fsdp_size > 1). `--offload cpu/component` enables real
component-wise host staging (params live on host; each module moves to HBM
for its phase; the two video experts never coexist on device); `--offload
group` further streams the active tower's blocks through HBM in layer groups
(diffusion/streamed.py) — the smallest-footprint escape hatch, fitting
flagship 720p on a single 16 GB chip. `--cp_size` builds a cp
mesh axis; attention runs sequence-parallel over ICI instead of torchrun+NCCL.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dualforce_tpu.utils.misc import respect_platform_env  # noqa: E402

respect_platform_env()  # JAX_PLATFORMS=cpu must keep subprocesses off the chip


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_path", type=str, required=True)
    p.add_argument("--prompt", type=str, required=True)
    p.add_argument("--negative_prompt", type=str, default="")
    p.add_argument("--ref_path", type=str, required=True,
                   help="reference first-frame image")
    p.add_argument("--output", "--output_path", dest="output", type=str,
                   default="output.mp4")
    p.add_argument("--num_frames", type=int, default=193)
    p.add_argument("--fps", type=float, default=24.0)
    p.add_argument("--height", type=int, default=352)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--cfg_scale", type=float, default=5.0)
    p.add_argument("--cfg_scale_bridge", type=float, default=0.0,
                   help="dual-CFG cross-modal guidance s_B (paper uses 3.5; "
                        "reference's cfg_mode='dual' is unimplemented there); "
                        "0 disables the third bridge-off pass")
    p.add_argument("--sigma_shift", type=float, default=5.0)
    p.add_argument("--visual_shift", type=float, default=None)
    p.add_argument("--audio_shift", type=float, default=None)
    p.add_argument("--cp_size", type=int, default=1)
    p.add_argument("--fsdp_size", type=int, default=1)
    p.add_argument("--attn_type", type=str, default="auto",
                   choices=["auto", "fast", "sage", "pallas", "ref"])
    p.add_argument("--offload", type=str, default="none",
                   choices=["none", "cpu", "group", "component"],
                   help="host staging: 'cpu'/'component' stage whole modules "
                        "per phase; 'group' additionally streams the active "
                        "tower's blocks through HBM in layer groups (the "
                        "smallest-footprint mode — fits flagship 720p on one "
                        "16 GB chip); default keeps weights HBM-resident")
    p.add_argument("--offload_resident_small", action="store_true",
                   help="group offload: pin audio tower + bridge in HBM, "
                        "stream only the video tower")
    p.add_argument("--offload_resident_groups", "--resident_groups",
                   type=int, default=0,
                   help="group offload: pin the first N video layer groups "
                        "in HBM across passes (partial residency); "
                        "--resident_groups (the tools/run_720p_e2e.py "
                        "spelling) is accepted as an alias")
    p.add_argument("--offload_group_size", type=int, default=8,
                   help="with --offload group: DiT layers per streamed group")
    p.add_argument("--offload_to_disk_path", type=str, default=None,
                   metavar="DIR",
                   help="with --offload: keep params as disk-backed memmaps "
                        "in DIR (one-time export on first run) so host RSS "
                        "stays at page-cache level — the reference's "
                        "group-offload-to-disk niche (inference_single.py:92)")
    p.add_argument("--weight_dtype", type=str, default="bf16",
                   choices=["bf16", "fp8"],
                   help="fp8 stores matmul kernels as float8_e4m3 (half the "
                        "HBM; compute stays bf16)")
    p.add_argument("--remove_video_dit", action="store_true",
                   help="free the high-noise tower after the boundary switch")
    p.add_argument("--cfg_cache_interval", type=int, default=1,
                   help="recompute the CFG negative pass every N steps and "
                        "reuse it in between (serving accelerator; 1 = exact)")
    p.add_argument("--cfg_batch", action="store_true",
                   help="batch pos+neg CFG passes in one forward")
    p.add_argument("--mask_ctx_pad", action="store_true",
                   help="cross-attend only the prompt's valid tokens via the "
                        "kernel kv mask (deviates from the reference's "
                        "attend-the-zero-pads semantics)")
    p.add_argument("--vae_encode_dtype", type=str, default=None,
                   choices=["fp32", "bf16"],
                   help="VAE encoder compute dtype for prepare_latents; "
                        "bf16 is required at 720p on 16 GB chips (f32 "
                        "streaming encode needs ~18 GB HBM)")
    p.add_argument("--quantize", type=str, default="none",
                   choices=["none", "int8", "int4"],
                   help="int8 pre-quantizes DiT/bridge projections (w8a8 "
                        "on the MXU); int4 packs tower kernels to 0.5 "
                        "B/param for full HBM residency on 16 GB chips; "
                        "both lossy, inference-only, compose with "
                        "--attn_type sage")
    p.add_argument("--compile_cache", type=str,
                   default=os.path.expanduser("~/.cache/dualforce_jax"),
                   help="persistent XLA compilation cache dir ('' disables); "
                        "repeat runs at the same geometry skip the "
                        "multi-minute compile")
    p.add_argument("--profile", type=str, default=None, metavar="DIR",
                   help="write a jax.profiler (Perfetto/XPlane) trace of the "
                        "generation to DIR")
    return p.parse_args()


def main():
    args = parse_args()
    from dualforce_tpu.parallel.mesh import initialize_distributed
    from dualforce_tpu.utils.misc import setup_compile_cache

    initialize_distributed()  # multi-host: must precede any other jax use
    setup_compile_cache(args.compile_cache)
    from PIL import Image

    from dualforce_tpu.convert.load_checkpoint import (
        config_from_checkpoint,
        load_pipeline_params,
        load_tokenizer,
    )
    from dualforce_tpu.data.transforms import crop_and_resize, image_to_tensor
    from dualforce_tpu.diffusion.pipeline import MOVAPipeline
    from dualforce_tpu.parallel.mesh import create_mesh
    from dualforce_tpu.parallel.sharding import shard_params
    from dualforce_tpu.utils.av_io import save_video_with_audio
    from dualforce_tpu.utils.misc import device_timer, hbm_in_use_gb, profile_trace

    # "cpu" maps to component-wise staging: params stay on host, each module
    # is staged to HBM for its phase, the two 14B experts never coexist on
    # device. "group" additionally streams the active tower's blocks in
    # layer groups (reference offload modes, inference_single.py:81-97).
    offload = {"cpu": "component"}.get(args.offload, args.offload)

    import jax.numpy as jnp

    cfg = config_from_checkpoint(args.ckpt_path)
    wdtype = jnp.float8_e4m3fn if args.weight_dtype == "fp8" else jnp.bfloat16

    if args.offload_to_disk_path:
        if offload == "none":
            raise SystemExit("--offload_to_disk_path requires --offload "
                             "cpu/group/component")
        from dualforce_tpu.convert.disk_store import (
            load_params_mmap_from_manifest, save_params_to_dir, store_matches)

        # fingerprint = source identity; a matching store loads straight from
        # disk with NO full-RAM checkpoint load (the point of this flag), and
        # a store from different weights / --weight_dtype is re-exported
        ckpt = os.path.abspath(args.ckpt_path)
        mtime = max((os.path.getmtime(os.path.join(ckpt, e))
                     for e in os.listdir(ckpt)), default=0.0)
        fp = f"{ckpt}|{args.weight_dtype}|{mtime:.0f}"
        if not store_matches(None, args.offload_to_disk_path, fingerprint=fp):
            print(f"[info] exporting params to {args.offload_to_disk_path} "
                  "(one-time)")
            params = load_pipeline_params(args.ckpt_path, cfg, dtype=wdtype,
                                          to_device=False)
            save_params_to_dir(params, args.offload_to_disk_path,
                               fingerprint=fp)
            del params
        params = load_params_mmap_from_manifest(args.offload_to_disk_path)
        print("[info] params are disk-backed memmaps; modules stream "
              "disk -> HBM per phase")
    else:
        params = load_pipeline_params(args.ckpt_path, cfg, dtype=wdtype,
                                      to_device=(offload == "none"))
    tokenizer = load_tokenizer(args.ckpt_path)

    mesh = None
    if args.cp_size * args.fsdp_size > 1:
        if offload != "none":
            raise SystemExit("--offload is for single-chip runs; use "
                             "--fsdp_size to shard weights across chips instead")
        mesh = create_mesh(1, args.fsdp_size, args.cp_size)
        params = shard_params(params, mesh)
        print(f"[info] mesh fsdp={args.fsdp_size} cp={args.cp_size}; "
              f"HBM in use: {hbm_in_use_gb():.1f} GB")

    pipe = MOVAPipeline(cfg, params, tokenizer=tokenizer, attn_impl=args.attn_type,
                        offload=offload, mesh=mesh, quantize=args.quantize,
                        mask_ctx_pad=args.mask_ctx_pad,
                        offload_group_size=args.offload_group_size,
                        offload_resident_small=args.offload_resident_small,
                        offload_resident_video_groups=args.offload_resident_groups,
                        vae_encode_dtype=args.vae_encode_dtype)

    image = Image.open(args.ref_path).convert("RGB")
    image = crop_and_resize(image, args.height, args.width)
    first_frame = image_to_tensor(image)

    ctx = mesh if mesh is not None else _nullcontext()
    with ctx, profile_trace(args.profile):
        with device_timer("generation"):
            result = pipe(
                prompt=args.prompt, image=first_frame,
                negative_prompt=args.negative_prompt, seed=args.seed,
                height=args.height, width=args.width, num_frames=args.num_frames,
                video_fps=args.fps, num_inference_steps=args.num_inference_steps,
                sigma_shift=args.sigma_shift, visual_shift=args.visual_shift,
                audio_shift=args.audio_shift, cfg_scale=args.cfg_scale,
                cfg_batch=args.cfg_batch,
                cfg_cache_interval=args.cfg_cache_interval,
                cfg_scale_bridge=args.cfg_scale_bridge)

    out = save_video_with_audio(args.output, result.video, result.audio,
                                fps=result.fps, sample_rate=result.sample_rate)
    print(f"[done] saved {out}")


class _nullcontext:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    main()
