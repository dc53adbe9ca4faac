"""LoRA inference CLI (counterpart of reference scripts/inference_single_lora.py:39-82).

Loads a base checkpoint, applies LoRA weights (merged into the base kernels —
the reference's `merge_lora` path, mova_lora.py:190-268), then runs the same
generation path as inference_single.py.
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
    p.add_argument("--base_model", type=str, required=True)
    p.add_argument("--lora_path", type=str, required=True)
    p.add_argument("--lora_alpha", type=float, default=None,
                   help="override the alpha stored with the LoRA")
    p.add_argument("--lora_scale", type=float, default=1.0)
    p.add_argument("--prompt", type=str, required=True)
    p.add_argument("--negative_prompt", type=str, default="")
    p.add_argument("--ref_path", type=str, required=True)
    p.add_argument("--output", "--output_path", dest="output", type=str,
                   default="output_lora.mp4")
    p.add_argument("--merge_lora", action="store_true",
                   help="compat no-op: LoRA is always folded into the base "
                        "kernels here (W + BA*alpha/r*scale) — functionally "
                        "identical to the reference's merged path; runtime "
                        "re-scaling without reload is a training-time concern "
                        "(engine/lora.py keeps factors separate there)")
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
    p.add_argument("--cp_size", type=int, default=1)
    p.add_argument("--fsdp_size", type=int, default=1)
    p.add_argument("--attn_type", type=str, default="auto",
                   choices=["auto", "fast", "sage", "pallas", "ref"])
    p.add_argument("--offload", type=str, default="none",
                   choices=["none", "cpu", "group", "component"],
                   help="host staging: 'cpu'/'component' stage whole modules "
                        "per phase; 'group' additionally streams the active "
                        "tower's blocks in layer groups; default keeps "
                        "weights HBM-resident")
    p.add_argument("--offload_group_size", type=int, default=8,
                   help="with --offload group: DiT layers per streamed group")
    p.add_argument("--weight_dtype", type=str, default="bf16",
                   choices=["bf16", "fp8"],
                   help="fp8 stores matmul kernels as float8_e4m3 AFTER the "
                        "LoRA merge (half the HBM; compute stays bf16)")
    p.add_argument("--quantize", type=str, default="none",
                   choices=["none", "int8"],
                   help="int8 pre-quantizes DiT/bridge projections after the "
                        "merge (w8a8; lossy, composes with --attn_type sage)")
    p.add_argument("--compile_cache", type=str,
                   default=os.path.expanduser("~/.cache/dualforce_jax"),
                   help="persistent XLA compilation cache dir ('' disables)")
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
    from dualforce_tpu.engine.lora import load_lora, merge_pipeline_lora
    from dualforce_tpu.parallel.mesh import create_mesh
    from dualforce_tpu.parallel.sharding import shard_params
    from dualforce_tpu.utils.av_io import save_video_with_audio

    offload = {"cpu": "component"}.get(args.offload, args.offload)
    cfg = config_from_checkpoint(args.base_model)
    params = load_pipeline_params(args.base_model, cfg,
                                  to_device=(offload == "none"))
    if args.lora_path.endswith(".pt") or os.path.exists(
            os.path.join(args.lora_path, "lora_weights.pt")):
        # reference-trained LoRA checkpoint (either trainer format) —
        # convert on the fly (convert/lora_import.py)
        from dualforce_tpu.convert.lora_import import load_reference_lora

        lora, lcfg = load_reference_lora(args.lora_path, cfg)
    else:
        lora, lcfg = load_lora(args.lora_path)
    alpha = args.lora_alpha if args.lora_alpha is not None else lcfg["alpha"]
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dualforce_tpu import nn as dnn

    fp8 = args.weight_dtype == "fp8"
    towers = [k for k in ("video_dit", "video_dit_2", "audio_dit", "bridge")
              if params.get(k) is not None]

    def _fp8_cast(tree):
        # cast AFTER the merge so the LoRA delta lands at full precision
        return dnn.cast_tree_fp8(tree, jnp.float8_e4m3fn) if fp8 else tree

    if offload == "none":
        params = merge_pipeline_lora(params, lora, alpha=alpha,
                                     scale=args.lora_scale)
        for k in towers:
            params[k] = _fp8_cast(params[k])
    else:
        # merge (and cast) on the HOST cpu backend: a flagship tower at bf16
        # exceeds the 16 GB HBM outright, so the merge math must never touch
        # the chip — params stay host-resident for component staging
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            for k in towers:
                tree = params[k]
                if lora.get(k):
                    tree = merge_pipeline_lora({k: tree}, {k: lora[k]},
                                               alpha=alpha,
                                               scale=args.lora_scale)[k]
                tree = _fp8_cast(tree)
                params[k] = jax.tree.map(
                    lambda x: np.asarray(jax.device_get(x)), tree)
    print(f"[info] merged LoRA (rank={lcfg['rank']}, alpha={alpha}, "
          f"scale={args.lora_scale}, weight_dtype={args.weight_dtype})")

    mesh = None
    if args.cp_size * args.fsdp_size > 1:
        if offload != "none":
            raise SystemExit("--offload is for single-chip runs; use "
                             "--fsdp_size to shard weights across chips instead")
        mesh = create_mesh(1, args.fsdp_size, args.cp_size)
        params = shard_params(params, mesh)

    pipe = MOVAPipeline(cfg, params, tokenizer=load_tokenizer(args.base_model),
                        mesh=mesh, attn_impl=args.attn_type, offload=offload,
                        quantize=args.quantize,
                        offload_group_size=args.offload_group_size)
    image = crop_and_resize(Image.open(args.ref_path).convert("RGB"),
                            args.height, args.width)
    result = pipe(
        prompt=args.prompt, image=image_to_tensor(image),
        negative_prompt=args.negative_prompt, seed=args.seed,
        height=args.height, width=args.width, num_frames=args.num_frames,
        video_fps=args.fps, num_inference_steps=args.num_inference_steps,
        sigma_shift=args.sigma_shift, cfg_scale=args.cfg_scale,
        cfg_scale_bridge=args.cfg_scale_bridge)
    out = save_video_with_audio(args.output, result.video, result.audio,
                                fps=result.fps, sample_rate=result.sample_rate)
    print(f"[done] saved {out}")


if __name__ == "__main__":
    main()
