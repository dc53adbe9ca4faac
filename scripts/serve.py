"""Launch the generation server (+UI).

Counterpart of workflow/launch_sglang_server.sh (README.md:153-212): loads the
checkpoint, builds the pipeline (optionally sharded over fsdp x cp), mounts
/v1/videos + the web UI, and serves.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dualforce_tpu.utils.misc import respect_platform_env  # noqa: E402

respect_platform_env()  # JAX_PLATFORMS=cpu must keep subprocesses off the chip


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_path", type=str, required=True)
    ap.add_argument("--host", type=str, default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--out_dir", type=str, default="./server_outputs")
    ap.add_argument("--cp_size", type=int, default=1)
    ap.add_argument("--fsdp_size", type=int, default=1)
    ap.add_argument("--attn_type", type=str, default="auto")
    ap.add_argument("--quantize", type=str, default="none",
                    choices=["none", "int8", "int4"],
                    help="int8 w8a8 projections (lossy serving accelerator); "
                         "int4 packed tower kernels (HBM residency)")
    ap.add_argument("--queue_timeout_s", type=float, default=None,
                    help="fail tasks that wait in the queue longer than this "
                         "(per-request timeout_s overrides)")
    ap.add_argument("--mask_ctx_pad", action="store_true",
                    help="cross-attend only each prompt's valid tokens via "
                         "the kernel kv mask (deviates from the reference's "
                         "attend-the-zero-pads semantics)")
    ap.add_argument("--vae_encode_dtype", type=str, default=None,
                    choices=["fp32", "bf16"],
                    help="VAE encoder compute dtype for prepare_latents; "
                         "bf16 is required at 720p on 16 GB chips (f32 "
                         "streaming encode needs ~18 GB HBM)")
    ap.add_argument("--weight_dtype", type=str, default="bf16",
                    choices=["bf16", "fp8"],
                    help="fp8 stores matmul kernels as float8_e4m3 — both "
                         "14B experts fit one 16 GB chip's HBM (bf16 needs "
                         "--fsdp_size or --offload)")
    ap.add_argument("--offload", type=str, default="none",
                    choices=["none", "component", "group"],
                    help="host-resident params, modules staged to HBM per "
                         "phase (single-chip escape hatch); 'group' also "
                         "streams the active tower's blocks in layer groups "
                         "(smallest footprint, fits 720p on 16 GB)")
    ap.add_argument("--offload_group_size", type=int, default=8,
                    help="with --offload group: DiT layers per streamed group")
    ap.add_argument("--cfg_cache_interval", type=int, default=1,
                    help="recompute the CFG negative pass every N steps and "
                         "reuse it in between (measured 1.43x loop speedup "
                         "at N=3; 1 = exact)")
    ap.add_argument("--max_batch", type=int, default=1,
                    help="batch same-geometry requests through one denoise "
                         "program (continuous batching)")
    ap.add_argument("--warmup", type=str, default=None,
                    help="AOT-compile a geometry bucket at startup, e.g. "
                         "'640x352x193x50' (WxHxframesxsteps); combined with "
                         "the persistent compilation cache the first request "
                         "skips the multi-minute compile")
    ap.add_argument("--compile_cache", type=str,
                    default=os.path.expanduser("~/.cache/dualforce_jax"),
                    help="persistent XLA compilation cache dir ('' disables)")
    args = ap.parse_args()

    from dualforce_tpu.parallel.mesh import initialize_distributed
    from dualforce_tpu.utils.misc import setup_compile_cache

    initialize_distributed()  # multi-host: must precede any other jax use
    setup_compile_cache(args.compile_cache)

    from dualforce_tpu.convert.load_checkpoint import (
        config_from_checkpoint,
        load_pipeline_params,
        load_tokenizer,
    )
    from dualforce_tpu.diffusion.pipeline import MOVAPipeline
    from dualforce_tpu.parallel.mesh import create_mesh
    from dualforce_tpu.parallel.sharding import shard_params
    from dualforce_tpu.serving.server import (VideoServer,
                                              make_pipeline_backend,
                                              make_pipeline_batch_backend)
    from dualforce_tpu.workflow.app import attach_ui

    import jax.numpy as jnp

    cfg = config_from_checkpoint(args.ckpt_path)
    wdtype = jnp.float8_e4m3fn if args.weight_dtype == "fp8" else jnp.bfloat16
    params = load_pipeline_params(args.ckpt_path, cfg, dtype=wdtype,
                                  to_device=(args.offload == "none"))
    mesh = None
    if args.cp_size * args.fsdp_size > 1:
        if args.offload != "none":
            raise SystemExit("--offload is for single-chip serving; use "
                             "--fsdp_size to shard weights across chips")
        mesh = create_mesh(1, args.fsdp_size, args.cp_size)
        params = shard_params(params, mesh)
    pipe = MOVAPipeline(cfg, params, tokenizer=load_tokenizer(args.ckpt_path),
                        attn_impl=args.attn_type, mesh=mesh,
                        quantize=args.quantize, offload=args.offload,
                        mask_ctx_pad=args.mask_ctx_pad,
                        offload_group_size=args.offload_group_size,
                        vae_encode_dtype=args.vae_encode_dtype)
    if args.warmup:
        w, h, frames, steps = (int(x) for x in args.warmup.split("x"))
        # batching makes group sizes 1..max_batch possible; warm the common ones
        for b in sorted({1, max(args.max_batch, 1)}):
            print(f"[serve] warming up {w}x{h} {frames}f {steps} steps b={b} ...")
            pipe.warmup(height=h, width=w, num_frames=frames,
                        num_inference_steps=steps, batch_size=b)
        print("[serve] warmup compile done")

    overrides = ({"cfg_cache_interval": args.cfg_cache_interval}
                 if args.cfg_cache_interval != 1 else None)
    server = VideoServer(
        make_pipeline_backend(pipe, overrides), out_dir=args.out_dir,
        batch_backend=(make_pipeline_batch_backend(pipe, overrides)
                       if args.max_batch > 1 else None),
        max_batch=args.max_batch, queue_timeout_s=args.queue_timeout_s)
    attach_ui(server)
    print(f"serving on http://{args.host}:{args.port} (UI at /)")
    server.run(args.host, args.port)


if __name__ == "__main__":
    main()
