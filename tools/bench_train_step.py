"""LoRA training-step throughput at flagship layer width and 360p geometry.

Measures the full jitted train step (fwd + remat recompute + flash backward
kernels + optax AdamW update) with layer count scaled to one chip, and
reports effective TF/s under the standard 3x-forward convention (fwd + 2x
bwd; the remat recompute means the chip really does ~4x, so hardware MFU is
higher than the effective number).

Usage: python tools/bench_train_step.py [--attn fast|auto] [--layers N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dualforce_tpu.utils.misc import respect_platform_env  # noqa: E402

respect_platform_env()  # JAX_PLATFORMS=cpu must keep subprocesses off the chip

import numpy as np


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--attn", type=str, default="fast")
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--remat_attn", type=str, default="recompute",
                    choices=["recompute", "save"],
                    help="save = keep flash-attn residuals across the "
                         "jax.checkpoint boundary (skips the O(L^2) fwd "
                         "re-run in the backward, costs HBM)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from dualforce_tpu.config import (
        AudioDiTConfig, BridgeConfig, MOVAConfig, VideoDiTConfig)
    from dualforce_tpu.diffusion.flow_match import FlowMatchPairScheduler
    from dualforce_tpu.diffusion.step import make_rope_pack
    from dualforce_tpu.diffusion.training import (
        build_train_tables, make_lora_train_step)
    from dualforce_tpu.engine.lora import init_pipeline_lora
    from dualforce_tpu.models.factory import init_pipeline_params

    F, H, W = 49, 22, 40
    La, Lt = 403, 512
    v_layers, a_layers = args.layers, max(1, args.layers - 1)
    cfg = MOVAConfig(
        video_dit=VideoDiTConfig(dim=5120, in_dim=36, ffn_dim=13824, out_dim=16,
                                 text_dim=4096, freq_dim=256, num_heads=40,
                                 num_layers=v_layers, rope_max_len=128),
        audio_dit=AudioDiTConfig(dim=1536, in_dim=128, ffn_dim=8960, out_dim=128,
                                 text_dim=4096, freq_dim=256, num_heads=12,
                                 num_layers=a_layers, rope_max_len=1024),
        bridge=BridgeConfig(visual_layers=v_layers, audio_layers=a_layers,
                            visual_hidden_dim=5120, audio_hidden_dim=1536,
                            head_dim=128, interaction_strategy="full",
                            apply_cross_rope=True, audio_fps=50.0),
    )
    key = jax.random.PRNGKey(0)
    params = init_pipeline_params(key, cfg, dtype=jnp.bfloat16,
                                  with_vaes=False, with_text=False,
                                  two_video_towers=False)
    lora = init_pipeline_lora(jax.random.PRNGKey(1), params, rank=16)

    sched = FlowMatchPairScheduler(cfg.scheduler)
    sched.set_timesteps(1000, training=True)
    tables = build_train_tables(sched, cfg.boundary_ratio)
    opt = optax.adamw(1e-4)
    opt_state = opt.init(lora)

    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    encoded = {
        "context": jax.random.normal(ks[0], (1, Lt, 4096), jnp.bfloat16),
        "video_latents": jax.random.normal(ks[1], (1, 16, F, 2 * H, 2 * W),
                                           jnp.float32),
        "condition": jax.random.normal(ks[2], (1, 20, F, 2 * H, 2 * W),
                                       jnp.float32),
        "audio_latents": jax.random.normal(ks[3], (1, 128, La), jnp.float32),
    }
    rope_pack = make_rope_pack(cfg.video_dit, cfg.audio_dit, cfg.bridge,
                               (F, H, W), La, 24.0)
    if args.remat_attn == "save":
        from dualforce_tpu.ops.flash_attention import remat_save_attention

        remat_save_attention(True)
    step = make_lora_train_step(cfg, tables, opt, attn_impl=args.attn)

    print(f"[train-bench] compiling: layers={v_layers}/{a_layers} "
          f"attn={args.attn}", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    lora, opt_state, metrics = step(lora, opt_state, params, encoded,
                                    jax.random.PRNGKey(3), 0,
                                    rope_pack=rope_pack)
    loss0 = float(metrics["loss"])
    print(f"[train-bench] compiled+first in {time.perf_counter()-t0:.1f}s "
          f"loss={loss0:.4f}", file=sys.stderr, flush=True)

    ts = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        lora, opt_state, metrics = step(lora, opt_state, params, encoded,
                                        jax.random.PRNGKey(4 + i), i % 2,
                                        rope_pack=rope_pack)
        float(metrics["loss"])  # forces completion (axon async fetch)
        ts.append(time.perf_counter() - t0)
        print(f"[train-bench] iter {i}: {ts[-1]:.3f}s", file=sys.stderr,
              flush=True)
    t = float(np.median(ts))

    Lv = F * H * W

    def dit_flops(L, d, ffn, layers):
        return layers * (8 * L * d * d + 4 * L * L * d + 4 * L * d * d
                         + 4 * Lt * d * d + 4 * L * Lt * d + 4 * L * d * ffn)

    def bridge_flops(layers):
        per = (4 * Lv * 5120 ** 2 + 4 * La * 1536 * 5120 + 4 * Lv * La * 5120
               + 4 * La * 1536 ** 2 + 4 * Lv * 5120 * 1536 + 4 * La * Lv * 1536)
        return layers * per

    fwd = (dit_flops(Lv, 5120, 13824, v_layers)
           + dit_flops(La, 1536, 8960, a_layers)
           + bridge_flops(min(v_layers, a_layers)))
    eff = 3 * fwd / t
    peak = 197e12
    print(f"train step: {t:.3f}s  effective {eff/1e12:.1f} TF/s "
          f"({eff/peak:.3f} of v5e bf16 peak, 3x-fwd convention; "
          f"remat means the chip does ~4x fwd)")
    import jax
    import json

    print(json.dumps({
        "metric": "lora_train_step", "step_s": round(t, 4),
        "effective_tflops": round(eff / 1e12, 1),
        "effective_mfu_3x_fwd": round(eff / peak, 4),
        "layers": v_layers, "remat_attn": args.remat_attn,
        "backend": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
