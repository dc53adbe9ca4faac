"""Measure the sequence-parallel block-stack machinery on the real chip.

Multi-chip hardware is unreachable here (one v5e), so this pins the two
things that CAN be measured single-chip (VERDICT r1 item 2c):

  1. the Pallas-inner ring body: `sp_forward_blocks` on a 1-device cp mesh
     runs the EXACT production sp code path (shard_map, ring fori_loop with
     ppermute(identity), gather-KV audio, LSE-combined bridge) with the
     Pallas flash inner — its overhead vs the plain fused forward bounds the
     per-chip cost the cp path adds;
  2. the same at 360p flagship-width geometry, so the overhead is read in
     units of the real per-layer time.

Usage: python tools/bench_sp.py [--layers N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    layers = 3
    if "--layers" in sys.argv:
        layers = int(sys.argv[sys.argv.index("--layers") + 1])

    import jax
    import jax.numpy as jnp

    from dualforce_tpu.config import (AudioDiTConfig, BridgeConfig, MOVAConfig,
                                      VideoDiTConfig)
    from dualforce_tpu.diffusion.step import make_rope_pack
    from dualforce_tpu.models.dual_tower import forward_dual_tower
    from dualforce_tpu.models.factory import init_pipeline_params
    from dualforce_tpu.parallel.mesh import create_mesh
    from dualforce_tpu.parallel.sp import sp_forward_blocks

    F, H, W = 49, 22, 40           # 360p: 43,120 tokens
    dim, heads, ffn = 5120, 40, 13824
    adim, aheads, affn = 1536, 12, 8960
    La = 403
    cfg = MOVAConfig(
        video_dit=VideoDiTConfig(dim=dim, in_dim=36, ffn_dim=ffn, out_dim=16,
                                 text_dim=4096, freq_dim=256, num_heads=heads,
                                 num_layers=layers, rope_max_len=128),
        audio_dit=AudioDiTConfig(dim=adim, in_dim=128, ffn_dim=affn,
                                 out_dim=128, text_dim=4096, freq_dim=256,
                                 num_heads=aheads, num_layers=max(layers - 1, 1),
                                 rope_max_len=1024),
        bridge=BridgeConfig(visual_layers=layers,
                            audio_layers=max(layers - 1, 1),
                            visual_hidden_dim=dim, audio_hidden_dim=adim,
                            head_dim=dim // heads, interaction_strategy="full",
                            apply_cross_rope=True, audio_fps=50.0),
    )
    params = init_pipeline_params(jax.random.PRNGKey(0), cfg,
                                  dtype=jnp.bfloat16, with_vaes=False,
                                  with_text=False, two_video_towers=False)
    vcfg, acfg, bcfg = cfg.video_dit, cfg.audio_dit, cfg.bridge

    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    Lv = F * H * W
    vx = jax.random.normal(ks[0], (1, Lv, dim), jnp.bfloat16)
    ax = jax.random.normal(ks[1], (1, La, adim), jnp.bfloat16)
    vctx = jax.random.normal(ks[2], (1, 512, dim), jnp.bfloat16)
    actx = jax.random.normal(ks[3], (1, 512, adim), jnp.bfloat16)
    vtm = jax.random.normal(ks[4], (1, 6, dim), jnp.bfloat16) * 0.1
    atm = jax.random.normal(ks[5], (1, 6, adim), jnp.bfloat16) * 0.1
    pack = make_rope_pack(vcfg, acfg, bcfg, (F, H, W), La, 24.0)
    v_rope, a_rope, cross = pack["v"], pack["a"], pack.get("cross")

    mesh = create_mesh(1, 1, 1)

    @jax.jit
    def plain(params, vx, ax):
        return forward_dual_tower(
            params["video_dit"]["blocks"], params["audio_dit"]["blocks"],
            params["bridge"], vcfg, acfg, bcfg, vx, ax, vctx, actx, vtm, atm,
            v_rope, a_rope, cross_rope=cross, attn_impl="fast")

    @jax.jit
    def sp(params, vx, ax):
        return sp_forward_blocks(
            mesh, params["video_dit"]["blocks"], params["audio_dit"]["blocks"],
            params["bridge"], vcfg, acfg, bcfg, vx, ax, vctx, actx, vtm, atm,
            v_rope, a_rope, cross_rope=cross, attn_impl="fast")

    def measure(fn, name):
        t0 = time.perf_counter()
        out = fn(params, vx, ax)
        float(jnp.sum(out[0]).astype(jnp.float32))
        print(f"[{name}] compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            out = fn(params, vx, ax)
            float(jnp.sum(out[0]).astype(jnp.float32))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        print(f"[{name}] {med:.3f}s median", flush=True)
        return med, out

    t_plain, out_p = measure(plain, "plain ")
    t_sp, out_s = measure(sp, "sp-cp1")
    num = float(jnp.linalg.norm((out_s[0] - out_p[0]).astype(jnp.float32)))
    den = float(jnp.linalg.norm(out_p[0].astype(jnp.float32))) + 1e-9
    print(f"rel diff sp vs plain: {num / den:.2e}")
    print(f"sp machinery overhead at cp=1: {(t_sp / t_plain - 1) * 100:.1f}% "
          f"({t_sp - t_plain:+.3f}s on {layers} flagship-width layers)")
    import json

    print(json.dumps({
        "metric": "sp_machinery_overhead_cp1",
        "plain_s": round(t_plain, 4), "sp_s": round(t_sp, 4),
        "overhead_pct": round((t_sp / t_plain - 1) * 100, 2),
        "rel_diff": num / den, "layers": layers,
        "backend": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
