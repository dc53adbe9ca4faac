"""Microbenchmark the flash-attention BACKWARD on the local TPU chip.

Compares the split (dkv kernel + dq kernel) and fused (single-kernel
dk+dv+dq) backward paths at MOVA geometries. The timed region is the whole
value-and-grad (fwd 2 matmuls + bwd 5), so TF/s uses 3.5x the fwd unit of
4*S*S*D*N. The shipped `DUALFORCE_FLASH_BWD` default comes
from this sweep plus tools/check_attn_tpu.py numerics.

Usage: python tools/bench_attn_bwd.py [S] [N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dualforce_tpu.ops import flash_attention as fa


def bench(fn, args, iters=5):
    out = fn(*args)
    float(jnp.sum(out[0][:, 0, 0, :]).astype(jnp.float32))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out[0][:, 0, 0, :]).astype(jnp.float32))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    pos = [a for a in sys.argv[1:]
           if not a.startswith("--") and a.lstrip("-").isdigit()
           and sys.argv[sys.argv.index(a) - 1] != "--artifact"]
    S = int(pos[0]) if pos else 43120
    N = int(pos[1]) if len(pos) > 1 else 8
    D = 128
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (1, S, N, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (1, S, N, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (1, S, N, D), jnp.bfloat16)
    # timed region = fwd (2 matmuls) + bwd (5 matmuls) = 3.5x the 2-matmul
    # fwd unit of 4*S*S*D*N
    flops = 3.5 * 4 * S * S * D * N

    def loss(q, k, v):
        return jnp.sum(
            fa.flash_attention(q, k, v).astype(jnp.float32) ** 2)

    grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

    rows = []
    for mode in ("split", "fused"):
        fa._BWD_MODE = mode  # module-level gate; set before trace
        jax.clear_caches()
        try:
            t = bench(grad, (q, k, v))
        except Exception as e:  # noqa: BLE001
            print(f"{mode:6s}  FAILED: {type(e).__name__}: {e}", flush=True)
            continue
        tf = flops / t / 1e12
        rows.append({"mode": mode, "bq_cap": fa._BWD_BQ_CAP,
                     "ms": round(t * 1e3, 1), "tf_s": round(tf, 1),
                     "mfu": round(tf / 197, 3)})
        print(f"{mode:6s}  {t*1e3:8.1f} ms  {tf:6.1f} TF/s  mfu={tf/197:.3f}",
              flush=True)

    if "--sweep" in sys.argv:
        # VERDICT r4 weak #7: _BWD_BQ_CAP=512 predates the 110 MiB VMEM
        # budget — re-sweep the bwd q-block cap on the winning (fused) path
        cap0 = fa._BWD_BQ_CAP
        fa._BWD_MODE = "fused"
        for cap in (256, 384, 512, 640, 768, 896, 1024):
            fa._BWD_BQ_CAP = cap
            jax.clear_caches()
            try:
                t = bench(grad, (q, k, v))
            except Exception as e:  # noqa: BLE001
                print(f"fused bq_cap={cap:5d}  FAILED: "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
                rows.append({"mode": "fused", "bq_cap": cap, "ms": None,
                             "tf_s": None, "mfu": None,
                             "error": type(e).__name__})
                continue
            tf = flops / t / 1e12
            rows.append({"mode": "fused", "bq_cap": cap,
                         "ms": round(t * 1e3, 1), "tf_s": round(tf, 1),
                         "mfu": round(tf / 197, 3)})
            print(f"fused bq_cap={cap:5d}  {t*1e3:8.1f} ms  {tf:6.1f} TF/s  "
                  f"mfu={tf/197:.3f}", flush=True)
        fa._BWD_BQ_CAP = cap0

    art = None
    if "--artifact" in sys.argv:
        art = sys.argv[sys.argv.index("--artifact") + 1]
    if art:
        import json

        best = max((r for r in rows if r.get("tf_s")),
                   key=lambda r: r["tf_s"], default=None)
        with open(art, "w") as f:
            json.dump({"metric": "flash_attn_bwd_sweep",
                       "geometry": f"S={S} N={N} D={D} (value-and-grad, "
                                   f"3.5x-fwd-unit TF/s)",
                       "rows": rows, "best": best,
                       "backend": jax.default_backend()}, f, indent=1)
        print(f"[attn-bwd] wrote {art}")


if __name__ == "__main__":
    main()
