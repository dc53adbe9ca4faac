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
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 43120
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 8
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

    for mode in ("split", "fused"):
        fa._BWD_MODE = mode  # module-level gate; set before trace
        jax.clear_caches()
        try:
            t = bench(grad, (q, k, v))
        except Exception as e:  # noqa: BLE001
            print(f"{mode:6s}  FAILED: {type(e).__name__}: {e}", flush=True)
            continue
        tf = flops / t / 1e12
        print(f"{mode:6s}  {t*1e3:8.1f} ms  {tf:6.1f} TF/s  mfu={tf/197:.3f}",
              flush=True)


if __name__ == "__main__":
    main()
