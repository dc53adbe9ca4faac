"""Microbenchmark the Pallas flash attention kernel on the local TPU chip.

Sweeps block sizes at the MOVA-360p self-attention geometry (43k tokens,
head_dim 128) and prints achieved TFLOP/s per variant. Dev tool — the
shipped default block sizes in ops/flash_attention.py come from this sweep.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dualforce_tpu.utils.misc import respect_platform_env  # noqa: E402

respect_platform_env()  # JAX_PLATFORMS=cpu must keep subprocesses off the chip

import jax
import jax.numpy as jnp
import numpy as np

from dualforce_tpu.ops.flash_attention import flash_attention
from dualforce_tpu.ops.attention import attention_ref


def bench(fn, args, iters=5):
    out = fn(*args)
    float(jnp.sum(out[:, 0, 0, :]).astype(jnp.float32))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out[:, 0, 0, :]).astype(jnp.float32))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 43120
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    D = 128
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (1, S, N, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (1, S, N, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (1, S, N, D), jnp.bfloat16)
    flops = 4 * S * S * D * N  # fwd only (2 matmuls)

    peak = 197e12
    for bq, bk in [(512, 512), (512, 1024), (1024, 512), (1024, 1024),
                   (2048, 512), (512, 2048), (2048, 1024), (1024, 2048),
                   (256, 1024), (3392, 1024)]:
        fn = jax.jit(lambda q, k, v, bq=bq, bk=bk: flash_attention(
            q, k, v, block_q=bq, block_k=bk))
        try:
            t = bench(fn, (q, k, v))
        except Exception as e:  # noqa: BLE001
            print(f"bq={bq:5d} bk={bk:5d}  FAILED: {type(e).__name__}")
            continue
        tf = flops / t / 1e12
        print(f"bq={bq:5d} bk={bk:5d}  {t*1e3:8.1f} ms  {tf:6.1f} TF/s  "
              f"mfu={tf/197:.3f}", flush=True)

    if S <= 8192:
        fn = jax.jit(attention_ref)
        t = bench(fn, (q, k, v))
        print(f"xla reference     {t*1e3:8.1f} ms  {flops/t/1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
