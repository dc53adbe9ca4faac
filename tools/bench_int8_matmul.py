"""Microbenchmark: int8 (w8a8, int32 accumulate) vs bf16 dense matmul on the
chip, at the DiT projection shapes (tokens x dim @ dim x dim / ffn).

Decides whether an opt-in quantized-projection serving mode is worth
building: v5e int8 MXU peak is 2x bf16 (394.7 TOPS vs 197.4 TFLOPS), but
realized gain depends on whether XLA tiles the int8 dot at full rate and on
the quant/dequant overhead (VPU).  Prints measured TF/s for each variant and
the speedup; run on the TPU (no args).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _timeit(f, *args, iters=5):
    r = f(*args)
    float(jnp.sum(r[0] if isinstance(r, tuple) else r))  # force fetch (axon)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    float(jnp.sum(r[0] if isinstance(r, tuple) else r))
    return (time.perf_counter() - t0) / iters


def main():
    L, D, F = 43120, 5120, 13824
    key = jax.random.PRNGKey(0)
    ka, kw = jax.random.split(key)
    for (m, k, n, name) in [(L, D, D, "proj dxd"), (L, D, F, "ffn in"),
                            (L, F, D, "ffn out")]:
        a = jax.random.normal(ka, (m, k), jnp.bfloat16)
        w = (jax.random.normal(kw, (k, n), jnp.bfloat16) / (k ** 0.5))

        @jax.jit
        def bf16(a, w):
            return a @ w

        @jax.jit
        def w8a8(a, w):
            # per-token activation scale, per-out-channel weight scale
            a_s = jnp.max(jnp.abs(a), axis=1, keepdims=True).astype(jnp.float32) / 127.0
            w_s = jnp.max(jnp.abs(w), axis=0, keepdims=True).astype(jnp.float32) / 127.0
            ai = jnp.round(a.astype(jnp.float32) / a_s).astype(jnp.int8)
            wi = jnp.round(w.astype(jnp.float32) / w_s).astype(jnp.int8)
            o = jax.lax.dot_general(ai, wi, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return (o.astype(jnp.float32) * a_s * w_s).astype(jnp.bfloat16)

        @jax.jit
        def w8a8_static(ai, a_s, wi, w_s):
            # weights pre-quantized (serving mode), activations dynamic
            o = jax.lax.dot_general(ai, wi, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return (o.astype(jnp.float32) * a_s * w_s).astype(jnp.bfloat16)

        @jax.jit
        def act_quant(a):
            a_s = jnp.max(jnp.abs(a), axis=1, keepdims=True).astype(jnp.float32) / 127.0
            return jnp.round(a.astype(jnp.float32) / a_s).astype(jnp.int8), a_s

        flops = 2 * m * k * n
        t_bf = _timeit(bf16, a, w)
        t_q = _timeit(w8a8, a, w)
        ai, a_s = act_quant(a)
        w_s = jnp.max(jnp.abs(w), axis=0, keepdims=True).astype(jnp.float32) / 127.0
        wi = jnp.round(w.astype(jnp.float32) / w_s).astype(jnp.int8)
        t_qs = _timeit(w8a8_static, ai, a_s, wi, w_s)
        t_aq = _timeit(act_quant, a)
        print(f"[{name}] {m}x{k}x{n}: bf16 {flops/t_bf/1e12:7.1f} TF/s ({t_bf*1e3:6.2f} ms)  "
              f"w8a8(dyn) {flops/t_q/1e12:7.1f} TF/s ({t_q*1e3:6.2f} ms, {t_bf/t_q:4.2f}x)  "
              f"int8-core {flops/t_qs/1e12:7.1f} TF/s ({t_qs*1e3:6.2f} ms, {t_bf/t_qs:4.2f}x)  "
              f"act-quant {t_aq*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
