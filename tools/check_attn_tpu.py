"""Numerical check of the compiled Pallas flash kernel on the real chip
(the pytest suite exercises interpret mode on CPU; this validates the
Mosaic-compiled path): fwd + grads vs XLA reference, padded + masked shapes."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dualforce_tpu.utils.misc import respect_platform_env  # noqa: E402

respect_platform_env()  # JAX_PLATFORMS=cpu must keep subprocesses off the chip

import jax
import jax.numpy as jnp

from dualforce_tpu.ops.attention import attention_ref
from dualforce_tpu.ops.flash_attention import flash_attention, sage_attention


def check(sq, sk, n=4, d=128, vlen=None, tag=""):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (2, sq, n, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (2, sk, n, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (2, sk, n, d), jnp.bfloat16)
    vl = None if vlen is None else jnp.asarray(vlen, jnp.int32)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.square(flash_attention(q, k, v, kv_valid_len=vl).astype(jnp.float32)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(attention_ref(q, k, v, kv_valid_len=vl).astype(jnp.float32)))

    o_f = jax.jit(lambda q, k, v: flash_attention(q, k, v, kv_valid_len=vl))(q, k, v)
    o_r = jax.jit(lambda q, k, v: attention_ref(q, k, v, kv_valid_len=vl))(q, k, v)
    err_o = float(jnp.max(jnp.abs(o_f.astype(jnp.float32) - o_r.astype(jnp.float32))))

    g_f = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    g_r = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    errs = [float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))) /
                  (float(jnp.max(jnp.abs(b.astype(jnp.float32)))) + 1e-6))
            for a, b in zip(g_f, g_r)]
    print(f"{tag:24s} out_maxabs={err_o:.4f}  rel_grad_err(q,k,v)="
          f"{errs[0]:.4f},{errs[1]:.4f},{errs[2]:.4f}", flush=True)
    assert err_o < 0.1 and all(e < 0.1 for e in errs), f"{tag} FAILED"


def check_sage(sq, sk, n=4, d=128, vlen=None, tag=""):
    """Fwd-only (sage is inference-only); gate = the int8 quantization floor."""
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (2, sq, n, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (2, sk, n, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (2, sk, n, d), jnp.bfloat16)
    vl = None if vlen is None else jnp.asarray(vlen, jnp.int32)
    o_s = jax.jit(lambda q, k, v: sage_attention(q, k, v, kv_valid_len=vl))(q, k, v)
    o_r = jax.jit(lambda q, k, v: attention_ref(q, k, v, kv_valid_len=vl))(q, k, v)
    rel = (float(jnp.linalg.norm((o_s - o_r).astype(jnp.float32))) /
           (float(jnp.linalg.norm(o_r.astype(jnp.float32))) + 1e-6))
    print(f"{tag:24s} sage rel_err={rel:.4f}", flush=True)
    assert rel < 2.5e-2, f"{tag} FAILED"


if __name__ == "__main__":
    check(1111, 1111, tag="self padded")
    check(2048, 2048, tag="self aligned")
    check(2048, 512, tag="cross text")
    check(403, 2048, tag="bridge v2a")
    check(2048, 403, tag="bridge a2v")
    check(1111, 1111, vlen=[700, 1111], tag="self vlen")
    check(2048, 512, vlen=[333, 512], tag="cross vlen")
    check_sage(2048, 2048, tag="sage self aligned")
    check_sage(1111, 1111, tag="sage self padded")
    check_sage(2048, 512, tag="sage cross text")
    check_sage(403, 2048, tag="sage bridge v2a")
    check_sage(1111, 1111, vlen=[700, 1111], tag="sage self vlen")
    print("all TPU flash checks OK")
