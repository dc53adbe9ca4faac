"""Attention dispatch.

The reference dispatches FA3 -> FA2 -> Sage -> SDPA (wan_video_dit.py:58-91);
here the chain is Pallas TPU flash attention -> XLA reference attention.
All call sites (video/audio self-attn, text cross-attn, bridge cross-attn) go
through `attention(q, k, v)` with [B, S, N, D] layout, non-causal, scale
1/sqrt(D), optionally with a kv-length mask for batched serving.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_FLASH_MIN_SEQ = 256  # below this, XLA's fused attention is already optimal


def attention_ref(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_valid_len: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Plain XLA attention, fp32 softmax. q/k/v: [B, S, N, D] -> [B, Sq, N, D]."""
    d = q.shape[-1]
    if scale is None:
        scale = d ** -0.5
    qf = q.astype(jnp.float32) * scale
    logits = jnp.einsum("bqnd,bknd->bnqk", qf, k.astype(jnp.float32))
    if kv_valid_len is not None:
        kv_ids = jnp.arange(k.shape[1])[None, None, None, :]
        mask = kv_ids < kv_valid_len[:, None, None, None]
        logits = jnp.where(mask, logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bnqk,bknd->bqnd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)


@functools.lru_cache(maxsize=1)
def _flash_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_valid_len: Optional[jnp.ndarray] = None,
    impl="auto",
) -> jnp.ndarray:
    """Fused attention. q/k/v: [B, S, N, D] (Sq may differ from Sk).

    impl: "auto" | "fast" | "sage" | "pallas" | "ref" | a callable
    (q, k, v, kv_valid_len) -> out — the hook the sequence-parallel path uses
    to inject ring attention. "fast" = the static-shift softmax kernel
    (exact for QK-normed attention, which all MOVA attention is; ~13% faster
    at 43k tokens — see flash_attention._fwd_kernel). "sage" = int8-QK
    quantized kernel (SageAttention-equivalent, wan_video_dit.py:40-43;
    inference-only, ~1.16x "fast", rel err ~1.5e-2 — the int8 floor).
    """
    if callable(impl):
        return impl(q, k, v, kv_valid_len)
    if impl == "ref":
        return attention_ref(q, k, v, kv_valid_len)
    if impl in ("auto", "fast", "sage") and (
        not _flash_available() or q.shape[1] < _FLASH_MIN_SEQ or q.shape[-1] % 128 != 0
    ):
        return attention_ref(q, k, v, kv_valid_len)
    if impl == "sage":
        from dualforce_tpu.ops.flash_attention import sage_attention

        return sage_attention(q, k, v, kv_valid_len=kv_valid_len)
    from dualforce_tpu.ops.flash_attention import FAST_SOFTMAX_CAP, flash_attention

    cap = FAST_SOFTMAX_CAP if impl == "fast" else None
    return flash_attention(q, k, v, kv_valid_len=kv_valid_len, softmax_cap=cap)
