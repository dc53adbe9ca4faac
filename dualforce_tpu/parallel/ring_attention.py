"""Sequence-parallel attention collectives (shard_map level).

TPU-native replacement for yunchang's Ulysses×Ring USP attention
(reference wan_video_dit.py:192-208, inference_single.py:102-119):

  - `ring_attention`: K/V chunks rotate around the `cp` ring via
    `lax.ppermute` (ICI collective-permute on TPU) with online-softmax
    accumulation — each rank keeps its local Q shard. O(S/cp) memory,
    bandwidth-optimal, comm overlappable by XLA.
  - `lse_combine_cross_attention`: for cross-attention where Q is SMALL and
    replicated but K/V are sequence-sharded (the bridge's v2a direction:
    403 audio queries against 43k sharded video tokens) — each rank attends
    to its local K/V chunk, partials merge exactly via a log-sum-exp-weighted
    psum. One tiny all-reduce instead of gathering 43k-token K/V.
  - `gather_kv_attention`: for self-attention on a TINY sharded sequence
    (audio's 403 tokens at dim 1536 ≈ 1.2 MB) — all-gather K/V once and
    attend locally; cheaper than a ring of launches, and padding is exact
    via a kv-length mask.
  - `ulysses_attention`: all-to-all head redistribution (each rank sees the
    FULL sequence for a head subset), matching yunchang's Ulysses degree;
    composable with ring for 2-level hybrids.

Padding exactness: when the global sequence length does not divide the axis
size, `global_valid_len` masks the zero-padded tail rows out of every softmax
(per rotating chunk in the ring; per local chunk in the LSE combine) so cp>1
matches cp=1 bit-for-tolerance — unlike the reference, whose pad rows leak
into the denominators (functional.py:55-95).

All functions run inside `shard_map` over a mesh axis; `inner` is the local
attention kernel `(q, k, v, kv_valid=None) -> (out, lse)` (defaults to the
Pallas flash / XLA reference dispatch).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax



def _inner_with_lse(q, k, v, kv_valid=None):
    """XLA local attention returning (normalized_out, lse). q/k/v: [B,S,N,D].

    kv_valid: optional [B] int — keys at positions >= kv_valid are masked.
    Fully-masked rows return out=0, lse=-inf (so ring/LSE combines weight
    them to exactly zero instead of NaN)."""
    d = q.shape[-1]
    qf = q.astype(jnp.float32) * (d ** -0.5)
    logits = jnp.einsum("bqnd,bknd->bnqk", qf, k.astype(jnp.float32))
    if kv_valid is not None:
        kv_ids = jnp.arange(k.shape[1])[None, None, None, :]
        mask = kv_ids < kv_valid[:, None, None, None]
        logits = jnp.where(mask, logits, -jnp.inf)
    m = jnp.max(logits, axis=-1, keepdims=True)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.exp(logits - m_safe)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bnqk,bknd->bqnd", p / jnp.maximum(l, 1e-37),
                   v.astype(jnp.float32))
    lse = jnp.where(l > 0, m_safe + jnp.log(jnp.maximum(l, 1e-37)),
                    -jnp.inf)[..., 0]                 # [B, N, Sq]
    return o.astype(q.dtype), lse


def _inner_auto(q, k, v, kv_valid=None):
    """Pallas flash kernel (with LSE) when on real TPU and the shape
    qualifies for MXU tiling (head_dim % 128, non-trivial q length), XLA
    attention otherwise — the per-shard analogue of ops.attention's dispatch.
    (Off-TPU the kernel would run in the Pallas HLO interpreter, which
    rejects vma-checked shard_map contexts — tests inject it explicitly.)"""
    d = q.shape[-1]
    if (jax.default_backend() == "tpu" and d % 128 == 0
            and q.shape[1] >= 128 and k.shape[1] >= 128):
        from dualforce_tpu.ops.flash_attention import flash_attention_with_lse

        return flash_attention_with_lse(q, k, v, kv_valid_len=kv_valid)
    return _inner_with_lse(q, k, v, kv_valid)


def _inner_pallas(q, k, v, kv_valid=None):
    """Unconditional Pallas inner (tests force this under interpret mode)."""
    from dualforce_tpu.ops.flash_attention import flash_attention_with_lse

    return flash_attention_with_lse(q, k, v, block_q=128, block_k=128,
                                    kv_valid_len=kv_valid)


def inner_for_impl(attn_impl) -> Callable:
    """Map an ops.attention impl name to a (q,k,v,kv_valid)->(o,lse) inner."""
    if callable(attn_impl):
        return attn_impl
    if attn_impl == "ref":
        return _inner_with_lse
    if attn_impl == "pallas":
        return _inner_pallas
    return _inner_auto  # auto / fast / sage (no int8 LSE variant)


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   axis_name: str,
                   inner: Callable = _inner_auto,
                   global_valid_len: Optional[int] = None) -> jnp.ndarray:
    """Ring attention over a sharded sequence. q/k/v: [B, S_local, N, D].

    global_valid_len: static global token count when the padded sequence
    (axis_size * S_local) exceeds it — the pad tail (always on the last
    rank's chunk) is masked out of every rotating chunk's softmax, making
    cp>1 exact."""
    n_dev = lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    b, sq, nh, d = q.shape
    chunk = k.shape[1]
    masked = (global_valid_len is not None
              and global_valid_len < n_dev * chunk)
    my = lax.axis_index(axis_name) if masked else None

    def body(i, carry):
        k_c, v_c, m, s, acc = carry
        if masked:
            # the chunk currently held came from rank (my - i) mod n
            src = (my - i) % n_dev
            kv_valid = jnp.clip(global_valid_len - src * chunk, 0, chunk)
            o_i, lse_i = inner(q, k_c, v_c,
                               jnp.full((b,), kv_valid, jnp.int32))
            # sanitize a fully-masked chunk (kv_valid == 0): weight -> 0
            lse_i = jnp.where(kv_valid > 0, lse_i, -jnp.inf)
            o_i = jnp.where(kv_valid > 0, o_i.astype(jnp.float32), 0.0)
        else:
            o_i, lse_i = inner(q, k_c, v_c)
            o_i = o_i.astype(jnp.float32)
        m_new = jnp.maximum(m, lse_i)
        if masked:
            m_fin = jnp.isfinite(m_new)
            w_old = jnp.where(m_fin, jnp.exp(jnp.where(m_fin, m - m_new, 0.0)), 0.0)
            w_new = jnp.where(m_fin, jnp.exp(jnp.where(m_fin, lse_i - m_new, 0.0)), 0.0)
        else:
            w_old = jnp.exp(m - m_new)
            w_new = jnp.exp(lse_i - m_new)
        acc = acc * w_old.transpose(0, 2, 1)[..., None] + o_i * w_new.transpose(0, 2, 1)[..., None]
        s = s * w_old + w_new
        k_c = lax.ppermute(k_c, axis_name, perm)
        v_c = lax.ppermute(v_c, axis_name, perm)
        return k_c, v_c, m_new, s, acc

    m0 = jnp.full((b, nh, sq), -jnp.inf, jnp.float32)
    s0 = jnp.zeros((b, nh, sq), jnp.float32)
    acc0 = jnp.zeros((b, sq, nh, d), jnp.float32)
    # mark the constant initial carry as device-varying over the same manual
    # axes as q (ring axis + any manual batch axis) so the fori_loop carry
    # types match (shard_map vma typing)
    vma = getattr(jax.typeof(q), "vma", None) or frozenset()
    axes = tuple(set(vma) | {axis_name})
    if hasattr(jax.lax, "pcast"):  # pvary deprecated in favor of pcast
        m0, s0, acc0 = jax.lax.pcast((m0, s0, acc0), axes, to="varying")
    else:
        m0, s0, acc0 = jax.lax.pvary((m0, s0, acc0), axes)
    _, _, _, s, acc = lax.fori_loop(0, n_dev, body, (k, v, m0, s0, acc0))
    out = acc / s.transpose(0, 2, 1)[..., None]
    return out.astype(q.dtype)


def lse_combine_cross_attention(q: jnp.ndarray, k_local: jnp.ndarray,
                                v_local: jnp.ndarray, axis_name: str,
                                inner: Callable = _inner_auto,
                                global_valid_len: Optional[int] = None
                                ) -> jnp.ndarray:
    """Cross-attention with replicated Q and sequence-sharded K/V; exact
    softmax via LSE-weighted all-reduce of per-rank partials.

    global_valid_len: static global K/V token count; the pad tail of the
    last rank's local chunk is masked so the combine stays exact."""
    chunk = k_local.shape[1]
    n_dev = lax.axis_size(axis_name)
    if global_valid_len is not None and global_valid_len < n_dev * chunk:
        idx = lax.axis_index(axis_name)
        kv_valid = jnp.clip(global_valid_len - idx * chunk, 0, chunk)
        o_i, lse_i = inner(q, k_local, v_local,
                           jnp.full((q.shape[0],), kv_valid, jnp.int32))
        lse_i = jnp.where(kv_valid > 0, lse_i, -jnp.inf)
        o_i = jnp.where(kv_valid > 0, o_i.astype(jnp.float32), 0.0)
        # the max is pure numerical stabilization — the combine is invariant
        # to it, so stop_gradient is exact (pmax has no VJP rule)
        m = lax.pmax(lax.stop_gradient(lse_i), axis_name)  # finite: global has keys
        w = jnp.where(jnp.isfinite(lse_i), jnp.exp(
            jnp.where(jnp.isfinite(lse_i), lse_i - m, 0.0)), 0.0)
    else:
        o_i, lse_i = inner(q, k_local, v_local)
        o_i = o_i.astype(jnp.float32)
        m = lax.pmax(lax.stop_gradient(lse_i), axis_name)
        w = jnp.exp(lse_i - m)                        # [B, N, Sq]
    num = lax.psum(o_i * w.transpose(0, 2, 1)[..., None], axis_name)
    den = lax.psum(w, axis_name)
    return (num / den.transpose(0, 2, 1)[..., None]).astype(q.dtype)


def gather_kv_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        axis_name: str,
                        global_valid_len: Optional[int] = None,
                        impl="auto") -> jnp.ndarray:
    """Self-attention on a tiny sharded sequence: all-gather K/V (cheap —
    audio is ~1.2 MB), attend locally with the pad tail masked. Exact for
    any sequence length; the right tool when S is small enough that a ring
    would be launch-bound."""
    k_full = lax.all_gather(k, axis_name, axis=1, tiled=True)
    v_full = lax.all_gather(v, axis_name, axis=1, tiled=True)
    vlen = None
    if global_valid_len is not None and global_valid_len < k_full.shape[1]:
        vlen = jnp.full((q.shape[0],), global_valid_len, jnp.int32)
    from dualforce_tpu.ops.attention import attention

    return attention(q, k_full, v_full, kv_valid_len=vlen, impl=impl)


def ulysses_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      axis_name: str,
                      inner: Optional[Callable] = None) -> jnp.ndarray:
    """Ulysses: all-to-all so each rank holds the FULL sequence for N/cp heads,
    run local attention, all-to-all back. Requires num_heads % axis_size == 0."""
    n_dev = lax.axis_size(axis_name)

    def scatter_heads(x):  # [B, S_loc, N, D] -> [B, S_full, N/n, D]
        b, s, nh, d = x.shape
        x = x.reshape(b, s, n_dev, nh // n_dev, d)
        x = lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1, tiled=False)
        return x.reshape(b, s * n_dev, nh // n_dev, d)

    def gather_heads(x):  # [B, S_full, N/n, D] -> [B, S_loc, N, D]
        b, sf, nh_l, d = x.shape
        x = x.reshape(b, n_dev, sf // n_dev, nh_l, d)
        # remove the seq-chunk device axis, insert the head device axis BEFORE
        # local heads (full head index = dev * nh_local + local head)
        x = lax.all_to_all(x, axis_name, split_axis=1, concat_axis=2, tiled=False)
        return x.reshape(b, sf // n_dev, nh_l * n_dev, d)

    qh, kh, vh = scatter_heads(q), scatter_heads(k), scatter_heads(v)
    if inner is None:
        from dualforce_tpu.ops.attention import attention

        out = attention(qh, kh, vh)   # Pallas flash / XLA ref dispatch
    else:
        out, _ = inner(qh, kh, vh)
    return gather_heads(out)
