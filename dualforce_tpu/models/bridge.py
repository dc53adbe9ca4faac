"""Dual-tower conditional bridge (behavioural reference:
mova/diffusion/models/interactionv2.py:210-593).

Per shared layer, two asymmetric cross-attentions:
  a2v: q = video hidden (dim V), kv = audio hidden (dim A)
  v2a: q = audio hidden (dim A), kv = video hidden (dim V)
each preceded by a LayerNorm on the conditioning sequence, with RMS-normed
q/k, optional time-aligned rotate-half RoPE (ops/rope.build_aligned_cross_rope)
and a residual add scaled by condition_scale.

Params for the interacting layers are STACKED so the dual-tower driver can
scan them together with the tower blocks.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from dualforce_tpu import nn
from dualforce_tpu.config import BridgeConfig
from dualforce_tpu.models.video_dit import attn_qkv_init
from dualforce_tpu.ops import attention, apply_rope_half
from dualforce_tpu.registry import MODELS


def cond_block_init(key, dim: int, kv_dim: int, dtype=jnp.float32,
                    pooled_adaln: bool = False, num_heads: int = 1):
    """ConditionalCrossAttentionBlock params (interactionv2.py:315-327)."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    p = {
        "y_norm": nn.layer_norm_init(kv_dim, dtype),
        "inner": attn_qkv_init(k2, dim, kv_dim, dtype),
    }
    if pooled_adaln and kv_dim % num_heads:
        # fail at init like torch nn.MultiheadAttention's assert — otherwise
        # this surfaces as a cryptic reshape error deep in the forward
        raise ValueError(
            f"pooled_adaln pools the kv side ({kv_dim}) over the query-side "
            f"head count ({num_heads}); kv_dim % num_heads must be 0 "
            "(interactionv2.py:326 has the same constraint)")
    if pooled_adaln:
        p["pool"] = {
            "probe": (jax.random.normal(k3, (1, 1, kv_dim), jnp.float32) * 0.02
                      ).astype(dtype),
            "in_proj": nn.linear_init(k4, kv_dim, 3 * kv_dim, dtype),
            "out_proj": nn.linear_init(k5, kv_dim, kv_dim, dtype),
            "ln": nn.layer_norm_init(kv_dim, dtype),
        }
        p["adaln"] = {"linear": nn.linear_init(k1, kv_dim, 2 * dim, dtype)}
    return p


def per_frame_attention_pooling(p, y, grid, num_heads: int, eps: float):
    """SigLIP-MAP-style probe pooling over H*W tokens per frame
    (interactionv2.py:75-125): q = learnable probe, kv = frame tokens,
    torch.nn.MultiheadAttention semantics (packed in_proj), then LayerNorm."""
    b, L, d = y.shape
    T, H, W = grid
    S = H * W
    hd = d // num_heads
    yf = y.reshape(b * T, S, d)
    wq, wk, wv = jnp.split(p["in_proj"]["kernel"], 3, axis=1)
    bq, bk, bv = jnp.split(p["in_proj"]["bias"], 3)
    probe = p["probe"].astype(y.dtype)
    q = (probe @ wq + bq).reshape(1, 1, num_heads, hd)
    k = (yf @ wk + bk).reshape(b * T, S, num_heads, hd)
    v = (yf @ wv + bv).reshape(b * T, S, num_heads, hd)
    logits = jnp.einsum("xqnd,bknd->bnqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * (hd ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bnqk,bknd->bqnd", probs,
                   v.astype(jnp.float32)).astype(y.dtype)
    o = o.reshape(b * T, 1, d)
    pooled = nn.linear(p["out_proj"], o).reshape(b, T, d)
    return nn.layer_norm(pooled, eps, p["ln"])


def _interp_linear_time(x, target_len: int):
    """F.interpolate(mode='linear', align_corners=False) along axis 1."""
    if x.shape[1] == target_len:
        return x
    return jax.image.resize(x, (x.shape[0], target_len, x.shape[2]),
                            method="linear")


def _adaln_from_pooled(p, x, pooled, x_valid_len: Optional[int] = None):
    """AdaLayerNorm of x by the (time-interpolated) pooled condition
    (interactionv2.py:329-350; chunk_dim=2, norm eps 1e-5). When x carries a
    padded tail (sequence-parallel gather), the interpolation targets only
    the valid length — pad rows get scale=shift=0 (their values are masked
    out of every downstream softmax and dropped at the end)."""
    lx = x.shape[1] if x_valid_len is None else x_valid_len
    pooled = _interp_linear_time(pooled, lx)
    temb = nn.linear(p["adaln"]["linear"], nn.silu(pooled))
    if lx < x.shape[1]:
        temb = jnp.pad(temb, ((0, 0), (0, x.shape[1] - lx), (0, 0)))
    scale, shift = jnp.split(temb, 2, axis=2)
    return nn.layer_norm(x, 1e-5) * (1 + scale) + shift


def pooled_adaln_condition(p, x, y, grid, num_heads: int, eps: float):
    """AdaLN of x by per-frame-pooled y, time-interpolated to x's length
    (interactionv2.py:329-350; AdaLayerNorm chunk_dim=2, norm eps 1e-5)."""
    pooled = per_frame_attention_pooling(p["pool"], y, grid, num_heads, eps)
    return _adaln_from_pooled(p, x, pooled)


def per_frame_attention_pooling_sp(p, y_local, grid, num_heads: int, eps: float,
                                   sp_axis: str,
                                   video_valid: Optional[int] = None):
    """Sequence-parallel per_frame_attention_pooling: y is a contiguous
    cp-shard of the token sequence, so frames may straddle shard boundaries.
    Exact per-frame softmax via an LSE combine over `sp_axis`: pmax of the
    per-frame logit maxima, then psum of exp-sums and exp-weighted values
    (segment ops bucket local tokens by global frame id; pad tokens go to a
    trash segment). fp32 math matches the local version bit-for-bit up to
    reduction order."""
    from jax import lax

    b, l_loc, d = y_local.shape
    T, H, W = grid
    S = H * W
    hd = d // num_heads
    wq, wk, wv = jnp.split(p["in_proj"]["kernel"], 3, axis=1)
    bq, bk, bv = jnp.split(p["in_proj"]["bias"], 3)
    probe = p["probe"].astype(y_local.dtype)
    q = (probe @ wq + bq).reshape(num_heads, hd)
    k = (y_local @ wk + bk).reshape(b, l_loc, num_heads, hd)
    v = (y_local @ wv + bv).reshape(b, l_loc, num_heads, hd)

    gpos = lax.axis_index(sp_axis) * l_loc + jnp.arange(l_loc)
    total = T * S if video_valid is None else video_valid
    valid = gpos < total
    gid = jnp.where(valid, gpos // S, T)        # pad tokens -> trash segment T

    logits = jnp.einsum("nd,blnd->bln", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * (hd ** -0.5)
    neg = jnp.float32(-1e30)
    logits = jnp.where(valid[None, :, None], logits, neg)
    lt = jnp.moveaxis(logits, 1, 0)                              # [l, b, n]
    # the max is a pure stability shift (softmax is invariant to it); pmax
    # has no differentiation rule, and none is needed — stop_gradient on its
    # INPUT so it never sees a tangent
    m = lax.pmax(lax.stop_gradient(
        jax.ops.segment_max(lt, gid, num_segments=T + 1,
                            indices_are_sorted=True)), sp_axis)
    m = jnp.maximum(m, neg)                      # empty trash segment -> finite
    m_tok = jnp.moveaxis(m[gid], 0, 1)                           # [b, l, n]
    e = jnp.where(valid[None, :, None], jnp.exp(logits - m_tok), 0.0)
    den = jax.ops.segment_sum(jnp.moveaxis(e, 1, 0), gid, num_segments=T + 1,
                              indices_are_sorted=True)           # [T+1, b, n]
    num = jax.ops.segment_sum(
        jnp.moveaxis(e[..., None] * v.astype(jnp.float32), 1, 0), gid,
        num_segments=T + 1, indices_are_sorted=True)          # [T+1, b, n, hd]
    den, num = lax.psum((den, num), sp_axis)
    o = num[:T] / jnp.maximum(den[:T, ..., None], 1e-30)
    o = jnp.moveaxis(o, 0, 1).reshape(b, T, d).astype(y_local.dtype)
    pooled = nn.linear(p["out_proj"], o)
    return nn.layer_norm(pooled, eps, p["ln"])


def cond_block_apply(p, x, y, x_freqs, y_freqs, *, num_heads: int, eps: float,
                     attn_impl: str = "auto", video_grid=None,
                     kv_valid_len=None):
    """LayerNorm(y) -> cross-attn with per-side rotate-half RoPE
    (interactionv2.py:227-251, 329-350). When the block carries pooled-AdaLN
    params, x is first conditioned on per-frame-pooled y.

    kv_valid_len: optional [B] int — mask out padded tail rows of y (the
    sequence-parallel gathered K/V side)."""
    if "pool" in p:
        if video_grid is None:
            raise ValueError("pooled_adaln requires video_grid")
        x = pooled_adaln_condition(p, x, y, video_grid, num_heads, eps)
    b, sx, dim = x.shape
    sy = y.shape[1]
    d = dim // num_heads
    y = nn.layer_norm(y, eps, p["y_norm"])
    inner = p["inner"]
    q = nn.rms_norm(nn.linear(inner["q"], x), inner["norm_q"], eps).reshape(b, sx, num_heads, d)
    k = nn.rms_norm(nn.linear(inner["k"], y), inner["norm_k"], eps).reshape(b, sy, num_heads, d)
    v = nn.linear(inner["v"], y).reshape(b, sy, num_heads, d)
    if x_freqs is not None:
        q = apply_rope_half(q, *x_freqs)
    if y_freqs is not None:
        k = apply_rope_half(k, *y_freqs)
    out = attention(q, k, v, kv_valid_len=kv_valid_len,
                    impl=attn_impl).reshape(b, sx, dim)
    return nn.linear(inner["o"], out)


@MODELS.register_module(name="DualTowerBridge")
def init(key, cfg: BridgeConfig, dtype=jnp.float32):
    layers = cfg.interaction_layers()
    ka, kv = jax.random.split(key)
    a2v = [cond_block_init(k, cfg.visual_hidden_dim, cfg.audio_hidden_dim, dtype)
           for k in jax.random.split(ka, len(layers))]
    # v2a optionally carries pooled-AdaLN (interactionv2.py:412-418: a2v never does)
    a_heads = cfg.audio_hidden_dim // cfg.head_dim
    v2a = [cond_block_init(k, cfg.audio_hidden_dim, cfg.visual_hidden_dim, dtype,
                           pooled_adaln=cfg.pooled_adaln, num_heads=a_heads)
           for k in jax.random.split(kv, len(layers))]
    params = {"a2v": nn.stack_params(a2v) if a2v else {},
              "v2a": nn.stack_params(v2a) if v2a else {}}
    if cfg.trainable_condition_scale:
        params["condition_scale"] = jnp.ones((1,), jnp.float32)
    return params


def layer_apply(a2v_p, v2a_p, visual_x, audio_x, visual_freqs, audio_freqs,
                cfg: BridgeConfig, a2v_scale=1.0, v2a_scale=1.0,
                attn_impl: str = "auto", video_grid=None):
    """One bridge interaction: BOTH directions read the pre-interaction hidden
    states (interactionv2.py:539-593). Per-direction condition scales override
    the global one upstream (resolve in the caller)."""
    v_heads = cfg.visual_hidden_dim // cfg.head_dim
    a_heads = cfg.audio_hidden_dim // cfg.head_dim
    dv = cond_block_apply(a2v_p, visual_x, audio_x, visual_freqs, audio_freqs,
                          num_heads=v_heads, eps=cfg.eps, attn_impl=attn_impl)
    da = cond_block_apply(v2a_p, audio_x, visual_x, audio_freqs, visual_freqs,
                          num_heads=a_heads, eps=cfg.eps, attn_impl=attn_impl,
                          video_grid=video_grid)
    return (visual_x + dv * jnp.asarray(a2v_scale, visual_x.dtype),
            audio_x + da * jnp.asarray(v2a_scale, audio_x.dtype))


def cond_block_apply_dist(p, x, y_local, x_freqs, y_freqs_local, *,
                          num_heads: int, eps: float, sp_axis: str,
                          attn_impl: str = "auto",
                          kv_global_valid: Optional[int] = None,
                          video_grid=None,
                          x_valid_len: Optional[int] = None):
    """Sequence-parallel variant: Q side (`x`) replicated/full, K/V side
    (`y_local`) sequence-sharded over `sp_axis`. Exact softmax via
    LSE-weighted psum of per-rank partials — the bridge's v2a direction
    (403 audio queries vs cp-sharded 43k video tokens) costs one tiny
    all-reduce instead of gathering the video K/V (SURVEY.md §7.3.1).

    kv_global_valid: static global K/V token count (padded tails masked).
    x_valid_len: static valid length of the gathered Q side (pooled-AdaLN
    interpolation target when x carries a cp pad tail)."""
    from dualforce_tpu.parallel.ring_attention import (
        inner_for_impl, lse_combine_cross_attention)

    if "pool" in p:
        if video_grid is None:
            raise ValueError("pooled_adaln requires video_grid")
        pooled = per_frame_attention_pooling_sp(
            p["pool"], y_local, video_grid, num_heads, eps, sp_axis,
            video_valid=kv_global_valid)
        x = _adaln_from_pooled(p, x, pooled, x_valid_len=x_valid_len)
    b, sx, dim = x.shape
    sy = y_local.shape[1]
    d = dim // num_heads
    y = nn.layer_norm(y_local, eps, p["y_norm"])
    inner = p["inner"]
    q = nn.rms_norm(nn.linear(inner["q"], x), inner["norm_q"], eps).reshape(b, sx, num_heads, d)
    k = nn.rms_norm(nn.linear(inner["k"], y), inner["norm_k"], eps).reshape(b, sy, num_heads, d)
    v = nn.linear(inner["v"], y).reshape(b, sy, num_heads, d)
    if x_freqs is not None:
        q = apply_rope_half(q, *x_freqs)
    if y_freqs_local is not None:
        k = apply_rope_half(k, *y_freqs_local)
    out = lse_combine_cross_attention(
        q, k, v, sp_axis, inner=inner_for_impl(attn_impl),
        global_valid_len=kv_global_valid).reshape(b, sx, dim)
    return nn.linear(inner["o"], out)


def layer_apply_sp(a2v_p, v2a_p, visual_x, audio_x, visual_freqs_local,
                   audio_freqs_full, cfg: BridgeConfig, sp_axis: str,
                   a2v_scale=1.0, v2a_scale=1.0, attn_impl: str = "auto",
                   video_valid: Optional[int] = None,
                   audio_valid: Optional[int] = None,
                   video_grid=None):
    """Bridge interaction under sequence parallelism.

    visual_x / audio_x are cp-sharded token chunks. a2v gathers the (tiny)
    audio side as full K/V and attends locally; v2a runs full-audio queries
    against local video K/V with an exact LSE combine, then keeps the local
    audio slice.

    video_valid / audio_valid: static global token counts when the padded
    global lengths exceed them — pad rows are masked out of BOTH directions'
    softmax, so cp>1 equals cp=1 exactly even at the real (43120, 403)
    geometry where 403 % cp != 0 (the reference leaks its zero-pads into
    the denominators instead, functional.py:55-95).
    """
    import jax
    from jax import lax

    v_heads = cfg.visual_hidden_dim // cfg.head_dim
    a_heads = cfg.audio_hidden_dim // cfg.head_dim
    la_local = audio_x.shape[1]
    n_dev = lax.axis_size(sp_axis)

    audio_full = lax.all_gather(audio_x, sp_axis, axis=1, tiled=True)
    a_vlen = None
    if audio_valid is not None and audio_valid < n_dev * la_local:
        a_vlen = jnp.full((audio_x.shape[0],), audio_valid, jnp.int32)

    dv = cond_block_apply(a2v_p, visual_x, audio_full,
                          visual_freqs_local, audio_freqs_full,
                          num_heads=v_heads, eps=cfg.eps, attn_impl=attn_impl,
                          kv_valid_len=a_vlen)
    da_full = cond_block_apply_dist(v2a_p, audio_full, visual_x,
                                    audio_freqs_full, visual_freqs_local,
                                    num_heads=a_heads, eps=cfg.eps,
                                    sp_axis=sp_axis, attn_impl=attn_impl,
                                    kv_global_valid=video_valid,
                                    video_grid=video_grid,
                                    x_valid_len=audio_valid)
    idx = lax.axis_index(sp_axis)
    da_local = lax.dynamic_slice_in_dim(da_full, idx * la_local, la_local, axis=1)
    return (visual_x + dv * jnp.asarray(a2v_scale, visual_x.dtype),
            audio_x + da_local * jnp.asarray(v2a_scale, audio_x.dtype))


def resolve_condition_scale(params, cfg: BridgeConfig,
                            external_scale: Optional[float]) -> jnp.ndarray:
    """External scale wins over the trainable one (interactionv2.py:526-535)."""
    if external_scale is not None:
        return jnp.asarray(external_scale, jnp.float32)
    if cfg.trainable_condition_scale:
        return params["condition_scale"][0]
    return jnp.asarray(1.0, jnp.float32)
