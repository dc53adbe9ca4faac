"""Functional NN primitives.

Models in this framework are pure functions over parameter pytrees (nested
dicts of jnp arrays). Each module provides `<name>_init(key, ...) -> params`
and an apply function. This keeps the whole model jit/scan/pjit-friendly and
makes torch->JAX weight conversion mechanical (names mirror the reference
modules' state-dict keys).

Numerics conventions (deliberately matching the reference):
  - LayerNorm / RMSNorm statistics computed in float32, result cast back.
  - Linear kernels stored as [in, out] (JAX convention; converters transpose).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

def _uniform(key, shape, bound, dtype):
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound, dtype=jnp.float32).astype(dtype)


FP8_DTYPES = (jnp.float8_e4m3fn, jnp.float8_e5m2)


def cast_tree_fp8(tree, weight_dtype=None, other_dtype=jnp.bfloat16):
    """Cast matmul kernels (ndim >= 2) to fp8 storage and everything
    precision-sensitive (biases, norm scales, modulation tables) to
    `other_dtype`. The fp8 weights upcast at use inside `linear`."""
    weight_dtype = weight_dtype or jnp.float8_e4m3fn

    def cast(path, x):
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path)
        if x.ndim >= 2 and "modulation" not in name and "norm" not in name:
            return x.astype(weight_dtype)
        return x.astype(other_dtype)

    return jax.tree_util.tree_map_with_path(cast, tree)


def _weight(p, key, like):
    """Fetch a weight, upcasting fp8 storage to the activation dtype at use
    (fp8 weight storage halves HBM; v5e has no fp8 MXU, so compute stays
    bf16 — the conversion is one VPU pass per weight per matmul, amortized
    over the token dimension)."""
    w = p[key]
    if w.dtype in FP8_DTYPES:
        w = w.astype(like.dtype)
    return w


def quantize_linear_int8(p):
    """Pre-quantize a linear's kernel to int8 with per-output-channel
    symmetric scales (serving mode; counterpart in spirit to the reference's
    sageattention fallback, wan_video_dit.py:79-84 — lossy, opt-in, 2x MXU).

    Works on single [in, out] kernels and scan-stacked [L, in, out] kernels
    (the scale max runs over the `in` axis only, so per-layer scales are
    preserved; stacked kernels are quantized one layer-slice at a time so
    the f32 transient never exceeds one layer — a flagship stacked FFN
    kernel is 5.7 GB in bf16 and would need ~3x that upcast whole).
    Measured on v5e at the 43k-token projection shapes: 1.3-1.65x over bf16
    including the dynamic activation quant."""
    def one(w):
        w = w.astype(jnp.float32)
        scale = jnp.maximum(jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 127.0,
                            1e-12)
        return jnp.round(w / scale).astype(jnp.int8), scale

    w = p["kernel"]
    if w.ndim >= 3:
        qs = [one(w[i]) for i in range(w.shape[0])]
        q = jnp.stack([a for a, _ in qs])
        scale = jnp.stack([s for _, s in qs])
    else:
        q, scale = one(w)
    out = {"kernel_q": q, "kernel_scale": scale}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


QUANT_INT8_SCOPES = ("self_attn", "cross_attn", "ffn", "inner")


INT4_GROUP = 128  # input-dim group size for int4 scales (all MOVA projection
                  # in-dims — 5120/13824/1536/8960/4096 — divide it)


def quantize_linear_int4(p, group: int = INT4_GROUP):
    """Pre-quantize a linear's kernel to packed int4 with per-(input-group,
    output-channel) symmetric scales — weights-ONLY quantization: the
    kernel dequantizes to the activation dtype at use and the matmul runs
    bf16 on the MXU (unlike `_linear_int8`'s w8a8). Purpose is HBM, not
    FLOPs: 0.5 byte/param makes a 14.3B-param flagship video tower ~7.2 GB
    — small enough to be fully HBM-RESIDENT on one 16 GB v5e, replacing
    the reference's group-offload streaming (README 12 GB-VRAM row) with
    zero per-pass host traffic. Storage: kernel_q4 [in/2, out] uint8 (two
    nibbles along the input dim), kernel_scale4 [in/group, out] f32.

    Works on single [in, out] kernels and scan-stacked [L, in, out] kernels
    (per-layer slices quantized one at a time, like quantize_linear_int8)."""
    def one(w):
        w = w.astype(jnp.float32)
        din, dout = w.shape
        g = group if din % group == 0 else (din if din % 2 == 0 else 1)
        if din % 2:
            raise ValueError(f"int4 pack needs even in_dim, got {din}")
        wg = w.reshape(din // g, g, dout)
        scale = jnp.maximum(jnp.max(jnp.abs(wg), axis=1) / 7.0, 1e-12)
        q = jnp.clip(jnp.round(wg / scale[:, None, :]), -7, 7)
        q = (q.reshape(din // 2, 2, dout) + 8.0).astype(jnp.uint8)
        packed = (q[:, 0, :] << 4) | q[:, 1, :]
        return packed, scale.astype(jnp.float32)

    w = p["kernel"]
    if w.ndim >= 3:
        qs = [one(w[i]) for i in range(w.shape[0])]
        q = jnp.stack([a for a, _ in qs])
        scale = jnp.stack([s for _, s in qs])
    else:
        q, scale = one(w)
    out = {"kernel_q4": q, "kernel_scale4": scale}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def quantize_tree_int4(tree, scopes=QUANT_INT8_SCOPES, group: int = INT4_GROUP):
    """int4 counterpart of quantize_tree_int8: same scopes (block attention
    q/k/v/o and FFN kernels), same stacked-kernel handling."""
    def walk(node, in_scope):
        if isinstance(node, dict):
            if in_scope and "kernel" in node and node["kernel"].ndim >= 2:
                return quantize_linear_int4(node, group)
            return {k: walk(v, in_scope or k in scopes)
                    for k, v in node.items()}
        return node

    return walk(tree, False)


def dequantize_int4(q4, scale, dtype):
    """[in/2, out] packed uint8 + [in/groups, out] scales -> [in, out]."""
    hi = (q4 >> 4).astype(jnp.int8) - 8
    lo = (q4 & 0xF).astype(jnp.int8) - 8
    din = q4.shape[-2] * 2
    w = jnp.stack([hi, lo], axis=-2).reshape(*q4.shape[:-2], din, q4.shape[-1])
    ng = scale.shape[-2]
    wg = w.reshape(*w.shape[:-2], ng, din // ng, w.shape[-1])
    wg = wg.astype(dtype) * scale[..., :, None, :].astype(dtype)
    return wg.reshape(*w.shape[:-2], din, w.shape[-1])


def _linear_int4(p, x):
    """Weights-only int4 matmul: dequantize the packed kernel to the
    activation dtype (one VPU pass over 0.5 byte/param of HBM) and run the
    bf16 MXU matmul. Dequant cost is amortized over the token dim like the
    fp8 upcast in `_weight`."""
    w = dequantize_int4(p["kernel_q4"], p["kernel_scale4"], x.dtype)
    y = x @ w
    if "bias" in p:
        y = y + _weight(p, "bias", x).astype(x.dtype)
    return y


def quantize_tree_int8(tree, scopes=QUANT_INT8_SCOPES):
    """Quantize the per-token projection linears of a DiT/bridge param tree
    to int8 (serving mode). Only linears under `scopes` (block attention
    q/k/v/o and FFN kernels — ~97% of per-token matmul FLOPs) are touched;
    modulation tables, norms, time/text embeddings, patchify and the output
    head stay in their storage dtype (precision-sensitive, negligible FLOPs).
    Handles scan-stacked [L, in, out] kernels."""
    def walk(node, in_scope):
        if isinstance(node, dict):
            if in_scope and "kernel" in node and node["kernel"].ndim >= 2:
                return quantize_linear_int8(node)
            return {k: walk(v, in_scope or k in scopes) for k, v in node.items()}
        return node

    return walk(tree, False)


def _linear_int8(p, x):
    """w8a8 matmul: dynamic per-token activation absmax quant, int8xint8 ->
    int32 on the MXU, dequant by (act_scale x per-channel weight scale)."""
    a32 = x.astype(jnp.float32)
    a_scale = jnp.max(jnp.abs(a32), axis=-1, keepdims=True) / 127.0
    a_scale = jnp.maximum(a_scale, 1e-12)
    ai = jnp.round(a32 / a_scale).astype(jnp.int8)
    acc = jax.lax.dot_general(
        ai, p["kernel_q"], (((ai.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = (acc.astype(jnp.float32) * a_scale * p["kernel_scale"]).astype(x.dtype)
    if "bias" in p:
        y = y + _weight(p, "bias", x)
    return y


def linear_init(key, in_dim: int, out_dim: int, dtype=jnp.float32, bias: bool = True):
    """Matches torch.nn.Linear default init (kaiming-uniform kernel, uniform bias)."""
    kk, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    p = {"kernel": _uniform(kk, (in_dim, out_dim), bound, dtype)}
    if bias:
        p["bias"] = _uniform(kb, (out_dim,), bound, dtype)
    return p


def linear(p, x: jnp.ndarray) -> jnp.ndarray:
    if "kernel_q4" in p:
        return _linear_int4(p, x)
    if "kernel_q" in p:
        return _linear_int8(p, x)
    y = x @ _weight(p, "kernel", x)
    if "bias" in p:
        y = y + _weight(p, "bias", x)
    return y


def layer_norm_init(dim: int, dtype=jnp.float32, affine: bool = True):
    if not affine:
        return {}
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(x: jnp.ndarray, eps: float = 1e-6, params: Optional[dict] = None) -> jnp.ndarray:
    """LayerNorm with fp32 statistics; affine applied if params given."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if params:
        y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(dtype)


def rms_norm_init(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype)}


def rms_norm(x: jnp.ndarray, params: dict, eps: float = 1e-6) -> jnp.ndarray:
    """RMSNorm over the last axis, fp32 statistics (torch.nn.RMSNorm convention:
    normalize in fp32, multiply by weight, cast back — wan_video_dit.py:140-151)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
    y = y * params["scale"].astype(jnp.float32)
    return y.astype(dtype)


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=True)


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=False)


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)


# ---------------------------------------------------------------------------
# patch embedding (replaces stride==kernel Conv3d/Conv1d with reshape+matmul,
# which maps directly onto the MXU instead of going through conv lowering)
# ---------------------------------------------------------------------------

def patch_embed_3d_init(key, in_dim: int, dim: int, patch_size: Tuple[int, int, int],
                        dtype=jnp.float32):
    """Equivalent to nn.Conv3d(in_dim, dim, kernel_size=patch, stride=patch).

    Kernel stored as [in_dim * pt * ph * pw, dim] with the flattened input
    ordering (c, pt, ph, pw) — the torch conv weight [dim, in, pt, ph, pw]
    converts via reshape+transpose.
    """
    pt, ph, pw = patch_size
    fan_in = in_dim * pt * ph * pw
    kk, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "kernel": _uniform(kk, (fan_in, dim), bound, dtype),
        "bias": _uniform(kb, (dim,), bound, dtype),
    }


def patch_embed_3d(p, x: jnp.ndarray, patch_size: Tuple[int, int, int]):
    """x: [B, C, F, H, W] -> tokens [B, f*h*w, dim], grid (f, h, w).

    Token order matches the reference's `rearrange(x, 'b c f h w -> b (f h w) c')`
    after the conv (wan_video_dit.py:399-409).
    """
    b, c, F, H, W = x.shape
    pt, ph, pw = patch_size
    f, h, w = F // pt, H // ph, W // pw
    x = x.reshape(b, c, f, pt, h, ph, w, pw)
    # -> [b, f, h, w, (c, pt, ph, pw)]
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(b, f * h * w, c * pt * ph * pw)
    return linear(p, x), (f, h, w)


def unpatchify_3d(x: jnp.ndarray, grid: Tuple[int, int, int],
                  patch_size: Tuple[int, int, int], out_dim: int) -> jnp.ndarray:
    """Inverse of head output: [B, f*h*w, pt*ph*pw*out] -> [B, out, F, H, W].

    Channel-last within the patch, matching the reference's
    `rearrange('b (f h w) (x y z c) -> b c (f x) (h y) (w z)')` (wan_video_dit.py:411-416).
    """
    f, h, w = grid
    pt, ph, pw = patch_size
    b = x.shape[0]
    x = x.reshape(b, f, h, w, pt, ph, pw, out_dim)
    x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)  # b, c, f, pt, h, ph, w, pw
    return x.reshape(b, out_dim, f * pt, h * ph, w * pw)


def patch_embed_1d_init(key, in_dim: int, dim: int, patch_size: int, dtype=jnp.float32):
    """Equivalent to nn.Conv1d(in_dim, dim, kernel_size=p, stride=p)."""
    fan_in = in_dim * patch_size
    kk, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "kernel": _uniform(kk, (fan_in, dim), bound, dtype),
        "bias": _uniform(kb, (dim,), bound, dtype),
    }


def patch_embed_1d(p, x: jnp.ndarray, patch_size: int):
    """x: [B, C, T] -> tokens [B, T//p, dim] (wan_audio_dit.py:180-188)."""
    b, c, T = x.shape
    f = T // patch_size
    x = x.reshape(b, c, f, patch_size).transpose(0, 2, 1, 3).reshape(b, f, c * patch_size)
    return linear(p, x), f


def unpatchify_1d(x: jnp.ndarray, patch_size: int, out_dim: int) -> jnp.ndarray:
    """[B, f, p*out] -> [B, out, f*p] (wan_audio_dit.py:190-195: 'b f (p c) -> b c (f p)')."""
    b, f, _ = x.shape
    x = x.reshape(b, f, patch_size, out_dim)
    return x.transpose(0, 3, 1, 2).reshape(b, out_dim, f * patch_size)


# ---------------------------------------------------------------------------
# time / sinusoidal embedding
# ---------------------------------------------------------------------------

def sinusoidal_embedding_1d(dim: int, position: jnp.ndarray) -> jnp.ndarray:
    """[cos | sin] sinusoid embedding (wan_video_dit.py:99-103; cos first).

    The reference computes in float64; on TPU we use float32 (error at
    t<=1000, freq<=1 is ~1e-5, within bf16 tower noise).
    """
    half = dim // 2
    freqs = jnp.power(10000.0, -jnp.arange(half, dtype=jnp.float32) / half)
    sinusoid = position.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(sinusoid), jnp.sin(sinusoid)], axis=1)


# ---------------------------------------------------------------------------
# pytree helpers
# ---------------------------------------------------------------------------

def stack_params(param_list: Sequence[dict]) -> dict:
    """Stack a list of identically-structured param trees along a new axis 0
    (for lax.scan over layers)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *param_list)


def index_params(params: dict, i) -> dict:
    """Select layer i from stacked params.

    ``i`` may be a Python int or a traced index (lax.scan carry over layers);
    numpy leaves are promoted to jnp so tracer indexing lowers to a
    dynamic-slice instead of calling ``__array__`` on the tracer."""
    return jax.tree.map(lambda x: jnp.asarray(x)[i], params)


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))


def cast_tree(params, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, params
    )
