"""UMT5 encoder in JAX (text encoder for MOVA; reference uses HF
`UMT5EncoderModel`, pipeline_mova.py:21,307 — umt5-xxl: d_model 4096,
24 layers, 64 heads, d_kv 64, gated-GELU FFN, PER-LAYER relative position
bias — the UMT5 difference vs T5/mT5).

T5 conventions reproduced: RMS layer norm (no mean subtraction, fp32 stats),
no 1/sqrt(d) attention scaling (folded into init), relative position buckets
(bidirectional, 32 buckets, max distance 128), additive -inf padding mask.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dualforce_tpu.config import UMT5Config
from dualforce_tpu.registry import MODELS


def _t5_ln(x, scale, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)).astype(x.dtype)


def relative_position_bucket(relative_position: np.ndarray, num_buckets: int = 32,
                             max_distance: int = 128) -> np.ndarray:
    """HF T5 bidirectional bucket function (host-side; positions are static)."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(np.int64) * num_buckets
    n = np.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact) / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    val_if_large = np.minimum(val_if_large, num_buckets - 1)
    return ret + np.where(is_small, n, val_if_large)


def _bias_index(seq_len: int, cfg: UMT5Config) -> np.ndarray:
    q = np.arange(seq_len)[:, None]
    k = np.arange(seq_len)[None, :]
    return relative_position_bucket(k - q, cfg.relative_attention_num_buckets,
                                    cfg.relative_attention_max_distance)


def init(key, cfg: UMT5Config, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 8 * cfg.num_layers + 4))
    inner = cfg.num_heads * cfg.d_kv

    def lin(kk, i, o):
        return {"kernel": jax.random.normal(kk, (i, o), jnp.float32).astype(dtype) * (i ** -0.5)}

    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "attn": {
                "q": lin(next(ks), cfg.d_model, inner),
                "k": lin(next(ks), cfg.d_model, inner),
                "v": lin(next(ks), cfg.d_model, inner),
                "o": lin(next(ks), inner, cfg.d_model),
                "rel_bias": jax.random.normal(
                    next(ks), (cfg.relative_attention_num_buckets, cfg.num_heads),
                    jnp.float32).astype(dtype) * 0.1,
            },
            "ln1": {"scale": jnp.ones((cfg.d_model,), dtype)},
            "mlp": {
                "wi_0": lin(next(ks), cfg.d_model, cfg.d_ff),
                "wi_1": lin(next(ks), cfg.d_model, cfg.d_ff),
                "wo": lin(next(ks), cfg.d_ff, cfg.d_model),
            },
            "ln2": {"scale": jnp.ones((cfg.d_model,), dtype)},
        })
    import dualforce_tpu.nn as nn

    return {
        "embed": jax.random.normal(next(ks), (cfg.vocab_size, cfg.d_model),
                                   jnp.float32).astype(dtype),
        "layers": nn.stack_params(layers),
        "final_ln": {"scale": jnp.ones((cfg.d_model,), dtype)},
    }


def _layer(p, x, bias, mask_add, cfg: UMT5Config, compute_dtype):
    from dualforce_tpu import nn as dnn

    b, s, _ = x.shape
    h, dk = cfg.num_heads, cfg.d_kv
    xn = _t5_ln(x, p["ln1"]["scale"], cfg.layer_norm_epsilon)
    q = dnn.linear(p["attn"]["q"], xn).reshape(b, s, h, dk)
    k = dnn.linear(p["attn"]["k"], xn).reshape(b, s, h, dk)
    v = dnn.linear(p["attn"]["v"], xn).reshape(b, s, h, dk)
    # per-layer position bias: [s, s, buckets-indexed] -> [h, s, s]
    pos_bias = p["attn"]["rel_bias"][bias]  # [s, s, h]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
    logits = logits + pos_bias.transpose(2, 0, 1)[None].astype(jnp.float32)
    if mask_add is not None:
        logits = logits + mask_add
    probs = jax.nn.softmax(logits, axis=-1).astype(compute_dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, h * dk)
    # keep the residual stream in compute dtype even over fp32 params
    # (mixed-dtype matmuls promote, which would flip the scan carry dtype)
    x = x + dnn.linear(p["attn"]["o"], o).astype(x.dtype)

    xn = _t5_ln(x, p["ln2"]["scale"], cfg.layer_norm_epsilon)
    gelu = jax.nn.gelu(dnn.linear(p["mlp"]["wi_0"], xn), approximate=True)
    x = x + dnn.linear(p["mlp"]["wo"],
                       gelu * dnn.linear(p["mlp"]["wi_1"], xn)).astype(x.dtype)
    return x


@MODELS.register_module(name="UMT5Encoder")
def encode(params, cfg: UMT5Config, input_ids: jnp.ndarray,
           attention_mask: Optional[jnp.ndarray] = None,
           compute_dtype=jnp.bfloat16):
    """input_ids [B, S] -> last hidden state [B, S, d_model]."""
    s = input_ids.shape[1]
    x = params["embed"][input_ids].astype(compute_dtype)
    bias_idx = jnp.asarray(_bias_index(s, cfg))
    mask_add = None
    if attention_mask is not None:
        mask_add = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9).astype(jnp.float32)

    def step(carry, lp):
        return _layer(lp, carry, bias_idx, mask_add, cfg, compute_dtype), None

    x, _ = jax.lax.scan(step, x, params["layers"])
    return _t5_ln(x, params["final_ln"]["scale"], cfg.layer_norm_epsilon)


def convert_umt5(sd: Dict, cfg: UMT5Config) -> Dict:
    """HF UMT5EncoderModel state dict -> pytree."""
    import dualforce_tpu.nn as nn

    def np_(x):
        return x.detach().cpu().float().numpy() if hasattr(x, "detach") else np.asarray(x)

    layers = []
    for i in range(cfg.num_layers):
        pre = f"encoder.block.{i}.layer"
        layers.append({
            "attn": {
                "q": {"kernel": np_(sd[f"{pre}.0.SelfAttention.q.weight"]).T},
                "k": {"kernel": np_(sd[f"{pre}.0.SelfAttention.k.weight"]).T},
                "v": {"kernel": np_(sd[f"{pre}.0.SelfAttention.v.weight"]).T},
                "o": {"kernel": np_(sd[f"{pre}.0.SelfAttention.o.weight"]).T},
                "rel_bias": np_(sd[f"{pre}.0.SelfAttention.relative_attention_bias.weight"]),
            },
            "ln1": {"scale": np_(sd[f"{pre}.0.layer_norm.weight"])},
            "mlp": {
                "wi_0": {"kernel": np_(sd[f"{pre}.1.DenseReluDense.wi_0.weight"]).T},
                "wi_1": {"kernel": np_(sd[f"{pre}.1.DenseReluDense.wi_1.weight"]).T},
                "wo": {"kernel": np_(sd[f"{pre}.1.DenseReluDense.wo.weight"]).T},
            },
            "ln2": {"scale": np_(sd[f"{pre}.1.layer_norm.weight"])},
        })
    return {
        "embed": np_(sd["shared.weight"] if "shared.weight" in sd
                     else sd["encoder.embed_tokens.weight"]),
        "layers": jax.tree.map(lambda *xs: np.stack(xs, 0), *layers),
        "final_ln": {"scale": np_(sd["encoder.final_layer_norm.weight"])},
    }
