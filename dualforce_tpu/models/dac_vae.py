"""DAC audio VAE — continuous (KL) variant, JAX implementation.

Behavioural reference: mova/diffusion/models/dac_vae.py:590-1000 (DAC with
continuous=True, the shipped MOVA config: encoder_dim 128, rates (2,3,4,5,8),
decoder_dim 2048, rates (8,5,4,3,2), latent 128, 48 kHz, hop 960).

Weight norm is folded at conversion time (w = g * v / ||v||), equivalent to
the reference's `remove_weight_norm` fusion (dac_vae.py:1040-1066) — the JAX
model only ever sees plain conv kernels.

Layout: waveforms [B, S] (mono), latents [B, T, D] channels-last internally;
public helpers accept/return the reference's [B, C, T] at the pipeline
boundary.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from dualforce_tpu.config import DACVAEConfig
from dualforce_tpu.registry import MODELS


# ---------------------------------------------------------------------------
# primitives ([B, T, C] layout; kernels [k, in, out])
# ---------------------------------------------------------------------------

def conv1d(p, x, stride: int = 1, padding: int = 0, dilation: int = 1):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], window_strides=(stride,), padding=((padding, padding),),
        rhs_dilation=(dilation,), dimension_numbers=("NTC", "TIO", "NTC"),
    )
    return y + p["bias"]


def conv_transpose1d(p, x, stride: int, padding: int, output_padding: int):
    """torch ConvTranspose1d semantics via lhs-dilated conv.

    p['kernel'] is stored PRE-FLIPPED as [k, in, out] (converter handles the
    torch [in, out, k] -> flip -> transpose).
    out_len = (T-1)*stride + k - 2*padding + output_padding.
    """
    k = p["kernel"].shape[0]
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], window_strides=(1,),
        padding=((k - 1 - padding, k - 1 - padding + output_padding),),
        lhs_dilation=(stride,), dimension_numbers=("NTC", "TIO", "NTC"),
    )
    return y + p["bias"]


def snake(p, x):
    """snake(x) = x + (alpha + 1e-9)^-1 * sin(alpha*x)^2 (dac_vae.py:323-339)."""
    alpha = p["alpha"].astype(jnp.float32)  # [C]
    xf = x.astype(jnp.float32)
    y = xf + jnp.square(jnp.sin(alpha * xf)) / (alpha + 1e-9)
    return y.astype(x.dtype)


def _conv_init(key, k, cin, cout, dtype=jnp.float32):
    k1, _ = jax.random.split(key)
    w = jax.random.truncated_normal(k1, -2, 2, (k, cin, cout), jnp.float32) * 0.02
    return {"kernel": w.astype(dtype), "bias": jnp.zeros((cout,), dtype)}


def _snake_init(c, dtype=jnp.float32):
    return {"alpha": jnp.ones((c,), dtype)}


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------

def residual_unit_init(key, dim, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "snake1": _snake_init(dim, dtype),
        "conv1": _conv_init(k1, 7, dim, dim, dtype),
        "snake2": _snake_init(dim, dtype),
        "conv2": _conv_init(k2, 1, dim, dim, dtype),
    }


def residual_unit(p, x, dilation: int):
    pad = ((7 - 1) * dilation) // 2
    y = conv1d(p["conv1"], snake(p["snake1"], x), padding=pad, dilation=dilation)
    y = conv1d(p["conv2"], snake(p["snake2"], y))
    trim = (x.shape[1] - y.shape[1]) // 2
    if trim > 0:
        x = x[:, trim:-trim]
    return x + y


def encoder_block_init(key, dim, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    return {
        "ru1": residual_unit_init(ks[0], dim // 2, dtype),
        "ru2": residual_unit_init(ks[1], dim // 2, dtype),
        "ru3": residual_unit_init(ks[2], dim // 2, dtype),
        "snake": _snake_init(dim // 2, dtype),
        "down": None,  # filled by caller (needs stride)
    }


def encoder_init(key, cfg: DACVAEConfig, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 32))
    d = cfg.encoder_dim
    p = {"conv_in": _conv_init(next(ks), 7, 1, d, dtype)}
    blocks = []
    for stride in cfg.encoder_rates:
        d *= 2
        b = encoder_block_init(next(ks), d, dtype)
        b["down"] = _conv_init(next(ks), 2 * stride, d // 2, d, dtype)
        blocks.append(b)
    p["blocks"] = blocks
    p["snake_out"] = _snake_init(d, dtype)
    p["conv_out"] = _conv_init(next(ks), 3, d, cfg.latent_dim, dtype)
    return p


def encoder_apply(p, cfg: DACVAEConfig, x):
    """x: [B, S, 1] -> [B, T, latent]."""
    h = conv1d(p["conv_in"], x, padding=3)
    for b, stride in zip(p["blocks"], cfg.encoder_rates):
        h = residual_unit(b["ru1"], h, 1)
        h = residual_unit(b["ru2"], h, 3)
        h = residual_unit(b["ru3"], h, 9)
        h = snake(b["snake"], h)
        h = conv1d(b["down"], h, stride=stride, padding=math.ceil(stride / 2))
    h = snake(p["snake_out"], h)
    return conv1d(p["conv_out"], h, padding=1)


def decoder_block_init(key, cin, cout, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    return {
        "snake": _snake_init(cin, dtype),
        "up": None,  # caller must set (decoder_init does); fail fast otherwise
        "ru1": residual_unit_init(ks[1], cout, dtype),
        "ru2": residual_unit_init(ks[2], cout, dtype),
        "ru3": residual_unit_init(ks[3], cout, dtype),
    }


def decoder_init(key, cfg: DACVAEConfig, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 32))
    ch = cfg.decoder_dim
    p = {"conv_in": _conv_init(next(ks), 7, cfg.latent_dim, ch, dtype)}
    blocks = []
    for i, stride in enumerate(cfg.decoder_rates):
        cin, cout = ch // (2 ** i), ch // (2 ** (i + 1))
        b = decoder_block_init(next(ks), cin, cout, dtype)
        b["up"] = _conv_init(next(ks), 2 * stride, cin, cout, dtype)
        blocks.append(b)
    p["blocks"] = blocks
    cout = ch // (2 ** len(cfg.decoder_rates))
    p["snake_out"] = _snake_init(cout, dtype)
    p["conv_out"] = _conv_init(next(ks), 7, cout, 1, dtype)
    return p


def decoder_apply(p, cfg: DACVAEConfig, z):
    """z: [B, T, latent] -> waveform [B, S, 1] in [-1, 1]."""
    h = conv1d(p["conv_in"], z, padding=3)
    for b, stride in zip(p["blocks"], cfg.decoder_rates):
        h = snake(b["snake"], h)
        h = conv_transpose1d(b["up"], h, stride=stride,
                             padding=math.ceil(stride / 2),
                             output_padding=stride % 2)
        h = residual_unit(b["ru1"], h, 1)
        h = residual_unit(b["ru2"], h, 3)
        h = residual_unit(b["ru3"], h, 9)
    h = snake(p["snake_out"], h)
    return jnp.tanh(conv1d(p["conv_out"], h, padding=3))


# ---------------------------------------------------------------------------
# residual vector quantizer (RVQ / discrete mode, continuous=False)
#
# Behavioural reference: VectorQuantize / ResidualVectorQuantize
# (dac_vae.py:346-588): factorized codes (1x1 in/out projections to a low-dim
# codebook space), l2-normalized nearest-neighbour lookup (cosine), residual
# stacking over n_codebooks, straight-through gradient estimator.
# ---------------------------------------------------------------------------

def vq_init(key, input_dim: int, codebook_size: int, codebook_dim: int,
            dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "in_proj": _conv_init(k1, 1, input_dim, codebook_dim, dtype),
        "out_proj": _conv_init(k2, 1, codebook_dim, input_dim, dtype),
        "codebook": (jax.random.normal(k3, (codebook_size, codebook_dim),
                                       jnp.float32) .astype(dtype)),
    }


def _l2n(x, axis=-1):
    return x * jax.lax.rsqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True)
                             + 1e-12)


def vq_decode_latents(p, z_e):
    """z_e: [B, T, D_cb] -> (z_q [B, T, D_cb], indices [B, T]). Nearest
    neighbour under l2-normalization == cosine similarity (dac_vae.py:413-433)."""
    enc = _l2n(z_e.astype(jnp.float32))
    cb = _l2n(p["codebook"].astype(jnp.float32))
    indices = jnp.argmax(enc @ cb.T, axis=-1)            # [B, T]
    z_q = jnp.take(p["codebook"], indices, axis=0)       # un-normalized entries
    return z_q.astype(z_e.dtype), indices


def vq_apply(p, z):
    """One quantizer stage. z: [B, T, D_in] -> (z_q, commit, codebook, idx, z_e)
    with straight-through gradients (dac_vae.py:367-404)."""
    z_e = conv1d(p["in_proj"], z)
    z_q, indices = vq_decode_latents(p, z_e)
    commit = jnp.mean(jnp.square(z_e - jax.lax.stop_gradient(z_q)), axis=(1, 2))
    codebook = jnp.mean(jnp.square(z_q - jax.lax.stop_gradient(z_e)), axis=(1, 2))
    z_q = z_e + jax.lax.stop_gradient(z_q - z_e)         # straight-through
    return conv1d(p["out_proj"], z_q), commit, codebook, indices, z_e


def vq_decode_code(p, indices):
    """indices [B, T] -> z_q [B, T, D_in] (embed + out projection)."""
    z_p = jnp.take(p["codebook"], indices, axis=0)
    return conv1d(p["out_proj"], z_p), z_p


def rvq_init(key, cfg: DACVAEConfig, dtype=jnp.float32):
    ks = jax.random.split(key, cfg.n_codebooks)
    return [vq_init(k, cfg.latent_dim, cfg.codebook_size, cfg.codebook_dim, dtype)
            for k in ks]


def rvq_apply(quantizers, z, n_quantizers=None):
    """Residual VQ over the stack (dac_vae.py:460-532, eval semantics).

    z: [B, T, D]. n_quantizers: static int or per-sample [B] int array (the
    training-time quantizer-dropout mask); None = all codebooks.
    Returns (z_q, codes [B, N, T], latents [B, T, sum D_cb], commit, codebook).
    """
    b = z.shape[0]
    nq = len(quantizers) if n_quantizers is None else n_quantizers
    per_sample = hasattr(nq, "shape") and getattr(nq, "ndim", 0) == 1
    z_q = jnp.zeros_like(z)
    residual = z
    commit = jnp.zeros((), jnp.float32)
    codebook = jnp.zeros((), jnp.float32)
    codes, latents = [], []
    for i, p in enumerate(quantizers):
        if not per_sample and i >= int(nq):
            break
        z_q_i, c_i, cb_i, idx_i, z_e_i = vq_apply(p, residual)
        if per_sample:
            mask = (i < nq).astype(z.dtype)[:, None, None]   # [B,1,1]
            z_q = z_q + z_q_i * mask
            commit = commit + jnp.mean(c_i * mask[:, 0, 0])
            codebook = codebook + jnp.mean(cb_i * mask[:, 0, 0])
        else:
            z_q = z_q + z_q_i
            commit = commit + jnp.mean(c_i)
            codebook = codebook + jnp.mean(cb_i)
        residual = residual - z_q_i
        codes.append(idx_i)
        latents.append(z_e_i)
    return (z_q, jnp.stack(codes, axis=1), jnp.concatenate(latents, axis=-1),
            commit, codebook)


def rvq_from_codes(quantizers, codes):
    """codes [B, N, T] -> (z_q [B, T, D], z_p [B, T, sum D_cb])
    (dac_vae.py:534-553)."""
    z_q = None
    z_p = []
    for i in range(codes.shape[1]):
        q_i, p_i = vq_decode_code(quantizers[i], codes[:, i, :])
        z_q = q_i if z_q is None else z_q + q_i
        z_p.append(p_i)
    return z_q, jnp.concatenate(z_p, axis=-1)


# ---------------------------------------------------------------------------
# full VAE (continuous KL mode — shipped by MOVA — or discrete RVQ mode)
# ---------------------------------------------------------------------------

@MODELS.register_module(name="DACVAE")
def init(key, cfg: DACVAEConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    p = {
        "encoder": encoder_init(ks[0], cfg, dtype),
        "decoder": decoder_init(ks[1], cfg, dtype),
    }
    if cfg.continuous:
        p["quant_conv"] = _conv_init(ks[2], 1, cfg.latent_dim,
                                     2 * cfg.latent_dim, dtype)
        p["post_quant_conv"] = _conv_init(ks[3], 1, cfg.latent_dim,
                                          cfg.latent_dim, dtype)
    else:
        p["quantizer"] = rvq_init(ks[2], cfg, dtype)
    return p


def preprocess(audio: jnp.ndarray, hop_length: int) -> jnp.ndarray:
    """Right-pad to a hop multiple (dac_vae.py preprocess)."""
    s = audio.shape[-1]
    pad = -s % hop_length
    if pad:
        audio = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(0, pad)])
    return audio


def encode_moments(params, cfg: DACVAEConfig, audio):
    """audio: [B, 1, S] (reference layout) -> (mean, logvar) each [B, D, T]."""
    x = preprocess(audio, cfg.hop_length).transpose(0, 2, 1)  # [B, S, 1]
    z = encoder_apply(params["encoder"], cfg, x)
    moments = conv1d(params["quant_conv"], z)  # [B, T, 2D]
    mean, logvar = jnp.split(moments, 2, axis=-1)
    return mean.transpose(0, 2, 1), jnp.clip(logvar, -30.0, 20.0).transpose(0, 2, 1)


def encode_mode(params, cfg: DACVAEConfig, audio):
    mean, _ = encode_moments(params, cfg, audio)
    return mean


def encode_sample(params, cfg: DACVAEConfig, audio, key):
    mean, logvar = encode_moments(params, cfg, audio)
    return mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape, mean.dtype)


def decode(params, cfg: DACVAEConfig, z):
    """z: [B, D, T] (reference layout) -> audio [B, 1, S]. Runs in fp32
    (pipeline_mova.py:491-493 decodes audio under fp32 autocast). In RVQ mode
    z is the quantized continuous representation (no post_quant_conv exists,
    dac_vae.py:944-960)."""
    zf = z.astype(jnp.float32).transpose(0, 2, 1)
    if "post_quant_conv" in params:
        zf = conv1d(params["post_quant_conv"], zf)
    wav = decoder_apply(params["decoder"], cfg, zf)
    return wav.transpose(0, 2, 1)


def encode_quantized(params, cfg: DACVAEConfig, audio, n_quantizers=None):
    """RVQ-mode encode (dac_vae.py:905-943): audio [B, 1, S] ->
    (z_q [B, D, T], codes [B, N, T], latents [B, sumD_cb, T], commit, codebook).
    """
    x = preprocess(audio, cfg.hop_length).transpose(0, 2, 1)
    z = encoder_apply(params["encoder"], cfg, x)
    z_q, codes, latents, commit, codebook = rvq_apply(
        params["quantizer"], z, n_quantizers)
    return (z_q.transpose(0, 2, 1), codes,
            latents.transpose(0, 2, 1), commit, codebook)


def decode_codes(params, cfg: DACVAEConfig, codes):
    """RVQ-mode decode from discrete codes [B, N, T] -> audio [B, 1, S]
    (CodecMixin.decompress path, dac_vae.py:272-312)."""
    z_q, _ = rvq_from_codes(params["quantizer"], codes)
    return decode(params, cfg, z_q.transpose(0, 2, 1))


# module-level jitted window programs: a fresh jax.jit per compress() call
# would carry an empty cache and recompile every invocation
_encode_mode_jit = jax.jit(encode_mode, static_argnums=(1,))
_decode_jit = jax.jit(decode, static_argnums=(1,))


def _encode_codes(params, cfg, audio):
    return encode_quantized(params, cfg, audio)[1]


_encode_codes_jit = jax.jit(_encode_codes, static_argnums=(1,))
_decode_codes_jit = jax.jit(decode_codes, static_argnums=(1,))


# ---------------------------------------------------------------------------
# chunked streaming compress/decompress
#
# Replaces the reference's CodecMixin chunked `compress`/`decompress`
# (dac_vae.py:68-312): long audio is processed in fixed windows with an
# overlap exceeding the conv receptive field, so interior frames equal the
# full-pass output. Fixed window shapes mean ONE XLA compile regardless of
# clip length — the TPU-native analogue of the reference's delay/receptive-
# field bookkeeping.
# ---------------------------------------------------------------------------

def encoder_receptive_frames(cfg: DACVAEConfig) -> int:
    """One-sided encoder receptive field, in LATENT frames (ceil)."""
    rf = 7  # conv_in k=7
    rate = 1
    for stride in cfg.encoder_rates:
        rf += rate * 6 * (1 + 3 + 9)        # three residual units, k=7 dilated
        rf += rate * (2 * stride - 1)        # strided down conv, k=2*stride
        rate *= stride
    rf += rate * 2  # conv_out k=3
    return -(-rf // (2 * cfg.hop_length)) + 1


def decoder_receptive_frames(cfg: DACVAEConfig) -> int:
    """One-sided decoder receptive field, in latent frames (ceil).

    Accumulated in output samples: each stage's kernels act at the sample
    rate reached so far (hop shrinks by each upsampling stride)."""
    rf_s = 7 * cfg.hop_length  # conv_in k=7 at latent rate
    rate_s = cfg.hop_length
    for stride in cfg.decoder_rates:
        rate_s //= stride
        rf_s += rate_s * (2 * stride - 1)     # transposed up conv, k=2*stride
        rf_s += rate_s * 6 * (1 + 3 + 9)      # three residual units, k=7 dilated
    rf_s += 6  # conv_out k=7 at sample rate
    return -(-rf_s // (2 * cfg.hop_length)) + 1


def compress(params, cfg: DACVAEConfig, audio: jnp.ndarray,
             chunk_frames: int = 512, overlap_frames: int = 0):
    """Chunked deterministic encode of long audio.

    audio: [B, 1, S] -> latent means [B, D, T] (continuous mode) or discrete
    codes [B, N, T] int32 (RVQ mode — the reference CodecMixin.compress
    artifact, dac_vae.py:68-213), T = ceil(S / hop).
    Interior frames match the full pass exactly (overlap >= receptive field);
    memory is bounded by the window size instead of the clip length.
    """
    rvq = "quantizer" in params
    ov = overlap_frames or encoder_receptive_frames(cfg)
    hop = cfg.hop_length
    audio = preprocess(audio, hop)
    total_t = audio.shape[-1] // hop
    win_t = chunk_frames + 2 * ov            # frames fed per window
    if total_t <= win_t:
        return (_encode_codes(params, cfg, audio) if rvq
                else encode_mode(params, cfg, audio))

    # Clamped windows: edge windows butt against the true clip boundaries, so
    # the per-layer zero padding there matches the full pass exactly; interior
    # frames are >= ov (>= receptive field) from any window edge.
    enc = ((lambda a: _encode_codes_jit(params, cfg, a)) if rvq
           else (lambda a: _encode_mode_jit(params, cfg, a)))
    n_win = -(-total_t // chunk_frames)
    outs = []
    for i in range(n_win):
        start = min(max(i * chunk_frames - ov, 0), total_t - win_t)
        off = i * chunk_frames - start        # in [0, 2*ov]
        take = min(chunk_frames, total_t - i * chunk_frames)
        z = enc(jax.lax.dynamic_slice_in_dim(audio, start * hop, win_t * hop, axis=-1))
        outs.append(z[:, :, off:off + take])
    return jnp.concatenate(outs, axis=-1)


def decompress(params, cfg: DACVAEConfig, z: jnp.ndarray,
               chunk_frames: int = 512, overlap_frames: int = 0):
    """Chunked decode of long latent sequences. z: [B, D, T] fp latents (or
    [B, N, T] integer codes in RVQ mode) -> [B, 1, T*hop].

    Interior samples match `decode` exactly; peak memory is bounded by the
    window size (the reference streams via CodecMixin.decompress the same way).
    """
    from_codes = jnp.issubdtype(z.dtype, jnp.integer)
    ov = overlap_frames or decoder_receptive_frames(cfg)
    hop = cfg.hop_length
    total_t = z.shape[-1]
    win_t = chunk_frames + 2 * ov
    if total_t <= win_t:
        return (decode_codes(params, cfg, z) if from_codes
                else decode(params, cfg, z))

    dec = ((lambda zz: _decode_codes_jit(params, cfg, zz)) if from_codes
           else (lambda zz: _decode_jit(params, cfg, zz)))
    n_win = -(-total_t // chunk_frames)
    outs = []
    for i in range(n_win):
        start = min(max(i * chunk_frames - ov, 0), total_t - win_t)
        off = i * chunk_frames - start
        take = min(chunk_frames, total_t - i * chunk_frames)
        wav = dec(jax.lax.dynamic_slice_in_dim(z, start, win_t, axis=-1))
        outs.append(wav[:, :, off * hop:(off + take) * hop])
    return jnp.concatenate(outs, axis=-1)
