"""Torch-checkpoint -> JAX param-pytree converters.

One-time weight interchange from the released MOVA HF-pipeline layout
(per-module safetensors / torch state dicts, SURVEY.md §5.4) into this
framework's stacked pytrees. Works on plain {name: numpy array} dicts so no
torch import is required at runtime (tests pass state_dict() tensors through
`numpy()`).

Naming reference: wan_video_dit.py:333-397 (WanModel), wan_audio_dit.py:105-178
(WanAudioModel), interactionv2.py:357-418 (DualTowerConditionalBridge).
"""

from __future__ import annotations

from typing import Dict, List, Mapping

import numpy as np

from dualforce_tpu.config import AudioDiTConfig, BridgeConfig, VideoDiTConfig

Array = np.ndarray
StateDict = Mapping[str, Array]


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().to("cpu").float().numpy()
    return np.asarray(x)


def _lin(sd: StateDict, prefix: str) -> Dict[str, Array]:
    p = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        p["bias"] = _np(sd[f"{prefix}.bias"])
    return p


def _rms(sd: StateDict, prefix: str) -> Dict[str, Array]:
    return {"scale": _np(sd[f"{prefix}.weight"])}


def _ln(sd: StateDict, prefix: str) -> Dict[str, Array]:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _attn(sd: StateDict, prefix: str) -> Dict:
    return {
        "q": _lin(sd, f"{prefix}.q"),
        "k": _lin(sd, f"{prefix}.k"),
        "v": _lin(sd, f"{prefix}.v"),
        "o": _lin(sd, f"{prefix}.o"),
        "norm_q": _rms(sd, f"{prefix}.norm_q"),
        "norm_k": _rms(sd, f"{prefix}.norm_k"),
    }


def _dit_block(sd: StateDict, prefix: str) -> Dict:
    return {
        "self_attn": _attn(sd, f"{prefix}.self_attn"),
        "cross_attn": _attn(sd, f"{prefix}.cross_attn"),
        "norm3": _ln(sd, f"{prefix}.norm3"),
        "ffn": {
            "fc1": _lin(sd, f"{prefix}.ffn.0"),
            "fc2": _lin(sd, f"{prefix}.ffn.2"),
        },
        "modulation": _np(sd[f"{prefix}.modulation"]),
    }


def _stack(blocks: List[Dict]) -> Dict:
    import jax

    if not blocks:
        return {}
    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *blocks)


def _common_embeds(sd: StateDict) -> Dict:
    return {
        "text_embedding": {
            "fc1": _lin(sd, "text_embedding.0"),
            "fc2": _lin(sd, "text_embedding.2"),
        },
        "time_embedding": {
            "fc1": _lin(sd, "time_embedding.0"),
            "fc2": _lin(sd, "time_embedding.2"),
        },
        "time_projection": {"fc": _lin(sd, "time_projection.1")},
        "head": {
            "head": _lin(sd, "head.head"),
            "modulation": _np(sd["head.modulation"]),
        },
    }


def convert_video_dit(sd: StateDict, cfg: VideoDiTConfig) -> Dict:
    """WanModel state dict -> video tower pytree."""
    w = _np(sd["patch_embedding.weight"])  # [dim, in, pt, ph, pw]
    params = _common_embeds(sd)
    params["patch_embedding"] = {
        # flattened-input order (c, pt, ph, pw) matches nn.patch_embed_3d
        "kernel": w.transpose(1, 2, 3, 4, 0).reshape(-1, w.shape[0]),
        "bias": _np(sd["patch_embedding.bias"]),
    }
    params["blocks"] = _stack(
        [_dit_block(sd, f"blocks.{i}") for i in range(cfg.num_layers)]
    )
    return params


def convert_audio_dit(sd: StateDict, cfg: AudioDiTConfig) -> Dict:
    """WanAudioModel state dict -> audio tower pytree."""
    w = _np(sd["patch_embedding.weight"])  # [dim, in, p]
    params = _common_embeds(sd)
    params["patch_embedding"] = {
        "kernel": w.transpose(1, 2, 0).reshape(-1, w.shape[0]),
        "bias": _np(sd["patch_embedding.bias"]),
    }
    params["blocks"] = _stack(
        [_dit_block(sd, f"blocks.{i}") for i in range(cfg.num_layers)]
    )
    return params


def _wn_conv1d(sd: StateDict, prefix: str) -> Dict[str, Array]:
    """Fold weight_norm (w = g * v/||v||, per-out-channel) and convert torch
    Conv1d [out, in, k] -> [k, in, out]."""
    if f"{prefix}.weight_g" in sd:
        g, v = _np(sd[f"{prefix}.weight_g"]), _np(sd[f"{prefix}.weight_v"])
        norm = np.sqrt(np.sum(v ** 2, axis=(1, 2), keepdims=True))
        w = g * v / norm
    else:
        w = _np(sd[f"{prefix}.weight"])
    return {"kernel": w.transpose(2, 1, 0), "bias": _np(sd[f"{prefix}.bias"])}


def _wn_convtranspose1d(sd: StateDict, prefix: str) -> Dict[str, Array]:
    """Fold weight_norm on ConvTranspose1d [in, out, k] (g over dim 0) and
    convert to the pre-flipped regular-conv kernel [k, in, out] that
    dac_vae.conv_transpose1d expects."""
    if f"{prefix}.weight_g" in sd:
        g, v = _np(sd[f"{prefix}.weight_g"]), _np(sd[f"{prefix}.weight_v"])
        norm = np.sqrt(np.sum(v ** 2, axis=(1, 2), keepdims=True))
        w = g * v / norm
    else:
        w = _np(sd[f"{prefix}.weight"])
    w = w[:, :, ::-1]  # flip kernel
    return {"kernel": np.ascontiguousarray(w.transpose(2, 0, 1)),
            "bias": _np(sd[f"{prefix}.bias"])}


def _snake(sd: StateDict, prefix: str) -> Dict[str, Array]:
    return {"alpha": _np(sd[f"{prefix}.alpha"]).reshape(-1)}


def _dac_residual_unit(sd: StateDict, prefix: str) -> Dict:
    return {
        "snake1": _snake(sd, f"{prefix}.block.0"),
        "conv1": _wn_conv1d(sd, f"{prefix}.block.1"),
        "snake2": _snake(sd, f"{prefix}.block.2"),
        "conv2": _wn_conv1d(sd, f"{prefix}.block.3"),
    }


def convert_dac(sd: StateDict, cfg) -> Dict:
    """Reference DAC (continuous) state dict -> dac_vae pytree
    (module layout: dac_vae.py:744-807 Encoder/Decoder Sequentials)."""
    n_enc = len(cfg.encoder_rates)
    enc = {"conv_in": _wn_conv1d(sd, "encoder.block.0")}
    blocks = []
    for i in range(n_enc):
        pre = f"encoder.block.{1 + i}.block"
        blocks.append({
            "ru1": _dac_residual_unit(sd, f"{pre}.0"),
            "ru2": _dac_residual_unit(sd, f"{pre}.1"),
            "ru3": _dac_residual_unit(sd, f"{pre}.2"),
            "snake": _snake(sd, f"{pre}.3"),
            "down": _wn_conv1d(sd, f"{pre}.4"),
        })
    enc["blocks"] = blocks
    enc["snake_out"] = _snake(sd, f"encoder.block.{1 + n_enc}")
    enc["conv_out"] = _wn_conv1d(sd, f"encoder.block.{2 + n_enc}")

    n_dec = len(cfg.decoder_rates)
    dec = {"conv_in": _wn_conv1d(sd, "decoder.model.0")}
    blocks = []
    for i in range(n_dec):
        pre = f"decoder.model.{1 + i}.block"
        blocks.append({
            "snake": _snake(sd, f"{pre}.0"),
            "up": _wn_convtranspose1d(sd, f"{pre}.1"),
            "ru1": _dac_residual_unit(sd, f"{pre}.2"),
            "ru2": _dac_residual_unit(sd, f"{pre}.3"),
            "ru3": _dac_residual_unit(sd, f"{pre}.4"),
        })
    dec["blocks"] = blocks
    dec["snake_out"] = _snake(sd, f"decoder.model.{1 + n_dec}")
    dec["conv_out"] = _wn_conv1d(sd, f"decoder.model.{2 + n_dec}")

    out = {"encoder": enc, "decoder": dec}
    if "quant_conv.weight" in sd or "quant_conv.weight_g" in sd:
        # continuous (KL) mode — shipped by MOVA
        out["quant_conv"] = _wn_conv1d(sd, "quant_conv")
        out["post_quant_conv"] = _wn_conv1d(sd, "post_quant_conv")
    else:
        # RVQ mode (dac_vae.py:346-365: WNConv1d projections + Embedding)
        quantizers = []
        i = 0
        while f"quantizer.quantizers.{i}.codebook.weight" in sd:
            pre = f"quantizer.quantizers.{i}"
            quantizers.append({
                "in_proj": _wn_conv1d(sd, f"{pre}.in_proj"),
                "out_proj": _wn_conv1d(sd, f"{pre}.out_proj"),
                "codebook": _np(sd[f"{pre}.codebook.weight"]),
            })
            i += 1
        out["quantizer"] = quantizers
    return out


def convert_bridge(sd: StateDict, cfg: BridgeConfig) -> Dict:
    """DualTowerConditionalBridge state dict -> stacked bridge pytree."""

    def cond_block(prefix: str) -> Dict:
        p = {
            "y_norm": _ln(sd, f"{prefix}.y_norm"),
            "inner": _attn(sd, f"{prefix}.inner"),
        }
        if f"{prefix}.per_frame_pooling.probe" in sd:
            p["pool"] = {
                "probe": _np(sd[f"{prefix}.per_frame_pooling.probe"]),
                "in_proj": {
                    "kernel": _np(sd[f"{prefix}.per_frame_pooling.attention.in_proj_weight"]).T,
                    "bias": _np(sd[f"{prefix}.per_frame_pooling.attention.in_proj_bias"]),
                },
                "out_proj": _lin(sd, f"{prefix}.per_frame_pooling.attention.out_proj"),
                "ln": _ln(sd, f"{prefix}.per_frame_pooling.layernorm"),
            }
            p["adaln"] = {"linear": _lin(sd, f"{prefix}.adaln.linear")}
        return p

    layers = cfg.interaction_layers()
    params = {
        "a2v": _stack([cond_block(f"audio_to_video_conditioners.{i}") for i in layers]),
        "v2a": _stack([cond_block(f"video_to_audio_conditioners.{i}") for i in layers]),
    }
    if cfg.trainable_condition_scale and "condition_scale" in sd:
        params["condition_scale"] = _np(sd["condition_scale"])
    return params
