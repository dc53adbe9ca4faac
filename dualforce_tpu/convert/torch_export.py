"""JAX param-pytree -> torch-layout state dicts (the inverse of
torch_import.py for the TRAINABLE modules).

Purpose: full-fine-tune checkpoints must be exportable in the reference's
HF-pipeline layout (per-module dir with config.json + model.safetensors —
the counterpart of accelerate_trainer.py:473-513's per-module
save_pretrained), so weights trained here load back into the torch reference
(and into our own load_pipeline_params, which is the round-trip test).

Only the diffusion modules are exportable (video_dit / video_dit_2 /
audio_dit / dual_tower_bridge); the VAEs/text encoder are frozen in every
training regime (mova_train.py:1452-1474) so they are copied/symlinked from
the base checkpoint, not re-exported.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

from dualforce_tpu.config import (
    AudioDiTConfig,
    BridgeConfig,
    MOVAConfig,
    VideoDiTConfig,
)

Array = np.ndarray


def _np32(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _lin(sd: Dict[str, Array], prefix: str, p: Dict[str, Any]) -> None:
    sd[f"{prefix}.weight"] = _np32(p["kernel"]).T
    if "bias" in p:
        sd[f"{prefix}.bias"] = _np32(p["bias"])


def _rms(sd, prefix, p) -> None:
    sd[f"{prefix}.weight"] = _np32(p["scale"])


def _ln(sd, prefix, p) -> None:
    sd[f"{prefix}.weight"] = _np32(p["scale"])
    sd[f"{prefix}.bias"] = _np32(p["bias"])


def _attn(sd, prefix, p) -> None:
    for name in ("q", "k", "v", "o"):
        _lin(sd, f"{prefix}.{name}", p[name])
    _rms(sd, f"{prefix}.norm_q", p["norm_q"])
    _rms(sd, f"{prefix}.norm_k", p["norm_k"])


def _dit_block(sd, prefix, p) -> None:
    _attn(sd, f"{prefix}.self_attn", p["self_attn"])
    _attn(sd, f"{prefix}.cross_attn", p["cross_attn"])
    _ln(sd, f"{prefix}.norm3", p["norm3"])
    _lin(sd, f"{prefix}.ffn.0", p["ffn"]["fc1"])
    _lin(sd, f"{prefix}.ffn.2", p["ffn"]["fc2"])
    sd[f"{prefix}.modulation"] = _np32(p["modulation"])


def _unstack(tree: Dict, i: int) -> Dict:
    import jax

    return jax.tree.map(lambda a: np.asarray(a)[i], tree)


def _common_embeds(sd, params) -> None:
    _lin(sd, "text_embedding.0", params["text_embedding"]["fc1"])
    _lin(sd, "text_embedding.2", params["text_embedding"]["fc2"])
    _lin(sd, "time_embedding.0", params["time_embedding"]["fc1"])
    _lin(sd, "time_embedding.2", params["time_embedding"]["fc2"])
    _lin(sd, "time_projection.1", params["time_projection"]["fc"])
    _lin(sd, "head.head", params["head"]["head"])
    sd["head.modulation"] = _np32(params["head"]["modulation"])


def export_video_dit(params: Dict[str, Any], cfg: VideoDiTConfig) -> Dict[str, Array]:
    sd: Dict[str, Array] = {}
    _common_embeds(sd, params)
    pt, ph, pw = cfg.patch_size
    k = _np32(params["patch_embedding"]["kernel"])  # [c*pt*ph*pw, dim]
    sd["patch_embedding.weight"] = (
        k.reshape(cfg.in_dim, pt, ph, pw, -1).transpose(4, 0, 1, 2, 3))
    sd["patch_embedding.bias"] = _np32(params["patch_embedding"]["bias"])
    for i in range(cfg.num_layers):
        _dit_block(sd, f"blocks.{i}", _unstack(params["blocks"], i))
    return sd


def export_audio_dit(params: Dict[str, Any], cfg: AudioDiTConfig) -> Dict[str, Array]:
    sd: Dict[str, Array] = {}
    _common_embeds(sd, params)
    k = _np32(params["patch_embedding"]["kernel"])  # [c*p, dim]
    sd["patch_embedding.weight"] = (
        k.reshape(cfg.in_dim, cfg.patch_size, -1).transpose(2, 0, 1))
    sd["patch_embedding.bias"] = _np32(params["patch_embedding"]["bias"])
    for i in range(cfg.num_layers):
        _dit_block(sd, f"blocks.{i}", _unstack(params["blocks"], i))
    return sd


def export_bridge(params: Dict[str, Any], cfg: BridgeConfig) -> Dict[str, Array]:
    sd: Dict[str, Array] = {}

    def cond_block(prefix: str, p: Dict[str, Any]) -> None:
        _ln(sd, f"{prefix}.y_norm", p["y_norm"])
        _attn(sd, f"{prefix}.inner", p["inner"])
        if "pool" in p:
            pool = p["pool"]
            sd[f"{prefix}.per_frame_pooling.probe"] = _np32(pool["probe"])
            sd[f"{prefix}.per_frame_pooling.attention.in_proj_weight"] = \
                _np32(pool["in_proj"]["kernel"]).T
            sd[f"{prefix}.per_frame_pooling.attention.in_proj_bias"] = \
                _np32(pool["in_proj"]["bias"])
            _lin(sd, f"{prefix}.per_frame_pooling.attention.out_proj",
                 pool["out_proj"])
            _ln(sd, f"{prefix}.per_frame_pooling.layernorm", pool["ln"])
            _lin(sd, f"{prefix}.adaln.linear", p["adaln"]["linear"])

    for pos, layer in enumerate(cfg.interaction_layers()):
        cond_block(f"audio_to_video_conditioners.{layer}",
                   _unstack(params["a2v"], pos))
        cond_block(f"video_to_audio_conditioners.{layer}",
                   _unstack(params["v2a"], pos))
    if "condition_scale" in params:
        sd["condition_scale"] = _np32(params["condition_scale"])
    return sd


_EXPORTERS = {
    "video_dit": ("video_dit", export_video_dit),
    "video_dit_2": ("video_dit_2", export_video_dit),
    "audio_dit": ("audio_dit", export_audio_dit),
    "bridge": ("dual_tower_bridge", export_bridge),
}


def export_module_dir(module: str, params: Dict[str, Any], cfg: MOVAConfig,
                      out_dir: str) -> str:
    """Write one module as an HF-layout dir ({dir_name}/model.safetensors).
    Returns the module dir path."""
    from safetensors import numpy as st_numpy

    dir_name, fn = _EXPORTERS[module]
    mcfg = {"video_dit": cfg.video_dit, "video_dit_2": cfg.video_dit,
            "audio_dit": cfg.audio_dit, "bridge": cfg.bridge}[module]
    sd = fn(params, mcfg)
    mod_dir = os.path.join(out_dir, dir_name)
    os.makedirs(mod_dir, exist_ok=True)
    st_numpy.save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
                       os.path.join(mod_dir, "model.safetensors"))
    return mod_dir


def export_trained_modules(trained: Dict[str, Any], cfg: MOVAConfig,
                           out_dir: str, base_ckpt: str = None) -> None:
    """Per-module HF-layout export of a full-fine-tune checkpoint
    (accelerate_trainer.py:473-513 counterpart). Copies the base checkpoint's
    config.json per module (shape metadata) when base_ckpt is given."""
    import shutil

    os.makedirs(out_dir, exist_ok=True)
    for module, params in trained.items():
        if module not in _EXPORTERS:
            continue
        mod_dir = export_module_dir(module, params, cfg, out_dir)
        if base_ckpt:
            src = os.path.join(base_ckpt, os.path.basename(mod_dir),
                               "config.json")
            if os.path.exists(src):
                shutil.copy(src, os.path.join(mod_dir, "config.json"))
