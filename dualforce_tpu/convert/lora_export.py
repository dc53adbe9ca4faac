"""This framework's LoRA pytree -> the reference's on-disk LoRA formats
(the inverse of lora_import.py).

The reference ships TWO LoRA formats (SURVEY.md §2.1); both are writable:
  1. accelerate-trainer format (lora_utils.py:259-308 / mova_lora.py:109-145):
     a directory with `lora_weights.pt` + `lora_config.pt`; keys
     `{module}.{torch_path}.lora_A.weight`, A: [r, in], B: [out, r].
  2. low-resource-trainer format (lora_layers.py:326-419): a single .pt state
     dict whose buffer-style keys end in `.lora_A` / `.lora_B` (no `.weight`).

Purpose: LoRAs trained here must round-trip back into the torch ecosystem
(and through our own convert/lora_import.py, which is the round-trip test).
Untrained layers (both factors all-zero, as lora_import.py zero-fills them)
are dropped — the reference saves only targeted layers.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

from dualforce_tpu.config import MOVAConfig

# our params key -> torch module name (inverse of lora_import._MODULE_MAP)
_MODULE_MAP_INV = {
    "video_dit": "video_dit",
    "video_dit_2": "video_dit_2",
    "audio_dit": "audio_dit",
    "bridge": "dual_tower_bridge",
}

_BRIDGE_SIDES = {"a2v": "audio_to_video_conditioners",
                 "v2a": "video_to_audio_conditioners"}


def _torch_subpath(module: str, path: str, layer_idx: int,
                   cfg: MOVAConfig) -> str:
    """'blocks/self_attn/q/kernel' + i -> 'blocks.{i}.self_attn.q';
    'a2v/inner/q/kernel' + pos -> 'audio_to_video_conditioners.{L}.inner.q'
    where L is the pos-th bridge interaction layer."""
    parts = path.split("/")
    if parts[-1] != "kernel":
        raise ValueError(f"non-kernel LoRA path: {module}:{path}")
    if parts[0] in _BRIDGE_SIDES:
        layer = cfg.bridge.interaction_layers()[layer_idx]
        return f"{_BRIDGE_SIDES[parts[0]]}.{layer}." + ".".join(parts[1:-1])
    if parts[0] == "blocks":
        return f"blocks.{layer_idx}." + ".".join(parts[1:-1])
    raise ValueError(f"unmapped LoRA path: {module}:{path}")


def export_lora_state_dict(lora: Dict[str, Any], cfg: MOVAConfig,
                           style: str = "accelerate") -> Dict[str, np.ndarray]:
    """Canonical stacked tree {module: {path: {a [L,in,r], b [L,r,out]}}} ->
    reference-format torch-layout state dict (numpy values).

    style='accelerate': keys `...lora_A.weight` (lora_utils.py:259-308);
    style='low_resource': keys `...lora_A` (lora_layers.py:326-419)."""
    if style not in ("accelerate", "low_resource"):
        raise ValueError(f"unknown LoRA export style: {style}")
    suffix = ".weight" if style == "accelerate" else ""
    sd: Dict[str, np.ndarray] = {}
    for module, tree in lora.items():
        if module not in _MODULE_MAP_INV:
            raise ValueError(f"unexportable LoRA module: {module}")
        prefix = _MODULE_MAP_INV[module]
        for path, ab in tree.items():
            a = np.asarray(ab["a"], np.float32)  # [L, in, r]
            b = np.asarray(ab["b"], np.float32)  # [L, r, out]
            for i in range(a.shape[0]):
                if not (a[i].any() or b[i].any()):
                    continue  # zero-filled untrained layer
                sub = _torch_subpath(module, path, i, cfg)
                # a [in, r] -> torch lora_A.weight [r, in]; b -> [out, r]
                sd[f"{prefix}.{sub}.lora_A{suffix}"] = np.ascontiguousarray(a[i].T)
                sd[f"{prefix}.{sub}.lora_B{suffix}"] = np.ascontiguousarray(b[i].T)
    return sd


def save_reference_lora(lora: Dict[str, Any], cfg: MOVAConfig, out: str,
                        alpha: float = 16.0, rank: int = 16,
                        style: str = "accelerate") -> str:
    """Write the reference on-disk layout. accelerate -> `out/` directory with
    lora_weights.pt + lora_config.pt; low_resource -> single state-dict .pt at
    `out` (a .pt path) or `out/lora_low_resource.pt` (a directory).
    Returns the weights path."""
    import torch

    sd = {k: torch.from_numpy(v)
          for k, v in export_lora_state_dict(lora, cfg, style=style).items()}
    if style == "accelerate":
        os.makedirs(out, exist_ok=True)
        weights_path = os.path.join(out, "lora_weights.pt")
        torch.save(sd, weights_path)
        torch.save({"rank": int(rank), "alpha": float(alpha)},
                   os.path.join(out, "lora_config.pt"))
    else:
        weights_path = (os.path.join(out, "lora_low_resource.pt")
                        if not out.endswith(".pt") else out)
        os.makedirs(os.path.dirname(weights_path) or ".", exist_ok=True)
        torch.save(sd, weights_path)
    return weights_path
