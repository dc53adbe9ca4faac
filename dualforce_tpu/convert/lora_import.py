"""Reference-trained LoRA checkpoint -> this framework's LoRA pytree.

The reference ships TWO LoRA on-disk formats (SURVEY.md §2.1):
  1. accelerate-trainer format (lora_utils.py:259-308 / mova_lora.py:109-145):
     directory with `lora_weights.pt` + `lora_config.pt`; keys
     `{module}.{torch_path}.lora_A.weight` (or the PEFT-style
     `.lora_A.default.weight`), A: [r, in], B: [out, r].
  2. low-resource-trainer format (lora_layers.py:326-419): a state dict whose
     buffer-style keys end in `.lora_A` / `.lora_B` (no `.weight`).

Both are converted into the canonical npz-style tree
{module: {path: {"a": [L, in, r], "b": [L, r, out]}}} with stacked layer
axes, matching engine/lora.py's merge semantics (W' = W + a@b * alpha/r —
identical scaling to the torch LoRALinear's alpha/rank).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

from dualforce_tpu.config import MOVAConfig

# torch module name -> our params key
_MODULE_MAP = {
    "video_dit": "video_dit",
    "video_dit_2": "video_dit_2",
    "audio_dit": "audio_dit",
    "dual_tower_bridge": "bridge",
}

# (torch sub-path regex) -> (our path template, layer-group index)
_KEY_RES = [
    # tower DiT blocks: blocks.{i}.{self_attn|cross_attn}.{q|k|v|o}
    (re.compile(r"^blocks\.(\d+)\.(self_attn|cross_attn)\.(q|k|v|o)$"),
     lambda m: (f"blocks/{m.group(2)}/{m.group(3)}/kernel", int(m.group(1)))),
    # bridge conditioners: audio_to_video_conditioners.{i}.inner.{q|k|v|o}
    (re.compile(r"^audio_to_video_conditioners\.(\d+)\.inner\.(q|k|v|o)$"),
     lambda m: (f"a2v/inner/{m.group(2)}/kernel", int(m.group(1)))),
    (re.compile(r"^video_to_audio_conditioners\.(\d+)\.inner\.(q|k|v|o)$"),
     lambda m: (f"v2a/inner/{m.group(2)}/kernel", int(m.group(1)))),
]


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().to("cpu").float().numpy()
    return np.asarray(x, dtype=np.float32)


def _parse_key(key: str) -> Optional[Tuple[str, str, str]]:
    """-> (module, torch_subpath, 'a'|'b') or None for non-LoRA keys."""
    m = re.match(
        r"^(?:(video_dit_2|video_dit|audio_dit|dual_tower_bridge)\.)?(.+?)"
        r"\.lora_([AB])(?:\.default)?(?:\.weight)?$", key)
    if not m:
        return None
    module = m.group(1) or ""
    return module, m.group(2), "a" if m.group(3) == "A" else "b"


def convert_lora_state_dict(
    sd: Mapping[str, Any],
    cfg: MOVAConfig,
) -> Tuple[Dict[str, Any], Dict[str, list]]:
    """Convert a reference LoRA state dict ({key: tensor/ndarray}) into the
    canonical stacked tree. Returns (lora_tree, skipped_keys_by_reason).

    Layers without trained factors get zero factors (merge-neutral) so the
    stacked [L, ...] shape always matches the base params.
    """
    # collect per (module, our_path): {layer: {"a": ..., "b": ...}}
    collected: Dict[Tuple[str, str], Dict[int, Dict[str, np.ndarray]]] = {}
    skipped: Dict[str, list] = {"non_lora": [], "unmapped": []}

    for key, value in sd.items():
        parsed = _parse_key(key)
        if parsed is None:
            skipped["non_lora"].append(key)
            continue
        module, sub, part = parsed
        hit = None
        for rx, to_ours in _KEY_RES:
            m = rx.match(sub)
            if m:
                hit = to_ours(m)
                break
        if hit is None or (module and module not in _MODULE_MAP):
            skipped["unmapped"].append(key)
            continue
        our_path, layer = hit
        mod = _MODULE_MAP.get(module, module)
        if not mod:  # low-resource dicts may be saved per-module without prefix
            mod = "bridge" if our_path.startswith(("a2v/", "v2a/")) else "video_dit"
        w = _np(value)
        # torch lora_A.weight: [r, in] -> a [in, r]; lora_B: [out, r] -> b [r, out]
        collected.setdefault((mod, our_path), {})[layer] = \
            collected.get((mod, our_path), {}).get(layer, {})
        collected[(mod, our_path)][layer][part] = w.T

    # bridge layer index -> stacked position (interaction_layers order)
    bridge_pos = {layer: i for i, layer in
                  enumerate(cfg.bridge.interaction_layers())}

    def num_layers(mod: str, path: str) -> int:
        if path.startswith(("a2v/", "v2a/")):
            return len(bridge_pos)
        return (cfg.video_dit.num_layers if mod.startswith("video")
                else cfg.audio_dit.num_layers)

    lora: Dict[str, Any] = {}
    for (mod, path), layers in collected.items():
        L = num_layers(mod, path)
        sample = next((ab for ab in layers.values()
                       if "a" in ab and "b" in ab), None)
        if sample is None:
            skipped["unmapped"].append(f"{mod}:{path} (missing a or b factor)")
            continue
        fan_in, r = sample["a"].shape
        fan_out = sample["b"].shape[1]
        a = np.zeros((L, fan_in, r), np.float32)
        b = np.zeros((L, r, fan_out), np.float32)
        for layer, ab in layers.items():
            if "a" not in ab or "b" not in ab:
                skipped["unmapped"].append(
                    f"{mod}:{path} layer {layer} (missing a or b factor)")
                continue
            pos = (bridge_pos.get(layer) if path.startswith(("a2v/", "v2a/"))
                   else layer)
            if pos is None or pos >= L:
                skipped["unmapped"].append(f"{mod}:{path} layer {layer}")
                continue
            a[pos] = ab["a"]
            b[pos] = ab["b"]
        lora.setdefault(mod, {})[path] = {"a": a, "b": b}
    return lora, skipped


def load_reference_lora(path: str, cfg: MOVAConfig
                        ) -> Tuple[Dict[str, Any], Dict[str, float]]:
    """Load either reference format from disk (directory with
    lora_weights.pt [+ lora_config.pt], or a bare .pt state dict) and
    convert. Returns (lora_tree, {"alpha", "rank"})."""
    import os

    import torch

    weights_path = path
    meta = {"alpha": 16.0, "rank": 16}
    if os.path.isdir(path):
        weights_path = os.path.join(path, "lora_weights.pt")
        config_path = os.path.join(path, "lora_config.pt")
        if os.path.exists(config_path):
            tcfg = torch.load(config_path, map_location="cpu",
                              weights_only=False)
            # The reference's non-FSDP save_lora_weights (lora_utils.py:248)
            # stores a module CLASS-NAME string under "rank"; rank is
            # re-inferred from the factor shapes below, so tolerate junk here.
            try:
                meta["alpha"] = float(tcfg.get("alpha", 16.0))
            except (TypeError, ValueError):
                pass
            try:
                meta["rank"] = int(tcfg.get("rank", 16))
            except (TypeError, ValueError):
                pass
    sd = torch.load(weights_path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    lora, skipped = convert_lora_state_dict(sd, cfg)
    if skipped["unmapped"]:
        print(f"[lora-import] {len(skipped['unmapped'])} unmapped keys "
              f"(first: {skipped['unmapped'][:3]})")
    n = sum(len(v) for v in lora.values())
    print(f"[lora-import] converted {n} LoRA factor pairs "
          f"(rank={meta['rank']}, alpha={meta['alpha']})")
    # infer rank from the factors if the config was absent
    for tree in lora.values():
        for ab in tree.values():
            meta["rank"] = int(ab["a"].shape[-1])
            break
        break
    return lora, meta
