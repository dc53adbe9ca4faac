"""LoRA over parameter pytrees.

Behavioural reference: the accelerate-format LoRA utils
(mova/engine/trainer/accelerate/lora_utils.py:19-195 — wrapper LoRALinear,
regex injection over q/k/v/o etc., merge = W + B@A * alpha/r).

TPU-first design: instead of wrapper modules, LoRA factors live in a SEPARATE
pytree mirroring the base params' structure ({"a": [in, r], "b": [r, out]}
per targeted kernel). `merge_lora` produces effective kernels
W' = W + (A @ B) * (alpha/r) functionally each step — cheap relative to the
forward, jit/scan/pjit-transparent, and the natural fit for stacked layer
params ([L, in, r] factors merge via one einsum). Gradients flow only through
the LoRA tree; the base stays frozen.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# default targets: attention + bridge projections (mova_lora.py:147-188)
DEFAULT_TARGET_RE = (
    r"(self_attn|cross_attn|inner)/(q|k|v|o)/kernel$"
)
# reference excludes time_projection/time_embedding (lora_utils.py:112-195)
DEFAULT_EXCLUDE_RE = r"(time_projection|time_embedding|patch_embedding)"


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def init_lora(
    key,
    params: Any,
    rank: int = 16,
    target_re: str = DEFAULT_TARGET_RE,
    exclude_re: str = DEFAULT_EXCLUDE_RE,
    dtype=jnp.float32,
) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Build a flat {path: {a, b}} LoRA tree for every matching kernel.

    Kernels of shape [..., in, out] get a: [..., in, r] (gaussian / sqrt(in)),
    b: [..., r, out] (zeros) — leading stacked-layer axes are preserved.
    """
    leaves = jax.tree_util.tree_leaves_with_path(params)
    out: Dict[str, Dict[str, jnp.ndarray]] = {}
    keys = jax.random.split(key, max(len(leaves), 1))
    for (path, leaf), k in zip(leaves, keys):
        name = _path_str(path)
        if not re.search(target_re, name) or re.search(exclude_re, name):
            continue
        *lead, fan_in, fan_out = leaf.shape
        a = jax.random.normal(k, (*lead, fan_in, rank), jnp.float32) / np.sqrt(fan_in)
        b = jnp.zeros((*lead, rank, fan_out), jnp.float32)
        out[name] = {"a": a.astype(dtype), "b": b.astype(dtype)}
    return out


def merge_lora(params: Any, lora: Dict[str, Dict[str, jnp.ndarray]],
               alpha: float = 16.0, rank: Optional[int] = None,
               scale: float = 1.0) -> Any:
    """Return params with W' = W + (a @ b) * (alpha/r) * scale on targeted kernels."""
    if not lora:
        return params
    any_b = next(iter(lora.values()))["b"]
    r = rank or any_b.shape[-2]
    scaling = (alpha / r) * scale

    def update(path, leaf):
        name = _path_str(path)
        if name in lora:
            a, b = lora[name]["a"], lora[name]["b"]
            delta = jnp.einsum("...ir,...ro->...io", a.astype(jnp.float32),
                               b.astype(jnp.float32)) * scaling
            return (leaf.astype(jnp.float32) + delta).astype(leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(update, params)


def merge_pipeline_lora(params: Dict[str, Any], lora: Dict[str, Any],
                        alpha: float = 16.0, scale: float = 1.0) -> Dict[str, Any]:
    """Apply per-module LoRA trees ({module_name: {path: {a,b}}}) to pipeline params."""
    out = dict(params)
    for mod, tree in lora.items():
        if mod in out and tree:
            out[mod] = merge_lora(out[mod], tree, alpha=alpha, scale=scale)
    return out


def init_pipeline_lora(key, params: Dict[str, Any], rank: int = 16,
                       modules: Tuple[str, ...] = ("video_dit", "video_dit_2",
                                                   "audio_dit", "bridge"),
                       dtype=jnp.float32) -> Dict[str, Any]:
    """LoRA trees for the trainable modules (reference trains video_dit(_2),
    audio_dit, dual_tower_bridge — mova_lora.py:147-188)."""
    lora = {}
    ks = jax.random.split(key, len(modules))
    for m, k in zip(modules, ks):
        if m in params:
            lora[m] = init_lora(k, params[m], rank=rank, dtype=dtype)
    return lora


def save_lora(lora: Dict[str, Any], path: str, alpha: float, rank: int) -> None:
    """Serialize LoRA weights + config (numpy npz + json sidecar)."""
    import json
    import os

    base = path[:-4] if path.endswith(".npz") else path
    flat = {}
    for mod, tree in lora.items():
        for name, ab in tree.items():
            flat[f"{mod}::{name}::a"] = np.asarray(ab["a"])
            flat[f"{mod}::{name}::b"] = np.asarray(ab["b"])
    os.makedirs(os.path.dirname(base) or ".", exist_ok=True)
    np.savez(base + ".npz", **flat)
    with open(base + ".json", "w") as f:
        json.dump({"alpha": alpha, "rank": rank}, f)


def load_lora(path: str) -> Tuple[Dict[str, Any], Dict[str, float]]:
    import json

    base = path[:-4] if path.endswith(".npz") else path
    data = np.load(base + ".npz")
    lora: Dict[str, Any] = {}
    for key in data.files:
        mod, name, part = key.split("::")
        lora.setdefault(mod, {}).setdefault(name, {})[part] = jnp.asarray(data[key])
    with open(base + ".json") as f:
        cfg = json.load(f)
    return lora, cfg
