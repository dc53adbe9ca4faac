"""Disk-backed parameter store for low-RAM hosts.

TPU-native equivalent of the reference's group-offload-to-disk
(`--offload_to_disk_path`, inference_single.py:92-97 → diffusers
enable_group_offload(offload_to_disk_path=...)): every pytree leaf is saved
as one .npy file and loaded back as a read-only np.memmap, so host RSS stays
at page-cache level and `MOVAPipeline(offload="component")` streams each
module disk → HBM for its phase.

Layout: <dir>/manifest.json {"leaves": {key: {"file", "shape", "dtype"}}}
plus one .npy per leaf; key is the "/"-joined pytree path.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict

import numpy as np
import jax


def _key_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


_RAW_VIEW = {1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint64}


def _resolve_dtype(name: str) -> np.dtype:
    """np.dtype by name, covering ml_dtypes (bfloat16, float8_e4m3fn, ...)."""
    try:
        return np.dtype(name)
    except TypeError:
        import ml_dtypes

        return np.dtype(getattr(ml_dtypes, name))


def save_params_to_dir(params: Dict[str, Any], out_dir: str) -> str:
    """Write every leaf as <out_dir>/<sanitized-key>.npy + manifest.json.
    Extended dtypes (bfloat16, fp8) are stored as same-itemsize uint raw bits
    — np.save would otherwise degrade them to opaque void records — and
    viewed back on load."""
    os.makedirs(out_dir, exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    manifest = {"leaves": {}, "treedef": None}
    for i, (path, leaf) in enumerate(leaves):
        key = _key_str(path)
        fname = re.sub(r"[^A-Za-z0-9_.-]", "_", key)[:180] + f".{i}.npy"
        arr = np.asarray(leaf)
        dtype_name = str(arr.dtype)
        if arr.dtype.kind not in "fiub":   # ml_dtypes register as kind 'V'
            dtype_name = arr.dtype.name
            arr = arr.view(_RAW_VIEW[arr.dtype.itemsize])
        np.save(os.path.join(out_dir, fname), arr, allow_pickle=False)
        manifest["leaves"][key] = {
            "file": fname, "shape": list(arr.shape), "dtype": dtype_name}
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return out_dir


def load_params_mmap(params_template: Dict[str, Any], store_dir: str):
    """Rebuild the pytree with np.memmap leaves (template supplies structure;
    its leaf VALUES are unused). Raises KeyError on a manifest/template
    mismatch — a stale store should fail loudly, not half-load."""
    with open(os.path.join(store_dir, "manifest.json")) as f:
        manifest = json.load(f)
    recs = manifest["leaves"]

    def _load(path, _leaf):
        rec = recs[_key_str(path)]
        mm = np.load(os.path.join(store_dir, rec["file"]), mmap_mode="r")
        want = _resolve_dtype(rec["dtype"])
        return mm.view(want) if mm.dtype != want else mm

    return jax.tree_util.tree_map_with_path(_load, params_template)


def store_matches(params_template: Dict[str, Any], store_dir: str) -> bool:
    """True when the on-disk manifest covers exactly the template's leaves."""
    mpath = os.path.join(store_dir, "manifest.json")
    if not os.path.exists(mpath):
        return False
    with open(mpath) as f:
        recs = json.load(f)["leaves"]
    leaves, _ = jax.tree_util.tree_flatten_with_path(params_template)
    keys = {_key_str(p) for p, _ in leaves}
    return keys == set(recs)
