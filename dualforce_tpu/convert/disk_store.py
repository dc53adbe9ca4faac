"""Disk-backed parameter store for low-RAM hosts.

TPU-native equivalent of the reference's group-offload-to-disk
(`--offload_to_disk_path`, inference_single.py:92-97 → diffusers
enable_group_offload(offload_to_disk_path=...)): every pytree leaf is saved
as one .npy file and loaded back as a read-only np.memmap, so host RSS stays
at page-cache level and `MOVAPipeline(offload="component")` streams each
module disk → HBM for its phase.

Layout: <dir>/manifest.json
    {"fingerprint": <caller-supplied source id>,
     "leaves": {key: {"file", "shape", "dtype"}}}
plus one .npy per leaf; key is the "/"-joined pytree path. Param trees here
are nested DICTS of arrays (models/factory.py, convert/load_checkpoint.py),
so a tree can be rebuilt from the manifest keys alone — a repeat run never
has to materialize the checkpoint in host RAM first
(`load_params_mmap_from_manifest`).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional

import numpy as np
import jax


def _key_str(path) -> str:
    """Sequence entries are tagged "i:<n>" so the manifest-only loader can
    rebuild lists (DAC conv blocks are lists) vs dicts unambiguously."""
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(f"i:{p.idx}")
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


def _storage_and_name(arr: np.ndarray):
    """(storable array, true dtype name): extended dtypes (bfloat16, fp8)
    are stored as same-itemsize uint raw bits — np.save would otherwise
    degrade them to opaque void records — and viewed back on load."""
    if arr.dtype.kind not in "fiub":   # ml_dtypes register as kind 'V'
        return arr.view(_RAW_VIEW[arr.dtype.itemsize]), arr.dtype.name
    return arr, str(arr.dtype)


def save_params_to_dir(params: Dict[str, Any], out_dir: str,
                       fingerprint: Optional[str] = None) -> str:
    """Write every leaf as <out_dir>/<sanitized-key>.npy + manifest.json.
    `fingerprint` identifies the source (e.g. ckpt path + dtype + mtime) so
    a later run can detect a stale store without loading the checkpoint."""
    os.makedirs(out_dir, exist_ok=True)
    leaves, _ = jax.tree_util.tree_flatten_with_path(params)
    manifest = {"fingerprint": fingerprint, "leaves": {}}
    for i, (path, leaf) in enumerate(leaves):
        key = _key_str(path)
        fname = re.sub(r"[^A-Za-z0-9_.-]", "_", key)[:180] + f".{i}.npy"
        arr, dtype_name = _storage_and_name(np.asarray(leaf))
        np.save(os.path.join(out_dir, fname), arr, allow_pickle=False)
        manifest["leaves"][key] = {
            "file": fname, "shape": list(arr.shape), "dtype": dtype_name}
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return out_dir


def _read_manifest(store_dir: str) -> Optional[Dict[str, Any]]:
    mpath = os.path.join(store_dir, "manifest.json")
    if not os.path.exists(mpath):
        return None
    try:
        with open(mpath) as f:
            return json.load(f)
    except json.JSONDecodeError:
        return None


def _load_leaf(store_dir: str, rec: Dict[str, Any]) -> np.ndarray:
    mm = np.load(os.path.join(store_dir, rec["file"]), mmap_mode="r")
    want = _resolve_dtype(rec["dtype"])
    return mm.view(want) if mm.dtype != want else mm


def load_params_mmap(params_template: Dict[str, Any], store_dir: str):
    """Rebuild the pytree with np.memmap leaves (template supplies structure;
    its leaf VALUES are unused). Raises KeyError on a manifest/template
    mismatch — a stale store should fail loudly, not half-load."""
    manifest = _read_manifest(store_dir)
    if manifest is None:
        raise FileNotFoundError(f"no manifest.json under {store_dir}")
    recs = manifest["leaves"]

    def _load(path, _leaf):
        return _load_leaf(store_dir, recs[_key_str(path)])

    return jax.tree_util.tree_map_with_path(_load, params_template)


def load_params_mmap_from_manifest(store_dir: str) -> Dict[str, Any]:
    """Rebuild the nested-dict param tree from the manifest alone — no
    template, so a repeat run never materializes the checkpoint in host RAM
    (the point of --offload_to_disk_path)."""
    manifest = _read_manifest(store_dir)
    if manifest is None:
        raise FileNotFoundError(f"no manifest.json under {store_dir}")
    out: Dict[str, Any] = {}
    for key, rec in manifest["leaves"].items():
        node = out
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
            if not isinstance(node, dict):
                raise ValueError(f"manifest key {key!r} conflicts with a leaf")
        node[parts[-1]] = _load_leaf(store_dir, rec)

    def listify(node):
        if not isinstance(node, dict):
            return node
        node = {k: listify(v) for k, v in node.items()}
        if node and all(k.startswith("i:") for k in node):
            seq = [None] * len(node)
            for k, v in node.items():
                seq[int(k[2:])] = v
            return seq
        return node

    return listify(out)


def store_matches(params_template: Optional[Dict[str, Any]], store_dir: str,
                  fingerprint: Optional[str] = None) -> bool:
    """True when the on-disk store is usable for this source. With a
    `fingerprint`, matches on it alone (no checkpoint load needed). With a
    template, additionally requires the exact leaf-key set AND each leaf's
    stored shape/dtype to match — a store exported from different weights or
    a different --weight_dtype must not be silently reused."""
    manifest = _read_manifest(store_dir)
    if manifest is None:
        return False
    if fingerprint is not None and manifest.get("fingerprint") != fingerprint:
        return False
    if params_template is None:
        return fingerprint is not None
    leaves, _ = jax.tree_util.tree_flatten_with_path(params_template)
    recs = manifest["leaves"]
    if {_key_str(p) for p, _ in leaves} != set(recs):
        return False
    for path, leaf in leaves:
        arr, dtype_name = _storage_and_name(np.asarray(leaf))
        rec = recs[_key_str(path)]
        if list(arr.shape) != rec["shape"] or dtype_name != rec["dtype"]:
            return False
    return True
