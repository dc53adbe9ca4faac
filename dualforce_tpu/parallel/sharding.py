"""GSPMD parameter sharding rules.

HBM-resident sharded weights replace the reference's entire offload stack
(FSDP2 wrap + CPU/FP8 offload + DeepSpeed ZeRO, SURVEY.md §2.4): annotate each
param leaf with a PartitionSpec over the `fsdp` axis and let XLA insert
all-gathers where weights are consumed.

Rule: for a leaf of rank >= 2, shard the LARGEST of the trailing two dims over
`fsdp` when divisible by the axis size (stacked block params [L, ..., in, out]
keep the layer axis unsharded so lax.scan slices stay local); rank-0/1 leaves
and non-divisible dims replicate.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _leaf_spec(x, fsdp_size: int) -> P:
    shape = np.shape(x)
    if len(shape) < 2 or fsdp_size <= 1:
        return P()
    d_last, d_prev = shape[-1], shape[-2]
    spec = [None] * len(shape)
    if d_last >= d_prev and d_last % fsdp_size == 0:
        spec[-1] = "fsdp"
    elif d_prev % fsdp_size == 0:
        spec[-2] = "fsdp"
    elif d_last % fsdp_size == 0:
        spec[-1] = "fsdp"
    return P(*spec)


def param_pspecs(params: Any, fsdp_size: int):
    """Tree of PartitionSpecs (the _leaf_spec rule) matching `params` —
    the manual in_specs / per-layer gather plan for the sequence-parallel
    shard_map (parallel/sp.py)."""
    return jax.tree.map(lambda x: _leaf_spec(x, fsdp_size), params)


def param_shardings(params: Any, mesh: Mesh):
    """Tree of NamedShardings matching `params`."""
    fsdp = mesh.shape.get("fsdp", 1)
    return jax.tree.map(lambda x: NamedSharding(mesh, _leaf_spec(x, fsdp)), params)


def shard_params(params: Any, mesh: Mesh):
    """device_put params with fsdp-sharded layouts (HBM-resident)."""
    return jax.device_put(params, param_shardings(params, mesh))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def activation_spec(batch_axis: bool = True, seq_axis: Optional[str] = None) -> P:
    """[B, S, D] activations: batch over `data`, optionally tokens over `cp`."""
    return P("data" if batch_axis else None, seq_axis, None)


def shard_batch(batch: Any, mesh: Mesh):
    """Shard a host batch over the mesh's `data` axis (leading dim of every
    array leaf). Replaces the reference's per-rank DataLoader sharding
    (accelerate's prepare(dataloader)): single-host, this is a device_put
    with a data-sharded layout; multi-host, each process contributes its
    LOCAL batch and the global array spans processes
    (jax.make_array_from_process_local_data)."""
    data = mesh.shape.get("data", 1)

    def _put(x):
        x = np.asarray(x)
        if x.ndim == 0 or data <= 1 or x.shape[0] % data:
            return jax.device_put(x, NamedSharding(mesh, P()))
        sh = NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sh, x)
        return jax.device_put(x, sh)

    return jax.tree.map(_put, batch)
