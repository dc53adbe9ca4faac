"""Device mesh construction.

One mesh, three axes (SURVEY.md §7.1): `data` (batch/DP, maps to DCN across
slices), `fsdp` (weight sharding, replaces the reference's FSDP2/DeepSpeed/CPU
offload stack), `cp` (sequence/context parallelism over ICI, replaces
torchrun cp_size + yunchang process groups — reference inference_single.py:65-71).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("data", "fsdp", "cp")


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host init (replaces the reference's
    dist.init_process_group("nccl"), inference_single.py:58-60).

    jax.distributed reads cluster env vars automatically on TPU pods
    (TPU_WORKER_ID etc.); explicit args or COORDINATOR_ADDRESS /
    NUM_PROCESSES / PROCESS_ID env vars cover manual launches. No-op when
    single-process (no coordinator discoverable).

    Must run BEFORE any other jax call: even jax.process_count() initializes
    the local backend, after which distributed init raises — and swallowing
    that error would silently degrade every host to its own 1-process world.
    """
    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    kw = {}
    if coordinator_address:
        kw = dict(
            coordinator_address=coordinator_address,
            num_processes=int(num_processes
                              or os.environ.get("NUM_PROCESSES", 1)),
            process_id=int(process_id if process_id is not None
                           else os.environ.get("PROCESS_ID", 0)),
        )
    else:
        # TPU-pod autodetect: only a MULTI-entry worker list means a real
        # cluster (single-host runtimes, incl. the axon tunnel, export
        # TPU_WORKER_HOSTNAMES=localhost)
        hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
        if len([h for h in hosts.split(",") if h]) <= 1:
            return  # single host, nothing to initialize
    if jax.distributed.is_initialized():
        return
    jax.distributed.initialize(**kw)


def create_mesh(data: int = 1, fsdp: int = 1, cp: int = 1,
                devices: Optional[Sequence] = None) -> Mesh:
    """Mesh(data, fsdp, cp). When the requested shape spans multiple slices
    (multi-host DCN), `data` is laid out across slices and fsdp/cp stay
    within a slice so their collectives ride ICI (SURVEY.md §5.8); within a
    slice, mesh_utils picks an ICI-topology-aware device order."""
    if devices is None:
        devices = jax.devices()
    n = data * fsdp * cp
    if n > len(devices):
        raise ValueError(f"mesh {data}x{fsdp}x{cp} needs {n} devices, "
                         f"have {len(devices)}")
    devices = list(devices)[:n]
    num_slices = len({getattr(d, "slice_index", 0) for d in devices})
    try:
        from jax.experimental import mesh_utils

        if num_slices > 1 and data % num_slices == 0:
            dev = mesh_utils.create_hybrid_device_mesh(
                (data // num_slices, fsdp, cp), (num_slices, 1, 1),
                devices=devices)
            dev = dev.reshape(data, fsdp, cp)
        else:
            dev = mesh_utils.create_device_mesh((data, fsdp, cp),
                                                devices=devices,
                                                allow_split_physical_axes=True)
    except Exception:  # virtual/CPU devices or odd topologies: plain order
        dev = np.asarray(devices).reshape(data, fsdp, cp)
    return Mesh(dev, AXES)


def single_device_mesh() -> Mesh:
    return create_mesh(1, 1, 1)
