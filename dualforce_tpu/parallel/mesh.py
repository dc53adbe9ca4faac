"""Device mesh construction.

One mesh, three axes (SURVEY.md §7.1): `data` (batch/DP, maps to DCN across
slices), `fsdp` (weight sharding, replaces the reference's FSDP2/DeepSpeed/CPU
offload stack), `cp` (sequence/context parallelism over ICI, replaces
torchrun cp_size + yunchang process groups — reference inference_single.py:65-71).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("data", "fsdp", "cp")


def create_mesh(data: int = 1, fsdp: int = 1, cp: int = 1,
                devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = data * fsdp * cp
    if n > len(devices):
        raise ValueError(f"mesh {data}x{fsdp}x{cp} needs {n} devices, "
                         f"have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(data, fsdp, cp)
    return Mesh(dev, AXES)


def single_device_mesh() -> Mesh:
    return create_mesh(1, 1, 1)
