"""Test configuration.

Forces an 8-virtual-device CPU platform BEFORE jax initializes, so every test
can build real `jax.sharding.Mesh`es and exercise DP/FSDP/CP collectives
without TPU hardware (SURVEY.md §4 implication (c)).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Neutralize @torch.compile decorators in the reference oracle modules.
os.environ.setdefault("TORCHDYNAMO_DISABLE", "1")
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
