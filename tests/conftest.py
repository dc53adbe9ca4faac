"""Test configuration.

Forces an 8-virtual-device CPU platform BEFORE jax initializes, so every test
can build real `jax.sharding.Mesh`es and exercise DP/FSDP/CP collectives
without TPU hardware (SURVEY.md §4 implication (c)).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"  # the env pins axon/TPU; tests must not grab the chip
# Neutralize @torch.compile decorators in the reference oracle modules.
os.environ.setdefault("TORCHDYNAMO_DISABLE", "1")
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU plugin and overrides
# jax_platforms in-process, ignoring JAX_PLATFORMS — override it back before
# any backend initializes.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
