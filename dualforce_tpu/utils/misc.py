"""Profiling/observability helpers.

Replaces the reference's cpu_timer/gpu_timer/track_gpu_mem
(mova/utils/misc.py:39-143) with TPU-native equivalents: device-synchronized
wall timers, HBM stats via device.memory_stats(), and jax.profiler trace
scoping (SURVEY.md §5.1).
"""

from __future__ import annotations

import contextlib
import functools as _functools
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def device_timer(name: str = "", sync_tree=None, verbose: bool = True):
    """Wall-clock bracket that blocks on `sync_tree` (device work) at exit."""
    t0 = time.perf_counter()
    result = {}
    try:
        yield result
    finally:
        if sync_tree is not None:
            jax.block_until_ready(sync_tree)
        result["seconds"] = time.perf_counter() - t0
        if verbose and name:
            print(f"[timer] {name}: {result['seconds']:.3f}s")


def hbm_stats(device=None) -> Dict[str, int]:
    """Device memory stats (bytes); empty dict on backends without support."""
    device = device or jax.local_devices()[0]
    try:
        return dict(device.memory_stats() or {})
    except Exception:
        return {}


def hbm_in_use_gb(device=None) -> float:
    stats = hbm_stats(device)
    return stats.get("bytes_in_use", 0) / 1e9


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace scope (Perfetto/XPlane); no-op if log_dir is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def tree_size_bytes(params) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))


def setup_compile_cache(path: Optional[str]):
    """Enable the persistent XLA compilation cache ('' / None disables).
    Shared by the CLIs (inference, LoRA inference, serve) so cache behavior
    cannot drift between them."""
    if path:
        import os

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


@_functools.lru_cache(maxsize=1)
def host_callbacks_supported() -> bool:
    """Whether the backend supports host send/recv callbacks
    (jax.debug.callback / io_callback). The axon tunnel PJRT does NOT —
    per-step progress reporting must degrade gracefully there."""
    import jax
    import jax.numpy as jnp

    try:
        def f(x):
            jax.debug.callback(lambda v: None, x)
            return x + 1

        jax.jit(f)(jnp.zeros(())).block_until_ready()
        return True
    except Exception:  # noqa: BLE001 — any failure means "don't use them"
        return False


def respect_platform_env() -> None:
    """Re-assert the JAX_PLATFORMS env var as the in-process platform choice.

    The axon sitecustomize force-selects jax_platforms="axon,cpu" in EVERY
    interpreter, overriding the env var — so a subprocess launched with
    JAX_PLATFORMS=cpu (tests, CPU smoke runs of the CLIs) would silently
    grab the real chip. Entry points call this before first backend use."""
    import os

    want = os.environ.get("JAX_PLATFORMS")
    if want and want != "axon":
        import jax

        jax.config.update("jax_platforms", want)
