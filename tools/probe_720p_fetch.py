"""Probe: can a concurrent KEEP-ALIVE revive the post-sweep d2h at 720p?

Round-4/5 characterization (out/720p/run_r4*.log, run_r5a/b.log): after one
176k-token streamed sweep, the session's device->host DATA channel is dead —
direct fetches at every size down to a 4-byte scalar fail RESOURCE_EXHAUSTED
(fast or after ~20 min of blocking), cross-backend device_put and fresh
compiles fail, io_callback hangs — while warm EXECUTIONS and h2d staging
keep working (steps 2..N always ran; the warm-copy canary returns in 0.0s).

This probe tests the one mechanism left: whether d2h only works when the
link carries concurrent traffic. It runs ONE streamed denoise step at the
full 720p geometry, then attempts the scalar + small-leaf fetch

  (a) with an h2d keep-alive thread streaming ~256 MiB device_puts,
  (b) with a warm-execution keep-alive thread re-running the copy program,
  (c) bare (control).

Writes the outcome matrix to stdout + --artifact.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np

sys.path.insert(0, os.path.join(_REPO, "tools"))
from run_720p_e2e import (  # noqa: E402
    WarmCopiers,
    WarmSlicers,
    build_tokenizer,
    load_params_cache,
    load_state,
)


def try_fetch(tag, fn, timeout_hint, log=print):
    t0 = time.time()
    try:
        v = fn()
        dt = time.time() - t0
        log(f"[probe] {tag}: OK in {dt:.1f}s", flush=True)
        return {"tag": tag, "ok": True, "seconds": round(dt, 1),
                "value": float(np.asarray(v).reshape(-1)[0])}
    except Exception as e:  # noqa: BLE001
        dt = time.time() - t0
        log(f"[probe] {tag}: FAILED in {dt:.1f}s "
            f"({type(e).__name__}: {str(e)[:120]})", flush=True)
        return {"tag": tag, "ok": False, "seconds": round(dt, 1),
                "error": type(e).__name__}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--state_dir", default="out/720p")
    ap.add_argument("--params_cache", default="out/720p/params_cache")
    ap.add_argument("--group_size", type=int, default=4)
    ap.add_argument("--artifact", default="out/720p/probe_fetch.json")
    ap.add_argument("--bare_control", action="store_true")
    args = ap.parse_args()

    from dualforce_tpu.utils.misc import setup_compile_cache

    setup_compile_cache(os.path.join(args.state_dir, "compile_cache"))

    import jax
    import jax.numpy as jnp

    from dualforce_tpu.config import MOVAConfig
    from dualforce_tpu.diffusion.pipeline import MOVAPipeline

    cfg = MOVAConfig()
    params = load_params_cache(cfg, args.params_cache)
    assert params is not None, "params cache missing"
    state = load_state(os.path.join(args.state_dir, "e2e_state.npz"))
    print(f"[probe] state at step {state['step']}", flush=True)

    tok = build_tokenizer(cfg.text_encoder.vocab_size)
    pipe = MOVAPipeline(cfg, params, tokenizer=tok, attn_impl="auto",
                        offload="group", offload_group_size=args.group_size,
                        offload_resident_small=True,
                        vae_encode_dtype="bf16")

    copiers, slicers = WarmCopiers(), WarmSlicers()
    lat, alat = state["latents"], state["audio_latents"]
    for v in (lat, alat):
        copiers.warm(np.shape(v), v.dtype)
        slicers.warm(np.shape(v), v.dtype)
    # keep-alive staging buffer (h2d) — warm its path too
    ka_host = np.zeros((64, 1024, 1024), np.float32)  # 256 MiB
    jax.device_put(ka_host).block_until_ready()

    t0 = time.time()
    state = pipe.denoise_state(state, max_steps=1)
    print(f"[probe] sweep done in {time.time() - t0:.1f}s", flush=True)
    alat_d = state["audio_latents"]
    lat_d = state["latents"]

    results = {"group_size": args.group_size}

    # (c) bare control: run only with --bare_control (each attempt can block
    # 5-20 min; run_r5a/b.log already established the bare channel is dead)
    if args.bare_control:
        results["bare_scalar"] = try_fetch(
            "bare scalar", lambda: slicers.probe_scalar(lat_d), 60)
    else:
        results["bare_scalar"] = {"ok": False,
                                  "note": "skipped; r5a/b logs are the control"}

    stop = threading.Event()

    def h2d_keepalive():
        while not stop.is_set():
            jax.device_put(ka_host).block_until_ready()
            time.sleep(0.5)

    def exec_keepalive():
        while not stop.is_set():
            copiers.copy(alat_d)
            time.sleep(0.2)

    if not results["bare_scalar"]["ok"]:
        th = threading.Thread(target=h2d_keepalive, daemon=True)
        th.start()
        time.sleep(2.0)
        results["h2d_keepalive_scalar"] = try_fetch(
            "scalar under h2d keep-alive",
            lambda: slicers.probe_scalar(lat_d), 120)
        results["h2d_keepalive_small_leaf"] = try_fetch(
            "audio_latents under h2d keep-alive",
            lambda: np.asarray(alat_d), 120)
        stop.set()
        th.join(timeout=30)

        stop.clear()
        th = threading.Thread(target=exec_keepalive, daemon=True)
        th.start()
        time.sleep(2.0)
        results["exec_keepalive_scalar"] = try_fetch(
            "scalar under exec keep-alive",
            lambda: slicers.probe_scalar(lat_d), 120)
        stop.set()
        th.join(timeout=30)
    else:
        # channel alive in this configuration — fetch the state directly
        results["direct_small_leaf"] = try_fetch(
            "audio_latents direct", lambda: np.asarray(alat_d), 120)
        results["warm_slice_latents"] = try_fetch(
            "latents warm-slice 1MiB",
            lambda: slicers.fetch(lat_d, 262144), 600)

    with open(args.artifact, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
