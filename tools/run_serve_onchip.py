"""On-chip serving session record: scripts/serve.py on the real TPU.

The last reference-visible surface never exercised on hardware (VERDICT r4
next #5): launch the production server (counterpart of
workflow/launch_sglang_server.sh, /root/reference/README.md:153-212) against
the tiny checkpoint fixture, then drive it over real HTTP — submit, per-step
progress polls, download, plus a same-geometry batched pair — and record
queue latency, progress timestamps, and the batch outcome in a JSON artifact.

Geometry defaults engage the Pallas flash kernel (head_dim 128, >=256 video
tokens) so the serving path exercises the real attention kernel, not the
XLA fallback.

Usage:
    python tools/run_serve_onchip.py --workdir out/serve \
        --artifact SERVE_r05.json
"""

from __future__ import annotations

import argparse
import io
import json
import os
import socket
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from dualforce_tpu.utils.misc import respect_platform_env  # noqa: E402

respect_platform_env()

import numpy as np  # noqa: E402


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _png_bytes(w=64, h=64):
    from PIL import Image

    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    arr = np.stack([np.sin(x / 7), np.cos(y / 9), np.sin((x + y) / 11)],
                   axis=-1)
    img = Image.fromarray(((arr * 0.5 + 0.5) * 255).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def drive_task(client, *, prompt, png, size, frames, steps, poll_s, tmo,
               log=print):
    """Submit one task and poll it to completion; returns the trace dict."""
    t_submit = time.time()
    task = client.submit_video_task(prompt, png, size=size,
                                    num_frames=frames,
                                    num_inference_steps=steps, seed=42)
    trace = {"task_id": task.task_id, "progress": [], "queue_latency_s": None}
    deadline = t_submit + tmo
    last_p = -1.0
    while time.time() < deadline:
        t = client.get_task(task.task_id)
        now = round(time.time() - t_submit, 2)
        if t.status == "running" and trace["queue_latency_s"] is None:
            trace["queue_latency_s"] = now
        if t.progress != last_p:
            trace["progress"].append({"t_s": now, "progress": t.progress,
                                      "status": t.status})
            last_p = t.progress
            log(f"[serve-run]   {task.task_id[:8]} t={now:.1f}s "
                f"{t.status} {t.progress:.2f}", flush=True)
        if t.status in ("completed", "failed", "cancelled"):
            trace["status"] = t.status
            trace["error"] = t.error
            trace["inference_time_s"] = t.inference_time_s
            trace["wall_s"] = now
            return task, trace
        time.sleep(poll_s)
    raise TimeoutError(f"task {task.task_id} did not finish in {tmo}s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="out/serve")
    ap.add_argument("--size", default="256x128",
                    help="WxH; default gives 384 video tokens at 9 frames "
                         "(Pallas kernel engaged)")
    ap.add_argument("--frames", type=int, default=9)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--cold_timeout_s", type=float, default=2400.0,
                    help="first task includes the serving compile "
                         "(tunnel compiles: 100s-12min)")
    ap.add_argument("--task_timeout_s", type=float, default=900.0)
    ap.add_argument("--artifact", default="SERVE_r05.json")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    log_path = os.path.join(args.workdir, "server.log")
    ckpt = os.path.join(args.workdir, "ckpt")
    if not os.path.isdir(os.path.join(ckpt, "video_dit")):
        print("[serve-run] building checkpoint fixture", flush=True)
        rc = subprocess.run(
            [sys.executable, os.path.join(_REPO, "tools",
                                          "make_tiny_checkpoint.py"), ckpt],
            stdout=open(log_path, "a"), stderr=subprocess.STDOUT).returncode
        if rc != 0:
            raise SystemExit(f"make_tiny_checkpoint failed rc={rc}")

    port = _free_port()
    w, h = args.size.split("x")
    argv = [sys.executable, os.path.join(_REPO, "scripts", "serve.py"),
            "--ckpt_path", ckpt, "--host", "127.0.0.1",
            "--port", str(port),
            "--out_dir", os.path.join(args.workdir, "outputs"),
            "--max_batch", "2",
            "--warmup", f"{w}x{h}x{args.frames}x{args.steps}",
            "--compile_cache", os.path.join(args.workdir, "compile_cache")]
    print(f"[serve-run] launching server on :{port}", flush=True)
    with open(log_path, "a") as lf:
        server = subprocess.Popen(argv, stdout=lf, stderr=subprocess.STDOUT)
    try:
        from dualforce_tpu.serving.client import VideoClient

        client = VideoClient(f"http://127.0.0.1:{port}", timeout=30)
        t0 = time.time()
        while True:
            if server.poll() is not None:
                raise SystemExit(f"server exited rc={server.returncode}; "
                                 f"see {log_path}")
            try:
                if client.health():
                    break
            except Exception:  # noqa: BLE001
                pass
            if time.time() - t0 > 1200:
                raise SystemExit("server never became healthy")
            time.sleep(2.0)
        health_wait_s = round(time.time() - t0, 1)
        print(f"[serve-run] healthy after {health_wait_s}s", flush=True)

        png = _png_bytes()
        kw = dict(size=args.size, frames=args.frames, steps=args.steps,
                  poll_s=1.0)

        print("[serve-run] cold task (includes serving compile)", flush=True)
        t_cold, cold = drive_task(client, prompt="a calm ocean at sunset",
                                  png=png, tmo=args.cold_timeout_s, **kw)
        assert cold["status"] == "completed", cold
        dest = os.path.join(args.workdir, "cold.avi")
        client.download(client.get_task(t_cold.task_id), dest)
        cold["download_bytes"] = os.path.getsize(dest)

        print("[serve-run] warm single task", flush=True)
        _, warm = drive_task(client, prompt="a kitten playing a tiny piano",
                             png=png, tmo=args.task_timeout_s, **kw)
        assert warm["status"] == "completed", warm

        print("[serve-run] same-geometry batched pair", flush=True)
        t_pair0 = time.time()
        a = client.submit_video_task("city lights timelapse", png,
                                     size=args.size, num_frames=args.frames,
                                     num_inference_steps=args.steps, seed=1)
        b = client.submit_video_task("rain on a window", png,
                                     size=args.size, num_frames=args.frames,
                                     num_inference_steps=args.steps, seed=2)
        done_a = client.wait_for_completion(a.task_id, poll_interval=1.0,
                                            timeout=args.task_timeout_s)
        done_b = client.wait_for_completion(b.task_id, poll_interval=1.0,
                                            timeout=args.task_timeout_s)
        pair_wall = round(time.time() - t_pair0, 2)
        assert done_a.status == "completed", done_a.error
        assert done_b.status == "completed", done_b.error

        import jax  # noqa: F401 — backend name only; server owns the chip

        artifact = {
            "metric": "serve_run_onchip",
            "server": "scripts/serve.py (aiohttp /v1/videos), tiny-config "
                      "checkpoint, max_batch=2",
            "geometry": f"{args.size}x{args.frames}f steps={args.steps}",
            "health_wait_s": health_wait_s,
            "cold_task": cold,
            "warm_task": warm,
            "batched_pair": {
                "wall_s": pair_wall,
                "inference_time_s": [done_a.inference_time_s,
                                     done_b.inference_time_s],
                "two_singles_wall_s": round(2 * warm["wall_s"], 2),
                "speedup_vs_two_singles": round(
                    2 * warm["wall_s"] / pair_wall, 3) if pair_wall else None,
            },
        }
        with open(args.artifact, "w") as f:
            json.dump(artifact, f, indent=1)
        print(json.dumps(artifact))
    finally:
        server.terminate()
        try:
            server.wait(timeout=30)
        except subprocess.TimeoutExpired:
            server.kill()


if __name__ == "__main__":
    main()
