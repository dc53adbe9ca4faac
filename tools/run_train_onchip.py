"""On-chip training run record: scripts/train.py end to end, twice.

Drives the FULL training CLI journey on whatever backend jax selects (the
real TPU under axon; CPU elsewhere): build an HF-layout checkpoint fixture,
synthesize an MJPEG-AVI clip corpus at the 360p data geometry (352x640,
49 frames — decoded by the in-repo reader, the dataset's real video path),
then

  phase 1: train  max_steps=N,      Orbax save at N/2 and N
  phase 2: train  max_steps=N+M  -> must auto-resume from step N

and record steps/s, losses, and the resume evidence in a JSON artifact.
This is the run-record counterpart of the reference's training story
(/root/reference/README.md:269-273: accelerate launch mova_train ... with
periodic checkpointing), which its docs back with run records; the per-step
flagship-width throughput is measured separately by tools/bench_train_step.py.

Usage:
    python tools/run_train_onchip.py --workdir out/train --steps 16 \
        --resume_steps 8 --artifact TRAIN_RUN_r04.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from dualforce_tpu.utils.misc import respect_platform_env  # noqa: E402

respect_platform_env()  # JAX_PLATFORMS=cpu must keep subprocesses off the chip

import numpy as np


def make_fixtures(workdir: str, *, height: int, width: int, num_frames: int,
                  fps: float, sample_rate: int, clips: int = 3) -> str:
    """MJPEG-AVI clip corpus + metadata.json (the dataset's real in-image
    video-decode path, dualforce_tpu/data/dataset.py:97-104)."""
    from dualforce_tpu.utils.av_io import write_mjpeg_avi

    d = os.path.join(workdir, "data")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    meta = []
    for i in range(clips):
        # smooth moving gradients compress like real content, not noise
        t = np.linspace(0, 2 * np.pi, num_frames, dtype=np.float32)
        y = np.linspace(-1, 1, height, dtype=np.float32)
        x = np.linspace(-1, 1, width, dtype=np.float32)
        phase = rng.uniform(0, 2 * np.pi, 3).astype(np.float32)
        vid = np.stack([
            np.sin(3 * x[None, None, :] + t[:, None, None] + phase[c])
            * np.cos(2 * y[None, :, None] + 0.5 * t[:, None, None])
            for c in range(3)], axis=-1)
        vid = ((vid * 0.5 + 0.5) * 255).astype(np.uint8)
        audio = (0.1 * np.sin(2 * np.pi * (220 + 110 * i)
                              * np.arange(int(num_frames / fps * sample_rate))
                              / sample_rate)).astype(np.float32)
        name = f"clip_{i}.avi"
        write_mjpeg_avi(os.path.join(d, name), vid, fps, audio=audio,
                        sample_rate=sample_rate)
        meta.append({"video_path": name, "caption": f"test pattern {i}"})
    meta_path = os.path.join(d, "metadata.json")
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return meta_path


def run_train(ckpt: str, meta_path: str, save_dir: str, *, height: int,
              width: int, num_frames: int, max_steps: int,
              save_interval: int, log_path: str, extra_set=()) -> float:
    argv = [sys.executable, os.path.join(_REPO, "scripts", "train.py"),
            os.path.join(_REPO, "configs", "training", "lora_tiny.py"),
            "--set",
            f"pipeline.ckpt_path={ckpt}",
            f"data.metadata_path={meta_path}",
            f"data.height={height}", f"data.width={width}",
            f"data.num_frames={num_frames}", "data.num_workers=2",
            f"trainer.max_steps={max_steps}",
            f"trainer.save_interval={save_interval}",
            "trainer.log_interval=1", "trainer.warmup_steps=2",
            f"trainer.save_dir={save_dir}", "trainer.logger=jsonl",
            *extra_set]
    t0 = time.time()
    with open(log_path, "a") as lf:
        rc = subprocess.run(argv, stdout=lf, stderr=subprocess.STDOUT).returncode
    if rc != 0:
        raise SystemExit(f"train.py failed rc={rc}; see {log_path}")
    return time.time() - t0


def read_metrics(save_dir: str):
    out = []
    p = os.path.join(save_dir, "metrics.jsonl")
    with open(p) as f:
        for ln in f:
            if ln.strip():
                out.append(json.loads(ln))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="out/train")
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--resume_steps", type=int, default=8)
    ap.add_argument("--height", type=int, default=352)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--num_frames", type=int, default=49)
    ap.add_argument("--clips", type=int, default=3)
    ap.add_argument("--artifact", default="TRAIN_RUN_r04.json")
    ap.add_argument("--set", dest="extra_set", action="append", default=[],
                    help="extra config overrides forwarded to train.py "
                         "(e.g. trainer.lr=1e-3 trainer.lora_rank=16)")
    ap.add_argument("--expect_learning", type=float, default=0.0,
                    help="assert the trailing-10-step mean loss is at most "
                         "this fraction of the leading-10-step mean "
                         "(e.g. 0.8 = a visible drop); 0 disables")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    log_path = os.path.join(args.workdir, "train_run.log")

    ckpt = os.path.join(args.workdir, "ckpt")
    if not os.path.isdir(os.path.join(ckpt, "video_dit")):
        print("[train-run] building checkpoint fixture", flush=True)
        rc = subprocess.run(
            [sys.executable, os.path.join(_REPO, "tools",
                                          "make_tiny_checkpoint.py"), ckpt],
            stdout=open(log_path, "a"), stderr=subprocess.STDOUT).returncode
        if rc != 0:
            raise SystemExit(f"make_tiny_checkpoint failed rc={rc}")

    from dualforce_tpu.convert.load_checkpoint import config_from_checkpoint

    sr = config_from_checkpoint(ckpt).audio_vae.sample_rate
    print(f"[train-run] fixtures: {args.clips} MJPEG-AVI clips "
          f"{args.width}x{args.height}x{args.num_frames}f sr={sr}", flush=True)
    meta_path = make_fixtures(args.workdir, height=args.height,
                              width=args.width, num_frames=args.num_frames,
                              fps=24.0, sample_rate=sr, clips=args.clips)

    save_dir = os.path.join(args.workdir, "lora_ckpt")
    half = max(1, args.steps // 2)
    print(f"[train-run] phase 1: {args.steps} steps, save every {half}",
          flush=True)
    wall1 = run_train(ckpt, meta_path, save_dir, height=args.height,
                      width=args.width, num_frames=args.num_frames,
                      max_steps=args.steps, save_interval=half,
                      log_path=log_path, extra_set=args.extra_set)
    m1 = read_metrics(save_dir)
    assert m1 and m1[-1]["step"] == args.steps, m1[-1:]
    saved = sorted(d for d in os.listdir(save_dir) if d.startswith("step-"))
    print(f"[train-run] phase 1 done in {wall1:.1f}s; checkpoints {saved}",
          flush=True)

    total = args.steps + args.resume_steps
    print(f"[train-run] phase 2: resume to {total} steps", flush=True)
    wall2 = run_train(ckpt, meta_path, save_dir, height=args.height,
                      width=args.width, num_frames=args.num_frames,
                      max_steps=total, save_interval=half,
                      log_path=log_path, extra_set=args.extra_set)
    m2 = read_metrics(save_dir)
    resumed_from = m2[len(m1)]["step"] - 1
    assert resumed_from == args.steps, (
        f"resume started at {resumed_from}, expected {args.steps}")
    assert m2[-1]["step"] == total

    # steady-state steps/s: skip the first logged step of each phase
    # (compile + first staging)
    st1 = [r["step_time"] for r in m1[1:] if "step_time" in r]
    st2 = [r["step_time"] for r in m2[len(m1) + 1:] if "step_time" in r]
    import jax

    artifact = {
        "metric": "train_run_onchip",
        "backend": jax.default_backend(),
        "config": "configs/training/lora_tiny.py + 360p data geometry "
                  f"({args.width}x{args.height}x{args.num_frames}f "
                  "MJPEG-AVI corpus, in-image decode)",
        "phase1": {"steps": args.steps, "wall_s": round(wall1, 1),
                   "median_step_s": round(float(np.median(st1)), 3),
                   "first_step_s": round(float(m1[0].get("step_time", 0)), 3),
                   "loss_first": round(m1[0]["loss"], 4),
                   "loss_last": round(m1[-1]["loss"], 4),
                   "checkpoints": saved},
        "overrides": args.extra_set,
        "loss_curve": [round(r["loss"], 4) for r in m2],
        "learning": {
            "lead10_mean": round(float(np.mean([r["loss"]
                                                for r in m2[:10]])), 4),
            "trail10_mean": round(float(np.mean([r["loss"]
                                                 for r in m2[-10:]])), 4),
        },
        "resume": {"restored_step": resumed_from,
                   "extra_steps": args.resume_steps,
                   "wall_s": round(wall2, 1),
                   "median_step_s": (round(float(np.median(st2)), 3)
                                     if st2 else None)},
        "flagship_width_reference": "tools/bench_train_step.py artifact "
                                    "(BENCH_r04_kernels)",
    }
    lead = artifact["learning"]["lead10_mean"]
    trail = artifact["learning"]["trail10_mean"]
    if args.expect_learning > 0:
        assert trail <= lead * args.expect_learning, (
            f"no visible learning: loss {lead} -> {trail} "
            f"(needed <= {lead * args.expect_learning:.4f})")
        artifact["learning"]["passed_threshold"] = args.expect_learning
    with open(args.artifact, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
