"""Evaluate a generated clip (mp4 / .npz shard / frame dir) — objective
metrics JSON to stdout.

Counterpart of the reference's out-of-repo eval suite (SURVEY.md §4 item 4 /
the audited scripts/eval directory): fidelity vs a reference clip or first
frame, temporal profile, audio stats, and a DeSync-style AV-sync proxy.

Usage:
  python scripts/eval.py out.mp4 [--reference ref.mp4] [--first_frame f.png]
                         [--prompt "..."] [--clip_model /path/to/clip]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _ffprobe_fps(path: str) -> float:
    try:
        out = subprocess.run(
            ["ffprobe", "-v", "error", "-select_streams", "v:0",
             "-show_entries", "stream=r_frame_rate", "-of", "csv=p=0", path],
            capture_output=True, text=True, check=True).stdout.strip()
        num, den = out.split("/")
        return float(num) / float(den)
    except Exception:
        return 24.0


def load_clip(path: str, sample_rate: int = 48000):
    """Returns (video [T,H,W,3] uint8, audio [S] float32 or None, sr, fps)."""
    if path.endswith(".npz"):
        d = np.load(path)
        return (d["video"], d["audio"].astype(np.float32) if "audio" in d else None,
                int(d["sr"]) if "sr" in d else sample_rate,
                float(d["fps"]) if "fps" in d else 24.0)
    if path.endswith(".avi"):
        from dualforce_tpu.utils.av_io import read_mjpeg_avi

        return read_mjpeg_avi(path)
    if os.path.isdir(path):
        from PIL import Image

        from dualforce_tpu.data.dataset import _load_wav

        frames = [np.asarray(Image.open(os.path.join(path, f)).convert("RGB"))
                  for f in sorted(os.listdir(path))
                  if f.lower().endswith((".jpg", ".jpeg", ".png"))]
        wav = os.path.join(path, "audio.wav")
        audio = _load_wav(wav, sample_rate) if os.path.exists(wav) else None
        return np.stack(frames), audio, sample_rate, 24.0
    # mp4 via ffmpeg rawvideo/f32le pipes
    fps = _ffprobe_fps(path)
    probe = subprocess.run(
        ["ffprobe", "-v", "error", "-select_streams", "v:0", "-show_entries",
         "stream=width,height", "-of", "csv=p=0", path],
        capture_output=True, text=True, check=True).stdout.strip()
    w, h = (int(x) for x in probe.split(","))
    raw = subprocess.run(
        ["ffmpeg", "-v", "error", "-i", path, "-f", "rawvideo",
         "-pix_fmt", "rgb24", "-"], capture_output=True, check=True).stdout
    video = np.frombuffer(raw, np.uint8).reshape(-1, h, w, 3)
    try:
        araw = subprocess.run(
            ["ffmpeg", "-v", "error", "-i", path, "-f", "f32le", "-ac", "1",
             "-ar", str(sample_rate), "-"], capture_output=True, check=True).stdout
        audio = np.frombuffer(araw, np.float32)
    except subprocess.CalledProcessError:
        audio = None
    return video, audio, sample_rate, fps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("clip", help="generated clip: .mp4, .npz, or frame dir")
    ap.add_argument("--reference", default=None,
                    help="ground-truth clip for PSNR/SSIM")
    ap.add_argument("--first_frame", default=None,
                    help="conditioning image: first-frame faithfulness")
    ap.add_argument("--prompt", default=None)
    ap.add_argument("--clip_model", default=None,
                    help="local CLIP checkpoint dir for text-video similarity")
    ap.add_argument("--sample_rate", type=int, default=48000)
    args = ap.parse_args()

    from dualforce_tpu.eval.metrics import evaluate_clip

    video, audio, sr, fps = load_clip(args.clip, args.sample_rate)
    if audio is None:
        audio = np.zeros(int(sr * len(video) / fps), np.float32)
    ref = None
    if args.reference:
        ref = load_clip(args.reference, args.sample_rate)[0]
    ff = None
    if args.first_frame:
        from PIL import Image

        ff = np.asarray(Image.open(args.first_frame).convert("RGB"))
    report = evaluate_clip(video, audio, sr, fps, reference_video=ref,
                           first_frame=ff, prompt=args.prompt,
                           clip_model=args.clip_model)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
