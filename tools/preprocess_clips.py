"""Preprocess raw media into .npz clip shards for VideoAudioDataset.

Run this where a video decoder exists (ffmpeg binary or PyAV) — except
MJPEG .avi sources, which decode in-image (pure python + PIL via
utils/av_io.py, no ffmpeg needed). The training environment then needs no
codecs. Output per clip:
  {video: [T, H, W, 3] uint8, audio: [S] float32, fps: float, sr: int}
plus an updated metadata.json next to the shards.

Usage:
  python tools/preprocess_clips.py --input raw/metadata.json --output data/train \
      --height 352 --width 640 --num_frames 49 --fps 24 --sr 48000
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def decode_with_ffmpeg(path: str, height: int, width: int, num_frames: int,
                       fps: float, sr: int):
    """Decode via the ffmpeg binary: raw RGB frames + s16le mono audio."""
    vf = (f"fps={fps},scale={width}:{height}:force_original_aspect_ratio=increase,"
          f"crop={width}:{height}")
    v = subprocess.run(
        ["ffmpeg", "-v", "error", "-i", path, "-vf", vf,
         "-frames:v", str(num_frames), "-f", "rawvideo", "-pix_fmt", "rgb24", "-"],
        check=True, capture_output=True).stdout
    video = np.frombuffer(v, np.uint8)
    t = len(video) // (height * width * 3)
    video = video[: t * height * width * 3].reshape(t, height, width, 3)

    a = subprocess.run(
        ["ffmpeg", "-v", "error", "-i", path, "-ac", "1", "-ar", str(sr),
         "-f", "s16le", "-"],
        check=True, capture_output=True).stdout
    audio = np.frombuffer(a, "<i2").astype(np.float32) / 32768.0
    return video, audio


def decode_mjpeg_avi(path: str, height: int, width: int, num_frames: int,
                     fps: float, sr: int):
    """In-image decode for MJPEG .avi (utils/av_io.py): no ffmpeg needed.
    Frame-rate-converts by nearest-frame sampling and center-crop-resizes
    with the same policy the dataset uses."""
    from dualforce_tpu.data import native
    from dualforce_tpu.data.dataset import _resample_f32
    from dualforce_tpu.utils.av_io import read_mjpeg_avi

    video, audio, src_sr, src_fps = read_mjpeg_avi(path)
    if abs(src_fps - fps) > 1e-3:
        idx = np.clip(np.round(np.arange(num_frames) * src_fps / fps), 0,
                      len(video) - 1).astype(int)
        video = video[idx]
    else:
        video = video[:num_frames]
    # native path expects uint8 [T,H,W,3]; output is float [-1,1] — convert
    # back to uint8 for the shard (dataset re-normalizes at load)
    norm = native.resize_crop_normalize(np.ascontiguousarray(video),
                                        height, width)
    video = ((norm + 1.0) * 127.5).round().clip(0, 255).astype(np.uint8)
    if audio is None:
        audio = np.zeros(0, np.float32)
    else:
        audio = _resample_f32(audio.astype(np.float32), src_sr, sr)
    return video, audio


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="metadata.json of raw clips")
    ap.add_argument("--output", required=True)
    ap.add_argument("--height", type=int, default=352)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--num_frames", type=int, default=49)
    ap.add_argument("--fps", type=float, default=24.0)
    ap.add_argument("--sr", type=int, default=48000)
    args = ap.parse_args()

    with open(args.input) as f:
        items = json.load(f)
    root = os.path.dirname(os.path.abspath(args.input))
    os.makedirs(args.output, exist_ok=True)

    out_items = []
    target_samples = int(args.sr * args.num_frames / args.fps)
    for i, item in enumerate(items):
        src = item["video_path"]
        if not os.path.isabs(src):
            src = os.path.join(root, src)
        try:
            if src.lower().endswith(".avi"):
                video, audio = decode_mjpeg_avi(
                    src, args.height, args.width, args.num_frames, args.fps,
                    args.sr)
            else:
                if shutil.which("ffmpeg") is None:
                    sys.exit("ffmpeg not found — MJPEG .avi decodes in-image; "
                             "other containers need ffmpeg")
                video, audio = decode_with_ffmpeg(
                    src, args.height, args.width, args.num_frames, args.fps,
                    args.sr)
        except subprocess.CalledProcessError as e:
            print(f"[skip] {src}: {e.stderr.decode()[:200]}")
            continue
        except (ValueError, OSError) as e:
            print(f"[skip] {src}: {e}")
            continue
        if video.shape[0] < args.num_frames:
            pad = np.repeat(video[-1:], args.num_frames - video.shape[0], axis=0)
            video = np.concatenate([video, pad], axis=0)
        audio = np.pad(audio, (0, max(0, target_samples - len(audio))))[:target_samples]
        name = f"clip_{i:06d}.npz"
        np.savez_compressed(os.path.join(args.output, name), video=video,
                            audio=audio, fps=args.fps, sr=args.sr)
        out_items.append({"video_path": name, "caption": item.get("caption", "")})
        print(f"[{i + 1}/{len(items)}] {name}: video {video.shape}, "
              f"audio {audio.shape}")

    with open(os.path.join(args.output, "metadata.json"), "w") as f:
        json.dump(out_items, f, indent=2)
    print(f"wrote {len(out_items)} clips -> {args.output}")


if __name__ == "__main__":
    main()
