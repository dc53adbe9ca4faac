"""Preprocess arbitrary video files (mp4/mov/mkv/...) into DualForce-TPU
training shards with an EXTERNAL ffmpeg.

The reference ingests mp4 corpora directly in its dataset via torchcodec
(/root/reference/mova/datasets/video_audio_dataset.py:83-117). This image
has no video decoder, so the in-tree dataset reads decoded containers only
(.npz clip shards or in-repo MJPEG-AVI, dualforce_tpu/data/dataset.py:80-108)
and THIS tool is the documented contract for getting an mp4 corpus there:
run it once wherever ffmpeg exists, point `data.metadata_path` at the
directory it writes, train.

    python tools/preprocess_clips.py --src /corpus --dst /shards \
        [--metadata /corpus/metadata.json] [--fps 24] [--sr 16000] \
        [--height 352 --width 640] [--format npz|avi]

- with --metadata (reference layout: JSON list of {video_path, caption}):
  converts exactly the listed clips, carrying captions over;
- without: scans --src for video files, caption = filename stem.

Output: <dst>/<stem>.npz shards ({video u8 [T,H,W,3], audio f32 [S], fps,
sr} — the tests/ data recipe) or MJPEG .avi (+ .txt caption sidecars via
metadata), plus <dst>/metadata.json ready for scripts/train.py.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from dualforce_tpu.utils.misc import respect_platform_env  # noqa: E402

respect_platform_env()  # JAX_PLATFORMS=cpu must keep subprocesses off the chip

import numpy as np

VIDEO_EXTS = (".mp4", ".mov", ".mkv", ".webm", ".m4v", ".avi")


def _parse_fps(s: dict) -> float | None:
    """r_frame_rate with avg_frame_rate fallback; attached-picture 'video'
    streams report '0/0', which must not abort the batch."""
    for key in ("r_frame_rate", "avg_frame_rate"):
        num, _, den = s.get(key, "").partition("/")
        try:
            v = float(num) / float(den or 1)
        except (ValueError, ZeroDivisionError):
            continue
        if v > 0:
            return v
    return None


def probe(path: str):
    """ffprobe -> (width, height, fps, has_audio)."""
    out = subprocess.run(
        ["ffprobe", "-v", "error", "-show_entries",
         "stream=codec_type,width,height,r_frame_rate,avg_frame_rate"
         ":stream_disposition=attached_pic", "-of", "json", path],
        capture_output=True, check=True).stdout
    width = height = None
    fps = 24.0
    has_audio = False
    for s in json.loads(out).get("streams", []):
        if (s.get("codec_type") == "video" and width is None
                and not s.get("disposition", {}).get("attached_pic")):
            # attached cover art is also codec_type=video; skip it or the
            # real movie stream never gets probed
            width, height = s["width"], s["height"]
            fps = _parse_fps(s) or fps
        elif s.get("codec_type") == "audio":
            has_audio = True
    if width is None:
        raise ValueError(f"{path}: no video stream")
    return width, height, fps, has_audio


def decode_with_ffmpeg(path: str, *, fps: float | None = None,
                       height: int | None = None, width: int | None = None,
                       sr: int = 16000):
    """Decode one clip -> (video u8 [T,H,W,3], audio f32 [S], fps, sr).

    Video and audio are pulled through two raw pipes (rgb24 / f32le mono);
    a clip with no audio stream gets a zero track of matching duration —
    the same contract the dataset's .npz branch expects."""
    w0, h0, fps0, has_audio = probe(path)
    out_fps = fps or fps0
    # aspect-preserved fill-in computed HERE (not via ffmpeg's scale=-2):
    # the raw-pipe reshape below must know the exact output frame size, so
    # pass ffmpeg explicit dimensions (even-rounded like -2 would)
    out_w, out_h = width or w0, height or h0
    if width and not height:
        out_h = max(2, round(h0 * width / w0 / 2) * 2)
    elif height and not width:
        out_w = max(2, round(w0 * height / h0 / 2) * 2)

    vf = [f"fps={out_fps}"]
    if width or height:
        # the dataset center-crops/resizes again if needed; scale here keeps
        # shards small
        vf.append(f"scale={out_w}:{out_h}")
    raw = subprocess.run(
        ["ffmpeg", "-v", "error", "-i", path, "-vf", ",".join(vf),
         "-f", "rawvideo", "-pix_fmt", "rgb24", "-"],
        capture_output=True, check=True).stdout
    frame_bytes = out_w * out_h * 3
    n = len(raw) // frame_bytes
    if n == 0:
        raise ValueError(f"{path}: decoded zero frames")
    video = np.frombuffer(raw[:n * frame_bytes], np.uint8).reshape(
        n, out_h, out_w, 3)

    if has_audio:
        rawa = subprocess.run(
            ["ffmpeg", "-v", "error", "-i", path, "-vn", "-ac", "1",
             "-ar", str(sr), "-f", "f32le", "-"],
            capture_output=True, check=True).stdout
        audio = np.frombuffer(rawa, np.float32).copy()
    else:
        audio = np.zeros(int(round(n / out_fps * sr)), np.float32)
    return video, audio, float(out_fps), sr


def decode_in_image(path: str, *, fps: float | None = None,
                    height: int | None = None, width: int | None = None,
                    sr: int = 16000):
    """No-ffmpeg branch for MJPEG .avi sources: decode with the in-repo
    reader (pure python + PIL, utils/av_io.py), nearest-frame resample to
    the target fps, resize/crop with the dataset's own policy. Lets .avi
    corpora be re-sharded to .npz inside this image."""
    from dualforce_tpu.data import native
    from dualforce_tpu.data.dataset import _resample_f32
    from dualforce_tpu.utils.av_io import read_mjpeg_avi

    video, audio, src_sr, src_fps = read_mjpeg_avi(path)
    video = np.asarray(video)
    out_fps = fps or src_fps
    if abs(src_fps - out_fps) > 1e-3:
        n = int(len(video) * out_fps / src_fps)
        idx = np.clip(np.round(np.arange(n) * src_fps / out_fps), 0,
                      len(video) - 1).astype(int)
        video = video[idx]
    if height or width:
        h = height or video.shape[1]
        w = width or video.shape[2]
        norm = native.resize_crop_normalize(np.ascontiguousarray(video), h, w)
        video = ((norm + 1.0) * 127.5).round().clip(0, 255).astype(np.uint8)
    if audio is None:
        audio = np.zeros(int(round(len(video) / out_fps * sr)), np.float32)
    elif src_sr != sr:
        audio = _resample_f32(np.asarray(audio, np.float32), src_sr, sr)
    return video, np.asarray(audio, np.float32), float(out_fps), sr


def decode_auto(path: str, **kw):
    """ffmpeg when present; in-image reader for MJPEG .avi otherwise."""
    from dualforce_tpu.utils.av_io import ffmpeg_available

    if ffmpeg_available():
        return decode_with_ffmpeg(path, **kw)
    if path.lower().endswith(".avi"):
        return decode_in_image(path, **kw)
    raise SystemExit(
        f"{path}: no ffmpeg on PATH and not an MJPEG .avi — run this tool "
        "on a machine that has ffmpeg; the output shards are portable")


def iter_items(src: str, metadata: str | None):
    if metadata:
        base = os.path.dirname(os.path.abspath(metadata))
        with open(metadata) as f:
            for it in json.load(f):
                p = it["video_path"]
                if not os.path.isabs(p):
                    p = os.path.join(base, p)
                yield p, it.get("caption", "")
    else:
        for name in sorted(os.listdir(src)):
            if name.lower().endswith(VIDEO_EXTS):
                yield (os.path.join(src, name),
                       os.path.splitext(name)[0].replace("_", " "))


def preprocess(src: str, dst: str, *, metadata: str | None = None,
               fps: float | None = None, height: int | None = None,
               width: int | None = None, sr: int = 16000,
               fmt: str = "npz", decode=None, log=print):
    """Convert every clip, write <dst>/metadata.json, return its path."""
    decode = decode or decode_auto
    os.makedirs(dst, exist_ok=True)
    out_meta = []
    used_stems: set[str] = set()
    for path, caption in iter_items(src, metadata):
        video, audio, clip_fps, clip_sr = decode(
            path, fps=fps, height=height, width=width, sr=sr)
        stem = os.path.splitext(os.path.basename(path))[0]
        if stem in used_stems:
            # a.mp4 + a.mkv (or same name in two subdirs) must not silently
            # overwrite each other's shard
            k = 2
            while f"{stem}_{k}" in used_stems:
                k += 1
            stem = f"{stem}_{k}"
        used_stems.add(stem)
        if fmt == "npz":
            shard = f"{stem}.npz"
            np.savez(os.path.join(dst, shard), video=video, audio=audio,
                     fps=np.float32(clip_fps), sr=np.int32(clip_sr))
        else:
            from dualforce_tpu.utils.av_io import write_mjpeg_avi

            shard = f"{stem}.avi"
            write_mjpeg_avi(os.path.join(dst, shard), video, clip_fps,
                            audio=audio, sample_rate=clip_sr)
        out_meta.append({"video_path": shard, "caption": caption})
        log(f"[preprocess] {path} -> {shard}: {video.shape[0]}f "
            f"{video.shape[2]}x{video.shape[1]} @{clip_fps:g}fps, "
            f"{len(audio) / clip_sr:.1f}s audio")
    meta_path = os.path.join(dst, "metadata.json")
    with open(meta_path, "w") as f:
        json.dump(out_meta, f, indent=1)
    log(f"[preprocess] wrote {meta_path} ({len(out_meta)} clips)")
    return meta_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="directory of video files")
    ap.add_argument("--dst", required=True, help="output shard directory")
    ap.add_argument("--metadata", default=None,
                    help="reference-layout metadata.json to convert "
                         "(default: scan --src)")
    ap.add_argument("--fps", type=float, default=None)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--sr", type=int, default=16000)
    ap.add_argument("--format", default="npz", choices=["npz", "avi"])
    args = ap.parse_args()

    preprocess(args.src, args.dst, metadata=args.metadata, fps=args.fps,
               height=args.height, width=args.width, sr=args.sr,
               fmt=args.format)


if __name__ == "__main__":
    main()
