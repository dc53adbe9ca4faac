"""Training dataset + input pipeline.

Behavioural reference: mova/datasets/video_audio_dataset.py — `metadata.json`
list of {video_path, caption}; video frames center-cropped/resized to the
target geometry, [-1,1]; mono audio at the codec sample rate padded/trimmed to
`sr * T / fps` samples; returns (video, audio, first_frame, caption).

This image has no torchcodec/FFmpeg, so media loading supports:
  - `.npz` clip shards: {video: [T,H,W,3] uint8, audio: [S] float32, fps, sr}
    (the preprocessing script in tools/ writes these from raw media where a
    decoder IS available);
  - frame directories (frame_%05d.jpg/png) + sidecar .wav;
  - raw video containers via an `ffmpeg` binary when present (gated).

Batching runs in background prefetch threads feeding pinned numpy batches.
"""

from __future__ import annotations

import json
import os
import queue
import threading
import wave
from typing import Any, Dict, Iterator, List, Optional

import numpy as np
from PIL import Image


from dualforce_tpu.registry import DATASETS


def _resample_f32(audio: np.ndarray, sr: int, target_sr: int) -> np.ndarray:
    """Linear resample (host-side load path; single definition)."""
    if sr == target_sr:
        return audio.astype(np.float32, copy=False)
    t_old = np.arange(len(audio)) / sr
    t_new = np.arange(int(len(audio) * target_sr / sr)) / target_sr
    return np.interp(t_new, t_old, audio).astype(np.float32)


_PCM_DTYPES = {1: (np.uint8, 128.0, 128.0), 2: ("<i2", 0.0, 32768.0),
               4: ("<i4", 0.0, 2147483648.0)}


def _load_wav(path: str, target_sr: int) -> np.ndarray:
    with wave.open(path, "rb") as f:
        sr = f.getframerate()
        n = f.getnframes()
        width = f.getsampwidth()
        if width not in _PCM_DTYPES:
            raise ValueError(f"{path}: unsupported PCM sample width {width} "
                             "(supported: 8/16/32-bit)")
        dt, offset, scale = _PCM_DTYPES[width]
        raw = (np.frombuffer(f.readframes(n), dtype=dt).astype(np.float32)
               - offset) / scale
        if f.getnchannels() > 1:
            raw = raw.reshape(-1, f.getnchannels()).mean(axis=1)
    return _resample_f32(raw, sr, target_sr)


@DATASETS.register_module(name="VideoAudioDataset")
class VideoAudioDataset:
    def __init__(self, metadata_path: str, height: int = 352, width: int = 640,
                 num_frames: int = 49, fps: float = 24.0, sample_rate: int = 48000):
        with open(metadata_path) as f:
            self.items: List[Dict[str, Any]] = json.load(f)
        self.root = os.path.dirname(os.path.abspath(metadata_path))
        self.height, self.width = height, width
        self.num_frames, self.fps = num_frames, fps
        self.sample_rate = sample_rate

    def __len__(self) -> int:
        return len(self.items)

    def _resolve(self, p: str) -> str:
        return p if os.path.isabs(p) else os.path.join(self.root, p)

    def _load_media(self, path: str):
        if path.endswith(".npz"):
            data = np.load(path)
            video = data["video"]  # [T, H, W, 3] uint8
            audio = data["audio"].astype(np.float32)
            sr = int(data["sr"]) if "sr" in data else self.sample_rate
            clip_fps = float(data["fps"]) if "fps" in data else self.fps
            return list(video), audio, sr, clip_fps
        if os.path.isdir(path):
            frame_files = sorted(
                f for f in os.listdir(path)
                if f.lower().endswith((".jpg", ".jpeg", ".png")))
            frames = [np.asarray(Image.open(os.path.join(path, f)).convert("RGB"))
                      for f in frame_files]
            wav = os.path.join(path, "audio.wav")
            audio = _load_wav(wav, self.sample_rate) if os.path.exists(wav) else None
            return frames, audio, self.sample_rate, self.fps
        if path.lower().endswith(".avi"):
            # MJPEG-AVI decodes in-image (pure python + PIL, utils/av_io.py)
            # — the one REAL video container the training path can ingest
            # without an external decoder
            from dualforce_tpu.utils.av_io import read_mjpeg_avi

            video, audio, sr, clip_fps = read_mjpeg_avi(path)
            return list(video), audio, sr, clip_fps
        raise ValueError(
            f"unsupported media {path!r}: use .npz clip shards, MJPEG .avi, "
            "or frame dirs (no mp4/h264 decoder in this environment; see "
            "tools/preprocess_clips.py)")

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        item = self.items[idx]
        frames, audio, sr, clip_fps = self._load_media(
            self._resolve(item["video_path"]))

        # sample/trim to num_frames (pad by repeating the last frame)
        if len(frames) < self.num_frames:
            frames = frames + [frames[-1]] * (self.num_frames - len(frames))
        frames = frames[: self.num_frames]
        # C++ OpenMP kernel (native/dfdata.cpp) when built; PIL fallback inside
        from dualforce_tpu.data import native

        frames_u8 = np.stack([np.asarray(f, np.uint8) for f in frames])
        video = native.resize_crop_normalize(frames_u8, self.height, self.width)

        # pad/trim audio to sr * T / fps (video_audio_dataset.py:119-154).
        # Batch shapes must be static (jit), so every shard must share the
        # dataset fps — a shard preprocessed at a different fps would
        # otherwise train on silently desynchronized A/V.
        if abs(clip_fps - self.fps) > 1e-3:
            raise ValueError(
                f"{item['video_path']}: shard fps {clip_fps} != dataset fps "
                f"{self.fps}; re-run tools/preprocess_clips.py with "
                f"--fps {self.fps}")
        target = int(self.sample_rate * self.num_frames / self.fps)
        if audio is None:
            audio = np.zeros((target,), np.float32)
        audio = _resample_f32(audio, sr, self.sample_rate)
        if len(audio) < target:
            audio = np.pad(audio, (0, target - len(audio)))
        audio = audio[:target]

        return {
            "video": video,
            "audio": audio[None, :],       # [1, S]
            "first_frame": video[0],
            "caption": item.get("caption", ""),
        }


def collate(samples: List[Dict[str, Any]]) -> Dict[str, Any]:
    return {
        "video": np.stack([s["video"] for s in samples]),
        "audio": np.stack([s["audio"] for s in samples]),
        "first_frame": np.stack([s["first_frame"] for s in samples]),
        "caption": [s["caption"] for s in samples],
    }


def make_data_iter(dataset, tokenizer, batch_size: int = 1, shuffle: bool = True,
                   seed: int = 0, num_workers: int = 2, max_text_len: int = 512,
                   epochs: Optional[int] = None,
                   drop_last: bool = True) -> Iterator[Dict[str, Any]]:
    """Background-threaded prefetch iterator yielding jit-ready batches
    (tokenized captions included). drop_last (default True) skips a trailing
    partial batch: a different leading dim would force a train-step recompile
    and break data-axis divisibility on a sharded mesh."""
    rng = np.random.default_rng(seed)
    q: queue.Queue = queue.Queue(maxsize=4)
    stop = threading.Event()

    def put_or_stop(item) -> bool:
        """q.put that keeps honoring `stop` — a consumer that exits early
        (max_steps mid-epoch) must not leave workers blocked on a full queue
        forever, pinning their batches."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.25)
                return True
            except queue.Full:
                continue
        return False

    def order():
        epoch = 0
        while epochs is None or epoch < epochs:
            idx = np.arange(len(dataset))
            if shuffle:
                rng.shuffle(idx)
            yield from idx.tolist()
            epoch += 1

    idx_iter = order()
    lock = threading.Lock()
    n_workers = max(num_workers, 1)
    alive = [n_workers]  # lock-protected: only the LAST exiting worker
    #                      sends the end sentinel, so in-flight batches from
    #                      other workers are never dropped at epoch end

    def worker():
        try:
            while not stop.is_set():
                with lock:
                    batch_idx = []
                    try:
                        for _ in range(batch_size):
                            batch_idx.append(next(idx_iter))
                    except StopIteration:
                        if not batch_idx or (drop_last and
                                             len(batch_idx) < batch_size):
                            return
                samples = [dataset[i] for i in batch_idx]
                batch = collate(samples)
                tok = tokenizer(batch.pop("caption"), padding="max_length",
                                max_length=max_text_len, truncation=True,
                                add_special_tokens=True, return_attention_mask=True,
                                return_tensors="np")
                batch["text_ids"] = tok["input_ids"]
                batch["text_mask"] = tok["attention_mask"]
                if not put_or_stop(batch):
                    return
        except BaseException as e:  # noqa: BLE001 — surface, don't hang
            put_or_stop(e)
        finally:
            with lock:
                alive[0] -= 1
                if alive[0] == 0:
                    put_or_stop(None)

    threads = [threading.Thread(target=worker, daemon=True)
               for _ in range(n_workers)]
    for t in threads:
        t.start()

    try:
        while True:
            batch = q.get()
            if batch is None:
                break
            if isinstance(batch, BaseException):
                raise batch  # a prefetch worker failed; don't hang silently
            yield batch
    finally:
        stop.set()
