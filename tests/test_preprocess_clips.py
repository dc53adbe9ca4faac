"""mp4 ingestion contract (VERDICT r3 missing #6): external ffmpeg ->
tools/preprocess_clips.py -> shards -> VideoAudioDataset -> training batch.

The orchestration (metadata carry-over, shard writing, dataset load) is
tested with a stub decoder everywhere; the real ffmpeg decode path is
skip-gated on ffmpeg being present (it is not in this image — the tool's
whole point is to run where it is).

Reference behavior being matched:
/root/reference/mova/datasets/video_audio_dataset.py:83-117 (torchcodec
decode of arbitrary containers into the same [T,H,W,3]-u8 + mono-f32 clip
contract).
"""

import importlib.util
import json
import os
import subprocess

import numpy as np
import pytest

from dualforce_tpu.data.dataset import VideoAudioDataset
from dualforce_tpu.utils.av_io import ffmpeg_available


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "preprocess_clips", os.path.join(os.path.dirname(__file__), "..",
                                         "tools", "preprocess_clips.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _stub_decode(path, *, fps=None, height=None, width=None, sr=16000):
    rng = np.random.default_rng(abs(hash(os.path.basename(path))) % 2**31)
    f = fps or 8.0
    video = rng.integers(0, 255, (9, height or 32, width or 48, 3),
                         dtype=np.uint8)
    audio = rng.standard_normal(int(9 / f * sr)).astype(np.float32) * 0.1
    return video, audio, float(f), sr


@pytest.mark.parametrize("fmt", ["npz", "avi"])
def test_preprocess_to_dataset_roundtrip(tmp_path, fmt):
    tool = _load_tool()
    src = tmp_path / "corpus"
    src.mkdir()
    for name in ("clip_a.mp4", "clip_b.mp4"):
        (src / name).write_bytes(b"\x00")  # stub decoder never opens them
    meta = {"video_path": "clip_a.mp4", "caption": "a red fox"}
    with open(src / "metadata.json", "w") as f:
        json.dump([meta, {"video_path": "clip_b.mp4", "caption": "waves"}], f)

    dst = tmp_path / "shards"
    meta_path = tool.preprocess(
        str(src), str(dst), metadata=str(src / "metadata.json"),
        fps=8.0, sr=16000, fmt=fmt, decode=_stub_decode,
        log=lambda *a, **k: None)

    with open(meta_path) as f:
        items = json.load(f)
    assert [it["caption"] for it in items] == ["a red fox", "waves"]
    assert all(it["video_path"].endswith("." + fmt) for it in items)

    ds = VideoAudioDataset(meta_path, height=32, width=48, num_frames=9,
                           fps=8.0, sample_rate=16000)
    sample = ds[0]
    assert sample["video"].shape[0] == 9
    assert sample["video"].shape[-1] == 3
    assert sample["caption"] == "a red fox"
    assert np.isfinite(sample["audio"]).all()


def test_preprocess_scan_mode_uses_stem_captions(tmp_path):
    tool = _load_tool()
    src = tmp_path / "corpus"
    src.mkdir()
    (src / "surfing_dog.mp4").write_bytes(b"\x00")
    (src / "notes.txt").write_text("not a video")
    dst = tmp_path / "shards"
    meta_path = tool.preprocess(str(src), str(dst), fmt="npz",
                                decode=_stub_decode, log=lambda *a, **k: None)
    with open(meta_path) as f:
        items = json.load(f)
    assert len(items) == 1 and items[0]["caption"] == "surfing dog"


@pytest.mark.skipif(not ffmpeg_available(), reason="ffmpeg not in image")
def test_preprocess_real_ffmpeg(tmp_path):
    src = tmp_path / "corpus"
    src.mkdir()
    clip = src / "test.mp4"
    subprocess.run(
        ["ffmpeg", "-v", "error", "-f", "lavfi", "-i",
         "testsrc=duration=1:size=64x48:rate=8", "-f", "lavfi", "-i",
         "sine=frequency=440:duration=1", "-shortest", "-pix_fmt", "yuv420p",
         str(clip)], check=True)
    tool = _load_tool()
    dst = tmp_path / "shards"
    meta_path = tool.preprocess(str(src), str(dst), fps=8.0, sr=16000,
                                fmt="npz", log=lambda *a, **k: None)
    ds = VideoAudioDataset(meta_path, height=48, width=64, num_frames=8,
                           fps=8.0, sample_rate=16000)
    sample = ds[0]
    assert sample["video"].shape[0] == 8
    assert np.isfinite(sample["audio"]).all()


def test_preprocess_avi_in_image_no_ffmpeg(tmp_path):
    """MJPEG .avi corpora re-shard to .npz with the in-repo decoder even
    when ffmpeg is absent (decode_auto's fallback branch)."""
    from dualforce_tpu.utils.av_io import write_mjpeg_avi

    tool = _load_tool()
    src = tmp_path / "corpus"
    src.mkdir()
    rng = np.random.default_rng(0)
    video = rng.integers(0, 255, (8, 32, 48, 3), dtype=np.uint8)
    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    write_mjpeg_avi(str(src / "clip.avi"), video, 8.0, audio=audio,
                    sample_rate=16000)

    dst = tmp_path / "shards"
    meta_path = tool.preprocess(
        str(src), str(dst), fps=4.0, height=16, width=24, sr=8000,
        fmt="npz", decode=tool.decode_in_image, log=lambda *a, **k: None)
    ds = VideoAudioDataset(meta_path, height=16, width=24, num_frames=4,
                           fps=4.0, sample_rate=8000)
    sample = ds[0]
    assert sample["video"].shape[0] == 4
    assert np.isfinite(sample["audio"]).all()
