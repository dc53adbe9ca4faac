"""Objective eval metrics: PSNR/SSIM properties, temporal profile, audio
stats, and the DeSync-style AV-sync proxy recovering a KNOWN injected lag."""

import numpy as np

from dualforce_tpu.eval.metrics import (audio_stats, av_sync, evaluate_clip,
                                        psnr, ssim, temporal_profile,
                                        video_fidelity)


def test_psnr_ssim_basics():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    assert psnr(a, a) == float("inf")
    assert abs(ssim(a, a) - 1.0) < 1e-9
    noisy = np.clip(a.astype(int) + rng.normal(0, 12, a.shape), 0, 255
                    ).astype(np.uint8)
    p, s = psnr(a, noisy), ssim(a, noisy)
    assert 20 < p < 35
    assert 0 < s < 0.99
    noisier = np.clip(a.astype(int) + rng.normal(0, 40, a.shape), 0, 255
                      ).astype(np.uint8)
    assert psnr(a, noisier) < p and ssim(a, noisier) < s


def test_temporal_profile_flicker_vs_static():
    static = np.tile(np.full((1, 16, 16, 3), 128, np.uint8), (8, 1, 1, 1))
    t = temporal_profile(static)
    assert t["interframe_psnr"] == float("inf") and t["motion_mean"] == 0.0
    rng = np.random.default_rng(1)
    flicker = rng.integers(0, 255, (8, 16, 16, 3), dtype=np.uint8)
    t2 = temporal_profile(flicker)
    assert t2["interframe_psnr"] < 12 and t2["motion_mean"] > 50


def test_audio_stats():
    sr = 48000
    t = np.arange(sr, dtype=np.float32) / sr
    tone = 0.5 * np.sin(2 * np.pi * 440 * t)
    s = audio_stats(tone)
    assert abs(s["rms_db"] - 20 * np.log10(0.5 / np.sqrt(2))) < 0.5
    assert s["silence_fraction"] == 0.0 and s["clipping_fraction"] == 0.0
    half_silent = np.concatenate([tone, np.zeros(sr, np.float32)])
    assert 0.4 < audio_stats(half_silent)["silence_fraction"] < 0.6
    clipped = np.clip(tone * 10, -1, 1)
    assert audio_stats(clipped)["clipping_fraction"] > 0.3


def _synthetic_av(lag_frames=0, T=48, fps=24.0, sr=4800):
    """Video with motion bursts + audio with onsets at the same (or lagged)
    frames. Burst spacing is APERIODIC so cross-correlation has a unique
    peak (uniform spacing aliases the lag by the period)."""
    rng = np.random.default_rng(7)
    burst_frames = [5, 11, 20, 26, 37]
    video = np.full((T, 8, 8, 3), 100, np.uint8)
    for f in burst_frames:
        video[f:f + 2] = rng.integers(0, 255, (2, 8, 8, 3), dtype=np.uint8)
    hop = int(sr / fps)
    audio = np.zeros(T * hop, np.float32)
    for f in burst_frames:
        fa = f + lag_frames
        if 0 <= fa < T:
            audio[fa * hop:(fa + 1) * hop] = 0.8 * np.sin(
                2 * np.pi * 440 * np.arange(hop) / sr).astype(np.float32)
    return video, audio, sr, fps


def test_av_sync_recovers_known_lag():
    """The proxy recovers an injected audio delay within ONE frame (the
    2-frame video bursts vs 1-frame onsets skew the centroid by <=1)."""
    for lag in (0, 3, -4, 6):
        video, audio, sr, fps = _synthetic_av(lag_frames=lag)
        out = av_sync(video, audio, sr, fps)
        assert abs(out["best_lag_frames"] + lag) <= 1, (lag, out)
        assert out["best_corr"] > 0.5
    # in-sync clip scores clearly positive at zero lag; a shifted one doesn't
    video, audio, sr, fps = _synthetic_av(0)
    assert av_sync(video, audio, sr, fps)["corr_zero_lag"] > 0.3
    video, audio, sr, fps = _synthetic_av(3)
    assert av_sync(video, audio, sr, fps)["corr_zero_lag"] < 0.1


def test_evaluate_clip_report_shape():
    video, audio, sr, fps = _synthetic_av(0)
    ref = video.copy()
    rep = evaluate_clip(video, audio, sr, fps, reference_video=ref,
                        first_frame=video[0])
    assert rep["num_frames"] == len(video)
    assert rep["fidelity_vs_reference"]["psnr"] == float("inf")
    assert rep["first_frame"]["ssim"] == 1.0
    assert "av_sync" in rep and "audio" in rep and "temporal" in rep
    rng = np.random.default_rng(9)
    noisy = np.clip(ref.astype(int) + rng.normal(0, 10, ref.shape), 0, 255
                    ).astype(np.uint8)
    fid = video_fidelity(video, noisy)
    assert np.isfinite(fid["psnr"]) and fid["ssim"] < 1.0


def test_avi_roundtrip_and_eval_cli(tmp_path):
    """write_mjpeg_avi -> read_mjpeg_avi round trip (the no-ffmpeg container
    is a real interchange format), and scripts/eval.py consumes it."""
    import json
    import subprocess
    import sys

    from dualforce_tpu.utils.av_io import read_mjpeg_avi, write_mjpeg_avi

    # smooth gradients (JPEG-friendly; random noise is destroyed by chroma
    # subsampling and would only test the codec's loss, not the container)
    yy, xx = np.mgrid[0:32, 0:48].astype(np.float32)
    video = np.stack([np.stack([(yy * 8 + t * 10) % 256, (xx * 5) % 256,
                                np.full_like(yy, 64 + 8 * t)], axis=-1)
                      for t in range(6)]).astype(np.uint8)
    sr = 16000
    audio = (0.5 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
    path = str(tmp_path / "clip.avi")
    write_mjpeg_avi(path, video, fps=23.976, audio=audio, sample_rate=sr)

    v2, a2, sr2, fps2 = read_mjpeg_avi(path)
    assert v2.shape == video.shape and sr2 == sr
    assert abs(fps2 - 23.976) < 1e-3
    # JPEG-lossy but close; PCM16 round trip is tight
    assert np.mean(np.abs(v2.astype(int) - video.astype(int))) < 12
    assert a2.shape[0] == audio.shape[0]
    np.testing.assert_allclose(a2, audio, atol=2 / 32767)

    out = subprocess.run(
        [sys.executable, "scripts/eval.py", path],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    rep = json.loads(out.stdout)
    assert rep["num_frames"] == 6 and rep["resolution"] == [32, 48]


import os  # noqa: E402


# ---------------------------------------------------------------------------
# model-based hooks (VERDICT r2 missing #5): Verse-Bench-class metrics behind
# local TorchScript checkpoints, tested with tiny fake models
# ---------------------------------------------------------------------------

def _video(t=8, h=24, w=24, seed=0):
    return np.random.default_rng(seed).integers(
        0, 255, (t, h, w, 3), dtype=np.uint8)


def test_lse_from_embeddings_sync_vs_shifted():
    from dualforce_tpu.eval.metrics import lse_from_embeddings

    rng = np.random.default_rng(2)
    vid = rng.normal(size=(40, 8))
    exact = lse_from_embeddings(vid, vid, vshift=5)
    assert exact["lse_d"] == 0.0 and exact["lse_c"] > 0.0
    # audio shifted by 3 windows: the matching window is inside +-vshift for
    # all but the first 3 video windows, so LSE-D collapses far below the
    # unsynced level (not exactly 0: the 3 edge windows can't reach their
    # match)
    shifted = lse_from_embeddings(vid[:-3], vid[3:], vshift=5)
    rand = lse_from_embeddings(vid, rng.normal(size=(40, 8)), vshift=5)
    assert rand["lse_d"] > 1.0
    assert shifted["lse_d"] < 0.2 * rand["lse_d"]


def test_lse_scores_torchscript_contract(tmp_path):
    import torch

    class FakeSync(torch.nn.Module):
        def forward(self, video, audio):
            vid = video.mean(dim=(1, 2, 3)).reshape(-1, 1)
            return vid, vid.clone()

    path = str(tmp_path / "syncnet.pt")
    torch.jit.script(FakeSync()).save(path)
    from dualforce_tpu.eval.metrics import lse_scores

    video = _video()
    audio = np.zeros(48000, np.float32)
    out = lse_scores(video, audio, 48000, 24.0, path)
    assert out is not None and out["lse_d"] == 0.0
    assert lse_scores(video, audio, 48000, 24.0, None) is None


def test_dnsmos_torchscript_contract(tmp_path):
    import torch

    class FakeDNSMOS(torch.nn.Module):
        def forward(self, audio):
            return torch.tensor([[3.5, 4.0, 3.8]])

    path = str(tmp_path / "dnsmos.pt")
    torch.jit.script(FakeDNSMOS()).save(path)
    from dualforce_tpu.eval.metrics import dnsmos_score

    out = dnsmos_score(np.zeros(48000 * 10, np.float32), 48000, path)
    assert abs(out["dnsmos_ovrl"] - 3.8) < 1e-6
    assert abs(out["dnsmos_sig"] - 3.5) < 1e-6


def test_inception_score_uniform_is_one(tmp_path):
    import torch

    class Uniform(torch.nn.Module):
        def forward(self, frames):
            return torch.zeros(frames.shape[0], 10)

    path = str(tmp_path / "cls.pt")
    torch.jit.script(Uniform()).save(path)
    from dualforce_tpu.eval.metrics import inception_score

    out = inception_score(_video(), path)
    assert abs(out["inception_score"] - 1.0) < 1e-6


def test_ib_score_aligned_embeddings(tmp_path):
    import torch

    class FakeIB(torch.nn.Module):
        def forward(self, frames, audio):
            n = frames.shape[0]
            return torch.ones(n, 4), torch.ones(1, 4)

    path = str(tmp_path / "ib.pt")
    torch.jit.script(FakeIB()).save(path)
    from dualforce_tpu.eval.metrics import ib_score

    out = ib_score(_video(), np.zeros(48000, np.float32), 48000, path)
    assert abs(out["ib_score"] - 1.0) < 1e-6


def test_cer():
    from dualforce_tpu.eval.metrics import _cer

    assert _cer("abc", "abc") == 0.0
    assert abs(_cer("axc", "abc") - 1 / 3) < 1e-9
    assert _cer("", "abc") == 1.0
    assert _cer("abc", "") == 1.0


def test_eval_batch_mode_table(tmp_path):
    """--batch over a directory of npz clips emits the Verse-Bench-shaped
    table; model-based columns show N/A without checkpoints, real values
    with the fake TorchScript hooks."""
    import json
    import os
    import subprocess
    import sys

    import torch

    clips = tmp_path / "clips"
    clips.mkdir()
    for i in range(2):
        v = _video(t=6, seed=i)
        a = (0.1 * np.sin(np.arange(24000) * (0.01 + 0.002 * i))).astype(np.float32)
        np.savez(clips / f"clip{i}.npz", video=v, audio=a, fps=24.0, sr=48000)

    class FakeDNSMOS(torch.nn.Module):
        def forward(self, audio):
            return torch.tensor([[3.5, 4.0, 3.8]])

    dns = str(tmp_path / "dnsmos.pt")
    torch.jit.script(FakeDNSMOS()).save(dns)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_json = str(tmp_path / "report.json")
    r = subprocess.run(
        [sys.executable, "scripts/eval.py", str(clips), "--batch",
         "--model_name", "tpu-build", "--dnsmos_model", dns,
         "--out_json", out_json],
        capture_output=True, text=True, cwd=root)
    assert r.returncode == 0, r.stderr[-2000:]
    table = r.stdout
    assert "| Model | IS↑ | DNSMOS↑ | DeSync↓" in table
    assert "| tpu-build |" in table
    row = [ln for ln in table.splitlines() if ln.startswith("| tpu-build")][0]
    cells = [c.strip() for c in row.split("|")[1:-1]]
    assert cells[1] == "N/A"            # IS: no checkpoint
    assert cells[2] == "3.800"          # DNSMOS from the fake hook
    assert cells[3] != "N/A"            # DeSync proxy always available
    rep = json.load(open(out_json))
    assert set(rep["clips"]) == {"clip0.npz", "clip1.npz"}
    assert abs(rep["aggregate"]["dnsmos_ovrl"] - 3.8) < 1e-6
