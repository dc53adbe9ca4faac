"""Objective evaluation metrics for generated video+audio clips.

The reference evaluates on Verse-Bench (IS/DNSMOS/DeSync/IB-Score/LSE-D/
LSE-C/cpCER, README.md §Evaluation) via an out-of-repo suite; its in-repo
`scripts/eval/` directory (FVD/FID/identity/sync/pose per the fork's audit,
cc_todo/20260223-review/01-code_research_review.md:24-27) is absent from the
snapshot. This module provides the dependency-free core that runs anywhere:

- fidelity: PSNR, SSIM (vs a reference clip or the conditioning first frame)
- temporal: inter-frame PSNR (flicker), motion energy profile
- audio: RMS/peak/silence/clipping stats
- AV sync: a DeSync-style proxy — normalized cross-correlation between the
  video motion-energy profile and the audio onset envelope, with the best
  alignment lag in milliseconds (0 = in sync).

Model-based scores (IS via a classifier, IB-Score via an image-audio
embedder, LSE via SyncNet) need external checkpoints; `clip_scores` hooks
them in when a local model path is supplied.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


# ---------------------------------------------------------------------------
# fidelity
# ---------------------------------------------------------------------------

def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 255.0) -> float:
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range ** 2 / mse))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return g / g.sum()


def _filter2d_sep(img: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Separable 'valid' filtering along H and W of [H, W] float64."""
    pad = len(w) // 2
    out = np.apply_along_axis(lambda r: np.convolve(r, w, mode="valid"), 1, img)
    out = np.apply_along_axis(lambda c: np.convolve(c, w, mode="valid"), 0, out)
    del pad
    return out


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 255.0) -> float:
    """Single-scale SSIM (Wang et al. 2004), 11x11 gaussian window, on
    [H, W] or [H, W, C] images (channel-averaged)."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    if a.ndim == 3:
        return float(np.mean([ssim(a[..., c], b[..., c], data_range)
                              for c in range(a.shape[-1])]))
    w = _gaussian_window()
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_a = _filter2d_sep(a, w)
    mu_b = _filter2d_sep(b, w)
    aa = _filter2d_sep(a * a, w) - mu_a ** 2
    bb = _filter2d_sep(b * b, w) - mu_b ** 2
    ab = _filter2d_sep(a * b, w) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * ab + c2)) / (
        (mu_a ** 2 + mu_b ** 2 + c1) * (aa + bb + c2))
    return float(np.mean(s))


def video_fidelity(video: np.ndarray, reference: np.ndarray) -> Dict[str, float]:
    """Frame-wise mean PSNR/SSIM of two [T, H, W, 3] uint8 videos."""
    t = min(len(video), len(reference))
    return {
        "psnr": float(np.mean([psnr(video[i], reference[i]) for i in range(t)])),
        "ssim": float(np.mean([ssim(video[i], reference[i]) for i in range(t)])),
        "frames_compared": t,
    }


# ---------------------------------------------------------------------------
# temporal
# ---------------------------------------------------------------------------

def temporal_profile(video: np.ndarray) -> Dict[str, float]:
    """Inter-frame statistics of a [T, H, W, 3] uint8 video: adjacent-frame
    PSNR (very high = frozen, very low = flicker) and motion energy stats."""
    if len(video) < 2:
        return {"interframe_psnr": float("inf"), "motion_mean": 0.0,
                "motion_std": 0.0}
    diffs = video[1:].astype(np.float32) - video[:-1].astype(np.float32)
    energy = np.sqrt(np.mean(diffs ** 2, axis=(1, 2, 3)))  # [T-1]
    ifp = [psnr(video[i], video[i + 1]) for i in range(len(video) - 1)]
    finite = [p for p in ifp if np.isfinite(p)]
    return {
        "interframe_psnr": float(np.mean(finite)) if finite else float("inf"),
        "motion_mean": float(energy.mean()),
        "motion_std": float(energy.std()),
    }


def motion_energy(video: np.ndarray) -> np.ndarray:
    """Per-transition RMS frame difference, [T-1] float."""
    diffs = video[1:].astype(np.float32) - video[:-1].astype(np.float32)
    return np.sqrt(np.mean(diffs ** 2, axis=(1, 2, 3)))


# ---------------------------------------------------------------------------
# audio
# ---------------------------------------------------------------------------

def audio_stats(audio: np.ndarray, silence_db: float = -60.0,
                frame: int = 1024) -> Dict[str, float]:
    """audio: [S] float in [-1, 1]."""
    audio = np.asarray(audio, np.float32).reshape(-1)
    n = (len(audio) // frame) * frame
    if n == 0:
        return {"rms_db": -120.0, "peak": 0.0, "silence_fraction": 1.0,
                "clipping_fraction": 0.0}
    frames = audio[:n].reshape(-1, frame)
    rms = np.sqrt(np.mean(frames ** 2, axis=1))
    rms_db = 20 * np.log10(np.maximum(rms, 1e-9))
    return {
        "rms_db": float(20 * np.log10(max(np.sqrt(np.mean(audio ** 2)), 1e-9))),
        "peak": float(np.max(np.abs(audio))),
        "silence_fraction": float(np.mean(rms_db < silence_db)),
        "clipping_fraction": float(np.mean(np.abs(audio) > 0.999)),
    }


def audio_onset_envelope(audio: np.ndarray, sr: int, fps: float,
                         num_frames: int) -> np.ndarray:
    """Frame-aligned onset strength: positive first difference of per-frame
    RMS energy, [num_frames-1] float (aligned with motion_energy)."""
    audio = np.asarray(audio, np.float32).reshape(-1)
    hop = sr / fps
    rms = np.empty(num_frames, np.float32)
    for i in range(num_frames):
        lo, hi = int(i * hop), min(int((i + 1) * hop), len(audio))
        seg = audio[lo:hi]
        rms[i] = np.sqrt(np.mean(seg ** 2)) if len(seg) else 0.0
    onset = np.diff(rms)
    return np.maximum(onset, 0.0)


def av_sync(video: np.ndarray, audio: np.ndarray, sr: int, fps: float,
            max_lag_frames: int = 12) -> Dict[str, float]:
    """DeSync-style proxy: normalized cross-correlation between video motion
    energy and audio onset strength over alignment lags. Returns the
    correlation at zero lag, the best-correlation lag in frames and ms
    (positive = audio leads), and the best correlation."""
    me = motion_energy(video)
    oe = audio_onset_envelope(audio, sr, fps, len(video))
    t = min(len(me), len(oe))
    me, oe = me[:t], oe[:t]

    def ncc(x, y):
        x = x - x.mean()
        y = y - y.mean()
        d = np.linalg.norm(x) * np.linalg.norm(y)
        return float(np.dot(x, y) / d) if d > 0 else 0.0

    lags = range(-max_lag_frames, max_lag_frames + 1)
    corrs = {}
    for lag in lags:
        if lag >= 0:
            x, y = me[lag:], oe[:t - lag]
        else:
            x, y = me[:t + lag], oe[-lag:]
        if len(x) >= 4:
            corrs[lag] = ncc(x, y)
    if not corrs:
        return {"corr_zero_lag": 0.0, "best_lag_frames": 0,
                "best_lag_ms": 0.0, "best_corr": 0.0}
    best = max(corrs, key=lambda k: corrs[k])
    return {
        "corr_zero_lag": corrs.get(0, 0.0),
        "best_lag_frames": int(best),
        "best_lag_ms": float(best * 1000.0 / fps),
        "best_corr": corrs[best],
    }


# ---------------------------------------------------------------------------
# model-based hooks (optional external checkpoints)
# ---------------------------------------------------------------------------

def clip_scores(video: np.ndarray, prompt: str,
                model_path: Optional[str] = None) -> Optional[Dict[str, float]]:
    """Text-video alignment via a LOCAL CLIP checkpoint (transformers).
    Returns None when no model is available (zero-egress images)."""
    if not model_path:
        return None
    try:
        import torch
        from transformers import CLIPModel, CLIPProcessor
    except ImportError:
        return None
    model = CLIPModel.from_pretrained(model_path)
    proc = CLIPProcessor.from_pretrained(model_path)
    idx = np.linspace(0, len(video) - 1, min(8, len(video))).astype(int)
    inputs = proc(text=[prompt], images=[video[i] for i in idx],
                  return_tensors="pt", padding=True)
    with torch.no_grad():
        out = model(**inputs)
        sims = torch.cosine_similarity(
            out.image_embeds, out.text_embeds.expand_as(out.image_embeds))
    return {"clip_text_sim": float(sims.mean())}


def evaluate_clip(video: np.ndarray, audio: np.ndarray, sr: int, fps: float,
                  reference_video: Optional[np.ndarray] = None,
                  first_frame: Optional[np.ndarray] = None,
                  prompt: Optional[str] = None,
                  clip_model: Optional[str] = None) -> Dict:
    """One-call report over a generated [T,H,W,3] uint8 + [S] float clip."""
    report: Dict = {
        "num_frames": int(len(video)),
        "resolution": [int(video.shape[1]), int(video.shape[2])],
        "audio_seconds": float(len(np.asarray(audio).reshape(-1)) / sr),
        "temporal": temporal_profile(video),
        "audio": audio_stats(audio),
        "av_sync": av_sync(video, audio, sr, fps),
    }
    if reference_video is not None:
        report["fidelity_vs_reference"] = video_fidelity(video, reference_video)
    if first_frame is not None:
        report["first_frame"] = {
            "psnr": psnr(video[0], first_frame),
            "ssim": ssim(video[0], first_frame),
        }
    if prompt and clip_model:
        cs = clip_scores(video, prompt, clip_model)
        if cs:
            report["clip"] = cs
    return report
