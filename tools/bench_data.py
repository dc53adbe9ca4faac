"""Data-pipeline throughput: native C++ kernels (native/dfdata.cpp, OpenMP)
vs the pure-Python/numpy equivalents they replace.

This is the host-side work that must keep up with the TPU during training
(the reference leans on torchcodec's native decode for the same reason,
video_audio_dataset.py:83-154). Measures the per-clip preprocessing cost of
a 360p training sample: resize+crop+normalize 193 frames, 48 kHz PCM
resample, and the float->uint8 output quantize. Pure CPU — runs anywhere.

Usage: python tools/bench_data.py [--frames 193] [--hw 720 1280] [--iters 3]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _time(fn, iters):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    argv = sys.argv
    frames = int(argv[argv.index("--frames") + 1]) if "--frames" in argv else 193
    if "--hw" in argv:
        i = argv.index("--hw")
        src_h, src_w = int(argv[i + 1]), int(argv[i + 2])
    else:
        src_h, src_w = 720, 1280
    iters = int(argv[argv.index("--iters") + 1]) if "--iters" in argv else 3

    from PIL import Image

    from dualforce_tpu.data import native
    from dualforce_tpu.data.transforms import crop_and_resize

    if not native.available():
        sys.exit("native lib unavailable (make -C native failed?)")

    rng = np.random.default_rng(0)
    video = rng.integers(0, 256, (frames, src_h, src_w, 3)).astype(np.uint8)
    pcm = (rng.uniform(-0.5, 0.5, 44100 * 8) * 32767).astype(np.int16)
    f32 = rng.uniform(-1, 1, (frames, 352, 640, 3)).astype(np.float32)

    # --- video resize+crop+normalize ---------------------------------------
    def py_resize(v):
        out = np.empty((v.shape[0], 352, 640, 3), np.float32)
        for t in range(v.shape[0]):
            img = crop_and_resize(Image.fromarray(v[t]), 352, 640)
            out[t] = np.asarray(img, np.float32) / 127.5 - 1.0
        return out

    tn = _time(lambda: native.resize_crop_normalize(video, 352, 640), iters)
    sub = video[: min(frames, 24)]                   # PIL path is slow; scale
    tf = _time(lambda: py_resize(sub), iters) * frames / sub.shape[0]
    print(f"resize_crop_normalize     PIL/numpy {tf:7.3f}s   native {tn:7.3f}s"
          f"   {tf / tn:5.1f}x   ({frames}f {src_h}x{src_w}->352x640)")

    # --- PCM resample -------------------------------------------------------
    def py_pcm(p):
        f = p.astype(np.float32) / 32768.0
        t_old = np.arange(len(f)) / 44100.0
        t_new = np.arange(int(len(f) * 48000 / 44100)) / 48000.0
        return np.interp(t_new, t_old, f).astype(np.float32)

    tn = _time(lambda: native.pcm_resample(pcm, 44100, 48000), iters)
    tf = _time(lambda: py_pcm(pcm), iters)
    print(f"pcm_resample 44.1k->48k   numpy     {tf:7.3f}s   native {tn:7.3f}s"
          f"   {tf / tn:5.1f}x   (8 s PCM)")

    # --- output quantize ----------------------------------------------------
    def py_quant(x):
        return ((np.clip(x, -1, 1) + 1) * 127.5).round().astype(np.uint8)

    tn = _time(lambda: native.float_to_uint8(f32), iters)
    tf = _time(lambda: py_quant(f32), iters)
    print(f"float_to_uint8            numpy     {tf:7.3f}s   native {tn:7.3f}s"
          f"   {tf / tn:5.1f}x   ({frames}x352x640x3)")


if __name__ == "__main__":
    main()
