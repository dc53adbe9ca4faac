"""ctypes bindings for the native data kernels (native/dfdata.cpp), with
transparent numpy fallbacks when the shared library isn't built.

Build: `make -C native` (or `python -m dualforce_tpu.data.native`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libdfdata.so"))

_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> bool:
    if os.path.exists(_SO_PATH) and not force:
        return True
    try:
        subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                       check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"[dfdata] native build failed ({e}); using numpy fallbacks")
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH):
        if not build():
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    i64, f32p, u8p, i16p = (ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
                            ctypes.POINTER(ctypes.c_uint8),
                            ctypes.POINTER(ctypes.c_int16))
    lib.df_resize_crop_normalize.argtypes = [u8p, i64, i64, i64, i64, i64, f32p]
    lib.df_pcm_resample.argtypes = [i16p, i64, i64, i64, f32p, i64]
    lib.df_pcm_resample.restype = i64
    lib.df_pcm_to_mono.argtypes = [i16p, i64, i64, f32p]
    lib.df_float_to_uint8.argtypes = [f32p, i64, u8p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def resize_crop_normalize(video_u8: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """[T, H, W, 3] uint8 -> [T, out_h, out_w, 3] float32 in [-1, 1]
    (aspect-preserving cover + center crop, matching transforms.crop_and_resize)."""
    video_u8 = np.ascontiguousarray(video_u8, np.uint8)
    T, H, W, _ = video_u8.shape
    lib = _load()
    out = np.empty((T, out_h, out_w, 3), np.float32)
    if lib is not None:
        lib.df_resize_crop_normalize(
            video_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            T, H, W, out_h, out_w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out
    # numpy fallback (PIL per frame)
    from PIL import Image

    from dualforce_tpu.data.transforms import crop_and_resize

    for t in range(T):
        img = crop_and_resize(Image.fromarray(video_u8[t]), out_h, out_w)
        out[t] = np.asarray(img, np.float32) / 127.5 - 1.0
    return out


def pcm_resample(pcm_i16: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    pcm_i16 = np.ascontiguousarray(pcm_i16, np.int16)
    lib = _load()
    cap = int(np.ceil(len(pcm_i16) * sr_out / sr_in)) + 1
    out = np.empty((cap,), np.float32)
    if lib is not None:
        n = lib.df_pcm_resample(
            pcm_i16.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            len(pcm_i16), sr_in, sr_out,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap)
        return out[:n]
    f = pcm_i16.astype(np.float32) / 32768.0
    if sr_in == sr_out:
        return f
    t_old = np.arange(len(f)) / sr_in
    t_new = np.arange(int(len(f) * sr_out / sr_in)) / sr_out
    return np.interp(t_new, t_old, f).astype(np.float32)


def float_to_uint8(video_f32: np.ndarray) -> np.ndarray:
    video_f32 = np.ascontiguousarray(video_f32, np.float32)
    lib = _load()
    out = np.empty(video_f32.shape, np.uint8)
    if lib is not None:
        lib.df_float_to_uint8(
            video_f32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            video_f32.size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out
    return ((np.clip(video_f32, -1, 1) + 1) * 127.5).round().astype(np.uint8)


if __name__ == "__main__":
    ok = build(force=True)
    print("native build:", "ok" if ok else "FAILED", "->", _SO_PATH)
