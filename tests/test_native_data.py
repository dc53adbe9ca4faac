"""Native (C++) data kernels vs numpy/PIL reference paths."""

import numpy as np
import pytest

from dualforce_tpu.data import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libdfdata.so not built")


def test_resize_crop_normalize_matches_pil():
    from PIL import Image

    from dualforce_tpu.data.transforms import crop_and_resize

    rng = np.random.default_rng(0)
    # smooth image so bilinear (C++) vs Lanczos (PIL) stay close
    base = rng.uniform(0, 255, (12, 16, 3))
    video = np.stack([base] * 2).astype(np.uint8)
    video = np.repeat(np.repeat(video, 8, axis=1), 8, axis=2)  # [2, 96, 128, 3]

    got = native.resize_crop_normalize(video, 48, 48)
    want = np.stack([
        np.asarray(crop_and_resize(Image.fromarray(video[t]), 48, 48),
                   np.float32) / 127.5 - 1.0
        for t in range(2)
    ])
    assert got.shape == want.shape
    # different filters -> compare loosely but structurally
    assert np.mean(np.abs(got - want)) < 0.06


def test_pcm_resample_identity_and_rate():
    pcm = (np.sin(np.arange(9600) * 0.01) * 30000).astype(np.int16)
    same = native.pcm_resample(pcm, 48000, 48000)
    np.testing.assert_allclose(same, pcm.astype(np.float32) / 32768.0, atol=1e-6)

    down = native.pcm_resample(pcm, 48000, 16000)
    assert abs(len(down) - 3200) <= 1
    ref = np.interp(np.arange(len(down)) * 48000 / 16000 / 48000,
                    np.arange(len(pcm)) / 48000, pcm / 32768.0)
    np.testing.assert_allclose(down, ref, atol=1e-3)


def test_float_to_uint8_roundtrip():
    f = np.linspace(-1, 1, 256, dtype=np.float32).reshape(1, 16, 16, 1)
    f = np.repeat(f, 3, axis=-1)
    u8 = native.float_to_uint8(f)
    back = u8.astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(back, f, atol=1 / 127.0)
