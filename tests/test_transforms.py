"""TV* transform semantics (torchvision-equivalent subset the reference
auto-registers, torchvision_transforms.py:6-11) + registry composition."""

import numpy as np
from PIL import Image

from dualforce_tpu.registry import TRANSFORMS


def _img(h=20, w=30):
    rng = np.random.default_rng(0)
    return Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))


def test_tv_resize_shorter_side_and_exact():
    r = TRANSFORMS.build(dict(type="TVResize", size=10))
    out = r(_img(20, 30))
    assert out.size == (15, 10)       # shorter side 10, aspect kept
    r2 = TRANSFORMS.build(dict(type="TVResize", size=(8, 12)))
    assert r2(_img()).size == (12, 8)  # PIL size is (w, h)


def test_tv_center_crop_and_pad_small():
    c = TRANSFORMS.build(dict(type="TVCenterCrop", size=(10, 12)))
    out = c(_img(20, 30))
    assert out.size == (12, 10)
    # undersized input gets zero-padded like torchvision
    out2 = c(_img(6, 6))
    assert out2.size == (12, 10)
    a = np.asarray(out2)
    assert a[0, 0].sum() == 0 and a.sum() > 0


def test_tv_random_crop_flip_deterministic_with_seed():
    c1 = TRANSFORMS.build(dict(type="TVRandomCrop", size=8, seed=3))
    c2 = TRANSFORMS.build(dict(type="TVRandomCrop", size=8, seed=3))
    img = _img()
    np.testing.assert_array_equal(np.asarray(c1(img)), np.asarray(c2(img)))

    f = TRANSFORMS.build(dict(type="TVRandomHorizontalFlip", p=1.0))
    np.testing.assert_array_equal(np.asarray(f(img)),
                                  np.asarray(img)[:, ::-1])
    fv = TRANSFORMS.build(dict(type="TVRandomVerticalFlip", p=1.0))
    np.testing.assert_array_equal(np.asarray(fv(img)),
                                  np.asarray(img)[::-1])


def test_tv_tensor_normalize_pipeline_via_compose():
    pipe = TRANSFORMS.build(dict(type="Compose", transforms=[
        dict(type="TVResize", size=(16, 16)),
        dict(type="TVToTensor"),
        dict(type="TVNormalize", mean=[0.5, 0.5, 0.5], std=[0.5, 0.5, 0.5]),
    ]))
    out = pipe(_img())
    assert out.shape == (3, 16, 16) and out.dtype == np.float32
    assert out.min() >= -1.0 - 1e-6 and out.max() <= 1.0 + 1e-6


def test_tv_pad_grayscale_lambda():
    p = TRANSFORMS.build(dict(type="TVPad", padding=2, fill=7))
    out = p(_img(4, 4))
    assert out.size == (8, 8)
    assert np.asarray(out)[0, 0, 0] == 7

    g3 = TRANSFORMS.build(dict(type="TVGrayscale", num_output_channels=3))(_img())
    a = np.asarray(g3)
    assert a.shape[-1] == 3
    np.testing.assert_array_equal(a[..., 0], a[..., 1])

    lam = TRANSFORMS.build(
        dict(type="TVLambda", lambd=lambda x: x.rotate(90, expand=True)))
    assert lam(_img(10, 20)).size == (10, 20)  # (w=20,h=10) rotated -> (10,20)
