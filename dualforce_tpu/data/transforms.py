"""Image/video transforms.

Behavioural reference: mova/datasets/transforms/ (mmengine-style Compose +
`crop_and_resize` aspect-preserving center crop, custom.py:4-17).
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import numpy as np
from PIL import Image

from dualforce_tpu.registry import TRANSFORMS


@TRANSFORMS.register_module(name="Compose")
class Compose:
    def __init__(self, transforms: Sequence):
        self.transforms = [
            TRANSFORMS.build(t) if isinstance(t, dict) else t for t in transforms
        ]

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


@TRANSFORMS.register_module(name="CropAndResize")
def crop_and_resize(image: Image.Image, height: int, width: int) -> Image.Image:
    """Aspect-preserving scale then center crop (custom.py:4-17)."""
    w, h = image.size
    scale = max(width / w, height / h)
    image = image.resize((round(w * scale), round(h * scale)),
                         Image.Resampling.LANCZOS)
    w2, h2 = image.size
    left, top = (w2 - width) // 2, (h2 - height) // 2
    return image.crop((left, top, left + width, top + height))


def frames_to_tensor(frames: List[np.ndarray]) -> np.ndarray:
    """uint8 [T][H,W,3] -> float32 [T, H, W, 3] in [-1, 1]."""
    x = np.stack(frames).astype(np.float32) / 127.5 - 1.0
    return x


def image_to_tensor(image: Image.Image) -> np.ndarray:
    return np.asarray(image, np.float32) / 127.5 - 1.0


# ---------------------------------------------------------------------------
# TV* transforms — torchvision-semantics equivalents, dependency-free.
#
# The reference auto-registers every torchvision transform class as `TV<Name>`
# (torchvision_transforms.py:6-11) so dataset configs can reference them by
# string; torchvision isn't in this image, so the commonly used subset is
# implemented here over PIL/numpy with the same constructor conventions.
# ---------------------------------------------------------------------------

def _size_pair(size):
    return (size, size) if isinstance(size, int) else tuple(size)


@TRANSFORMS.register_module(name="TVResize")
class TVResize:
    """int size = resize shorter side keeping aspect; (h, w) = exact resize."""

    def __init__(self, size, interpolation=Image.Resampling.BILINEAR):
        self.size = size
        self.interpolation = interpolation

    def __call__(self, img: Image.Image) -> Image.Image:
        if isinstance(self.size, int):
            w, h = img.size
            short, long = (w, h) if w <= h else (h, w)
            new_short = self.size
            new_long = round(self.size * long / short)
            nw, nh = ((new_short, new_long) if w <= h else (new_long, new_short))
            return img.resize((nw, nh), self.interpolation)
        h, w = _size_pair(self.size)
        return img.resize((w, h), self.interpolation)


@TRANSFORMS.register_module(name="TVCenterCrop")
class TVCenterCrop:
    def __init__(self, size):
        self.size = _size_pair(size)

    def __call__(self, img: Image.Image) -> Image.Image:
        th, tw = self.size
        w, h = img.size
        if w < tw or h < th:  # torchvision zero-pads undersized inputs
            canvas = Image.new(img.mode, (max(w, tw), max(h, th)))
            canvas.paste(img, ((canvas.width - w) // 2, (canvas.height - h) // 2))
            img, (w, h) = canvas, canvas.size
        left, top = (w - tw) // 2, (h - th) // 2
        return img.crop((left, top, left + tw, top + th))


@TRANSFORMS.register_module(name="TVRandomCrop")
class TVRandomCrop:
    def __init__(self, size, seed=None):
        self.size = _size_pair(size)
        self.rng = np.random.default_rng(seed)

    def __call__(self, img: Image.Image) -> Image.Image:
        th, tw = self.size
        w, h = img.size
        if w < tw or h < th:
            raise ValueError(f"crop {self.size} larger than image {(h, w)}")
        left = int(self.rng.integers(0, w - tw + 1))
        top = int(self.rng.integers(0, h - th + 1))
        return img.crop((left, top, left + tw, top + th))


@TRANSFORMS.register_module(name="TVRandomHorizontalFlip")
class TVRandomHorizontalFlip:
    def __init__(self, p: float = 0.5, seed=None):
        self.p = p
        self.rng = np.random.default_rng(seed)

    def __call__(self, img: Image.Image) -> Image.Image:
        if self.rng.random() < self.p:
            return img.transpose(Image.Transpose.FLIP_LEFT_RIGHT)
        return img


@TRANSFORMS.register_module(name="TVRandomVerticalFlip")
class TVRandomVerticalFlip:
    def __init__(self, p: float = 0.5, seed=None):
        self.p = p
        self.rng = np.random.default_rng(seed)

    def __call__(self, img: Image.Image) -> Image.Image:
        if self.rng.random() < self.p:
            return img.transpose(Image.Transpose.FLIP_TOP_BOTTOM)
        return img


@TRANSFORMS.register_module(name="TVGrayscale")
class TVGrayscale:
    def __init__(self, num_output_channels: int = 1):
        self.n = num_output_channels

    def __call__(self, img: Image.Image) -> Image.Image:
        g = img.convert("L")
        return g.convert("RGB") if self.n == 3 else g


@TRANSFORMS.register_module(name="TVPad")
class TVPad:
    def __init__(self, padding, fill: int = 0):
        if isinstance(padding, int):
            padding = (padding,) * 4          # l, t, r, b
        elif len(padding) == 2:
            padding = (padding[0], padding[1]) * 2
        self.padding = tuple(padding)
        self.fill = fill

    def __call__(self, img: Image.Image) -> Image.Image:
        l, t, r, b = self.padding
        canvas = Image.new(img.mode, (img.width + l + r, img.height + t + b),
                           self.fill)
        canvas.paste(img, (l, t))
        return canvas


@TRANSFORMS.register_module(name="TVToTensor")
class TVToTensor:
    """PIL/uint8 HWC -> float32 CHW in [0, 1] (torchvision layout)."""

    def __call__(self, img) -> np.ndarray:
        a = np.asarray(img, np.float32) / 255.0
        if a.ndim == 2:
            a = a[:, :, None]
        return np.ascontiguousarray(a.transpose(2, 0, 1))


@TRANSFORMS.register_module(name="TVNormalize")
class TVNormalize:
    """(x - mean) / std, channel-first float input (after TVToTensor)."""

    def __init__(self, mean, std):
        self.mean = np.asarray(mean, np.float32).reshape(-1, 1, 1)
        self.std = np.asarray(std, np.float32).reshape(-1, 1, 1)

    def __call__(self, x: np.ndarray) -> np.ndarray:
        return (x - self.mean) / self.std


@TRANSFORMS.register_module(name="TVLambda")
class TVLambda:
    def __init__(self, lambd: Callable):
        self.lambd = lambd

    def __call__(self, x):
        return self.lambd(x)
