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
