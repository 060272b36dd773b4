"""Host-side image ops for the data pipeline.

Behavior-equivalent to reference ``src/transforms/functional.py:21-101``
(normalize in 0-255 space, flips, PIL enhance ops) plus the cv2 resize
helpers the reference reaches through ``paddle.vision.transforms.functional``.
Images stay HWC float32 end-to-end — the TPU models are NHWC, so no CHW
transpose is ever needed.
"""
from __future__ import annotations

import cv2
import numpy as np
from PIL import Image, ImageEnhance

_INTERP = {
    "nearest": cv2.INTER_NEAREST,
    "bilinear": cv2.INTER_LINEAR,
    "linear": cv2.INTER_LINEAR,
    "cubic": cv2.INTER_CUBIC,
    "area": cv2.INTER_AREA,
    "lanczos": cv2.INTER_LANCZOS4,
}


def resize(img: np.ndarray, size, interp: str = "bilinear") -> np.ndarray:
    """Resize HWC or HW array. ``size`` is (h, w) or int (short edge match)."""
    h, w = img.shape[:2]
    if isinstance(size, int):
        if h > w:
            oh, ow = int(size * h / w), size
        else:
            oh, ow = size, int(size * w / h)
    else:
        oh, ow = int(size[0]), int(size[1])
    if (oh, ow) == (h, w):
        return img
    return cv2.resize(img, (ow, oh), interpolation=_INTERP[interp])


def normalize(img: np.ndarray, mean, std) -> np.ndarray:
    """Normalize a 0-255 float image: (img - mean) / std, in 0-255 space."""
    img = img.astype(np.float32, copy=True)
    mean = np.asarray(mean, dtype=np.float32).reshape(1, 1, -1)
    std = np.asarray(std, dtype=np.float32).reshape(1, 1, -1)
    img -= mean
    img /= std
    return img


def horizontal_flip(img: np.ndarray) -> np.ndarray:
    return img[:, ::-1] if img.ndim == 2 else img[:, ::-1, :]


def vertical_flip(img: np.ndarray) -> np.ndarray:
    return img[::-1] if img.ndim == 2 else img[::-1, :, :]


def brightness(img: Image.Image, lower: float, upper: float, rng) -> Image.Image:
    return ImageEnhance.Brightness(img).enhance(rng.uniform(lower, upper))


def contrast(img: Image.Image, lower: float, upper: float, rng) -> Image.Image:
    return ImageEnhance.Contrast(img).enhance(rng.uniform(lower, upper))


def saturation(img: Image.Image, lower: float, upper: float, rng) -> Image.Image:
    return ImageEnhance.Color(img).enhance(rng.uniform(lower, upper))


def hue(img: Image.Image, lower: float, upper: float, rng) -> Image.Image:
    delta = rng.uniform(lower, upper)
    arr = np.array(img.convert("HSV"))
    arr[:, :, 0] = arr[:, :, 0] + delta
    return Image.fromarray(arr, mode="HSV").convert("RGB")


def imread_rgb(path: str) -> np.ndarray:
    """Read image as float32 RGB HWC (reference Compose: cv2 BGR read → RGB)."""
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise ValueError(f"Can't read the image file {path}!")
    img = img.astype(np.float32)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def imread_label(path: str) -> np.ndarray:
    """Read a label map via PIL palette mode (reference Compose label read)."""
    return np.asarray(Image.open(path).convert("P"), dtype=np.uint8)
