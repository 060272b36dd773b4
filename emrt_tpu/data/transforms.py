"""Paired image/label augmentations.

Behavior-equivalent to reference ``src/transforms/transforms.py`` (Compose,
flips, Resize, ResizeStepScaling, Normalize, Padding, RandomPaddingCrop,
RandomBlur, RandomRotation, RandomDistort) with two deliberate changes:

* every random op draws from an explicit ``numpy.random.Generator`` threaded
  through ``Compose`` so the pipeline is deterministic per (seed, sample);
* output stays HWC float32 (models are NHWC on TPU) — no CHW transpose
  (the reference transposes at Compose tail for NCHW Paddle).
"""
from __future__ import annotations

import cv2
import numpy as np

from . import functional as F

__all__ = [
    "Compose", "RandomHorizontalFlip", "RandomVerticalFlip", "Resize",
    "ResizeStepScaling", "Normalize", "Padding", "RandomPaddingCrop",
    "RandomBlur", "RandomRotation", "RandomDistort",
]


class Compose:
    """Run transforms in order. Accepts paths or arrays; returns (img, label)."""

    def __init__(self, transforms, to_rgb: bool = True):
        if not isinstance(transforms, list):
            raise TypeError("The transforms must be a list!")
        self.transforms = transforms
        self.to_rgb = to_rgb

    def __call__(self, img, label=None, rng: np.random.Generator | None = None):
        rng = rng or np.random.default_rng()
        if isinstance(img, str):
            img = F.imread_rgb(img) if self.to_rgb else cv2.imread(img).astype(np.float32)
        if isinstance(label, str):
            label = F.imread_label(label)
        for op in self.transforms:
            img, label = op(img, label, rng)
        return img, label


class RandomHorizontalFlip:
    def __init__(self, prob: float = 0.5):
        self.prob = prob

    def __call__(self, img, label=None, rng=None):
        if rng.random() < self.prob:
            img = F.horizontal_flip(img)
            if label is not None:
                label = F.horizontal_flip(label)
        return img, label


class RandomVerticalFlip:
    def __init__(self, prob: float = 0.1):
        self.prob = prob

    def __call__(self, img, label=None, rng=None):
        if rng.random() < self.prob:
            img = F.vertical_flip(img)
            if label is not None:
                label = F.vertical_flip(label)
        return img, label


class Resize:
    """Resize to (h, w) or short-edge int; bilinear img / nearest label."""

    def __init__(self, target_size=520, interp: str = "bilinear", keep_ori_size: bool = False):
        if isinstance(target_size, (list, tuple)) and len(target_size) != 2:
            raise ValueError(f"`target_size` should have 2 elements, got {target_size}")
        self.target_size = tuple(target_size) if isinstance(target_size, (list, tuple)) else target_size
        self.interp = interp
        self.keep_ori_size = keep_ori_size

    def __call__(self, img, label=None, rng=None):
        if not self.keep_ori_size:
            img = F.resize(img, self.target_size, self.interp)
        if label is not None:
            label = F.resize(label, self.target_size, "nearest")
        return img, label


class ResizeStepScaling:
    """Random proportional rescale from a stepped set of scale factors."""

    def __init__(self, min_scale_factor=0.75, max_scale_factor=1.25, scale_step_size=0.25):
        if min_scale_factor > max_scale_factor:
            raise ValueError("min_scale_factor must be <= max_scale_factor")
        self.min_scale_factor = min_scale_factor
        self.max_scale_factor = max_scale_factor
        self.scale_step_size = scale_step_size

    def __call__(self, img, label=None, rng=None):
        if self.min_scale_factor == self.max_scale_factor:
            scale = self.min_scale_factor
        elif self.scale_step_size == 0:
            scale = rng.uniform(self.min_scale_factor, self.max_scale_factor)
        else:
            num_steps = int((self.max_scale_factor - self.min_scale_factor)
                            / self.scale_step_size + 1)
            scales = np.linspace(self.min_scale_factor, self.max_scale_factor, num_steps)
            scale = float(rng.choice(scales))
        h = int(round(scale * img.shape[0]))
        w = int(round(scale * img.shape[1]))
        img = F.resize(img, (h, w), "bilinear")
        if label is not None:
            label = F.resize(label, (h, w), "nearest")
        return img, label


class Normalize:
    """(img - mean) / std in 0-255 pixel space (ImageNet-style constants)."""

    def __init__(self, mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)):
        self.mean = mean
        self.std = std
        if not np.all(np.asarray(std) != 0):
            raise ValueError("std must be non-zero")

    def __call__(self, img, label=None, rng=None):
        return F.normalize(img, self.mean, self.std), label


class Padding:
    """Bottom-right constant padding to target (h, w)."""

    def __init__(self, target_size, im_padding_value=(127.5, 127.5, 127.5),
                 label_padding_value=255):
        if not isinstance(target_size, (list, tuple)) or len(target_size) != 2:
            raise ValueError(f"`target_size` should have 2 elements, got {target_size}")
        self.target_size = target_size
        self.im_padding_value = im_padding_value
        self.label_padding_value = label_padding_value

    def __call__(self, img, label=None, rng=None):
        th, tw = self.target_size[1], self.target_size[0]
        pad_h, pad_w = th - img.shape[0], tw - img.shape[1]
        if pad_h < 0 or pad_w < 0:
            raise ValueError("image is larger than target_size")
        img = cv2.copyMakeBorder(img, 0, pad_h, 0, pad_w, cv2.BORDER_CONSTANT,
                                 value=self.im_padding_value)
        if label is not None:
            label = cv2.copyMakeBorder(label, 0, pad_h, 0, pad_w, cv2.BORDER_CONSTANT,
                                       value=self.label_padding_value)
        return img, label


class RandomPaddingCrop:
    """Pad (bottom-right) to at least crop size, then random-crop crop_size."""

    def __init__(self, crop_size=(512, 512), img_padding_value=(123.675, 116.28, 103.53),
                 label_padding_value=255):
        if not isinstance(crop_size, (list, tuple)) or len(crop_size) != 2:
            raise ValueError(f"`crop_size` should have 2 elements, got {crop_size}")
        self.crop_size = crop_size
        self.img_padding_value = img_padding_value
        self.label_padding_value = label_padding_value

    def __call__(self, img, label=None, rng=None):
        crop_w, crop_h = self.crop_size[0], self.crop_size[1]
        img_h, img_w = img.shape[:2]
        if img_h == crop_h and img_w == crop_w:
            return img, label
        pad_h = max(crop_h - img_h, 0)
        pad_w = max(crop_w - img_w, 0)
        if pad_h > 0 or pad_w > 0:
            img = cv2.copyMakeBorder(img, 0, pad_h, 0, pad_w, cv2.BORDER_CONSTANT,
                                     value=self.img_padding_value)
            if label is not None:
                label = cv2.copyMakeBorder(label, 0, pad_h, 0, pad_w, cv2.BORDER_CONSTANT,
                                           value=self.label_padding_value)
            img_h, img_w = img.shape[:2]
        h_off = int(rng.integers(img_h - crop_h + 1))
        w_off = int(rng.integers(img_w - crop_w + 1))
        img = img[h_off:h_off + crop_h, w_off:w_off + crop_w]
        if label is not None:
            label = label[h_off:h_off + crop_h, w_off:w_off + crop_w]
        return img, label


class RandomBlur:
    def __init__(self, prob: float = 0.1):
        self.prob = prob

    def __call__(self, img, label=None, rng=None):
        n = 0 if self.prob <= 0 else (1 if self.prob >= 1 else int(1.0 / self.prob))
        if n > 0 and rng.integers(0, n) == 0:
            radius = int(rng.integers(3, 10))
            if radius % 2 != 1:
                radius += 1
            radius = min(radius, 9)
            img = cv2.GaussianBlur(img, (radius, radius), 0, 0)
        return img, label


class RandomRotation:
    """Rotate by U(-max, max) degrees with expand-and-pad."""

    def __init__(self, max_rotation: float = 15, im_padding_value=(127.5, 127.5, 127.5),
                 label_padding_value=255):
        self.max_rotation = max_rotation
        self.im_padding_value = im_padding_value
        self.label_padding_value = label_padding_value

    def __call__(self, img, label=None, rng=None):
        if self.max_rotation > 0:
            h, w = img.shape[:2]
            angle = rng.uniform(-self.max_rotation, self.max_rotation)
            pc = (w // 2, h // 2)
            r = cv2.getRotationMatrix2D(pc, angle, 1.0)
            cos, sin = abs(r[0, 0]), abs(r[0, 1])
            nw = int(h * sin + w * cos)
            nh = int(h * cos + w * sin)
            r[0, 2] += nw / 2 - pc[0]
            r[1, 2] += nh / 2 - pc[1]
            img = cv2.warpAffine(img, r, (nw, nh), flags=cv2.INTER_LINEAR,
                                 borderMode=cv2.BORDER_CONSTANT,
                                 borderValue=self.im_padding_value)
            if label is not None:
                label = cv2.warpAffine(label, r, (nw, nh), flags=cv2.INTER_NEAREST,
                                       borderMode=cv2.BORDER_CONSTANT,
                                       borderValue=self.label_padding_value)
        return img, label


class RandomDistort:
    """Photometric jitter (brightness/contrast/saturation/hue) in random order."""

    def __init__(self, brightness_range=0.5, brightness_prob=0.5,
                 contrast_range=0.5, contrast_prob=0.5,
                 saturation_range=0.5, saturation_prob=0.5,
                 hue_range=18, hue_prob=0.5):
        self.brightness_range = brightness_range
        self.brightness_prob = brightness_prob
        self.contrast_range = contrast_range
        self.contrast_prob = contrast_prob
        self.saturation_range = saturation_range
        self.saturation_prob = saturation_prob
        self.hue_range = hue_range
        self.hue_prob = hue_prob

    def __call__(self, img, label=None, rng=None):
        from PIL import Image

        ops = [
            ("brightness", F.brightness, 1 - self.brightness_range,
             1 + self.brightness_range, self.brightness_prob),
            ("contrast", F.contrast, 1 - self.contrast_range,
             1 + self.contrast_range, self.contrast_prob),
            ("saturation", F.saturation, 1 - self.saturation_range,
             1 + self.saturation_range, self.saturation_prob),
            ("hue", F.hue, -self.hue_range, self.hue_range, self.hue_prob),
        ]
        order = rng.permutation(len(ops))
        pil = Image.fromarray(img.astype(np.uint8))
        for i in order:
            _, fn, lo, hi, prob = ops[i]
            if rng.uniform(0, 1) < prob:
                pil = fn(pil, lo, hi, rng)
        return np.asarray(pil).astype(np.float32), label


def get_transforms(config):
    """Per-dataset train augmentation recipes (reference src/transforms/__init__.py:5-59)."""
    dataset = config.DATA.DATASET
    imagenet = dict(mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375])
    if dataset == "Trans10kV2":
        return [Resize(target_size=config.DATA.CROP_SIZE),
                RandomHorizontalFlip(prob=0.5),
                Normalize(**imagenet)]
    if dataset == "ADE20K":
        return [ResizeStepScaling(0.5, 2.0, 0.25),
                RandomPaddingCrop(crop_size=config.DATA.CROP_SIZE,
                                  img_padding_value=(123.675, 116.28, 103.53),
                                  label_padding_value=255),
                RandomHorizontalFlip(prob=0.5),
                RandomDistort(brightness_range=0.4, contrast_range=0.4,
                              saturation_range=0.4),
                Normalize(**imagenet)]
    if dataset in ("Potsdam", "Vaihingen"):
        return [ResizeStepScaling(0.5, 2.0, 0.25),
                RandomPaddingCrop(crop_size=config.DATA.CROP_SIZE,
                                  img_padding_value=(0, 0, 0),
                                  label_padding_value=255),
                RandomHorizontalFlip(prob=0.5),
                Normalize(**imagenet)]
    if dataset == "LoveDA":
        return [Normalize(**imagenet)]
    if dataset == "Synthetic":
        return [RandomHorizontalFlip(prob=0.5), Normalize(**imagenet)]
    if dataset in ("Cityscapes", "PascalContext", "CocoStuff"):
        return [ResizeStepScaling(0.5, 2.0, 0.25),
                RandomPaddingCrop(crop_size=config.DATA.CROP_SIZE,
                                  img_padding_value=(123.675, 116.28, 103.53),
                                  label_padding_value=255),
                RandomHorizontalFlip(prob=0.5),
                Normalize(**imagenet)]
    raise NotImplementedError(f"{dataset} dataset is not supported")
