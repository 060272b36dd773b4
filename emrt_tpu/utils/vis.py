"""Visualization: palettes + colorized mask rendering
(reference: src/utils/vis.py:18-98 and predict.py:75-96 palettes)."""
from __future__ import annotations

import numpy as np


def get_palette(dataset: str) -> np.ndarray:
    """Per-dataset RGB palette (reference predict.py:75-96)."""
    name = dataset.lower()
    if name in ("potsdam", "vaihingen"):
        # ISPRS: imp-surface, building, low-veg, tree, car, clutter
        palette = [[255, 255, 255], [0, 0, 255], [0, 255, 255],
                   [0, 255, 0], [255, 255, 0], [255, 0, 0]]
    elif name == "loveda":
        palette = [[255, 255, 255], [255, 0, 0], [255, 255, 0],
                   [0, 0, 255], [159, 129, 183], [0, 255, 0], [255, 195, 128]]
    elif name == "cityscapes":
        palette = [[128, 64, 128], [244, 35, 232], [70, 70, 70],
                   [102, 102, 156], [190, 153, 153], [153, 153, 153],
                   [250, 170, 30], [220, 220, 0], [107, 142, 35],
                   [152, 251, 152], [70, 130, 180], [220, 20, 60],
                   [255, 0, 0], [0, 0, 142], [0, 0, 70], [0, 60, 100],
                   [0, 80, 100], [0, 0, 230], [119, 11, 32]]
    else:
        # pseudo-color LUT (reference vis.py:18-46 bit-shuffle palette)
        palette = []
        for j in range(256):
            lab, color = j, [0, 0, 0]
            i = 0
            while lab:
                color[0] |= ((lab >> 0) & 1) << (7 - i)
                color[1] |= ((lab >> 1) & 1) << (7 - i)
                color[2] |= ((lab >> 2) & 1) << (7 - i)
                lab >>= 3
                i += 1
            palette.append(color)
    return np.asarray(palette, dtype=np.uint8)


def colorize(pred: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """Label map [H, W] -> RGB [H, W, 3]."""
    pred = np.asarray(pred).astype(np.int64)
    safe = np.clip(pred, 0, len(palette) - 1)
    return palette[safe]


def overlay(image: np.ndarray, color_mask: np.ndarray, weight: float = 0.6) -> np.ndarray:
    """Blend image with colorized mask (reference vis.py overlay blend)."""
    img = np.asarray(image, dtype=np.float32)
    return (weight * img + (1 - weight) * color_mask.astype(np.float32)).astype(np.uint8)
