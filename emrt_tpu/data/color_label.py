"""Color <-> label conversion via a 256^3 LUT
(reference: src/transforms/color_label.py:5-25)."""
from __future__ import annotations

import numpy as np

# ISPRS 2D semantic labeling palette: RGB -> class id
ISPRS_COLOR_MAP = {
    (255, 255, 255): 0,   # impervious surface
    (0, 0, 255): 1,       # building
    (0, 255, 255): 2,     # low vegetation
    (0, 255, 0): 3,       # tree
    (255, 255, 0): 4,     # car
    (255, 0, 0): 5,       # clutter / background
}

_LUTS: dict[str, np.ndarray] = {}


def _build_lut(color_map: dict, default: int = 255) -> np.ndarray:
    lut = np.full(256 ** 3, default, dtype=np.uint8)
    for (r, g, b), idx in color_map.items():
        lut[(r << 16) + (g << 8) + b] = idx
    return lut


def color2label(color_img: np.ndarray, dataset: str = "ISPRS") -> np.ndarray:
    """RGB [H, W, 3] color-coded annotation -> [H, W] class-id map."""
    if dataset not in _LUTS:
        if dataset.upper() != "ISPRS":
            raise NotImplementedError(f"color map for {dataset}")
        _LUTS[dataset] = _build_lut(ISPRS_COLOR_MAP)
    img = np.asarray(color_img, dtype=np.uint32)
    key = (img[..., 0] << 16) + (img[..., 1] << 8) + img[..., 2]
    return _LUTS[dataset][key]


def label2color(label: np.ndarray, dataset: str = "ISPRS") -> np.ndarray:
    """[H, W] class ids -> RGB [H, W, 3]."""
    inv = {v: k for k, v in ISPRS_COLOR_MAP.items()}
    palette = np.zeros((256, 3), dtype=np.uint8)
    for idx, rgb in inv.items():
        palette[idx] = rgb
    return palette[np.clip(label, 0, 255)]
