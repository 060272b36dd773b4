"""Dataset base class (reference: src/datasets/dataset.py:23-87).

Pure-numpy host-side datasets: ``__getitem__`` returns HWC float32 images and
HW uint8/int32 labels. Device batching/sharding happens in the loader.
"""
from __future__ import annotations

import os

import numpy as np
from PIL import Image

from .transforms import Compose


class Dataset:
    """Base file-list dataset.

    mode='train': paired transforms applied; returns (img HWC f32, label HW).
    mode='val'  : transforms applied to image only; label read raw (P-mode).
    mode='test' : image only; returns (img, image_path).
    """

    def __init__(self, transforms, dataset_root, num_classes, mode="train",
                 ignore_index=255):
        if mode not in ("train", "val", "test"):
            raise ValueError(f"mode should be 'train', 'val' or 'test', got {mode}")
        if transforms is None:
            raise ValueError("`transforms` is necessary, but it is None.")
        if dataset_root and not os.path.exists(dataset_root):
            raise FileNotFoundError(f"there is no `dataset_root`: {dataset_root}.")
        self.dataset_root = dataset_root
        self.transforms = Compose(transforms)
        self.file_list: list[list[str]] = []
        self.mode = mode
        self.num_classes = num_classes
        self.ignore_index = ignore_index

    # Label post-read remap hook (identity by default; LoveDA/ADE override).
    def _remap_val_label(self, label: np.ndarray) -> np.ndarray:
        return label

    def _remap_train_label(self, label: np.ndarray) -> np.ndarray:
        return label

    def _read_val_label(self, label_path: str) -> np.ndarray:
        return np.asarray(Image.open(label_path).convert("P"))

    def __getitem__(self, idx, rng: np.random.Generator | None = None):
        image_path, label_path = self.file_list[idx]
        if self.mode == "test":
            img, _ = self.transforms(img=image_path, rng=rng)
            return img, image_path
        if self.mode == "val":
            img, _ = self.transforms(img=image_path, rng=rng)
            label = self._remap_val_label(self._read_val_label(label_path).astype(np.int32))
            return img, label
        img, label = self.transforms(img=image_path, label=label_path, rng=rng)
        return img, self._remap_train_label(label.astype(np.int32))

    def get(self, idx, rng=None):
        return self.__getitem__(idx, rng=rng)

    def __len__(self):
        return len(self.file_list)
