"""Concrete datasets (reference: src/datasets/*.py).

Label conventions preserved exactly:
  * Potsdam/Vaihingen (registry alias): labels already 0..C-1, ignore 255
    (reference potsdam.py:22-77; the 'Vaihingen' name maps to the Potsdam
    directory layout via the registry, src/datasets/__init__.py:49-57).
  * VaihingenISPRS (ADE-style layout, reference vaihingen.py): label-1 with
    254->255 remap.
  * LoveDA (reference loveda.py:21-72): label-1, 254->255 and -1->255.
  * ADE20K (reference ade.py): label-1, 254->255.
"""
from __future__ import annotations

import glob
import os

import numpy as np
from PIL import Image

from .dataset import Dataset


class Potsdam(Dataset):
    """ISPRS Potsdam tiles: train|test dirs + *_convert_labels .tif/.png pairs."""

    def __init__(self, transforms, dataset_root=None, mode="train", num_classes=6):
        super().__init__(transforms, dataset_root, num_classes, mode)
        sub = {"train": ("train", "train_convert_labels"),
               "val": ("test", "test_convert_labels"),
               "test": ("test", "test_convert_labels")}[mode]
        img_dir = os.path.join(dataset_root, sub[0])
        label_dir = os.path.join(dataset_root, sub[1])
        img_files = sorted(os.listdir(img_dir), key=lambda x: int(x[:-4]))
        for f in img_files:
            self.file_list.append([os.path.join(img_dir, f),
                                   os.path.join(label_dir, f.rsplit(".", 1)[0] + ".png")])

    def _read_val_label(self, label_path):
        # Potsdam val labels are plain index maps; read without P conversion
        # (reference potsdam.py:69-75 reads with bare Image.open).
        return np.asarray(Image.open(label_path))


class VaihingenISPRS(Dataset):
    """ADE-style Vaihingen layout with _noBoundary labels (reference vaihingen.py)."""

    def __init__(self, transforms, dataset_root=None, mode="train", num_classes=6):
        super().__init__(transforms, dataset_root, num_classes, mode)
        sub = "training" if mode == "train" else "validation"
        img_dir = os.path.join(dataset_root, "images", sub)
        label_dir = os.path.join(dataset_root, "annotations", sub)
        for f in sorted(os.listdir(img_dir)):
            self.file_list.append([os.path.join(img_dir, f),
                                   os.path.join(label_dir, f.replace(".tif", "_noBoundary.png"))])

    def _remap_train_label(self, label):
        label = label - 1
        label[label == 254] = 255
        label[label == -1] = 255
        return label

    def _remap_val_label(self, label):
        return self._remap_train_label(label)

    def _read_val_label(self, label_path):
        return np.asarray(Image.open(label_path))


class LoveDA(Dataset):
    """LoveDA urban+rural (reference loveda.py:21-72): 7 classes, label-1 remap."""

    def __init__(self, transforms, dataset_root=None, mode="train", num_classes=7):
        super().__init__(transforms, dataset_root, num_classes, mode)
        sub = "Train" if mode == "train" else "Val"
        img_dir = os.path.join(dataset_root, sub, "images_png")
        label_dir = os.path.join(dataset_root, sub, "masks_png")
        for f in sorted(os.listdir(img_dir), key=lambda x: int(x[:-4])):
            self.file_list.append([os.path.join(img_dir, f), os.path.join(label_dir, f)])

    def _remap_train_label(self, label):
        label = label - 1
        label[label == 254] = 255
        label[label == -1] = 255
        return label

    def _remap_val_label(self, label):
        # Same convention as train: raw 0 (ignore) must land on 255, not -1
        # (the reference reads val labels as uint8 where 0-1 wraps to 255).
        return self._remap_train_label(label)

    def _read_val_label(self, label_path):
        return np.asarray(Image.open(label_path))


class ADE20K(Dataset):
    """ADE20K scenes (reference ade.py): 150 classes, label-1 with 254->255."""

    def __init__(self, transforms, dataset_root=None, mode="train", num_classes=150):
        super().__init__(transforms, dataset_root, num_classes, mode)
        sub = "training" if mode == "train" else "validation"
        img_dir = os.path.join(dataset_root, "images", sub)
        label_dir = os.path.join(dataset_root, "annotations", sub)
        for f in sorted(os.listdir(img_dir)):
            self.file_list.append([os.path.join(img_dir, f),
                                   os.path.join(label_dir, f.replace(".jpg", ".png"))])

    def _remap_train_label(self, label):
        label = label - 1
        label[label == 254] = 255
        label[label == -1] = 255
        return label

    def _remap_val_label(self, label):
        return self._remap_train_label(label)

    def _read_val_label(self, label_path):
        return np.asarray(Image.open(label_path))


class Cityscapes(Dataset):
    """Cityscapes gtFine trainIds (reference cityscapes.py:21-64)."""

    def __init__(self, transforms, dataset_root=None, mode="train", num_classes=19):
        super().__init__(transforms, dataset_root, num_classes, mode)
        img_dir = os.path.join(dataset_root, "leftImg8bit")
        label_dir = os.path.join(dataset_root, "gtFine")
        label_files = sorted(glob.glob(os.path.join(label_dir, mode, "*", "*_gtFine_labelTrainIds.png")))
        img_files = sorted(glob.glob(os.path.join(img_dir, mode, "*", "*_leftImg8bit.png")))
        self.file_list = [[i, l] for i, l in zip(img_files, label_files)]


class PascalContext(Dataset):
    """Pascal-Context 60-class (reference pascal_context.py:21-81)."""

    def __init__(self, transforms, dataset_root=None, mode="train", num_classes=60):
        super().__init__(transforms, dataset_root, num_classes, mode)
        image_set_dir = os.path.join(dataset_root, "ImageSets", "SegmentationContext")
        file_path = os.path.join(image_set_dir, f"{mode}.txt")
        img_dir = os.path.join(dataset_root, "JPEGImages")
        label_dir = os.path.join(dataset_root, "SegmentationClassContext")
        with open(file_path) as f:
            for line in f:
                line = line.strip()
                self.file_list.append([os.path.join(img_dir, line + ".jpg"),
                                       os.path.join(label_dir, line + ".png")])


class Trans10kV2(Dataset):
    """Trans10kV2 transparent objects (reference trans10k_v2.py:21-61)."""

    def __init__(self, transforms, dataset_root=None, mode="train", num_classes=12):
        super().__init__(transforms, dataset_root, num_classes, mode)
        sub = "validation" if mode == "val" else mode
        img_dir = os.path.join(dataset_root, sub, "images")
        label_dir = os.path.join(dataset_root, sub, "masks_12")
        label_files = sorted(glob.glob(os.path.join(label_dir, "*_mask.png")),
                             key=lambda x: x.split("_m")[0])
        img_files = sorted(glob.glob(os.path.join(img_dir, "*.jpg")),
                           key=lambda x: x.split(".")[0])
        self.file_list = [[i, l] for i, l in zip(img_files, label_files)]


class CocoStuff(Dataset):
    """COCO-Stuff 2017 (reference cocostuff.py)."""

    def __init__(self, transforms, dataset_root=None, mode="train", num_classes=172):
        super().__init__(transforms, dataset_root, num_classes, mode)
        img_dir = os.path.join(dataset_root, "images")
        label_dir = os.path.join(dataset_root, "annotations")
        label_files = sorted(glob.glob(os.path.join(label_dir, mode + "2017", "*.png")))
        img_files = sorted(glob.glob(os.path.join(img_dir, mode + "2017", "*.jpg")))
        self.file_list = [[i, l] for i, l in zip(img_files, label_files)]


class SyntheticDataset(Dataset):
    """In-memory random tiles for smoke tests / benchmarks (no reference analog)."""

    def __init__(self, transforms, num_samples=64, crop_size=(256, 256),
                 num_classes=6, mode="train", seed=0):
        # bypass base validation that requires a dataset_root on disk
        self.dataset_root = None
        from .transforms import Compose
        self.transforms = Compose(transforms or [])
        self.file_list = [None] * num_samples
        self.mode = mode
        self.num_classes = num_classes
        self.ignore_index = 255
        rng = np.random.default_rng(seed)
        h, w = crop_size
        self._imgs = rng.uniform(0, 255, (num_samples, h, w, 3)).astype(np.float32)
        self._labels = rng.integers(0, num_classes, (num_samples, h, w)).astype(np.int32)

    def __getitem__(self, idx, rng=None):
        img, label = self._imgs[idx], self._labels[idx]
        for op in self.transforms.transforms:
            img, label = op(img, label, rng or np.random.default_rng())
        return img, label


_REGISTRY = {
    "Potsdam": Potsdam,
    # the reference registry serves DATASET 'Vaihingen' with the Potsdam
    # loader (src/datasets/__init__.py:49-57); keep that contract.
    "Vaihingen": Potsdam,
    "VaihingenISPRS": VaihingenISPRS,
    "LoveDA": LoveDA,
    "ADE20K": ADE20K,
    "Cityscapes": Cityscapes,
    "PascalContext": PascalContext,
    "Trans10kV2": Trans10kV2,
    "CocoStuff": CocoStuff,
    "Synthetic": None,  # handled in get_dataset
}


def get_dataset(config, transforms, mode="train"):
    name = config.DATA.DATASET
    if name == "Synthetic":
        return SyntheticDataset(transforms, crop_size=tuple(config.DATA.CROP_SIZE),
                                num_classes=config.DATA.NUM_CLASSES, mode=mode)
    if name not in _REGISTRY:
        raise NotImplementedError(f"{name} dataset is not supported")
    cls = _REGISTRY[name]
    ds_mode = "val" if (mode in ("val", "test") and name in ("Potsdam", "Vaihingen", "LoveDA")) else mode
    return cls(transforms=transforms, dataset_root=config.DATA.DATA_PATH,
               num_classes=config.DATA.NUM_CLASSES, mode=ds_mode)
