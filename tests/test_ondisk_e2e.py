"""On-disk dataset end-to-end: real .tif/.png trees through the CLIs.

VERDICT round-2 item 4: every CLI smoke ran on the in-memory Synthetic
dataset, so imread, file pairing, numeric sorting, label remaps and the
palette dump were never exercised against actual files. This writes a tiny
Potsdam-convention tree (train|test + *_convert_labels, .tif images paired
with .png labels, numeric-sorted — reference potsdam.py:22-77) and a
Vaihingen ADE-style tree (_noBoundary labels, label-1 remap with 254->255,
reference vaihingen.py:69-83) and drives train.py/val.py/predict.py over
them via subprocess.
"""
from __future__ import annotations

import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _write_potsdam_tree(root, n_train=4, n_test=2, size=96, n_classes=6):
    rng = np.random.default_rng(0)
    for sub, n in (("train", n_train), ("test", n_test)):
        img_dir = os.path.join(root, sub)
        lab_dir = os.path.join(root, f"{sub}_convert_labels")
        os.makedirs(img_dir), os.makedirs(lab_dir)
        # deliberately include 2-digit names: pairing must sort numerically
        names = list(range(1, n)) + [10]
        for i in names:
            img = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
            Image.fromarray(img, "RGB").save(os.path.join(img_dir, f"{i}.tif"))
            lab = rng.integers(0, n_classes, (size, size), dtype=np.uint8)
            lab[:4, :4] = 255  # ignore region
            Image.fromarray(lab, "L").save(os.path.join(lab_dir, f"{i}.png"))


def _write_vaihingen_tree(root, size=64):
    rng = np.random.default_rng(1)
    for sub in ("training", "validation"):
        img_dir = os.path.join(root, "images", sub)
        lab_dir = os.path.join(root, "annotations", sub)
        os.makedirs(img_dir), os.makedirs(lab_dir)
        img = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
        Image.fromarray(img, "RGB").save(os.path.join(img_dir, "area1.tif"))
        # stored labels are 1..C with 0=void (reference vaihingen.py:69-83)
        lab = rng.integers(1, 7, (size, size), dtype=np.uint8)
        lab[:3] = 0
        Image.fromarray(lab, "L").save(
            os.path.join(lab_dir, "area1_noBoundary.png"))


def _run(cmd, timeout=900):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    out = subprocess.run([sys.executable] + cmd, cwd=ROOT, env=env,
                         capture_output=True, text=True, timeout=timeout)
    assert out.returncode == 0, (out.stdout[-1500:], out.stderr[-3000:])
    return out.stdout + out.stderr


def test_vaihingen_isprs_loader_remap(tmp_path):
    """_noBoundary pairing + label-1/254->255 remap on real files."""
    _write_vaihingen_tree(str(tmp_path))
    from emrt_tpu.data.datasets import VaihingenISPRS
    from emrt_tpu.data.transforms import Normalize

    ds = VaihingenISPRS([Normalize()], dataset_root=str(tmp_path),
                        mode="train")
    assert len(ds) == 1
    img, lab = ds.get(0, rng=np.random.default_rng(0))
    assert img.shape == (64, 64, 3) and img.dtype == np.float32
    assert lab.shape == (64, 64)
    assert set(np.unique(lab)) <= set(range(6)) | {255}
    assert (lab[:3] == 255).all()   # void row -> ignore
    ds_val = VaihingenISPRS([Normalize()], dataset_root=str(tmp_path),
                            mode="val")
    _, lab_v = ds_val.get(0)
    assert set(np.unique(lab_v)) <= set(range(6)) | {255}


@pytest.mark.slow
def test_potsdam_tree_through_clis(tmp_path):
    """train 2 iters + val + predict over a real Potsdam-convention tree."""
    data_root = str(tmp_path / "potsdam")
    os.makedirs(data_root)
    _write_potsdam_tree(data_root)
    save_dir = str(tmp_path / "run")
    cfg = os.path.join("configs", "EMRT", "EMRT_smoke_synthetic.yaml")
    common = ["DATA.DATASET", "Potsdam", "DATA.DATA_PATH", data_root,
              "DATA.BATCH_SIZE", "2", "DATA.BATCH_SIZE_VAL", "2"]

    log = _run(["train.py", "--config", cfg, "--iters", "2",
                "SAVE_DIR", save_dir, "VALIDATE_FREQ", "2",
                "SAVE_FREQ_CHECKPOINT", "2", "LOGGING_INFO_FREQ", "1",
                *common])
    assert "[EVAL]" in log and "mIoU" in log
    best = os.path.join(save_dir, "best_model")
    assert os.path.isdir(best)

    log = _run(["val.py", "--config", cfg, "--model_path", best, *common])
    assert "final mIoU:" in log

    out_dir = str(tmp_path / "preds")
    log = _run(["predict.py", "--config", cfg, "--model_path", best,
                "--out_dir", out_dir, *common])
    pngs = sorted(os.listdir(out_dir))
    assert len(pngs) == 2 and all(p.endswith(".png") for p in pngs)
    arr = np.asarray(Image.open(os.path.join(out_dir, pngs[0])))
    assert arr.ndim == 3 and arr.shape[2] == 3   # colorized palette dump
