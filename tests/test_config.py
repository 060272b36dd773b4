import os
import textwrap

from emrt_tpu.config import get_config


def test_defaults():
    cfg = get_config()
    assert cfg.DATA.BATCH_SIZE == 4
    assert cfg.TRAIN.LR_SCHEDULER.NAME == "PolynomialDecay"
    assert cfg.MODEL.AUX.AUX_WEIGHT == 0.4
    assert cfg.VAL.MEAN == [123.675, 116.28, 103.53]


def test_base_inheritance(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text(textwrap.dedent("""
        DATA:
            BATCH_SIZE: 16
            NUM_CLASSES: 6
    """))
    child = tmp_path / "child.yaml"
    child.write_text(textwrap.dedent("""
        BASE: ['base.yaml']
        DATA:
            BATCH_SIZE: 8
        TRAIN:
            BASE_LR: 0.01
    """))
    cfg = get_config(str(child))
    assert cfg.DATA.BATCH_SIZE == 8        # child overrides base
    assert cfg.DATA.NUM_CLASSES == 6       # inherited from base
    assert cfg.TRAIN.BASE_LR == 0.01


def test_reference_style_yaml(tmp_path):
    # tuple-as-string and scientific-notation values as in the reference yamls
    f = tmp_path / "emrt.yaml"
    f.write_text(textwrap.dedent("""
        DATA:
            DATASET: 'Potsdam'
            BATCH_SIZE: 8
            CROP_SIZE: (256, 256)
            NUM_CLASSES: 6
        TRAIN:
            BASE_LR: 0.01
            END_LR: 0.0
            ITERS: 160000
            OPTIMIZER:
                WEIGHT_DECAY: 1e-4
                GRAD_CLIP: 1.0
        MODEL:
            NAME: "EMRT"
            ENCODER:
                TYPE: "resnet50"
            OUTPUT_STRIDE: 32
        VAL:
            IMAGE_BASE_SIZE: 256
            CROP_SIZE: [256, 256]
    """))
    cfg = get_config(str(f))
    assert cfg.DATA.CROP_SIZE == (256, 256)
    assert cfg.TRAIN.OPTIMIZER.WEIGHT_DECAY == 1e-4
    assert cfg.TRAIN.OPTIMIZER.GRAD_CLIP == 1.0
    assert cfg.MODEL.ENCODER.TYPE == "resnet50"
    assert cfg.VAL.CROP_SIZE == [256, 256]


def test_clone_and_freeze():
    cfg = get_config()
    cfg2 = cfg.clone()
    cfg2.DATA.BATCH_SIZE = 99
    assert cfg.DATA.BATCH_SIZE == 4
    cfg.freeze()
    try:
        cfg.DATA.BATCH_SIZE = 1
        raised = False
    except AttributeError:
        raised = True
    assert raised


def test_merge_from_list_rejects_unknown_keys():
    """CLI overrides must fail loudly on typo'd keys (yacs contract) —
    e.g. TRAIN.SAVE_DIR for the top-level SAVE_DIR must not be silently
    created-and-ignored."""
    cfg = get_config()
    cfg.merge_from_list(["TRAIN.ITERS", "5", "SAVE_DIR", "/tmp/x"])
    assert cfg.TRAIN.ITERS == 5 and cfg.SAVE_DIR == "/tmp/x"
    import pytest
    with pytest.raises(KeyError):
        cfg.merge_from_list(["TRAIN.SAVE_DIR", "/tmp/y"])
    with pytest.raises(KeyError):
        cfg.merge_from_list(["DATA.BATCHSIZE", "8"])
    # typo in a NON-leaf segment gets the same descriptive error, not a
    # bare KeyError from the traversal (advisor finding, round 4)
    with pytest.raises(KeyError, match="unknown config override key"):
        cfg.merge_from_list(["TRIAN.ITERS", "5"])
    with pytest.raises(KeyError, match="unknown config override key"):
        cfg.merge_from_list(["TRAIN.OPTIMIZR.WEIGHT_DECAY", "1e-4"])


def test_all_shipped_configs_parse_and_build():
    """Every yaml in configs/ (now name-for-name with the reference's 63-file
    zoo, reference configs/**) parses through BASE inheritance and builds
    its registered model."""
    import os
    from emrt_tpu.config import get_config
    from emrt_tpu.models import get_model

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    ref_root = "/root/reference/semantic_segmentation/configs"
    n = 0
    for d, _, files in os.walk(root):
        for f in sorted(files):
            if f.endswith(".yaml"):
                path = os.path.join(d, f)
                with open(path) as fh:
                    text = fh.read()
                # A duplicate top-level BASE key silently clobbers the real
                # base via YAML last-wins (advisor finding, round 2).
                n_base = sum(1 for ln in text.splitlines()
                             if ln.startswith("BASE:"))
                assert n_base <= 1, f"{f}: duplicate BASE key"
                cfg = get_config(path)
                assert get_model(cfg, use_pallas=False) is not None, f
                # Same-named reference configs must resolve to the same
                # model family and dataset.
                rel = os.path.relpath(path, root)
                ref_path = os.path.join(ref_root, rel)
                if os.path.exists(ref_path):
                    import yaml
                    with open(ref_path) as fh:
                        ref = yaml.safe_load(fh)
                    ref_name = (ref.get("MODEL") or {}).get("NAME")
                    ref_ds = (ref.get("DATA") or {}).get("DATASET")
                    if ref_name:
                        assert cfg.MODEL.NAME == ref_name, (
                            f"{rel}: MODEL.NAME {cfg.MODEL.NAME!r} != "
                            f"reference {ref_name!r}")
                    if ref_ds:
                        assert cfg.DATA.DATASET == ref_ds, (
                            f"{rel}: DATASET {cfg.DATA.DATASET!r} != "
                            f"reference {ref_ds!r}")
                n += 1
    assert n >= 96
