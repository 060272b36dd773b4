"""yacs-compatible configuration system.

Re-implements the reference's config contract (reference:
``semantic_segmentation/config.py``) without the yacs dependency: a
``CfgNode`` tree with attribute access, recursive ``BASE:`` yaml file
inheritance (``config.py:221-232``), ``merge_from_file`` semantics, and the
full default field tree (``config.py:5-219``) so that the reference's
``EMRT_*.yaml`` / model-zoo configs parse unchanged.
"""
from __future__ import annotations

import copy
import os
from typing import Any

import yaml


class CfgNode(dict):
    """A dict with attribute access and freeze semantics (yacs-compatible)."""

    IMMUTABLE = "__immutable__"

    def __init__(self, init_dict=None):
        init_dict = init_dict or {}
        super().__init__()
        object.__setattr__(self, CfgNode.IMMUTABLE, False)
        for k, v in init_dict.items():
            self[k] = CfgNode(v) if isinstance(v, dict) else v

    # -- attribute access -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        if name in self:
            return self[name]
        raise AttributeError(name)

    def __setattr__(self, name: str, value: Any) -> None:
        if object.__getattribute__(self, CfgNode.IMMUTABLE):
            raise AttributeError(f"Attempted to set {name} on an immutable CfgNode")
        self[name] = CfgNode(value) if isinstance(value, dict) and not isinstance(value, CfgNode) else value

    # -- freeze / clone ----------------------------------------------------
    def freeze(self) -> None:
        self._set_immutable(True)

    def defrost(self) -> None:
        self._set_immutable(False)

    def is_frozen(self) -> bool:
        return object.__getattribute__(self, CfgNode.IMMUTABLE)

    def _set_immutable(self, val: bool) -> None:
        object.__setattr__(self, CfgNode.IMMUTABLE, val)
        for v in self.values():
            if isinstance(v, CfgNode):
                v._set_immutable(val)

    def clone(self) -> "CfgNode":
        return copy.deepcopy(self)

    def __deepcopy__(self, memo):
        new = CfgNode()
        memo[id(self)] = new
        for k, v in self.items():
            dict.__setitem__(new, k, copy.deepcopy(v, memo))
        object.__setattr__(new, CfgNode.IMMUTABLE, False)
        return new

    # -- merging -----------------------------------------------------------
    def merge_from_dict(self, other: dict) -> None:
        was_frozen = self.is_frozen()
        if was_frozen:
            self.defrost()
        for k, v in other.items():
            if isinstance(v, dict) and isinstance(self.get(k), CfgNode):
                self[k].merge_from_dict(v)
            else:
                self[k] = CfgNode(v) if isinstance(v, dict) else _coerce(v, self.get(k))
        if was_frozen:
            self.freeze()

    def merge_from_file(self, cfg_file: str) -> None:
        with open(cfg_file, "r") as f:
            loaded = yaml.safe_load(f) or {}
        self.merge_from_dict(loaded)

    def merge_from_list(self, opts) -> None:
        assert len(opts) % 2 == 0, "override list must be key/value pairs"
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            # yacs contract: CLI overrides may only touch existing keys —
            # a typo'd key (e.g. TRAIN.SAVE_DIR for the top-level SAVE_DIR,
            # or TRIAN.ITERS at any segment) must fail loudly with the same
            # descriptive message, not a bare KeyError or silent ignore
            for p in parts[:-1]:
                if p not in node or not isinstance(node[p], CfgNode):
                    raise KeyError(
                        f"unknown config override key {key!r} (no such "
                        f"section {p!r}); CLI opts can only set keys that "
                        f"exist in the config tree")
                node = node[p]
            if parts[-1] not in node:
                raise KeyError(
                    f"unknown config override key {key!r}; CLI opts can only "
                    f"set keys that exist in the config tree")
            node[parts[-1]] = _coerce(value, node.get(parts[-1]))

    def dump(self) -> str:
        def to_plain(node):
            return {k: to_plain(v) if isinstance(v, CfgNode) else v for k, v in node.items()}

        return yaml.safe_dump(to_plain(self), sort_keys=False)


def _coerce(value: Any, old: Any) -> Any:
    """Coerce yaml-loaded strings to the type of the default where sensible."""
    if old is None or value is None:
        return value
    if isinstance(old, bool) and isinstance(value, str):
        return value.lower() in ("true", "1", "yes")
    if isinstance(old, (int, float)) and isinstance(value, str):
        try:
            return type(old)(float(value))
        except ValueError:
            return value
    if isinstance(value, str):
        # the reference's yamls write tuples like "(256, 256)" as strings
        s = value.strip()
        if s.startswith("(") and s.endswith(")"):
            value = tuple(yaml.safe_load("[" + s[1:-1] + "]"))
    if isinstance(old, tuple) and isinstance(value, list):
        return tuple(value)
    return value


# ---------------------------------------------------------------------------
# Default configuration tree — field-compatible with reference config.py:5-219.
# ---------------------------------------------------------------------------
_C = CfgNode()
_C.BASE = [""]

_C.DATA = CfgNode()
_C.DATA.BATCH_SIZE = 4            # train batch size per process
_C.DATA.BATCH_SIZE_VAL = 1        # val batch size per process
_C.DATA.DATASET = "PascalContext"
_C.DATA.DATA_PATH = ""
_C.DATA.CROP_SIZE = (480, 480)    # training input size
_C.DATA.NUM_CLASSES = 60
_C.DATA.NUM_WORKERS = 0

_C.MODEL = CfgNode()
_C.MODEL.NAME = "SETR_MLA"
_C.MODEL.ENCODER = CfgNode()
_C.MODEL.ENCODER.TYPE = "ViT_MLA"
_C.MODEL.ENCODER.OUT_INDICES = [5, 11, 17, 23]
_C.MODEL.ENCODER.MULTI_GRID = False
_C.MODEL.ENCODER.MULTI_DILATION = None
_C.MODEL.DECODER_TYPE = "ViT_MLAHead"
_C.MODEL.RESUME = None
_C.MODEL.PRETRAINED = None
_C.MODEL.NUM_CLASSES = 1000
_C.MODEL.DROPOUT = 0.0
_C.MODEL.ATTENTION_DROPOUT = 0.0
_C.MODEL.DROP_PATH = 0.1
_C.MODEL.OUTPUT_STRIDE = 16
_C.MODEL.BACKBONE_SCALE = 1.0

_C.MODEL.TRANS = CfgNode()
_C.MODEL.TRANS.HYBRID = False
_C.MODEL.TRANS.PATCH_GRID = None
_C.MODEL.TRANS.PATCH_SIZE = None
_C.MODEL.TRANS.HIDDEN_SIZE = 768
_C.MODEL.TRANS.MLP_RATIO = 4
_C.MODEL.TRANS.QKV_BIAS = True
_C.MODEL.TRANS.WINDOW_SIZE = 7
_C.MODEL.TRANS.IN_CHANNELS = 3
_C.MODEL.TRANS.EMBED_DIM = 96
_C.MODEL.TRANS.STAGE_DEPTHS = [2, 2, 6, 2]
_C.MODEL.TRANS.NUM_HEADS = None
_C.MODEL.TRANS.NUM_LAYERS = None
_C.MODEL.TRANS.QK_SCALE = None
_C.MODEL.TRANS.APE = False
_C.MODEL.TRANS.PATCH_NORM = True
_C.MODEL.TRANS.KEEP_CLS_TOKEN = False
_C.MODEL.TRANS.NUM_STAGES = 4
_C.MODEL.TRANS.STRIDES = [4, 2, 2, 2]
_C.MODEL.TRANS.SR_RATIOS = [8, 4, 2, 1]
_C.MODEL.TRANS.SPLIT_SIZES = None
_C.MODEL.TRANS.FOCAL_STAGES = None
_C.MODEL.TRANS.FOCAL_LEVELS = None
_C.MODEL.TRANS.FOCAL_WINDOWS = None
_C.MODEL.TRANS.EXPAND_STAGES = None
_C.MODEL.TRANS.EXPAND_SIZES = None
_C.MODEL.TRANS.USE_CONV_EMBED = True

_C.MODEL.MLA = CfgNode()
_C.MODEL.MLA.MLA_CHANNELS = 256
_C.MODEL.MLA.MLAHEAD_CHANNELS = 128
_C.MODEL.MLA.AUXIHEAD = False
_C.MODEL.MLA.MLAHEAD_ALIGN_CORNERS = False

_C.MODEL.PUP = CfgNode()
_C.MODEL.PUP.INPUT_CHANNEL = 1024
_C.MODEL.PUP.NUM_CONV = 4
_C.MODEL.PUP.NUM_UPSAMPLE_LAYER = 4
_C.MODEL.PUP.CONV3x3_CONV1x1 = True
_C.MODEL.PUP.ALIGN_CORNERS = False

_C.MODEL.AUXPUP = CfgNode()
_C.MODEL.AUXPUP.INPUT_CHANNEL = 1024
_C.MODEL.AUXPUP.NUM_CONV = 2
_C.MODEL.AUXPUP.NUM_UPSAMPLE_LAYER = 2
_C.MODEL.AUXPUP.CONV3x3_CONV1x1 = True
_C.MODEL.AUXPUP.ALIGN_CORNERS = False

_C.MODEL.UPERHEAD = CfgNode()
_C.MODEL.UPERHEAD.IN_CHANNELS = [96, 192, 384, 768]
_C.MODEL.UPERHEAD.CHANNELS = 512
_C.MODEL.UPERHEAD.IN_INDEX = [0, 1, 2, 3]
_C.MODEL.UPERHEAD.POOL_SCALES = [1, 2, 3, 6]
_C.MODEL.UPERHEAD.DROP_RATIO = 0.1
_C.MODEL.UPERHEAD.ALIGN_CORNERS = False

_C.MODEL.AUX = CfgNode()
_C.MODEL.AUX.AUXIHEAD = True
_C.MODEL.AUX.AUXHEAD_ALIGN_CORNERS = False
_C.MODEL.AUX.LOSS = True
_C.MODEL.AUX.AUX_WEIGHT = 0.4

_C.MODEL.AUXFCN = CfgNode()
_C.MODEL.AUXFCN.IN_CHANNELS = 384
_C.MODEL.AUXFCN.UP_RATIO = 16

_C.MODEL.DPT = CfgNode()
_C.MODEL.DPT.HIDDEN_FEATURES = [256, 512, 1024, 1024]
_C.MODEL.DPT.FEATURES = 256
_C.MODEL.DPT.READOUT_PROCESS = "project"

_C.MODEL.SEGMENTER = CfgNode()
_C.MODEL.SEGMENTER.NUM_LAYERS = 2

_C.MODEL.SEGFORMER = CfgNode()
_C.MODEL.SEGFORMER.IN_CHANNELS = [32, 64, 160, 256]
_C.MODEL.SEGFORMER.CHANNELS = 256
_C.MODEL.SEGFORMER.ALIGN_CORNERS = False

_C.MODEL.TRANS2SEG = CfgNode()
_C.MODEL.TRANS2SEG.EMBED_DIM = 256
_C.MODEL.TRANS2SEG.DEPTH = 4
_C.MODEL.TRANS2SEG.NUM_HEADS = 8
_C.MODEL.TRANS2SEG.MLP_RATIO = 3.0
_C.MODEL.TRANS2SEG.HID_DIM = 64

_C.MODEL.RSDECODER = CfgNode()
_C.MODEL.RSDECODER.EMBED_DIM = 256
_C.MODEL.RSDECODER.DEPTH = 4
_C.MODEL.RSDECODER.NUM_HEADS = 8
_C.MODEL.RSDECODER.MLP_RATIO = 3.0
_C.MODEL.RSDECODER.HID_DIM = 64

_C.MODEL.DEFORMABLE = CfgNode()
_C.MODEL.DEFORMABLE.EMBED_DIM = 256
_C.MODEL.DEFORMABLE.DEPTH = 4
_C.MODEL.DEFORMABLE.NUM_HEADS = 8
_C.MODEL.DEFORMABLE.MLP_RATIO = 3.0
_C.MODEL.DEFORMABLE.HID_DIM = 64

_C.TRAIN = CfgNode()
_C.TRAIN.LOSS = "MixSoftmaxCrossEntropyLoss"
_C.TRAIN.WEIGHTS = [1, 0.4, 0.4, 0.4, 0.4]
_C.TRAIN.USE_GPU = True
_C.TRAIN.LAST_EPOCH = 0
_C.TRAIN.BASE_LR = 0.001
_C.TRAIN.END_LR = 1e-4
_C.TRAIN.DECODER_LR_COEF = 1.0
_C.TRAIN.ITERS = 80000
_C.TRAIN.POWER = 0.9
_C.TRAIN.DECAY_STEPS = 80000
_C.TRAIN.APEX = False
_C.TRAIN.IGNORE_INDEX = 255
# TPU-native additions (absent from the reference):
_C.TRAIN.DTYPE = "bfloat16"       # compute dtype for model forward/backward
_C.TRAIN.DONATE = True            # donate train-state buffers to the jitted step
# dropout-key PRNG implementation: "rbg" routes mask generation through the
# TPU hardware RngBitGenerator (~15 ms/step faster at bs32) but its bits are
# not guaranteed stable across JAX/XLA versions; "threefry2x32" restores
# bitwise-reproducible seeded runs at that cost
_C.TRAIN.RNG_IMPL = "rbg"

_C.TRAIN.LR_SCHEDULER = CfgNode()
_C.TRAIN.LR_SCHEDULER.NAME = "PolynomialDecay"
_C.TRAIN.LR_SCHEDULER.WARM_UP_STEPS = 0
_C.TRAIN.LR_SCHEDULER.WARM_UP_LR_INIT = 0.0
_C.TRAIN.LR_SCHEDULER.MILESTONES = [30, 60, 90]
_C.TRAIN.LR_SCHEDULER.POWER = 0.9
_C.TRAIN.LR_SCHEDULER.GAMMA = 0.1

_C.TRAIN.OPTIMIZER = CfgNode()
_C.TRAIN.OPTIMIZER.NAME = "SGD"
_C.TRAIN.OPTIMIZER.EPS = 1e-8
_C.TRAIN.OPTIMIZER.BETAS = (0.9, 0.999)
_C.TRAIN.OPTIMIZER.MOMENTUM = 0.9
_C.TRAIN.OPTIMIZER.NESTEROV = False
_C.TRAIN.OPTIMIZER.WEIGHT_DECAY = 0.0
_C.TRAIN.OPTIMIZER.CENTERTED = False
_C.TRAIN.OPTIMIZER.RHO = 0.95
_C.TRAIN.OPTIMIZER.GRAD_CLIP = None

_C.VAL = CfgNode()
_C.VAL.USE_GPU = True
_C.VAL.MULTI_SCALES_VAL = False
_C.VAL.SCALE_RATIOS = [0.5, 0.75, 1.0, 1.25, 1.5, 1.75]
_C.VAL.IMAGE_BASE_SIZE = None
_C.VAL.KEEP_ORI_SIZE = False
_C.VAL.RESCALE_FROM_ORI = False
_C.VAL.CROP_SIZE = [480, 480]
_C.VAL.STRIDE_SIZE = [320, 320]
_C.VAL.MEAN = [123.675, 116.28, 103.53]
_C.VAL.STD = [58.395, 57.12, 57.375]

_C.SAVE_DIR = "./output"
_C.KEEP_CHECKPOINT_MAX = 1
_C.TAG = "default"
_C.SAVE_FREQ_CHECKPOINT = 2000
_C.LOGGING_INFO_FREQ = 100
_C.VALIDATE_FREQ = 2000
_C.SEED = 0
_C.EVAL = False
_C.LOCAL_RANK = 0

# Parallelism (TPU-native addition): mesh axes sizes; -1 = all devices on axis.
_C.PARALLEL = CfgNode()
_C.PARALLEL.DATA = -1            # data-parallel axis size
_C.PARALLEL.MODEL = 1            # tensor/model axis size (for large backbones)
_C.PARALLEL.SPATIAL = 1          # spatial axis size (shard image H for big crops)


def _update_config_from_file(config: CfgNode, cfg_file: str) -> None:
    """Recursive BASE-inheritance merge (reference config.py:221-232)."""
    config.defrost()
    with open(cfg_file, "r") as f:
        yaml_cfg = yaml.safe_load(f) or {}
    for base in yaml_cfg.setdefault("BASE", [""]):
        if base:
            _update_config_from_file(config, os.path.join(os.path.dirname(cfg_file), base))
    config.merge_from_dict(yaml_cfg)
    config.freeze()


def update_config(config: CfgNode, args) -> CfgNode:
    """Update config from an argparse namespace (reference config.py:234-247)."""
    if getattr(args, "cfg", None):
        _update_config_from_file(config, args.cfg)
    config.defrost()
    if getattr(args, "pretrained_backbone", None):
        config.MODEL.PRETRAINED = args.pretrained_backbone
    if getattr(args, "opts", None):
        config.merge_from_list(args.opts)
    return config


def get_config(cfg_file: str | None = None) -> CfgNode:
    config = _C.clone()
    if cfg_file:
        _update_config_from_file(config, cfg_file)
        config.defrost()
    return config
