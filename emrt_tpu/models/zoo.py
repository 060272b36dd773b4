"""Model-zoo registry for non-EMRT models
(reference dispatch: src/models/__init__.py:14-40)."""
from __future__ import annotations

import jax.numpy as jnp


def get_zoo_model(config, dtype=jnp.float32):
    name = config.MODEL.NAME
    if "SETR" in name:
        from .setr import build_setr
        return build_setr(config, dtype=dtype)
    if "FCN" in name:
        from .fcn import FCN
        return FCN(num_classes=config.DATA.NUM_CLASSES,
                   backbone=config.MODEL.ENCODER.TYPE.lower(),
                   output_stride=config.MODEL.OUTPUT_STRIDE, dtype=dtype)
    if "UperNet" in name:
        from .upernet import build_upernet
        return build_upernet(config, dtype=dtype)
    if "Segformer" in name or "SegFormer" in name:
        from .segformer import build_segformer
        return build_segformer(config, dtype=dtype)
    if "Segmenter" in name:
        from .segmenter import build_segmenter
        return build_segmenter(config, dtype=dtype)
    if "Trans2Seg" in name:
        from .trans2seg import build_trans2seg
        return build_trans2seg(config, dtype=dtype)
    if "DPT" in name:
        from .dpt import build_dpt
        return build_dpt(config, dtype=dtype)
    raise NotImplementedError(f"model {name} is not supported yet")
