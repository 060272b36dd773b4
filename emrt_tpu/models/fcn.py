"""FCN baseline: resnet50c encoder + 1x1 head (reference: src/models/fcn.py:22-64)."""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import resize_bilinear
from .backbones.resnet import resnet
from .layers import ConvBNReLU, kaiming_normal


class FCN(nn.Module):
    num_classes: int
    backbone: str = "resnet50c"
    output_stride: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        deep_stem = self.backbone.endswith("c")
        depth = int("".join(ch for ch in self.backbone if ch.isdigit()))
        bb = resnet(depth, deep_stem=deep_stem,
                    output_stride=self.output_stride,
                    dtype=self.dtype).copy(name="cnn_encoder")
        c1, c2, c3, c4 = bb(x.astype(self.dtype), train)
        y = ConvBNReLU(256, 1, dtype=self.dtype, name="head_conv")(c4, train)
        y = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    kernel_init=kaiming_normal, name="head_cls")(y)
        out = resize_bilinear(y, (x.shape[1], x.shape[2]), align_corners=False)
        return [out.astype(jnp.float32)]
