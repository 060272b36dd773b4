"""FCN head — aux segmentation head used across the zoo
(reference: src/models/decoders/fcn_head.py:19-81)."""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ...ops.resize import resize_bilinear
from ..layers import ConvBNReLU, kaiming_normal


class FCNHead(nn.Module):
    channels: int = 256
    num_convs: int = 1
    concat_input: bool = False
    dropout_ratio: float = 0.1
    num_classes: int = 60
    up_ratio: int = 16
    align_corners: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        up_size = (self.up_ratio * x.shape[1], self.up_ratio * x.shape[2])
        out = x
        for i in range(self.num_convs):
            out = ConvBNReLU(self.channels, 3, dtype=self.dtype,
                             name=f"conv{i}")(out, train)
        if self.concat_input:
            out = ConvBNReLU(self.channels, 3, dtype=self.dtype,
                             name="conv_cat")(
                jnp.concatenate([x, out], axis=-1), train)
        if self.dropout_ratio > 0:
            out = nn.Dropout(self.dropout_ratio)(out, deterministic=not train)
        out = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                      kernel_init=kaiming_normal, name="conv_seg")(out)
        return resize_bilinear(out, up_size, self.align_corners)
