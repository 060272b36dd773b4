"""SETR-MLA decoder heads (reference: src/models/decoders/vit_mla_head.py:20-156
and vit_mla_auxi_head.py:20-62)."""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ...ops.resize import resize_bilinear
from ..layers import ConvBNReLU, kaiming_normal


class VIT_MLAHead(nn.Module):
    """4 branch heads (2x conv3x3-BN-ReLU) -> 4x up -> concat -> cls -> 16x."""
    mlahead_channels: int = 128
    num_classes: int = 60
    align_corners: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mla_p2, mla_p3, mla_p4, mla_p5, train: bool = False):
        h, w = mla_p2.shape[1], mla_p2.shape[2]
        outs = []
        for i, p in enumerate((mla_p2, mla_p3, mla_p4, mla_p5)):
            y = ConvBNReLU(self.mlahead_channels, 3, dtype=self.dtype,
                           name=f"head{i + 2}_conv0")(p, train)
            y = ConvBNReLU(self.mlahead_channels, 3, dtype=self.dtype,
                           name=f"head{i + 2}_conv1")(y, train)
            outs.append(resize_bilinear(y, (4 * h, 4 * w), align_corners=True))
        x = jnp.concatenate(outs, axis=-1)
        x = nn.Conv(self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, kernel_init=kaiming_normal,
                    name="cls")(x)
        return resize_bilinear(x, (16 * h, 16 * w), self.align_corners)


class VIT_MLA_AUXIHead(nn.Module):
    """1x1 cls conv + 16x upsample aux head."""
    in_channels: int = 256
    num_classes: int = 60
    align_corners: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        if self.in_channels == 1024:
            x = nn.Conv(256, (1, 1), use_bias=False, dtype=self.dtype,
                        kernel_init=kaiming_normal, name="aux_0")(x)
            x = nn.Conv(self.num_classes, (1, 1), use_bias=False,
                        dtype=self.dtype, kernel_init=kaiming_normal,
                        name="aux_1")(x)
        else:
            x = nn.Conv(self.num_classes, (1, 1), use_bias=False,
                        dtype=self.dtype, kernel_init=kaiming_normal,
                        name="aux")(x)
        return resize_bilinear(x, (16 * h, 16 * w), self.align_corners)
