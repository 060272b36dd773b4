"""SETR PUP/Naive decoder (reference: src/models/decoders/vit_up_head.py:24-118)."""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ...ops.resize import resize_bilinear
from ..layers import kaiming_normal


class VisionTransformerUpHead(nn.Module):
    """LayerNorm + progressive conv/upsample head. Input: NHWC token map.

    num_conv=2 (Naive): conv(3x3 or 1x1)->BN->ReLU->cls->16x up.
    num_conv=4 (PUP): 4x (conv3x3-BN-ReLU + 2x up) + 1x1 cls + final 2x up.
    """
    num_classes: int = 60
    num_conv: int = 1
    num_upsample_layer: int = 1
    conv3x3_conv1x1: bool = True
    align_corners: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                         name="norm")(x).astype(self.dtype)
        h, w = x.shape[1], x.shape[2]

        def bn(y, name):
            return nn.relu(nn.BatchNorm(use_running_average=not train,
                                        momentum=0.9, epsilon=1e-5,
                                        dtype=jnp.float32,
                                        name=name)(y).astype(self.dtype))

        if self.num_conv == 2:
            k = 3 if self.conv3x3_conv1x1 else 1
            x = nn.Conv(256, (k, k), padding=[(k // 2,) * 2] * 2,
                        dtype=self.dtype, kernel_init=kaiming_normal,
                        name="conv_0")(x)
            x = bn(x, "syncbn_fc_0")
            if self.num_upsample_layer == 2:
                x = resize_bilinear(x, (4 * h, 4 * w), self.align_corners)
            x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                        kernel_init=kaiming_normal, name="conv_1")(x)
            x = resize_bilinear(x, (16 * h, 16 * w), self.align_corners)
        elif self.num_conv == 4:
            for i in range(4):
                x = nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)],
                            dtype=self.dtype, kernel_init=kaiming_normal,
                            name=f"conv_{i}")(x)
                x = bn(x, f"syncbn_fc_{i}")
                if i < 3:
                    x = resize_bilinear(x, (2 * x.shape[1], 2 * x.shape[2]),
                                        self.align_corners)
            x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                        kernel_init=kaiming_normal, name="conv_4")(x)
            x = resize_bilinear(x, (2 * x.shape[1], 2 * x.shape[2]),
                                self.align_corners)
        else:
            raise NotImplementedError(f"num_conv {self.num_conv}")
        return x
