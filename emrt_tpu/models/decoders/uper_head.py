"""UperNet decoder head (reference: src/models/decoders/uper_head.py:21-122
and the PPM variant in psp_head.py:20-63)."""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops.pooling import adaptive_avg_pool
from ...ops.resize import resize_bilinear
from ..layers import ConvBNReLU, kaiming_normal


class UperHead(nn.Module):
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    channels: int = 512
    num_classes: int = 60
    align_corners: bool = False
    dropout_ratio: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        # PSP over the top level
        top = inputs[-1]
        psp_outs = [top]
        for i, s in enumerate(self.pool_scales):
            y = adaptive_avg_pool(top, s)
            y = ConvBNReLU(self.channels, 1, dtype=self.dtype,
                           name=f"psp{i}")(y, train)
            psp_outs.append(resize_bilinear(y, (top.shape[1], top.shape[2]),
                                            self.align_corners))
        psp = ConvBNReLU(self.channels, 3, dtype=self.dtype,
                         name="bottleneck")(jnp.concatenate(psp_outs, -1), train)

        # FPN laterals + top-down fusion
        laterals = [ConvBNReLU(self.channels, 1, dtype=self.dtype,
                               name=f"lateral{i}")(inputs[i], train)
                    for i in range(len(inputs) - 1)]
        laterals.append(psp)
        for idx in range(len(laterals) - 1, 0, -1):
            prev = laterals[idx - 1]
            laterals[idx - 1] = prev + resize_bilinear(
                laterals[idx], (prev.shape[1], prev.shape[2]),
                self.align_corners)
        fpn_outs = [ConvBNReLU(self.channels, 3, dtype=self.dtype,
                               name=f"fpn{i}")(laterals[i], train)
                    for i in range(len(laterals) - 1)]
        fpn_outs.append(laterals[-1])
        size0 = (fpn_outs[0].shape[1], fpn_outs[0].shape[2])
        fpn_outs = [fpn_outs[0]] + [
            resize_bilinear(f, size0, self.align_corners) for f in fpn_outs[1:]]
        out = ConvBNReLU(self.channels, 3, dtype=self.dtype,
                         name="fpn_bottleneck")(jnp.concatenate(fpn_outs, -1),
                                                train)
        if self.dropout_ratio > 0:
            out = nn.Dropout(self.dropout_ratio)(out, deterministic=not train)
        out = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                      kernel_init=kaiming_normal, name="conv_seg")(out)
        return resize_bilinear(out, (4 * size0[0], 4 * size0[1]),
                               self.align_corners)
