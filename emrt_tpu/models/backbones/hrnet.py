"""HRNet backbone (reference: src/models/backbones/hrnet.py, W18..W64).

High-resolution network: parallel multi-resolution branches with repeated
cross-resolution fusion. Returns (c1, stage2_list, stage3_list, stage4_list)
like the reference (:165-190) — EMRT_HRNet fuses each stage's branches by
upsample+concat.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops.resize import resize_bilinear
from ..layers import ConvBNReLU, kaiming_normal
from .resnet import Bottleneck, _BN, _conv


class BasicBlockHR(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = _conv(self.features, 3)(x)
        out = _BN(self.dtype)(out, train)
        out = nn.relu(out)
        out = _conv(self.features, 3)(out)
        out = _BN(self.dtype)(out, train)
        if identity.shape[-1] != self.features:
            identity = _conv(self.features, 1)(x)
            identity = _BN(self.dtype)(identity, train)
        return nn.relu(out + identity)


class FuseLayer(nn.Module):
    """Cross-resolution exchange: each output branch sums contributions from
    every input branch (1x1+upsample from finer? coarser; strided 3x3 chain
    down)."""
    channels: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        n = len(self.channels)
        outs = []
        for i in range(n):
            acc = None
            for j, xj in enumerate(xs):
                y = xj
                if j > i:      # coarser -> finer: 1x1 conv + upsample
                    y = _conv(self.channels[i], 1, name=f"up{i}_{j}")(y)
                    y = _BN(self.dtype)(y, train)
                    y = resize_bilinear(y, (xs[i].shape[1], xs[i].shape[2]))
                elif j < i:    # finer -> coarser: chain of strided 3x3
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = self.channels[i] if last else self.channels[j]
                        y = nn.Conv(ch, (3, 3), strides=2, padding="SAME",
                                        use_bias=False,
                                        kernel_init=kaiming_normal,
                                        name=f"down{i}_{j}_{k}")(y)
                        y = _BN(self.dtype)(y, train)
                        if not last:
                            y = nn.relu(y)
                acc = y if acc is None else acc + y
            outs.append(nn.relu(acc))
        return outs


class HRModule(nn.Module):
    channels: Sequence[int]
    num_blocks: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        ys = []
        for i, x in enumerate(xs):
            for b in range(self.num_blocks):
                x = BasicBlockHR(self.channels[i], dtype=self.dtype,
                                 name=f"branch{i}_block{b}")(x, train)
            ys.append(x)
        return FuseLayer(self.channels, dtype=self.dtype, name="fuse")(ys, train)


class HRNet(nn.Module):
    """HRNet-W{width}; returns (c1, [s2...], [s3...], [s4...])."""
    width: int = 48
    stage_modules: Sequence[int] = (1, 4, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.width
        chs = [w, 2 * w, 4 * w, 8 * w]
        x = x.astype(self.dtype)
        # stem: two stride-2 convs -> stride 4
        x = ConvBNReLU(64, 3, strides=2, padding="SAME", dtype=self.dtype,
                       name="stem1")(x, train)
        x = ConvBNReLU(64, 3, strides=2, padding="SAME", dtype=self.dtype,
                       name="stem2")(x, train)
        c1 = x
        # layer1: 4 bottlenecks -> 256 ch
        for b in range(4):
            x = Bottleneck(64, downsample=(b == 0), dtype=self.dtype,
                           name=f"layer1_block{b}")(x, train)

        # transitions + stages
        xs = [
            ConvBNReLU(chs[0], 3, dtype=self.dtype, name="trans1_b0")(x, train),
            ConvBNReLU(chs[1], 3, strides=2, padding="SAME", dtype=self.dtype,
                       name="trans1_b1")(x, train),
        ]
        for m in range(self.stage_modules[0]):
            xs = HRModule(chs[:2], dtype=self.dtype,
                          name=f"stage2_m{m}")(xs, train)
        st2 = list(xs)

        xs = xs + [ConvBNReLU(chs[2], 3, strides=2, padding="SAME",
                              dtype=self.dtype,
                              name="trans2_new")(xs[-1], train)]
        for m in range(self.stage_modules[1]):
            xs = HRModule(chs[:3], dtype=self.dtype,
                          name=f"stage3_m{m}")(xs, train)
        st3 = list(xs)

        xs = xs + [ConvBNReLU(chs[3], 3, strides=2, padding="SAME",
                              dtype=self.dtype,
                              name="trans3_new")(xs[-1], train)]
        for m in range(self.stage_modules[2]):
            xs = HRModule(chs, dtype=self.dtype, name=f"stage4_m{m}")(xs, train)
        st4 = list(xs)
        return c1, st2, st3, st4


def hrnet_w48(dtype=jnp.float32) -> HRNet:
    return HRNet(width=48, dtype=dtype)


def hrnet_w18(dtype=jnp.float32) -> HRNet:
    return HRNet(width=18, dtype=dtype)
