"""ResNet backbones (NHWC Flax).

Covers both reference variants:
  * torchvision-style ``resnet50`` — the default EMRT backbone
    (reference src/models/backbones/paddle_vision_resnet.py; returns
    c1..c4 at strides 4/8/16/32), plus resnet18/34/101/152 depths.
  * ``resnet50c`` — deep-stem (3x 3x3 convs) dilated ResNet with
    OUTPUT_STRIDE 32/16/8 via dilations [1,1]/[1,2]/[2,4]
    (reference src/models/backbones/resnet.py:107-252).

TPU-first: NHWC layout so convs lower directly onto the MXU, BatchNorm in
f32 with bf16 compute, no Python control flow on traced values.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..layers import kaiming_normal


def _conv(features, kernel, strides=1, dilation=1, name=None):
    pad = dilation * (kernel // 2)
    return nn.Conv(features, (kernel, kernel), strides=strides,
                   kernel_dilation=dilation, padding=[(pad, pad), (pad, pad)],
                   use_bias=False, kernel_init=kaiming_normal, name=name)


class _BN(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=jnp.float32)(x).astype(self.dtype)


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = _conv(self.features, 3, self.strides, self.dilation)(x)
        out = _BN(self.dtype)(out, train)
        out = nn.relu(out)
        out = _conv(self.features, 3, 1, self.dilation)(out)
        out = _BN(self.dtype)(out, train)
        if self.downsample:
            identity = _conv(self.features, 1, self.strides)(x)
            identity = _BN(self.dtype)(identity, train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = _conv(self.features, 1)(x)
        out = _BN(self.dtype)(out, train)
        out = nn.relu(out)
        out = _conv(self.features, 3, self.strides, self.dilation)(out)
        out = _BN(self.dtype)(out, train)
        out = nn.relu(out)
        out = _conv(self.features * 4, 1)(out)
        out = _BN(self.dtype)(out, train)
        if self.downsample:
            identity = _conv(self.features * 4, 1, self.strides)(x)
            identity = _BN(self.dtype)(identity, train)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Feature-pyramid ResNet; __call__ returns (c1, c2, c3, c4)."""
    layers: Sequence[int] = (3, 4, 6, 3)
    block: str = "bottleneck"           # 'basic' | 'bottleneck'
    deep_stem: bool = False
    output_stride: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls = Bottleneck if self.block == "bottleneck" else BasicBlock
        if self.output_stride == 32:
            dilations, strides = (1, 1), (2, 2)
        elif self.output_stride == 16:
            dilations, strides = (1, 2), (2, 1)
        elif self.output_stride == 8:
            dilations, strides = (2, 4), (1, 1)
        else:
            raise NotImplementedError(f"output_stride {self.output_stride}")

        x = x.astype(self.dtype)
        if self.deep_stem:
            x = _conv(64, 3, 2)(x)
            x = _BN(self.dtype)(x, train)
            x = nn.relu(x)
            x = _conv(64, 3, 1)(x)
            x = _BN(self.dtype)(x, train)
            x = nn.relu(x)
            x = _conv(128, 3, 1)(x)
            x = _BN(self.dtype)(x, train)
            x = nn.relu(x)
        else:
            x = nn.Conv(64, (7, 7), strides=2, padding=[(3, 3), (3, 3)],
                        use_bias=False, kernel_init=kaiming_normal)(x)
            x = _BN(self.dtype)(x, train)
            x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        def stage(x, features, blocks, strides, dilation):
            # first block dilation follows reference _make_layer: dilation
            # in (1,2) -> 1, dilation 4 -> 2 for the strided block
            first_dil = 1 if dilation in (1, 2) else 2
            x = block_cls(features, strides, first_dil, downsample=True,
                          dtype=self.dtype)(x, train)
            for _ in range(1, blocks):
                x = block_cls(features, 1, dilation, dtype=self.dtype)(x, train)
            return x

        c1 = stage(x, 64, self.layers[0], 1, 1)
        c2 = stage(c1, 128, self.layers[1], 2, 1)
        c3 = stage(c2, 256, self.layers[2], strides[0], dilations[0])
        c4 = stage(c3, 512, self.layers[3], strides[1], dilations[1])
        return c1, c2, c3, c4


_DEPTHS = {
    18: ((2, 2, 2, 2), "basic"),
    34: ((3, 4, 6, 3), "basic"),
    50: ((3, 4, 6, 3), "bottleneck"),
    101: ((3, 4, 23, 3), "bottleneck"),
    152: ((3, 8, 36, 3), "bottleneck"),
}


def resnet(depth: int, deep_stem: bool = False, output_stride: int = 32,
           dtype=jnp.float32) -> ResNet:
    layers, block = _DEPTHS[depth]
    return ResNet(layers=layers, block=block, deep_stem=deep_stem,
                  output_stride=output_stride, dtype=dtype)


def backbone_channels(depth: int) -> list[int]:
    """(c1..c4) channel counts."""
    if depth in (18, 34):
        return [64, 128, 256, 512]
    return [256, 512, 1024, 2048]
