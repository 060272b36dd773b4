"""ResNeXt and ResNeSt backbones (reference: src/models/backbones/resnext.py,
resnest.py) — alternative CNN encoders for EMRT, returning (c1..c4).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..layers import kaiming_normal
from .resnet import _BN, _conv


class ResNeXtBottleneck(nn.Module):
    """Grouped-conv bottleneck (cardinality x base_width), e.g. 64x4d."""
    features: int
    strides: int = 1
    cardinality: int = 64
    base_width: int = 4
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.features * self.base_width / 64) * self.cardinality
        identity = x
        out = _conv(width, 1)(x)
        out = _BN(self.dtype)(out, train)
        out = nn.relu(out)
        out = nn.Conv(width, (3, 3), strides=self.strides,
                      padding=[(1, 1), (1, 1)],
                      feature_group_count=self.cardinality, use_bias=False,
                      kernel_init=kaiming_normal)(out)
        out = _BN(self.dtype)(out, train)
        out = nn.relu(out)
        out = _conv(self.features * 4, 1)(out)
        out = _BN(self.dtype)(out, train)
        if self.downsample:
            identity = _conv(self.features * 4, 1, self.strides)(x)
            identity = _BN(self.dtype)(identity, train)
        return nn.relu(out + identity)


class SplitAttention(nn.Module):
    """ResNeSt split-attention over radix groups."""
    features: int
    radix: int = 2
    reduction: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, _ = x.shape
        r, c = self.radix, self.features
        splits = x.reshape(b, h, w, r, c)
        gap = jnp.mean(splits.sum(axis=3), axis=(1, 2))           # [b, c]
        inter = max(c * r // self.reduction, 32)
        att = nn.Dense(inter, dtype=self.dtype,
                       kernel_init=kaiming_normal, name="fc1")(gap)
        att = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=jnp.float32,
                           name="bn")(att).astype(self.dtype)
        att = nn.relu(att)
        att = nn.Dense(c * r, dtype=self.dtype,
                       kernel_init=kaiming_normal, name="fc2")(att)
        att = nn.softmax(att.reshape(b, r, c).astype(jnp.float32),
                         axis=1).astype(self.dtype)
        return jnp.einsum("bhwrc,brc->bhwc", splits, att)


class ResNeStBottleneck(nn.Module):
    features: int
    strides: int = 1
    radix: int = 2
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = _conv(self.features, 1)(x)
        out = _BN(self.dtype)(out, train)
        out = nn.relu(out)
        # radix-grouped conv producing radix*features channels
        out = nn.Conv(self.features * self.radix, (3, 3), strides=1,
                      padding=[(1, 1), (1, 1)],
                      feature_group_count=self.radix, use_bias=False,
                      kernel_init=kaiming_normal)(out)
        out = _BN(self.dtype)(out, train)
        out = nn.relu(out)
        out = SplitAttention(self.features, self.radix, dtype=self.dtype,
                             name="splat")(out, train)
        if self.strides > 1:  # ResNeSt uses avg-pool downsampling
            out = nn.avg_pool(out, (3, 3), strides=(self.strides,) * 2,
                              padding=[(1, 1), (1, 1)])
        out = _conv(self.features * 4, 1)(out)
        out = _BN(self.dtype)(out, train)
        if self.downsample:
            idn = x
            if self.strides > 1:
                idn = nn.avg_pool(idn, (self.strides,) * 2,
                                  strides=(self.strides,) * 2)
            identity = _conv(self.features * 4, 1, 1)(idn)
            identity = _BN(self.dtype)(identity, train)
        return nn.relu(out + identity)


class _CNNPyramid(nn.Module):
    """Shared stem + 4 stages returning (c1..c4)."""
    block: str = "resnext"        # 'resnext' | 'resnest'
    layers: tuple = (3, 4, 6, 3)
    deep_stem: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        if self.deep_stem:
            for i, ch in enumerate((32, 32, 64)):
                x = _conv(ch, 3, 2 if i == 0 else 1, name=f"stem{i}")(x)
                x = _BN(self.dtype)(x, train)
                x = nn.relu(x)
        else:
            x = nn.Conv(64, (7, 7), strides=2, padding=[(3, 3), (3, 3)],
                        use_bias=False, kernel_init=kaiming_normal)(x)
            x = _BN(self.dtype)(x, train)
            x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        def stage(x, feats, blocks, strides):
            cls = ResNeXtBottleneck if self.block == "resnext" else ResNeStBottleneck
            x = cls(feats, strides, downsample=True, dtype=self.dtype)(x, train)
            for _ in range(1, blocks):
                x = cls(feats, 1, dtype=self.dtype)(x, train)
            return x

        c1 = stage(x, 64, self.layers[0], 1)
        c2 = stage(c1, 128, self.layers[1], 2)
        c3 = stage(c2, 256, self.layers[2], 2)
        c4 = stage(c3, 512, self.layers[3], 2)
        return c1, c2, c3, c4


def resnext50_64x4d(dtype=jnp.float32):
    return _CNNPyramid(block="resnext", dtype=dtype)


def resnest50(dtype=jnp.float32):
    return _CNNPyramid(block="resnest", deep_stem=True, dtype=dtype)
