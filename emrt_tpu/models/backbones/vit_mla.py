"""ViT-MLA backbone: ViT taps + multi-level aggregation
(reference: src/models/backbones/vit_mla.py:309-460)."""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..layers import ConvBNReLU
from .vit import VisionTransformer


class ConvMLA(nn.Module):
    """Per-tap 1x1 reduce + cumulative top-down adds + 3x3 smooth
    (reference Conv_MLA, vit_mla.py:309-407)."""
    mla_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, res2, res3, res4, res5, train: bool = False):
        p5_1x1 = ConvBNReLU(self.mla_channels, 1, dtype=self.dtype,
                            name="mla_p5_1x1")(res5, train)
        p4_1x1 = ConvBNReLU(self.mla_channels, 1, dtype=self.dtype,
                            name="mla_p4_1x1")(res4, train)
        p3_1x1 = ConvBNReLU(self.mla_channels, 1, dtype=self.dtype,
                            name="mla_p3_1x1")(res3, train)
        p2_1x1 = ConvBNReLU(self.mla_channels, 1, dtype=self.dtype,
                            name="mla_p2_1x1")(res2, train)
        p4_plus = p5_1x1 + p4_1x1
        p3_plus = p4_plus + p3_1x1
        p2_plus = p3_plus + p2_1x1
        p5 = ConvBNReLU(self.mla_channels, 3, dtype=self.dtype,
                        name="mla_p5")(p5_1x1, train)
        p4 = ConvBNReLU(self.mla_channels, 3, dtype=self.dtype,
                        name="mla_p4")(p4_plus, train)
        p3 = ConvBNReLU(self.mla_channels, 3, dtype=self.dtype,
                        name="mla_p3")(p3_plus, train)
        p2 = ConvBNReLU(self.mla_channels, 3, dtype=self.dtype,
                        name="mla_p2")(p2_plus, train)
        return p2, p3, p4, p5


class ViT_MLA(nn.Module):
    """ViT backbone with per-tap LayerNorm feeding ConvMLA."""
    patch_size: int = 16
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    out_indices: Sequence[int] = (5, 11, 17, 23)
    mla_channels: int = 256
    dropout: float = 0.0
    attn_dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = VisionTransformer(
            patch_size=self.patch_size, hidden_size=self.hidden_size,
            num_layers=self.num_layers, num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio, out_indices=tuple(self.out_indices),
            drop_prefix_after_pos=True,   # vit_mla.py:94 "For SETR"
            dropout=self.dropout, attn_dropout=self.attn_dropout,
            dtype=self.dtype, name="transformer")(x, train)
        normed = []
        for i, f in enumerate(feats):
            normed.append(nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                       name=f"norm_{i}")(f).astype(self.dtype))
        return ConvMLA(self.mla_channels, dtype=self.dtype,
                       name="mla")(*normed, train=train)
