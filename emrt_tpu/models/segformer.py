"""SegFormer (reference: src/models/segformer.py:20-53 + segformer_head.py:27-98)."""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import resize_bilinear
from .backbones.mix_transformer import MixVisionTransformer
from .layers import ConvBNReLU, kaiming_normal


class SegformerHead(nn.Module):
    """Per-level 1x1 reduce -> upsample to 1/4 -> concat -> fuse -> cls."""
    channels: int = 256
    num_classes: int = 60
    align_corners: bool = False
    dropout_ratio: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        size0 = (inputs[0].shape[1], inputs[0].shape[2])
        outs = []
        for i, f in enumerate(inputs):
            y = ConvBNReLU(self.channels, 1, dtype=self.dtype,
                           name=f"conv{i}")(f, train)
            outs.append(resize_bilinear(y, size0, self.align_corners))
        out = ConvBNReLU(self.channels, 1, dtype=self.dtype,
                         name="fusion_conv")(jnp.concatenate(outs, -1), train)
        if self.dropout_ratio > 0:
            out = nn.Dropout(self.dropout_ratio)(out, deterministic=not train)
        out = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                      kernel_init=kaiming_normal, name="conv_seg")(out)
        return resize_bilinear(out, (4 * size0[0], 4 * size0[1]),
                               self.align_corners)


class Segformer(nn.Module):
    num_classes: int
    embed_dims: Sequence[int] = (64, 128, 320, 512)
    depths: Sequence[int] = (3, 8, 27, 3)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    mlp_ratio: float = 4.0
    head_channels: int = 256
    align_corners: bool = False
    dropout: float = 0.0
    drop_path: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = MixVisionTransformer(
            embed_dims=self.embed_dims, depths=self.depths,
            num_heads=self.num_heads, sr_ratios=self.sr_ratios,
            mlp_ratio=self.mlp_ratio, dropout=self.dropout,
            drop_path_rate=self.drop_path, dtype=self.dtype,
            name="encoder")(x, train)
        out = SegformerHead(self.head_channels, self.num_classes,
                            self.align_corners, dtype=self.dtype,
                            name="decoder")(feats, train)
        return [out.astype(jnp.float32)]


def build_segformer(config, dtype=jnp.float32) -> Segformer:
    trans = config.MODEL.TRANS
    return Segformer(
        num_classes=config.DATA.NUM_CLASSES,
        embed_dims=tuple(config.MODEL.SEGFORMER.IN_CHANNELS),
        depths=tuple(trans.STAGE_DEPTHS),
        num_heads=tuple(trans.NUM_HEADS or (1, 2, 5, 8)),
        sr_ratios=tuple(trans.SR_RATIOS),
        mlp_ratio=trans.MLP_RATIO or 4.0,
        head_channels=config.MODEL.SEGFORMER.CHANNELS,
        align_corners=config.MODEL.SEGFORMER.ALIGN_CORNERS,
        dropout=config.MODEL.DROPOUT,
        drop_path=config.MODEL.DROP_PATH,
        dtype=dtype,
    )
