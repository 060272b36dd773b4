"""UperNet with Swin/CSwin/Focal backbones (reference: src/models/upernet.py:30-102)."""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import resize_bilinear
from .decoders.fcn_head import FCNHead
from .decoders.uper_head import UperHead


class UperNet(nn.Module):
    num_classes: int
    encoder_type: str = "SwinTransformer"
    embed_dim: int = 96
    depths: tuple = (2, 2, 6, 2)
    num_heads: tuple = (3, 6, 12, 24)
    window_size: int = 7
    split_sizes: tuple | None = None      # CSwin
    expand_sizes: tuple | None = None     # Focal
    focal_levels: tuple | None = None
    focal_windows: tuple | None = None
    focal_stages: tuple | None = None
    use_conv_embed: bool = False
    qkv_bias: bool = True
    mlp_ratio: float = 4.0
    pool_scales: tuple = (1, 2, 3, 6)
    uper_channels: int = 512
    aux_channels: int = 256
    auxfcn_up_ratio: int = 16
    auxihead: bool = True
    drop_path: float = 0.2
    dropout: float = 0.0
    attn_dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.encoder_type == "SwinTransformer":
            from .backbones.swin import SwinTransformer
            feats = SwinTransformer(
                embed_dim=self.embed_dim, depths=self.depths,
                num_heads=self.num_heads, window_size=self.window_size,
                mlp_ratio=self.mlp_ratio, drop_path_rate=self.drop_path,
                dropout=self.dropout, attn_dropout=self.attn_dropout,
                dtype=self.dtype, name="encoder")(x, train)
        elif self.encoder_type == "CSwinTransformer":
            from .backbones.cswin import CSwinTransformer
            feats = CSwinTransformer(
                embed_dim=self.embed_dim, depths=self.depths,
                num_heads=self.num_heads, split_sizes=self.split_sizes,
                mlp_ratio=self.mlp_ratio, drop_path_rate=self.drop_path,
                dtype=self.dtype, name="encoder")(x, train)
            # the reference norms every backbone output before the head
            # (upernet.py:60-63, 97-99); Swin does this inside our backbone
            # (norm{s}) but CSwin/Focal feed raw stage features
            feats = [nn.LayerNorm(dtype=jnp.float32,
                                  name=f"layer_norm{i}")(f).astype(self.dtype)
                     for i, f in enumerate(feats)]
        elif self.encoder_type == "FocalTransformer":
            from .backbones.focal import FocalTransformer
            feats = FocalTransformer(
                embed_dim=self.embed_dim, depths=self.depths,
                num_heads=self.num_heads, window_size=self.window_size,
                expand_sizes=self.expand_sizes or (3, 3, 3, 3),
                focal_levels=self.focal_levels or (2, 2, 2, 2),
                focal_windows=self.focal_windows or (7, 5, 3, 1),
                focal_stages=self.focal_stages or (0, 1, 2, 3),
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                use_conv_embed=self.use_conv_embed, dropout=self.dropout,
                attn_dropout=self.attn_dropout,
                drop_path_rate=self.drop_path,
                dtype=self.dtype, name="encoder")(x, train)
            feats = [nn.LayerNorm(dtype=jnp.float32,
                                  name=f"layer_norm{i}")(f).astype(self.dtype)
                     for i, f in enumerate(feats)]
        else:
            raise NotImplementedError(self.encoder_type)

        preds = []
        out = UperHead(self.pool_scales, self.uper_channels, self.num_classes,
                       dtype=self.dtype, name="decoder")(feats, train)
        preds.append(resize_bilinear(out, (x.shape[1], x.shape[2])))
        if self.auxihead:
            aux = FCNHead(channels=self.aux_channels,
                          num_classes=self.num_classes, up_ratio=1,
                          dtype=self.dtype, name="aux_decoder")(feats[2], train)
            preds.append(resize_bilinear(aux, (x.shape[1], x.shape[2])))
        return [p.astype(jnp.float32) for p in preds]


def build_upernet(config, dtype=jnp.float32) -> UperNet:
    trans = config.MODEL.TRANS
    return UperNet(
        num_classes=config.DATA.NUM_CLASSES,
        encoder_type=config.MODEL.ENCODER.TYPE,
        embed_dim=trans.EMBED_DIM,
        depths=tuple(trans.STAGE_DEPTHS),
        num_heads=tuple(trans.NUM_HEADS or (3, 6, 12, 24)),
        window_size=trans.WINDOW_SIZE or 7,
        split_sizes=tuple(trans.SPLIT_SIZES) if trans.SPLIT_SIZES else None,
        expand_sizes=tuple(trans.EXPAND_SIZES) if trans.EXPAND_SIZES else None,
        focal_levels=tuple(trans.FOCAL_LEVELS) if trans.FOCAL_LEVELS else None,
        focal_windows=(tuple(trans.FOCAL_WINDOWS)
                       if trans.FOCAL_WINDOWS else None),
        focal_stages=tuple(trans.FOCAL_STAGES) if trans.FOCAL_STAGES else None,
        use_conv_embed=bool(trans.USE_CONV_EMBED),
        qkv_bias=bool(trans.QKV_BIAS),
        mlp_ratio=trans.MLP_RATIO or 4.0,
        pool_scales=tuple(config.MODEL.UPERHEAD.POOL_SCALES),
        uper_channels=config.MODEL.UPERHEAD.CHANNELS,
        auxfcn_up_ratio=config.MODEL.AUXFCN.UP_RATIO,
        auxihead=config.MODEL.AUX.AUXIHEAD,
        drop_path=config.MODEL.DROP_PATH,
        dropout=config.MODEL.DROPOUT,
        attn_dropout=config.MODEL.ATTENTION_DROPOUT,
        dtype=dtype,
    )
