"""SETR: SEgmentation TRansformer — MLA / PUP / Naive variants
(reference: src/models/setr.py:28-170)."""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .backbones.vit import VisionTransformer
from .backbones.vit_mla import ViT_MLA
from .decoders.vit_mla_head import VIT_MLA_AUXIHead, VIT_MLAHead
from .decoders.vit_up_head import VisionTransformerUpHead


class SETR(nn.Module):
    """forward(images) -> [main, aux...] logits at input resolution.

    Decoder params are named 'decoder'/'aux_decoder*' so the solver's
    DECODER_LR_COEF label rule (reference setr.py:121-151 x10 lr) applies.
    """
    num_classes: int
    encoder_type: str = "ViT_MLA"        # 'ViT_MLA' | 'ViT'
    decoder_type: str = "VIT_MLAHead"
    patch_size: int = 16
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    out_indices: tuple = (5, 11, 17, 23)
    mla_channels: int = 256
    mlahead_channels: int = 128
    pup_num_conv: int = 4
    pup_num_upsample: int = 4
    pup_conv3x3: bool = True
    auxpup_num_conv: int = 2
    auxpup_num_upsample: int = 2
    align_corners: bool = False
    auxihead: bool = True
    dropout: float = 0.0
    attn_dropout: float = 0.0
    dtype: Any = jnp.float32

    decoder_lr_prefixes = ("decoder", "aux_decoder")

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.encoder_type == "ViT_MLA":
            p2, p3, p4, p5 = ViT_MLA(
                patch_size=self.patch_size, hidden_size=self.hidden_size,
                num_layers=self.num_layers, num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio, out_indices=self.out_indices,
                mla_channels=self.mla_channels, dropout=self.dropout,
                attn_dropout=self.attn_dropout, dtype=self.dtype,
                name="encoder")(x, train)
        else:
            p2, p3, p4, p5 = VisionTransformer(
                patch_size=self.patch_size, hidden_size=self.hidden_size,
                num_layers=self.num_layers, num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio, out_indices=self.out_indices,
                dropout=self.dropout, attn_dropout=self.attn_dropout,
                dtype=self.dtype, name="encoder")(x, train)

        preds = []
        if self.decoder_type == "VIT_MLAHead":
            preds.append(VIT_MLAHead(self.mlahead_channels, self.num_classes,
                                     self.align_corners, dtype=self.dtype,
                                     name="decoder")(p2, p3, p4, p5, train))
            if self.auxihead:
                for i, p in enumerate((p2, p3, p4, p5)):
                    preds.append(VIT_MLA_AUXIHead(
                        self.mla_channels, self.num_classes,
                        self.align_corners, dtype=self.dtype,
                        name=f"aux_decoder{i + 2}")(p, train))
        else:  # PUP / Naive
            preds.append(VisionTransformerUpHead(
                self.num_classes, self.pup_num_conv, self.pup_num_upsample,
                self.pup_conv3x3, self.align_corners, dtype=self.dtype,
                name="decoder")(p5, train))
            if self.auxihead:
                taps = (p2, p3, p4, p5) if self.decoder_type.startswith("PUP") \
                    else (p2, p3, p4)
                for i, p in enumerate(taps):
                    preds.append(VisionTransformerUpHead(
                        self.num_classes, self.auxpup_num_conv,
                        self.auxpup_num_upsample, self.pup_conv3x3,
                        self.align_corners, dtype=self.dtype,
                        name=f"aux_decoder{i + 2}")(p, train))
        return [p.astype(jnp.float32) for p in preds]


def build_setr(config, dtype=jnp.float32) -> SETR:
    trans = config.MODEL.TRANS
    return SETR(
        num_classes=config.DATA.NUM_CLASSES,
        encoder_type=config.MODEL.ENCODER.TYPE,
        decoder_type=config.MODEL.DECODER_TYPE,
        patch_size=trans.PATCH_SIZE or 16,
        hidden_size=trans.HIDDEN_SIZE,
        num_layers=trans.NUM_LAYERS or 24,
        num_heads=trans.NUM_HEADS or 16,
        mlp_ratio=trans.MLP_RATIO or 4.0,
        out_indices=tuple(config.MODEL.ENCODER.OUT_INDICES),
        mla_channels=config.MODEL.MLA.MLA_CHANNELS,
        mlahead_channels=config.MODEL.MLA.MLAHEAD_CHANNELS,
        pup_num_conv=config.MODEL.PUP.NUM_CONV,
        pup_num_upsample=config.MODEL.PUP.NUM_UPSAMPLE_LAYER,
        pup_conv3x3=config.MODEL.PUP.CONV3x3_CONV1x1,
        auxpup_num_conv=config.MODEL.AUXPUP.NUM_CONV,
        auxpup_num_upsample=config.MODEL.AUXPUP.NUM_UPSAMPLE_LAYER,
        align_corners=config.MODEL.PUP.ALIGN_CORNERS,
        auxihead=config.MODEL.AUX.AUXIHEAD,
        dropout=config.MODEL.DROPOUT,
        attn_dropout=config.MODEL.ATTENTION_DROPOUT,
        dtype=dtype,
    )
