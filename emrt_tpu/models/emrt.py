"""EMRT: Enhancing Multiscale Representations with Transformer (flagship).

From-scratch Flax NHWC re-design of the reference model
(src/models/paddle_EMRT.py:13-304): dilated/torchvision ResNet backbone,
CNN spatial branch, pyramid-pooling tokens driving a deformable-attention
encoder-decoder, enhanced feature pyramid (EFP), PSP-token re-broadcast,
and a progressive-upsampling head plus an auxiliary FCN head.

Forward contract matches the reference: __call__(images NHWC) ->
(main_logits, aux_logits) at input resolution.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.pooling import adaptive_avg_pool
from ..ops.resize import resize_bilinear
from .backbones.resnet import resnet
from .decoders.fcn_head import FCNHead
from .deformable_transformer import EncoderDecoder, tokens_to_levels
from .layers import ConvBNReLU, kaiming_normal


class Conv2dBlock(nn.Module):
    """Two conv3x3-BN-ReLU with residual (reference paddle_EMRT.py:13-29)."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = ConvBNReLU(self.features, 3, dtype=self.dtype, name="conv1")(x, train)
        out = ConvBNReLU(self.features, 3, dtype=self.dtype, name="conv2")(out, train)
        return out + x


class EFP(nn.Module):
    """Enhanced feature pyramid: top-down residual fusion (reference :31-48)."""
    features: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x0, x1, x2, train: bool = False):
        out2 = Conv2dBlock(self.features, dtype=self.dtype, name="conv2")(x2, train)
        out2 = resize_bilinear(out2, (x1.shape[1], x1.shape[2]), align_corners=True)
        out1 = Conv2dBlock(self.features, dtype=self.dtype, name="conv1")(x1, train)
        out21 = out1 + out2
        out21 = resize_bilinear(out21, (x0.shape[1], x0.shape[2]), align_corners=True)
        out0 = Conv2dBlock(self.features, dtype=self.dtype, name="conv0")(x0, train)
        return out0 + out21


class PyramidPoolingModule(nn.Module):
    """Adaptive-pool pyramid -> 1x1 conv-BN-ReLU -> flattened tokens
    (reference :50-78). Returns [bs, sum(s^2), C] token-major."""
    pool_scales: Sequence[int] = (1, 3, 6, 8)
    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bs = x.shape[0]
        outs = []
        for i, s in enumerate(self.pool_scales):
            y = adaptive_avg_pool(x, s)
            y = ConvBNReLU(self.channels, 1, dtype=self.dtype,
                           name=f"pool_branch{i}")(y, train)
            outs.append(y.reshape(bs, s * s, self.channels))
        return jnp.concatenate(outs, axis=1)


class SpatialBranch(nn.Module):
    """3x (maxpool/2 + 2x conv3x3-BN-ReLU): 3->64->128->256 at 1/8 res
    (reference :80-113)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, ch in enumerate((64, 128, 256)):
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
            x = ConvBNReLU(ch, 3, dtype=self.dtype, name=f"enc{i}_conv1")(x, train)
            x = ConvBNReLU(ch, 3, dtype=self.dtype, name=f"enc{i}_conv2")(x, train)
        return x


class UpHead(nn.Module):
    """3x conv3x3-BN-ReLU with progressive 2x ups + 1x1 cls + final 2x
    (reference :115-181, num_conv=3 path => 8x upsample total)."""
    num_classes: int = 6
    embed_dim: int = 256
    align_corners: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNReLU(256, 3, dtype=self.dtype, name="conv0")(x, train)
        x = resize_bilinear(x, (2 * x.shape[1], 2 * x.shape[2]), self.align_corners)
        x = ConvBNReLU(256, 3, dtype=self.dtype, name="conv1")(x, train)
        x = resize_bilinear(x, (2 * x.shape[1], 2 * x.shape[2]), self.align_corners)
        x = ConvBNReLU(256, 3, dtype=self.dtype, name="conv2")(x, train)
        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    kernel_init=kaiming_normal, name="cls")(x)
        return resize_bilinear(x, (2 * x.shape[1], 2 * x.shape[2]), self.align_corners)


class EMRT(nn.Module):
    """EMRT assembly (reference :183-304)."""
    num_classes: int = 6
    backbone: str = "resnet50"
    output_stride: int = 32
    hidden_dim: int = 256
    psp_scales: Sequence[int] = (1, 3, 6, 8)
    num_encoder_layers: int = 4
    num_decoder_layers: int = 2
    nhead: int = 8
    num_points: int = 6
    dropout: float = 0.1
    # transformer-backbone settings (cswin / vit variants)
    trans_embed_dim: int = 64
    trans_depths: Sequence[int] = (1, 2, 21, 1)
    trans_heads: Sequence[int] = (2, 4, 8, 16)
    trans_splits: Sequence[int] = (1, 2, 7, 7)
    vit_hidden: int = 1024
    vit_layers: int = 24
    vit_heads: int = 16
    vit_out_indices: Sequence[int] = (9, 14, 19, 23)
    dtype: Any = jnp.float32
    use_pallas: bool = False

    def _backbone_features(self, x, train):
        """Returns (x_fea [3 levels], aux_feat) for every supported encoder.

        Covers the reference's EMRT variants without duplicating the
        encoder-decoder (the reference clones it per backbone —
        paddle_EMRT_cswin_backbone.py / _hrnet_backbone.py; we dispatch on
        the backbone name instead):
          * resnet family (paddle_EMRT.py:227-240)
          * cswin / vit with per-tap LayerNorm (cswin_backbone.py:256-296)
          * hrnet with per-stage upsample+concat fusion + strided input
            pre-projections (hrnet_backbone.py:237-260, 190-197)
          * segformer_b4 MixViT feature taps (segformer_paddleSeg.py:80-84)
        """
        name = self.backbone.lower()
        if name.startswith("resnet") and name[6:].rstrip("c").isdigit():
            from .backbones.resnet import _DEPTHS
            depth = int(name[6:].rstrip("c"))
            if depth not in _DEPTHS:
                raise NotImplementedError(
                    f"backbone {self.backbone}: no resnet depth {depth} "
                    f"(available: {sorted(_DEPTHS)})")
            bb = resnet(depth, deep_stem=name.endswith("c"),
                        output_stride=self.output_stride, dtype=self.dtype)
            c1, c2, c3, c4 = bb.copy(name="backbone")(x, train)
            return [c2, c3, c4], c3
        if name == "resnext50":
            from .backbones.resnext import resnext50_64x4d
            c1, c2, c3, c4 = resnext50_64x4d(self.dtype).copy(
                name="backbone")(x, train)
            return [c2, c3, c4], c3
        if name == "resnest50":
            from .backbones.resnext import resnest50
            c1, c2, c3, c4 = resnest50(self.dtype).copy(name="backbone")(x, train)
            return [c2, c3, c4], c3
        if name == "cswintransformer":
            from .backbones.cswin import CSwinTransformer
            feats = CSwinTransformer(embed_dim=self.trans_embed_dim,
                                     depths=tuple(self.trans_depths),
                                     num_heads=tuple(self.trans_heads),
                                     split_sizes=tuple(self.trans_splits),
                                     dtype=self.dtype, name="backbone")(x, train)
            feats = [nn.LayerNorm(dtype=jnp.float32, name=f"tap_norm{i}")(f)
                     .astype(self.dtype) for i, f in enumerate(feats)]
            return feats[1:], feats[2]
        if name == "vit":
            from .backbones.vit import VisionTransformer
            feats = VisionTransformer(hidden_size=self.vit_hidden,
                                      num_layers=self.vit_layers,
                                      num_heads=self.vit_heads,
                                      out_indices=tuple(self.vit_out_indices),
                                      dtype=self.dtype, name="backbone")(x, train)
            feats = [nn.LayerNorm(dtype=jnp.float32, name=f"tap_norm{i}")(f)
                     .astype(self.dtype) for i, f in enumerate(feats)]
            return feats[1:], feats[2]
        if name == "hrnet":
            from .backbones.hrnet import hrnet_w48
            c1, st2, st3, st4 = hrnet_w48(self.dtype).copy(
                name="backbone")(x, train)

            def fuse(stage):
                size = (stage[0].shape[1], stage[0].shape[2])
                ups = [stage[0]] + [resize_bilinear(s, size) for s in stage[1:]]
                return jnp.concatenate(ups, axis=-1)

            c2, c3, c4 = fuse(st2), fuse(st3), fuse(st4)
            # strided pre-projection to 256ch / halved resolution
            x_fea = [ConvBNReLU(self.hidden_dim, 3, strides=2,
                                dtype=self.dtype, name=f"input_pre{i}")(c, train)
                     for i, c in enumerate((c2, c3, c4))]
            return x_fea, c3
        if name == "segformer_b4":
            from .backbones.mix_transformer import mit
            feats = mit("b4", dtype=self.dtype).copy(name="backbone")(x, train)
            return feats[1:], feats[2]
        raise NotImplementedError(f"backbone {self.backbone}")

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = inputs.astype(self.dtype)
        x_fea, aux_feat = self._backbone_features(x, train)

        x_context = SpatialBranch(dtype=self.dtype,
                                  name="spatial_branch")(x, train)   # [bs, H/8, W/8, 256]
        x_psp = PyramidPoolingModule(self.psp_scales, 256, dtype=self.dtype,
                                     name="psp_module")(x_context, train)

        x_trans, memory = EncoderDecoder(
            num_queries=sum(s * s for s in self.psp_scales),
            hidden_dim=self.hidden_dim, nhead=self.nhead,
            num_feature_levels=3,
            num_encoder_layers=self.num_encoder_layers,
            num_decoder_layers=self.num_decoder_layers,
            num_encoder_points=self.num_points,
            num_decoder_points=self.num_points,
            dropout=self.dropout, dtype=self.dtype,
            use_pallas=self.use_pallas,
            name="encoder_decoder")(x_fea, x_psp, deterministic=not train)

        # unflatten memory back to the three level maps (reference :265-279)
        spatial_shapes = tuple((f.shape[1], f.shape[2]) for f in x_fea)
        m0, m1, m2 = tokens_to_levels(memory, spatial_shapes)
        x_fpn = EFP(256, dtype=self.dtype, name="efp")(m0, m1, m2, train)

        # PSP-token re-broadcast to the context grid (reference :281-291)
        ctx_hw = (x_context.shape[1], x_context.shape[2])
        cat = [x_context]
        idx = 0
        bs = x.shape[0]
        for s in self.psp_scales:
            pooled = x_trans[:, idx:idx + s * s].reshape(bs, s, s, self.hidden_dim)
            cat.append(resize_bilinear(pooled, ctx_hw, align_corners=True))
            idx += s * s
        if (x_fpn.shape[1], x_fpn.shape[2]) != ctx_hw:
            # ViT taps are all stride-16; bring the fused pyramid to the
            # 1/8 context grid (reference cswin_backbone.py:295-296)
            x_fpn = resize_bilinear(x_fpn, ctx_hw, align_corners=False)
        cat.append(x_fpn)
        psp_cat = jnp.concatenate(cat, axis=-1)   # 256 * (2 + len(scales))

        y = ConvBNReLU(512, 3, dtype=self.dtype, name="cls_psp0")(psp_cat, train)
        y = ConvBNReLU(256, 3, dtype=self.dtype, name="cls_psp1")(y, train)
        y = nn.Dropout(0.1)(y, deterministic=not train)
        main = UpHead(self.num_classes, dtype=self.dtype, name="uphead")(y, train)

        aux = FCNHead(channels=max(aux_feat.shape[-1] // 4, 16),
                      num_classes=self.num_classes,
                      up_ratio=1, dtype=self.dtype, name="auxlayer")(aux_feat, train)
        aux = resize_bilinear(aux, (inputs.shape[1], inputs.shape[2]),
                              align_corners=True)
        return main.astype(jnp.float32), aux.astype(jnp.float32)


def build_emrt(config, dtype=jnp.float32, use_pallas: bool = False) -> EMRT:
    """Build EMRT (any backbone variant) from a config node.

    MODEL.NAME containing 'EMRT_CSwin' / 'EMRT_ViT' / 'EMRT_HRNet' selects
    the respective backbone (reference registry, src/models/__init__.py:33-38);
    otherwise MODEL.ENCODER.TYPE decides."""
    name = config.MODEL.NAME
    backbone = config.MODEL.ENCODER.TYPE
    if "EMRT_CSwin" in name:
        backbone = "CSwinTransformer"
    elif "EMRT_ViT" in name:
        backbone = "ViT"
    elif "EMRT_HRNet" in name:
        backbone = "HRNet"
    trans = config.MODEL.TRANS
    heads = trans.NUM_HEADS
    head_list = tuple(heads) if isinstance(heads, (list, tuple)) else (2, 4, 8, 16)
    vit_heads = heads if isinstance(heads, int) else 16
    return EMRT(
        num_classes=config.DATA.NUM_CLASSES,
        backbone=backbone,
        output_stride=config.MODEL.OUTPUT_STRIDE,
        trans_embed_dim=trans.EMBED_DIM,
        trans_depths=tuple(trans.STAGE_DEPTHS),
        trans_heads=head_list,
        trans_splits=tuple(trans.SPLIT_SIZES or (1, 2, 7, 7)),
        vit_hidden=trans.HIDDEN_SIZE,
        vit_layers=trans.NUM_LAYERS or 24,
        vit_heads=vit_heads,
        vit_out_indices=tuple(config.MODEL.ENCODER.OUT_INDICES),
        dtype=dtype,
        use_pallas=use_pallas,
    )
