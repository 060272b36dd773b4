"""Trans2Seg: transparent-object segmentation transformer
(reference: src/models/trans2seg.py:24-108,
backbones/trans2seg_transformer.py:84-421, decoders/trans2seg_head.py:21-130).

resnet50c features -> linear hybrid embed -> flat transformer encoder with
cls token + resizable pos embed -> class-prototype decoder whose per-class
attention maps are fused with CNN features by a separable-conv head.

Faithful quirks preserved: the decoder's doubled residuals
(query = query + drop_path(query), etc., reference
trans2seg_transformer.py:251-266) and pre-softmax attention logits as the
returned maps (reference :155-176).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import resize_bilinear
from .backbones.resnet import resnet
from .layers import Mlp, MultiHeadAttention, xavier_uniform


class AttentionDecoder(nn.Module):
    """Class-prototype cross-attention returning (pre-softmax maps, query)."""
    dim: int
    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, x, deterministic: bool = True):
        b, n, c = x.shape
        n_class = q.shape[1]
        head_dim = self.dim // self.num_heads
        q = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                     kernel_init=xavier_uniform, name="fc_q")(q)
        # reference quirk (trans2seg_transformer.py:161): fc_q output
        # [B, n_class, C] is reshaped HEAD-MAJOR to [B, nh, n_class, hd]
        # (NOT a per-class head split) and the attention output is merged
        # back the same head-major way (:171) — trained checkpoints bake
        # this scramble in, so parity requires reproducing it exactly
        # (verified by the torch oracle)
        q = q.reshape(b, self.num_heads, n_class, head_dim)
        kv = nn.Dense(self.dim * 2, use_bias=False, dtype=self.dtype,
                      kernel_init=xavier_uniform, name="fc_kv")(x)
        kv = kv.reshape(b, n, 2, self.num_heads, head_dim)
        k, v = kv[:, :, 0], kv[:, :, 1]
        attn_logits = jnp.einsum("bhqd,bkhd->bhqk", q, k,
                                 preferred_element_type=jnp.float32)
        attn_logits = attn_logits * head_dim ** -0.5
        attn = nn.softmax(attn_logits, axis=-1).astype(self.dtype)
        # [b, nh, n_class, hd] flattened row-major -> [b, n_class, C] (:171)
        out = jnp.einsum("bhqk,bkhd->bhqd", attn, v).reshape(b, n_class, self.dim)
        out = nn.Dense(self.dim, dtype=self.dtype, kernel_init=xavier_uniform,
                       name="proj")(out)
        # maps: [b, n_class, n_heads, HW] pre-softmax (reference :175)
        return jnp.swapaxes(attn_logits, 1, 2).astype(self.dtype), out


class BlockDecoder(nn.Module):
    dim: int
    num_heads: int
    feat_hw: int
    mlp_ratio: float = 3.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, feat, deterministic: bool = True):
        qn = nn.LayerNorm(dtype=jnp.float32, name="norm1_clsembed")(query).astype(self.dtype)
        fn = nn.LayerNorm(dtype=jnp.float32, name="norm1")(feat).astype(self.dtype)
        attn, query2 = AttentionDecoder(self.dim, self.num_heads,
                                        dtype=self.dtype, name="attn")(
            qn, fn, deterministic)
        # reference keeps these doubled residuals (:251-266)
        query = query2 + query2
        query = query + Mlp(int(self.dim * self.mlp_ratio), self.dim,
                            dtype=self.dtype, name="mlp")(
            nn.LayerNorm(dtype=jnp.float32, name="norm2")(query).astype(self.dtype),
            deterministic)
        feat = feat + feat
        feat = feat + Mlp(int(self.dim * self.mlp_ratio), self.dim,
                          dtype=self.dtype, name="mlp2")(
            nn.LayerNorm(dtype=jnp.float32, name="norm3")(feat).astype(self.dtype),
            deterministic)
        attn = attn + attn
        attn = attn + Mlp(self.feat_hw * 3, self.feat_hw, dtype=self.dtype,
                          name="mlp3")(
            nn.LayerNorm(dtype=jnp.float32, name="norm4")(attn).astype(self.dtype),
            deterministic)
        return attn, query, feat


class SeparableConvBlock(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        x = nn.Conv(c_in, (3, 3), padding=[(1, 1), (1, 1)],
                    feature_group_count=c_in, use_bias=False,
                    dtype=self.dtype, kernel_init=xavier_uniform,
                    name="depthwise")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         name="bn_depth")(x).astype(self.dtype)
        x = nn.relu(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=xavier_uniform, name="pointwise")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         name="bn_point")(x).astype(self.dtype)
        return nn.relu(x)


class Trans2Seg(nn.Module):
    num_classes: int
    backbone: str = "resnet50c"
    output_stride: int = 16
    embed_dim: int = 256
    depth: int = 4
    num_heads: int = 8
    mlp_ratio: float = 3.0
    hid_dim: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        det = not train
        bb = resnet(50, deep_stem=self.backbone.endswith("c"),
                    output_stride=self.output_stride,
                    dtype=self.dtype).copy(name="cnn_encoder")
        c1, c2, c3, c4 = bb(x.astype(self.dtype), train)
        b, h, w, _ = c4.shape
        hw = h * w

        # hybrid embed: flatten + linear 2048 -> 256 (trans2seg_head.py:96)
        tokens = nn.Dense(self.embed_dim, dtype=self.dtype,
                          kernel_init=xavier_uniform,
                          name="hybrid_embed")(c4.reshape(b, hw, -1))

        # transformer encoder with cls token + learned pos embed
        cls = self.param("cls_token", nn.initializers.truncated_normal(0.02),
                         (1, 1, self.embed_dim))
        pos = self.param("pos_embed", nn.initializers.truncated_normal(0.02),
                         (1, hw + 1, self.embed_dim))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, self.embed_dim)),
             tokens], axis=1) + pos.astype(self.dtype)
        from .backbones.vit import ViTBlock
        for i in range(self.depth):
            # qkv_bias=False per the reference encoder default
            # (trans2seg_transformer.py:102,110 - bias_attr=qkv_bias=False)
            tokens = ViTBlock(self.embed_dim, self.num_heads, self.mlp_ratio,
                              qkv_bias=False, dtype=self.dtype,
                              name=f"enc_block{i}")(tokens, deterministic=det)
        tokens = nn.LayerNorm(dtype=jnp.float32,
                              name="enc_norm")(tokens).astype(self.dtype)
        feat = tokens[:, 1:]                                   # [b, hw, 256]

        # class-prototype decoder
        cls_embed = self.param("cls_embed",
                               nn.initializers.truncated_normal(0.02),
                               (1, self.num_classes, self.embed_dim))
        query = jnp.broadcast_to(cls_embed.astype(self.dtype),
                                 (b, self.num_classes, self.embed_dim))
        attn = None
        f = feat
        for i in range(self.depth):
            if i > 0:
                query = query + jnp.broadcast_to(
                    cls_embed.astype(self.dtype),
                    (b, self.num_classes, self.embed_dim))
            attn, query, f = BlockDecoder(self.embed_dim, self.num_heads, hw,
                                          self.mlp_ratio, dtype=self.dtype,
                                          name=f"dec_block{i}")(query, f, det)

        feat_enc = feat.reshape(b, h, w, self.embed_dim)
        # attn [b, nclass, nheads, hw] -> [b*nclass, h, w, nheads]
        amap = attn.reshape(b * self.num_classes, self.num_heads, h, w)
        amap = amap.transpose(0, 2, 3, 1)
        fexp = jnp.broadcast_to(feat_enc[:, None],
                                (b, self.num_classes, h, w, self.embed_dim))
        fexp = fexp.reshape(b * self.num_classes, h, w, self.embed_dim)
        y = jnp.concatenate([fexp, amap], axis=-1)

        # CNN head (trans2seg_head.py:96-130)
        y = SeparableConvBlock(self.hid_dim, dtype=self.dtype, name="lay1")(y, train)
        y = SeparableConvBlock(self.hid_dim, dtype=self.dtype, name="lay2")(y, train)
        y = resize_bilinear(y, (c1.shape[1], c1.shape[2]), align_corners=True)
        c1r = nn.Conv(self.hid_dim, (1, 1), use_bias=False, dtype=self.dtype,
                      kernel_init=xavier_uniform, name="conv_c1")(c1)
        c1r = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=jnp.float32,
                           name="conv_c1_bn")(c1r).astype(self.dtype)
        c1r = nn.relu(c1r)
        c1exp = jnp.broadcast_to(
            c1r[:, None], (b, self.num_classes) + c1r.shape[1:]).reshape(
            (b * self.num_classes,) + c1r.shape[1:])
        y = y + c1exp
        y = SeparableConvBlock(self.hid_dim, dtype=self.dtype, name="lay3")(y, train)
        y = nn.Conv(1, (1, 1), dtype=self.dtype, kernel_init=xavier_uniform,
                    name="pred")(y)
        y = y.reshape(b, self.num_classes, c1.shape[1], c1.shape[2])
        y = y.transpose(0, 2, 3, 1)
        out = resize_bilinear(y, (x.shape[1], x.shape[2]), align_corners=True)
        return [out.astype(jnp.float32)]


def build_trans2seg(config, dtype=jnp.float32) -> Trans2Seg:
    t = config.MODEL.TRANS2SEG
    return Trans2Seg(
        num_classes=config.DATA.NUM_CLASSES,
        backbone=config.MODEL.ENCODER.TYPE.lower(),
        output_stride=config.MODEL.OUTPUT_STRIDE,
        embed_dim=t.EMBED_DIM, depth=t.DEPTH, num_heads=t.NUM_HEADS,
        mlp_ratio=t.MLP_RATIO, hid_dim=t.HID_DIM, dtype=dtype,
    )
