"""Segmenter (reference: src/models/segmentor.py:10-44 +
decoders/segmentor_head.py:21-109): ViT/DeiT encoder with a mask-transformer
or linear decoder; class masks = normalized patch x class-token dot product.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import resize_bilinear
from .backbones.vit import ViTBlock, VisionTransformer
from .layers import xavier_uniform


class MaskTransformer(nn.Module):
    hidden_size: int
    num_classes: int
    num_layers: int = 2
    num_heads: int = 16
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, grid_hw, deterministic: bool = True):
        b = x.shape[0]
        h, w = grid_hw
        x = nn.Dense(self.hidden_size, dtype=self.dtype,
                     kernel_init=xavier_uniform, name="proj_decoder")(x)
        mask_tokens = self.param("mask_tokens",
                                 nn.initializers.truncated_normal(0.02),
                                 (1, self.num_classes, self.hidden_size))
        x = jnp.concatenate(
            [x, jnp.broadcast_to(mask_tokens.astype(self.dtype),
                                 (b, self.num_classes, self.hidden_size))], 1)
        for i in range(self.num_layers):
            x = ViTBlock(self.hidden_size, self.num_heads, self.mlp_ratio,
                         dtype=self.dtype,
                         name=f"layer{i}")(x, deterministic=deterministic)
        x = nn.LayerNorm(dtype=jnp.float32,
                         name="decoder_norm")(x).astype(self.dtype)
        patches, masks = x[:, :-self.num_classes], x[:, -self.num_classes:]
        scale_init = nn.initializers.normal(self.hidden_size ** -0.5)
        patches = nn.Dense(self.hidden_size, use_bias=False,
                           kernel_init=scale_init, dtype=self.dtype,
                           name="proj_patch")(patches)
        masks = nn.Dense(self.hidden_size, use_bias=False,
                         kernel_init=scale_init, dtype=self.dtype,
                         name="proj_class")(masks)
        patches = patches / jnp.linalg.norm(patches.astype(jnp.float32),
                                            axis=-1, keepdims=True).astype(self.dtype)
        masks = masks / jnp.linalg.norm(masks.astype(jnp.float32),
                                        axis=-1, keepdims=True).astype(self.dtype)
        logits = jnp.einsum("bpd,bcd->bpc", patches, masks,
                            preferred_element_type=jnp.float32)
        logits = nn.LayerNorm(dtype=jnp.float32, name="mask_norm")(logits)
        return logits.reshape(b, h, w, self.num_classes)


class LinearDecoder(nn.Module):
    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, grid_hw, deterministic: bool = True):
        b = x.shape[0]
        h, w = grid_hw
        masks = nn.Dense(self.num_classes, dtype=self.dtype,
                         kernel_init=xavier_uniform, name="head")(x)
        return masks.reshape(b, h, w, self.num_classes)


class Segmenter(nn.Module):
    num_classes: int
    decoder_type: str = "MaskTransformer"
    patch_size: int = 16
    hidden_size: int = 384
    num_layers: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    seg_num_layers: int = 2
    distilled: bool = False          # DeiT: 2 leading tokens
    dropout: float = 0.0
    attn_dropout: float = 0.0
    dtype: Any = jnp.float32

    decoder_lr_prefixes = ("decoder",)

    @nn.compact
    def __call__(self, x, train: bool = False):
        h_in, w_in = x.shape[1], x.shape[2]
        gh, gw = h_in // self.patch_size, w_in // self.patch_size
        feats = VisionTransformer(
            patch_size=self.patch_size, hidden_size=self.hidden_size,
            num_layers=self.num_layers, num_heads=self.num_heads,
            num_prefix_tokens=2 if self.distilled else 1,  # DeiT layout
            mlp_ratio=self.mlp_ratio, out_indices=(self.num_layers - 1,),
            dropout=self.dropout, attn_dropout=self.attn_dropout,
            dtype=self.dtype, name="encoder")(x, train)
        tokens = feats[-1].reshape(x.shape[0], gh * gw, self.hidden_size)
        tokens = nn.LayerNorm(dtype=jnp.float32,
                              name="norm")(tokens).astype(self.dtype)
        if "Linear" in self.decoder_type:
            masks = LinearDecoder(self.num_classes, dtype=self.dtype,
                                  name="decoder")(tokens, (gh, gw), not train)
        else:
            masks = MaskTransformer(self.hidden_size, self.num_classes,
                                    self.seg_num_layers, self.num_heads,
                                    self.mlp_ratio, dtype=self.dtype,
                                    name="decoder")(tokens, (gh, gw), not train)
        out = resize_bilinear(masks, (h_in, w_in), align_corners=False)
        return [out.astype(jnp.float32)]


def build_segmenter(config, dtype=jnp.float32) -> Segmenter:
    trans = config.MODEL.TRANS
    return Segmenter(
        num_classes=config.DATA.NUM_CLASSES,
        decoder_type=config.MODEL.DECODER_TYPE,
        patch_size=trans.PATCH_SIZE or 16,
        hidden_size=trans.HIDDEN_SIZE,
        num_layers=trans.NUM_LAYERS or 12,
        num_heads=trans.NUM_HEADS or 6,
        mlp_ratio=trans.MLP_RATIO or 4.0,
        seg_num_layers=config.MODEL.SEGMENTER.NUM_LAYERS,
        distilled="DeiT" in config.MODEL.ENCODER.TYPE,
        dropout=config.MODEL.DROPOUT,
        attn_dropout=config.MODEL.ATTENTION_DROPOUT,
        dtype=dtype,
    )
