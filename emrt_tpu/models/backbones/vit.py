"""Vision Transformer backbone (reference: src/models/backbones/vit.py).

Plain ViT: conv patch embed, cls token + learned position embedding,
pre-norm transformer blocks, multi-tap feature output at OUT_INDICES.
TPU-first: tokens [bs, N, D] with fused MHSA on the MXU; optional cls-token
drop for SETR (reference vit.py:75-94); position embedding resized on load
for other resolutions (handled in checkpoint loader).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..layers import Mlp, MultiHeadAttention, xavier_uniform


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    attn_dropout: float = 0.0
    qkv_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        h = MultiHeadAttention(self.dim, self.num_heads,
                               dropout=self.attn_dropout,
                               qkv_bias=self.qkv_bias, dtype=self.dtype,
                               name="attn")(h, deterministic=deterministic)
        x = x + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        h = Mlp(int(self.dim * self.mlp_ratio), self.dim, act=nn.gelu,
                dropout=self.dropout, dtype=self.dtype,
                name="mlp")(h, deterministic=deterministic)
        return x + h


class VisionTransformer(nn.Module):
    """Returns a list of token maps [bs, H/p, W/p, D] at out_indices.

    num_prefix_tokens=2 gives the DeiT layout (cls + distill token,
    reference src/models/backbones/deit.py)."""
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    num_prefix_tokens: int = 1
    mlp_ratio: float = 4.0
    out_indices: Sequence[int] = (9, 14, 19, 23)
    keep_cls_token: bool = False
    return_cls: bool = False      # also return per-tap cls tokens (DPT readout)
    drop_prefix_after_pos: bool = False   # ViT_MLA: cls only joins the pos add
    dropout: float = 0.0
    attn_dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, _ = x.shape
        gh, gw = h // self.patch_size, w // self.patch_size
        x = nn.Conv(self.hidden_size,
                    (self.patch_size, self.patch_size),
                    strides=self.patch_size, padding="VALID",
                    dtype=self.dtype, kernel_init=xavier_uniform,
                    name="patch_embed")(x.astype(self.dtype))
        x = x.reshape(b, gh * gw, self.hidden_size)

        npt = self.num_prefix_tokens
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, npt, self.hidden_size))
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(self.dtype),
                                              (b, npt, self.hidden_size)), x], 1)
        pos = self.param("pos_embed",
                         nn.initializers.truncated_normal(0.02),
                         (1, gh * gw + npt, self.hidden_size))
        x = x + pos.astype(self.dtype)
        if self.drop_prefix_after_pos:
            # ViT_MLA quirk (vit_mla.py:88-96): the cls token is concatenated
            # only for the positional add, then sliced off BEFORE the blocks
            # ("For SETR") — the encoder runs on grid tokens alone
            x = x[:, npt:]
        x = nn.Dropout(self.dropout)(x, deterministic=not train)

        feats = []
        cls_taps = []
        for i in range(self.num_layers):
            x = ViTBlock(self.hidden_size, self.num_heads, self.mlp_ratio,
                         self.dropout, self.attn_dropout, dtype=self.dtype,
                         name=f"block{i}")(x, deterministic=not train)
            if i in self.out_indices:
                keep = self.keep_cls_token or self.drop_prefix_after_pos
                tokens = x if keep else x[:, npt:]
                feats.append(tokens[:, -gh * gw:].reshape(b, gh, gw,
                                                          self.hidden_size))
                cls_taps.append(x[:, 0])
        if not feats:
            grid = x if self.drop_prefix_after_pos else x[:, npt:]
            feats.append(grid.reshape(b, gh, gw, self.hidden_size))
            cls_taps.append(x[:, 0])
        if self.return_cls:
            return feats, cls_taps
        return feats
