"""MixVisionTransformer — the SegFormer encoder
(reference: src/models/backbones/mix_transformer.py / paddleseg copy).

Overlap patch embeds (conv k7s4 / k3s2), spatial-reduction efficient
attention, MixFFN with a depthwise 3x3 conv, per-stage LayerNorm. NHWC;
the NLC<->NCHW shuffles of the reference collapse into plain reshapes.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..layers import DropPath, xavier_uniform


class EfficientAttention(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int = 1
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, hw, deterministic: bool = True):
        b, n, _ = x.shape
        h, w = hw
        head_dim = self.dim // self.num_heads
        q = nn.Dense(self.dim, dtype=self.dtype, kernel_init=xavier_uniform,
                     name="q")(x).reshape(b, n, self.num_heads, head_dim)
        kv_in = x
        if self.sr_ratio > 1:
            y = x.reshape(b, h, w, self.dim)
            y = nn.Conv(self.dim, (self.sr_ratio, self.sr_ratio),
                        strides=self.sr_ratio, dtype=self.dtype,
                        kernel_init=xavier_uniform, name="sr")(y)
            y = y.reshape(b, -1, self.dim)
            kv_in = nn.LayerNorm(dtype=jnp.float32,
                                 name="sr_norm")(y).astype(self.dtype)
        kv = nn.Dense(self.dim * 2, dtype=self.dtype,
                      kernel_init=xavier_uniform, name="kv")(kv_in)
        kv = kv.reshape(b, -1, 2, self.num_heads, head_dim)
        k, v = kv[:, :, 0], kv[:, :, 1]
        attn = jnp.einsum("bqhd,bkhd->bhqk", q * head_dim ** -0.5, k,
                          preferred_element_type=jnp.float32)
        attn = nn.softmax(attn, axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, n, self.dim)
        out = nn.Dense(self.dim, dtype=self.dtype, kernel_init=xavier_uniform,
                       name="proj")(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class MixFFN(nn.Module):
    dim: int
    hidden: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, hw, deterministic: bool = True):
        b, n, _ = x.shape
        h, w = hw
        y = nn.Dense(self.hidden, dtype=self.dtype,
                     kernel_init=xavier_uniform, name="fc1")(x)
        # depthwise 3x3 conv on the 2D map
        y = y.reshape(b, h, w, self.hidden)
        y = nn.Conv(self.hidden, (3, 3), padding=[(1, 1), (1, 1)],
                    feature_group_count=self.hidden, dtype=self.dtype,
                    kernel_init=xavier_uniform, name="dwconv")(y)
        y = y.reshape(b, n, self.hidden)
        y = nn.gelu(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = nn.Dense(self.dim, dtype=self.dtype, kernel_init=xavier_uniform,
                     name="fc2")(y)
        return nn.Dropout(self.dropout)(y, deterministic=deterministic)


class MixBlock(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, hw, deterministic: bool = True):
        y = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        y = EfficientAttention(self.dim, self.num_heads, self.sr_ratio,
                               self.dropout, dtype=self.dtype,
                               name="attn")(y, hw, deterministic)
        x = x + DropPath(self.drop_path)(y, deterministic=deterministic)
        y = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        y = MixFFN(self.dim, int(self.dim * self.mlp_ratio), self.dropout,
                   dtype=self.dtype, name="ffn")(y, hw, deterministic)
        return x + DropPath(self.drop_path)(y, deterministic=deterministic)


_MIT_CONFIGS = {
    # embed_dims, depths
    "b0": ((32, 64, 160, 256), (2, 2, 2, 2)),
    "b1": ((64, 128, 320, 512), (2, 2, 2, 2)),
    "b2": ((64, 128, 320, 512), (3, 4, 6, 3)),
    "b3": ((64, 128, 320, 512), (3, 4, 18, 3)),
    "b4": ((64, 128, 320, 512), (3, 8, 27, 3)),
    "b5": ((64, 128, 320, 512), (3, 6, 40, 3)),
}


class MixVisionTransformer(nn.Module):
    """Returns 4 NHWC stage maps at strides 4/8/16/32."""
    embed_dims: Sequence[int] = (64, 128, 320, 512)
    depths: Sequence[int] = (3, 8, 27, 3)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    drop_path_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        det = not train
        total = sum(self.depths)
        dpr = [float(r) for r in np.linspace(0, self.drop_path_rate, total)]
        feats = []
        blk = 0
        x = x.astype(self.dtype)
        for s in range(4):
            k, stride = (7, 4) if s == 0 else (3, 2)
            x = nn.Conv(self.embed_dims[s], (k, k), strides=stride,
                        padding=[(k // 2,) * 2] * 2, dtype=self.dtype,
                        kernel_init=xavier_uniform,
                        name=f"patch_embed{s}")(x)
            x = nn.LayerNorm(dtype=jnp.float32,
                             name=f"embed_norm{s}")(x).astype(self.dtype)
            b, h, w, c = x.shape
            tokens = x.reshape(b, h * w, c)
            for d in range(self.depths[s]):
                tokens = MixBlock(self.embed_dims[s], self.num_heads[s],
                                  self.sr_ratios[s], self.mlp_ratio,
                                  self.dropout, dpr[blk], dtype=self.dtype,
                                  name=f"stage{s}_block{d}")(
                    tokens, (h, w), deterministic=det)
                blk += 1
            tokens = nn.LayerNorm(dtype=jnp.float32,
                                  name=f"norm{s}")(tokens).astype(self.dtype)
            x = tokens.reshape(b, h, w, c)
            feats.append(x)
        return feats


def mit(variant: str, **kw) -> MixVisionTransformer:
    dims, depths = _MIT_CONFIGS[variant]
    return MixVisionTransformer(embed_dims=dims, depths=depths, **kw)
