"""CSwin Transformer backbone (reference: src/models/backbones/cswin_transformer.py).

Cross-shaped-window attention: heads split into a horizontal-stripe branch
and a vertical-stripe branch, each with LePE (depthwise conv on V applied
per stripe). Stages merge with a strided conv. TPU-first: stripe partition
is a reshape with static shapes; padding to stripe multiples is static.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..layers import DropPath, Mlp, xavier_uniform


def _stripes(x, hs: int, ws: int):
    """[b, h, w, c] -> [b * (h/hs) * (w/ws), hs, ws, c]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // hs, hs, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, hs, ws, c)


def _unstripes(x, hs: int, ws: int, h: int, w: int):
    b = x.shape[0] // ((h // hs) * (w // ws))
    c = x.shape[-1]
    x = x.reshape(b, h // hs, w // ws, hs, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


class LePEAttention(nn.Module):
    """Stripe attention with locally-enhanced positional encoding on V."""
    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, hs: int, ws: int, h: int, w: int,
                 deterministic: bool = True):
        head_dim = self.dim // self.num_heads
        qs = _stripes(q, hs, ws).reshape(-1, hs * ws, self.num_heads, head_dim)
        ks = _stripes(k, hs, ws).reshape(-1, hs * ws, self.num_heads, head_dim)
        v_str = _stripes(v, hs, ws)                       # [bn, hs, ws, c]
        lepe = nn.Conv(self.dim, (3, 3), padding=[(1, 1), (1, 1)],
                       feature_group_count=self.dim, dtype=self.dtype,
                       kernel_init=xavier_uniform, name="get_v")(v_str)
        vs = v_str.reshape(-1, hs * ws, self.num_heads, head_dim)
        lepe = lepe.reshape(-1, hs * ws, self.num_heads, head_dim)
        attn = jnp.einsum("bqhd,bkhd->bhqk", qs * head_dim ** -0.5, ks,
                          preferred_element_type=jnp.float32)
        attn = nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vs) + lepe
        out = out.reshape(-1, hs, ws, self.dim)
        return _unstripes(out, hs, ws, h, w)


class CSwinBlock(nn.Module):
    dim: int
    num_heads: int
    split_size: int = 7
    mlp_ratio: float = 4.0
    split_heads: bool = True
    drop_path: float = 0.0
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, h, w, c = x.shape
        shortcut = x
        y = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        pad_r = (self.split_size - w % self.split_size) % self.split_size
        pad_b = (self.split_size - h % self.split_size) % self.split_size
        if pad_r or pad_b:
            y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r
        qkv = nn.Dense(self.dim * 3, use_bias=True, dtype=self.dtype,
                       kernel_init=xavier_uniform, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if self.split_heads:
            half = self.dim // 2
            h_attn = LePEAttention(half, self.num_heads // 2, dtype=self.dtype,
                                   name="attn_h")(
                q[..., :half], k[..., :half], v[..., :half],
                hp, self.split_size, hp, wp, deterministic)
            w_attn = LePEAttention(half, self.num_heads // 2, dtype=self.dtype,
                                   name="attn_w")(
                q[..., half:], k[..., half:], v[..., half:],
                self.split_size, wp, hp, wp, deterministic)
            attn = jnp.concatenate([h_attn, w_attn], axis=-1)
        else:
            attn = LePEAttention(self.dim, self.num_heads, dtype=self.dtype,
                                 name="attn")(q, k, v, hp, wp, hp, wp,
                                              deterministic)
        attn = nn.Dense(self.dim, dtype=self.dtype, kernel_init=xavier_uniform,
                        name="proj")(attn)
        if pad_r or pad_b:
            attn = attn[:, :h, :w]
        x = shortcut + DropPath(self.drop_path)(attn, deterministic=deterministic)
        y = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        y = Mlp(int(self.dim * self.mlp_ratio), self.dim, act=nn.gelu,
                dropout=self.dropout, dtype=self.dtype,
                name="mlp")(y, deterministic=deterministic)
        return x + DropPath(self.drop_path)(y, deterministic=deterministic)


class CSwinTransformer(nn.Module):
    """Returns 4 per-stage NHWC feature maps at strides 4/8/16/32."""
    embed_dim: int = 64
    depths: Sequence[int] = (1, 2, 21, 1)
    num_heads: Sequence[int] = (2, 4, 8, 16)
    split_sizes: Sequence[int] | None = (1, 2, 7, 7)
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.2
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        det = not train
        splits = self.split_sizes or (1, 2, 7, 7)
        # padding 2 (NOT "same"/3) matches the reference PatchEmbedding's
        # Conv2D(k=7, s=4, p=2), cswin_transformer.py:87-93 — verified by
        # the torch activation oracle (tests/test_pdparams_oracle.py)
        x = nn.Conv(self.embed_dim, (7, 7), strides=4,
                    padding=[(2, 2), (2, 2)], dtype=self.dtype,
                    kernel_init=xavier_uniform,
                    name="patch_embed")(x.astype(self.dtype))
        x = nn.LayerNorm(dtype=jnp.float32,
                         name="patch_norm")(x).astype(self.dtype)
        total = sum(self.depths)
        dpr = [float(r) for r in np.linspace(0, self.drop_path_rate, total)]
        feats = []
        blk = 0
        dim = self.embed_dim
        for s, depth in enumerate(self.depths):
            last = s == len(self.depths) - 1
            for d in range(depth):
                x = CSwinBlock(dim, self.num_heads[s], splits[s],
                               self.mlp_ratio, split_heads=not last,
                               drop_path=dpr[blk], dropout=self.dropout,
                               dtype=self.dtype,
                               name=f"stage{s}_block{d}")(x, deterministic=det)
                blk += 1
            feats.append(x)
            if not last:
                x = nn.Conv(dim * 2, (3, 3), strides=2,
                            padding=[(1, 1), (1, 1)], dtype=self.dtype,
                            kernel_init=xavier_uniform, name=f"merge{s}")(x)
                x = nn.LayerNorm(dtype=jnp.float32,
                                 name=f"merge_norm{s}")(x).astype(self.dtype)
                dim *= 2
        return feats
