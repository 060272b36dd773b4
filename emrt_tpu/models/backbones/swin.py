"""Swin Transformer backbone (reference: src/models/backbones/swin_transformer.py).

Shifted-window attention re-designed for TPU: window partition is a reshape
(static shapes), the cyclic shift is jnp.roll (lowers to two slices+concat),
and the shifted-window attention mask is a constant table built host-side.
Returns the 4 pre-merge stage outputs like the reference (:636-646).
"""
from __future__ import annotations

import functools
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..layers import DropPath, Mlp, xavier_uniform


def window_partition(x, ws: int):
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(windows, ws: int, h: int, w: int):
    b = windows.shape[0] // (h * w // ws // ws)
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


@functools.lru_cache(maxsize=None)
def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + ws - 1
    return (rel[:, :, 0] * (2 * ws - 1) + rel[:, :, 1]).astype(np.int32)


@functools.lru_cache(maxsize=None)
def _shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """[num_windows, ws*ws, ws*ws] additive mask for shifted windows."""
    img_mask = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[:, hs, wsl, :] = cnt
            cnt += 1
    mw = img_mask.reshape(1, h // ws, ws, w // ws, ws, 1)
    mw = mw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    attn_mask = mw[:, None, :] - mw[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    attn_dropout: float = 0.0
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        bw, n, _ = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias,
                       dtype=self.dtype, kernel_init=xavier_uniform,
                       name="qkv")(x)
        qkv = qkv.reshape(bw, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bqhd,bkhd->bhqk", q * head_dim ** -0.5, k,
                          preferred_element_type=jnp.float32)
        rpbt = self.param("relative_position_bias_table",
                          nn.initializers.truncated_normal(0.02),
                          ((2 * self.window_size - 1) ** 2, self.num_heads))
        idx = jnp.asarray(_relative_position_index(self.window_size))
        bias = rpbt[idx.reshape(-1)].reshape(n, n, self.num_heads)
        attn = attn + bias.transpose(2, 0, 1)[None].astype(jnp.float32)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bw // nw, nw, self.num_heads, n, n)
            attn = attn + mask[None, :, None].astype(jnp.float32)
            attn = attn.reshape(bw, self.num_heads, n, n)
        attn = nn.softmax(attn, axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.attn_dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(bw, n, self.dim)
        out = nn.Dense(self.dim, dtype=self.dtype, kernel_init=xavier_uniform,
                       name="proj")(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    dropout: float = 0.0
    attn_dropout: float = 0.0
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, h, w, c = x.shape
        ws = min(self.window_size, h, w)
        shift = self.shift_size if ws < min(h, w) else 0

        shortcut = x
        x = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        # pad to window multiples (reference pads feature maps for
        # segmentation-sized inputs)
        pad_b = (ws - h % ws) % ws
        pad_r = (ws - w % ws) % ws
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(hp, wp, ws, shift))
        else:
            mask = None
        windows = window_partition(x, ws)
        attn = WindowAttention(self.dim, ws, self.num_heads, self.qkv_bias,
                               self.attn_dropout, self.dropout,
                               dtype=self.dtype, name="attn")(
            windows, mask, deterministic=deterministic)
        x = window_reverse(attn, ws, hp, wp)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        if pad_b or pad_r:
            x = x[:, :h, :w]
        x = shortcut + DropPath(self.drop_path)(x, deterministic=deterministic)
        y = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        y = Mlp(int(self.dim * self.mlp_ratio), self.dim, act=nn.gelu,
                dropout=self.dropout, dtype=self.dtype,
                name="mlp")(y, deterministic=deterministic)
        return x + DropPath(self.drop_path)(y, deterministic=deterministic)


class PatchMerging(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        # reference concat order (swin_transformer.py:290-296):
        # x0(0::2,0::2), x1(1::2,0::2), x2(0::2,1::2), x3(1::2,1::2) —
        # i.e. column-offset-major: transpose to [..., dx, dy, c] before the
        # flatten so the 4C layout matches the reference reduction kernel
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 4, 2, 5).reshape(b, h // 2, w // 2, 4 * c)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(x).astype(self.dtype)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                        kernel_init=xavier_uniform, name="reduction")(x)


class SwinTransformer(nn.Module):
    """Returns the 4 per-stage (pre-merge) NHWC feature maps."""
    patch_size: int = 4
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    dropout: float = 0.0
    attn_dropout: float = 0.0
    drop_path_rate: float = 0.2
    patch_norm: bool = True
    ape: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        det = not train
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=self.patch_size, padding="VALID",
                    dtype=self.dtype, kernel_init=xavier_uniform,
                    name="patch_embed")(x.astype(self.dtype))
        if self.patch_norm:
            x = nn.LayerNorm(dtype=jnp.float32,
                             name="patch_norm")(x).astype(self.dtype)
        if self.ape:
            pe = self.param("absolute_pos_embed",
                            nn.initializers.truncated_normal(0.02),
                            (1,) + x.shape[1:3] + (self.embed_dim,))
            x = x + pe.astype(self.dtype)
        x = nn.Dropout(self.dropout)(x, deterministic=det)

        total = sum(self.depths)
        dpr = [float(r) for r in np.linspace(0, self.drop_path_rate, total)]
        feats = []
        blk = 0
        dim = self.embed_dim
        for s, depth in enumerate(self.depths):
            for d in range(depth):
                x = SwinBlock(dim, self.num_heads[s], self.window_size,
                              0 if d % 2 == 0 else self.window_size // 2,
                              self.mlp_ratio, self.qkv_bias, self.dropout,
                              self.attn_dropout, dpr[blk], dtype=self.dtype,
                              name=f"stage{s}_block{d}")(x, deterministic=det)
                blk += 1
            # per-stage output norm (reference swin_transformer.py:636-646)
            out = nn.LayerNorm(dtype=jnp.float32,
                               name=f"norm{s}")(x).astype(self.dtype)
            feats.append(out)
            if s < len(self.depths) - 1:
                x = PatchMerging(dim, dtype=self.dtype,
                                 name=f"merge{s}")(x)
                dim *= 2
        return feats
