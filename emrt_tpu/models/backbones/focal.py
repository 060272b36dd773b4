"""Focal Transformer backbone (reference: src/models/backbones/focal_transformer.py).

TPU-idiomatic re-design of focal attention: each window's queries attend to
  * level 0 — its own window tokens plus the rolled-in surrounding ring
    (the reference's expand_size neighborhood, realized with 4 jnp.roll
    shifts instead of masked gathers), and
  * levels 1..L-1 — the feature map average-pooled by 2^k, every window
    seeing the pooled tokens of its covering region (realized as pooled
    windows aligned to the query window grid).
This keeps the multi-granularity receptive field of focal attention with
static shapes and no unfold/gather; the exact token sets differ slightly
from the reference's Unfold-based neighborhoods at window borders.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ...ops.pooling import adaptive_avg_pool
from ..layers import DropPath, Mlp, xavier_uniform
from .swin import PatchMerging, window_partition, window_reverse


class FocalAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    expand_size: int
    focal_level: int
    focal_window: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, h, w, c = x.shape
        ws = self.window_size
        head_dim = self.dim // self.num_heads
        nwin = (h // ws) * (w // ws)

        qkv = nn.Dense(self.dim * 3, dtype=self.dtype,
                       kernel_init=xavier_uniform, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        q_win = window_partition(q, ws)                         # [b*nw, ws*ws, c]
        k_parts = [window_partition(k, ws)]
        v_parts = [window_partition(v, ws)]

        # level 0 expansion: rolled neighborhoods (4 diagonal shifts)
        if self.expand_size > 0 and self.focal_level > 0:
            e = self.expand_size
            for dy, dx in ((-e, -e), (-e, e), (e, -e), (e, e)):
                k_parts.append(window_partition(
                    jnp.roll(k, (dy, dx), axis=(1, 2)), ws))
                v_parts.append(window_partition(
                    jnp.roll(v, (dy, dx), axis=(1, 2)), ws))

        # coarser levels: each fine window sees its own region pooled by 2^k.
        # Pool the map to exactly (n_win_h * pws, n_win_w * pws) so the
        # pooled window grid always matches the fine window grid.
        nwh, nww = h // ws, w // ws
        for lvl in range(1, self.focal_level):
            stride = 2 ** lvl
            pws = max(ws // stride, 1)
            k_pool = adaptive_avg_pool(k, (nwh * pws, nww * pws))
            v_pool = adaptive_avg_pool(v, (nwh * pws, nww * pws))
            k_parts.append(window_partition(k_pool, pws))      # [b*nwin, pws², c]
            v_parts.append(window_partition(v_pool, pws))

        k_all = jnp.concatenate(k_parts, axis=1)
        v_all = jnp.concatenate(v_parts, axis=1)
        bw, nq, _ = q_win.shape
        nk = k_all.shape[1]
        qh = q_win.reshape(bw, nq, self.num_heads, head_dim)
        kh = k_all.reshape(bw, nk, self.num_heads, head_dim)
        vh = v_all.reshape(bw, nk, self.num_heads, head_dim)
        attn = jnp.einsum("bqhd,bkhd->bhqk", qh * head_dim ** -0.5, kh,
                          preferred_element_type=jnp.float32)
        bias = self.param("focal_bias", nn.initializers.truncated_normal(0.02),
                          (self.num_heads, nq, nk))
        attn = nn.softmax(attn + bias[None].astype(jnp.float32),
                          axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(bw, nq, self.dim)
        out = window_reverse(out, ws, h, w)
        return nn.Dense(self.dim, dtype=self.dtype, kernel_init=xavier_uniform,
                        name="proj")(out)


class FocalBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    expand_size: int = 3
    focal_level: int = 2
    focal_window: int = 7
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, h, w, c = x.shape
        ws = min(self.window_size, h, w)
        pad_b = (ws - h % ws) % ws
        pad_r = (ws - w % ws) % ws
        y = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        if pad_b or pad_r:
            y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        y = FocalAttention(self.dim, self.num_heads, ws,
                           min(self.expand_size, ws // 2), self.focal_level,
                           self.focal_window, dtype=self.dtype,
                           name="attn")(y, deterministic)
        if pad_b or pad_r:
            y = y[:, :h, :w]
        x = x + DropPath(self.drop_path)(y, deterministic=deterministic)
        y = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        y = Mlp(int(self.dim * self.mlp_ratio), self.dim, act=nn.gelu,
                dtype=self.dtype, name="mlp")(y, deterministic=deterministic)
        return x + DropPath(self.drop_path)(y, deterministic=deterministic)


class FocalTransformer(nn.Module):
    """Returns 4 per-stage NHWC feature maps at strides 4/8/16/32."""
    patch_size: int = 4
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    expand_sizes: Sequence[int] = (3, 3, 3, 3)
    focal_levels: Sequence[int] = (2, 2, 2, 2)
    focal_windows: Sequence[int] = (7, 5, 3, 1)
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        det = not train
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=self.patch_size, padding="VALID", dtype=self.dtype,
                    kernel_init=xavier_uniform,
                    name="patch_embed")(x.astype(self.dtype))
        x = nn.LayerNorm(dtype=jnp.float32,
                         name="patch_norm")(x).astype(self.dtype)
        total = sum(self.depths)
        dpr = [float(r) for r in np.linspace(0, self.drop_path_rate, total)]
        feats, blk, dim = [], 0, self.embed_dim
        for s, depth in enumerate(self.depths):
            for d in range(depth):
                x = FocalBlock(dim, self.num_heads[s], self.window_size,
                               self.expand_sizes[s], self.focal_levels[s],
                               self.focal_windows[s], self.mlp_ratio,
                               dpr[blk], dtype=self.dtype,
                               name=f"stage{s}_block{d}")(x, deterministic=det)
                blk += 1
            out = nn.LayerNorm(dtype=jnp.float32,
                               name=f"norm{s}")(x).astype(self.dtype)
            feats.append(out)
            if s < len(self.depths) - 1:
                x = PatchMerging(dim, dtype=self.dtype, name=f"merge{s}")(x)
                dim *= 2
        return feats
