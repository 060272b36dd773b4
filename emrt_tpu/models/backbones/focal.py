"""Focal Transformer backbone (reference: src/models/backbones/focal_transformer.py).

Exact reference semantics, realized TPU-first. The reference's focal
attention is already roll-based at the finest level (:222-266: four
diagonal paddle.roll shifts + a constant valid-index gather); its coarser
levels unfold fc-pooled window maps into per-window neighborhoods
(:271-320). Everything data-dependent here is dense linear algebra; every
index set, unfold pattern, border mask, and relative-position index is a
CONSTANT table built host-side with numpy, so under jit the whole module
is static slices, reshapes, rolls, and matmuls — no dynamic gathers.

Per window of size ws, a query attends to
  * its own ws^2 tokens               (+ Swin-style relative position bias),
  * the rolled-in surrounding ring — the 4*ws^2 - 4*(ws-e)^2 tokens of the
    four diagonal rolls outside the window (+ a learned per-slot bias),
  * per coarser level k: the (focal_window + 2^k - 1)^2 fc-pooled window
    tokens unfolded around its own window position (+ a cross-size
    relative position bias and a -100 border mask).

The reference hardcodes use_shift=False for segmentation (:1000) and never
consults EXPAND_STAGES (:873 reads it, nothing uses it); both quirks are
preserved. Stage outputs are the raw pre-downsample feature maps — the
reference's UperNet owns the per-stage LayerNorms (upernet.py:60-63).
"""
from __future__ import annotations

import functools
import math
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..layers import DropPath, Mlp, xavier_uniform
from .swin import window_partition, window_reverse, _relative_position_index


@functools.lru_cache(maxsize=None)
def _valid_ind_rolled(ws: int, e: int) -> np.ndarray:
    """Indices into the concatenated (tl,tr,bl,br) rolled windows that lie
    OUTSIDE the original window (focal_transformer.py:140-150)."""
    masks = []
    for corner in ("tl", "tr", "bl", "br"):
        m = np.ones((ws, ws), np.float32)
        rs = slice(None, -e) if corner[0] == "t" else slice(e, None)
        cs = slice(None, -e) if corner[1] == "l" else slice(e, None)
        m[rs, cs] = 0
        masks.append(m)
    return np.nonzero(np.stack(masks).reshape(-1))[0].astype(np.int32)


@functools.lru_cache(maxsize=None)
def _cross_position_index(ws: int, fr: int) -> np.ndarray:
    """Relative position index between a ws x ws query window and a
    fr x fr pooled key region (get_relative_position_index, :38-69)."""
    cq = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                              indexing="ij")).reshape(2, -1)
    ck = np.stack(np.meshgrid(np.arange(fr), np.arange(fr),
                              indexing="ij")).reshape(2, -1)
    rel = cq[:, :, None] - ck[:, None, :]
    rel = rel.transpose(1, 2, 0) + fr - 1
    return (rel[:, :, 0] * (ws + fr - 1) + rel[:, :, 1]).astype(np.int32)


@functools.lru_cache(maxsize=None)
def _valid_ind_unfold(kernel: int, stride: int) -> np.ndarray:
    """For stride > 1 unfolds, the reference keeps only the bottom-right
    (kernel - stride + 1)^2 taps (:184-191)."""
    m = np.zeros((kernel, kernel), np.float32)
    m[stride - 1:, stride - 1:] = 1
    return np.nonzero(m.reshape(-1))[0].astype(np.int32)


def _np_unfold_ones(nwh: int, nww: int, kernel: int, stride: int
                    ) -> np.ndarray:
    """Unfold an all-ones [nwh, nww] map -> [L, kernel^2] validity
    (zero-padded borders produce 0 = out-of-bounds)."""
    pad = kernel // 2
    ones = np.zeros((nwh + 2 * pad, nww + 2 * pad), np.float32)
    ones[pad:pad + nwh, pad:pad + nww] = 1
    oh = (nwh + 2 * pad - kernel) // stride + 1
    ow = (nww + 2 * pad - kernel) // stride + 1
    taps = [ones[ki:ki + oh * stride:stride, kj:kj + ow * stride:stride]
            for ki in range(kernel) for kj in range(kernel)]
    return np.stack(taps, -1).reshape(oh * ow, kernel * kernel)


@functools.lru_cache(maxsize=None)
def _pooled_mask(nwh: int, nww: int, kernel: int, stride: int) -> np.ndarray:
    """[L, n_taps] additive mask: 0 inside the map, -100 on padded taps
    (the reference builds this at runtime via numpy, :277-290)."""
    valid = _np_unfold_ones(nwh, nww, kernel, stride)
    if stride > 1:
        valid = valid[:, _valid_ind_unfold(kernel, stride)]
    return np.where(valid > 0, 0.0, -100.0).astype(np.float32)


def _unfold(x, kernel: int, stride: int):
    """paddle.nn.Unfold(kernel, stride, padding=kernel//2) on an NHWC map,
    token order row-major over (ki, kj): [b, h, w, c] -> [b, L, k^2, c].
    Realized as k^2 static strided slices of the zero-padded map."""
    b, h, w, c = x.shape
    pad = kernel // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    oh = (h + 2 * pad - kernel) // stride + 1
    ow = (w + 2 * pad - kernel) // stride + 1
    taps = [xp[:, ki:ki + oh * stride:stride, kj:kj + ow * stride:stride]
            for ki in range(kernel) for kj in range(kernel)]
    u = jnp.stack(taps, axis=3)                    # [b, oh, ow, k^2, c]
    return u.reshape(b, oh * ow, kernel * kernel, c)


class FocalAttention(nn.Module):
    """WindowAttention with focal expansion (focal_transformer.py:71-390).

    Input: x_all = [fine map (padded to window multiples)] + pooled maps
    [B, nWh*2^k, nWw*2^k, C]; output [B*nW, ws^2, dim]."""
    dim: int
    num_heads: int
    window_size: int
    expand_size: int
    focal_window: int
    focal_level: int
    pool_method: str = "fc"
    qkv_bias: bool = True
    dropout: float = 0.0
    attn_dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_all, deterministic: bool = True):
        ws, e = self.window_size, self.expand_size
        nh = self.num_heads
        hd = self.dim // nh
        x = x_all[0]
        b, h, w, c = x.shape
        n_win = (h // ws) * (w // ws)

        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias,
                       dtype=self.dtype, kernel_init=xavier_uniform,
                       name="qkv")
        q, k, v = jnp.split(qkv(x), 3, axis=-1)
        q_win = window_partition(q, ws)                   # [b*nw, ws^2, c]
        k_parts = [window_partition(k, ws)]
        v_parts = [window_partition(v, ws)]

        # finest level: ring of the four diagonal rolls, constant-index
        # subset of tokens outside the window (:222-266)
        n_rolled = 0
        if e > 0 and self.focal_level > 0:
            sel = jnp.asarray(_valid_ind_rolled(ws, e))
            n_rolled = sel.shape[0]
            kr, vr = [], []
            for dy, dx in ((-e, -e), (-e, e), (e, -e), (e, e)):
                kr.append(window_partition(jnp.roll(k, (dy, dx), (1, 2)), ws))
                vr.append(window_partition(jnp.roll(v, (dy, dx), (1, 2)), ws))
            k_parts.append(jnp.take(jnp.concatenate(kr, 1), sel, axis=1))
            v_parts.append(jnp.take(jnp.concatenate(vr, 1), sel, axis=1))

        # coarser levels: unfold the pooled maps' k/v around each window
        # (:271-320); same qkv projection as the fine map
        pooled_meta = []                       # (fr, kernel, stride, nwh, nww)
        if self.pool_method != "none" and self.focal_level > 1:
            for lk in range(self.focal_level - 1):
                stride = 2 ** lk
                kernel = 2 * (self.focal_window // 2) + 2 ** lk + (2 ** lk - 1)
                fr = self.focal_window + 2 ** lk - 1
                pooled = x_all[lk + 1]
                nwh, nww = pooled.shape[1], pooled.shape[2]
                _, kp, vp = jnp.split(qkv(pooled), 3, axis=-1)
                ku = _unfold(kp, kernel, stride)      # [b, L, kernel^2, c]
                vu = _unfold(vp, kernel, stride)
                if lk > 0:
                    vsel = jnp.asarray(_valid_ind_unfold(kernel, stride))
                    ku = jnp.take(ku, vsel, axis=2)
                    vu = jnp.take(vu, vsel, axis=2)
                k_parts.append(ku.reshape(b * n_win, fr * fr, c))
                v_parts.append(vu.reshape(b * n_win, fr * fr, c))
                pooled_meta.append((fr, kernel, stride, nwh, nww))

        k_all = jnp.concatenate(k_parts, axis=1)
        v_all = jnp.concatenate(v_parts, axis=1)
        bw, nq, _ = q_win.shape
        nk = k_all.shape[1]
        qh = q_win.reshape(bw, nq, nh, hd)
        kh = k_all.reshape(bw, nk, nh, hd)
        vh = v_all.reshape(bw, nk, nh, hd)
        attn = jnp.einsum("bqhd,bkhd->bhqk", qh * hd ** -0.5, kh,
                          preferred_element_type=jnp.float32)

        # additive biases per key segment (:341-390)
        segs = []
        rpbt = self.param("relative_position_bias_table",
                          nn.initializers.truncated_normal(0.02),
                          ((2 * ws - 1) ** 2, nh))
        idx = jnp.asarray(_relative_position_index(ws))
        bias = rpbt[idx.reshape(-1)].reshape(nq, nq, nh)
        segs.append(attn[..., :nq]
                    + bias.transpose(2, 0, 1)[None].astype(jnp.float32))
        off = nq
        if n_rolled:
            nbias = self.param("relative_position_bias_table_to_neighbors",
                               nn.initializers.truncated_normal(0.02),
                               (1, nh, nq, n_rolled))
            segs.append(attn[..., off:off + n_rolled]
                        + nbias.astype(jnp.float32))
            off += n_rolled
        for lk, (fr, kernel, stride, nwh, nww) in enumerate(pooled_meta):
            wtab = self.param(
                f"relative_position_bias_table_to_windows{lk}",
                nn.initializers.truncated_normal(0.02),
                (nh, (ws + fr - 1) ** 2))
            widx = jnp.asarray(_cross_position_index(ws, fr))
            wbias = wtab[:, widx.reshape(-1)].reshape(nh, nq, fr * fr)
            seg = attn[..., off:off + fr * fr] + wbias[None].astype(
                jnp.float32)
            mask = jnp.asarray(_pooled_mask(nwh, nww, kernel, stride))
            seg = (seg.reshape(b, n_win, nh, nq, fr * fr)
                   + mask[None, :, None, None, :]
                   ).reshape(bw, nh, nq, fr * fr)
            segs.append(seg)
            off += fr * fr
        attn = jnp.concatenate(segs, axis=-1)

        attn = nn.softmax(attn, axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.attn_dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(bw, nq, self.dim)
        out = nn.Dense(self.dim, dtype=self.dtype, kernel_init=xavier_uniform,
                       name="proj")(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class FocalBlock(nn.Module):
    """FocalTransformerBlock (focal_transformer.py:406-645), shift-free."""
    dim: int
    num_heads: int
    window_size: int = 7
    expand_size: int = 3
    focal_level: int = 2
    focal_window: int = 7
    pool_method: str = "fc"
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    dropout: float = 0.0
    attn_dropout: float = 0.0
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, h, w, c = x.shape
        # window larger than the map: shrink it and drop expansion (:442-446)
        if min(h, w) <= self.window_size:
            ws, e = min(h, w), 0
        else:
            ws, e = self.window_size, self.expand_size

        shortcut = x
        y = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        pad_b = (ws - h % ws) % ws
        pad_r = (ws - w % ws) % ws
        if pad_b or pad_r:
            y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r

        x_all = [y]
        if self.pool_method != "none" and self.focal_level > 1:
            for lk in range(self.focal_level - 1):
                wsg = int(math.floor(ws / (2 ** lk)))
                ph = math.ceil(hp / ws) * (2 ** lk)
                pw = math.ceil(wp / ws) * (2 ** lk)
                ylk = _fit(y, ph * wsg, pw * wsg)
                # fc pooling: a learned [wsg^2 -> 1] projection over each
                # window's tokens, initialized to the mean (:452-465)
                win = ylk.reshape(b, ph, wsg, pw, wsg, c)
                win = win.transpose(0, 1, 3, 5, 2, 4).reshape(
                    b, ph, pw, c, wsg * wsg)
                pooled = nn.Dense(
                    1, dtype=self.dtype,
                    kernel_init=nn.initializers.constant(1.0 / (wsg * wsg)),
                    name=f"pool_layers{lk}")(win)[..., 0]
                x_all.append(pooled)

        out = FocalAttention(self.dim, self.num_heads, ws, e,
                             self.focal_window, self.focal_level,
                             self.pool_method, self.qkv_bias, self.dropout,
                             self.attn_dropout, dtype=self.dtype,
                             name="attn")(x_all, deterministic)
        out = window_reverse(out, ws, hp, wp)[:, :h, :w]
        x = shortcut + DropPath(self.drop_path)(out, deterministic=deterministic)
        y = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        y = Mlp(int(self.dim * self.mlp_ratio), self.dim, act=nn.gelu,
                dtype=self.dtype, name="mlp")(y, deterministic=deterministic)
        return x + DropPath(self.drop_path)(y, deterministic=deterministic)


def _fit(y, th: int, tw: int):
    """Center-trim/pad a padded map to the pooled grid size (:558-575)."""
    b, h, w, c = y.shape
    if h > th:
        t = (h - th) // 2
        y = y[:, t:t + th]
    elif h < th:
        t = (th - h) // 2
        y = jnp.pad(y, ((0, 0), (t, th - h - t), (0, 0), (0, 0)))
    if w > tw:
        t = (w - tw) // 2
        y = y[:, :, t:t + tw]
    elif w < tw:
        t = (tw - w) // 2
        y = jnp.pad(y, ((0, 0), (0, 0), (t, tw - w - t), (0, 0)))
    return y


class FocalPatchEmbed(nn.Module):
    """PatchEmbed (:739-816): plain patchify conv, or overlapped conv
    embedding (stem 7x7/s4/p2, downsample 3x3/s2/p1), then LayerNorm."""
    embed_dim: int
    patch_size: int = 4
    use_conv_embed: bool = False
    is_stem: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.use_conv_embed:
            kern, stride, pad = (7, 4, 2) if self.is_stem else (3, 2, 1)
            x = nn.Conv(self.embed_dim, (kern, kern), strides=stride,
                        padding=[(pad, pad), (pad, pad)], dtype=self.dtype,
                        kernel_init=xavier_uniform, name="proj")(x)
        else:
            p = self.patch_size
            x = nn.Conv(self.embed_dim, (p, p), strides=p, padding="VALID",
                        dtype=self.dtype, kernel_init=xavier_uniform,
                        name="proj")(x)
        return nn.LayerNorm(dtype=jnp.float32, name="norm")(x).astype(
            self.dtype)


class FocalTransformer(nn.Module):
    """Returns the 4 raw pre-downsample NHWC stage maps at strides
    4/8/16/32 (focal_transformer.py:985-1000; the per-stage LayerNorms
    live in the reference's UperNet, upernet.py:60-63)."""
    patch_size: int = 4
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    expand_sizes: Sequence[int] = (3, 3, 3, 3)
    focal_levels: Sequence[int] = (2, 2, 2, 2)
    focal_windows: Sequence[int] = (7, 5, 3, 1)
    focal_stages: Sequence[int] = (0, 1, 2, 3)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    use_conv_embed: bool = False
    dropout: float = 0.0
    attn_dropout: float = 0.0
    drop_path_rate: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        det = not train
        x = FocalPatchEmbed(self.embed_dim, self.patch_size,
                            self.use_conv_embed, is_stem=True,
                            dtype=self.dtype,
                            name="patch_embed")(x.astype(self.dtype))
        x = nn.Dropout(self.dropout)(x, deterministic=det)
        total = sum(self.depths)
        dpr = [float(r) for r in np.linspace(0, self.drop_path_rate, total)]
        feats, blk, dim = [], 0, self.embed_dim
        for s, depth in enumerate(self.depths):
            pool = "fc" if s in tuple(self.focal_stages) else "none"
            for d in range(depth):
                x = FocalBlock(dim, self.num_heads[s], self.window_size,
                               self.expand_sizes[s], self.focal_levels[s],
                               self.focal_windows[s], pool, self.mlp_ratio,
                               self.qkv_bias, self.dropout,
                               self.attn_dropout, dpr[blk], dtype=self.dtype,
                               name=f"stage{s}_block{d}")(x, deterministic=det)
                blk += 1
            feats.append(x)
            if s < len(self.depths) - 1:
                x = FocalPatchEmbed(dim * 2, 2, self.use_conv_embed,
                                    is_stem=False, dtype=self.dtype,
                                    name=f"downsample{s}")(x)
                dim *= 2
        return feats
