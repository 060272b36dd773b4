"""Bilinear/nearest resize with exact paddle/torch interpolate semantics.

The reference leans on ``F.interpolate(..., mode='bilinear',
align_corners=True/False)`` throughout (e.g. paddle_EMRT.py:288-301,
infer.py:151). On TPU we implement resize as two einsums against static
separable interpolation matrices: 1-D bilinear weights are built host-side
(shapes are static under jit), so the whole resize runs on the MXU and XLA
fuses it with neighboring ops — no gather, no dynamic shapes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """[out, in] row-stochastic bilinear interpolation matrix."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        m[:, 0] = 1.0
        return m
    o = np.arange(out_size, dtype=np.float64)
    if align_corners:
        src = o * (in_size - 1) / max(out_size - 1, 1)
    else:
        src = (o + 0.5) * in_size / out_size - 0.5
        src = np.clip(src, 0.0, in_size - 1)
    i0 = np.floor(src).astype(np.int64)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = (src - i0).astype(np.float32)
    m[np.arange(out_size), i0] += 1.0 - w1
    m[np.arange(out_size), i1] += w1
    return m


@functools.lru_cache(maxsize=None)
def _nearest_index(in_size: int, out_size: int) -> np.ndarray:
    # paddle/torch 'nearest' uses floor(o * in/out)
    o = np.arange(out_size, dtype=np.float64)
    return np.minimum(np.floor(o * in_size / out_size), in_size - 1).astype(np.int32)


def resize_bilinear(x: jnp.ndarray, size, align_corners: bool = False) -> jnp.ndarray:
    """Resize NHWC (or HWC) to ``size=(out_h, out_w)``; matches paddle bilinear."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    _, h, w, _ = x.shape
    out_h, out_w = int(size[0]), int(size[1])
    dtype = x.dtype
    if (out_h, out_w) == (h, w):
        return x[0] if squeeze else x
    if dtype == jnp.bfloat16:
        # inside bf16 model paths ride the MXU at full rate; the interp
        # weights for the common 2x/0.5x cases are exactly representable
        compute_dtype = jnp.bfloat16
        precision = jax.lax.Precision.DEFAULT
    else:
        compute_dtype = jnp.float32
        precision = jax.lax.Precision.HIGHEST
    mh = jnp.asarray(_interp_matrix(h, out_h, align_corners), dtype=compute_dtype)
    mw = jnp.asarray(_interp_matrix(w, out_w, align_corners), dtype=compute_dtype)
    y = x.astype(compute_dtype)
    y = jnp.einsum("oh,bhwc->bowc", mh, y, precision=precision,
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("ow,bhwc->bhoc", mw, y, precision=precision,
                   preferred_element_type=jnp.float32)
    y = y.astype(dtype)
    return y[0] if squeeze else y


def _batched_interp_matrix(out_pad: int, in_pad: int, src_n, dst_n):
    """[bs, out_pad, in_pad] per-image bilinear matrices from RUNTIME sizes.

    src_n / dst_n are int32 [bs] arrays (valid extents inside the padded
    canvases). Rows i >= dst_n are zeroed. align_corners=False with edge
    clamp — matches _interp_matrix. Shapes stay static, so one compile
    covers every per-image size combination inside a padding bucket."""
    o = jnp.arange(out_pad, dtype=jnp.float32)[None, :, None]       # [1,O,1]
    k = jnp.arange(in_pad, dtype=jnp.float32)[None, None, :]        # [1,1,I]
    src_f = src_n.astype(jnp.float32)[:, None, None]
    dst_f = dst_n.astype(jnp.float32)[:, None, None]
    src = (o + 0.5) * src_f / dst_f - 0.5
    src = jnp.clip(src, 0.0, src_f - 1.0)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(src - k))                    # [bs,O,I]
    return jnp.where(o < dst_f, w, 0.0)


def batched_resize_bilinear_padded(x: jnp.ndarray, src_hw: jnp.ndarray,
                                   dst_hw: jnp.ndarray, out_shape) -> jnp.ndarray:
    """Per-image bilinear resize at a FIXED padded shape (TPU-native
    variable-shape eval): x [bs, Hp, Wp, C] holds each image's valid
    content in its top-left src_hw[b] region; the result [bs, out_shape..]
    holds each image resized to dst_hw[b] (top-left), zeros elsewhere.
    Sizes are runtime data, so shape-diverse datasets (ADE20K, Pascal
    Context, Cityscapes) evaluate with a bounded number of compiles —
    the reference instead list-collates ragged batches
    (src/utils/multi_batch_collate.py:17-29, src/api/infer.py:82-157).
    Two batched MXU matmuls; no gathers."""
    bs, hp, wp, _ = x.shape
    oh, ow = int(out_shape[0]), int(out_shape[1])
    ry = _batched_interp_matrix(oh, hp, src_hw[:, 0], dst_hw[:, 0])
    rx = _batched_interp_matrix(ow, wp, src_hw[:, 1], dst_hw[:, 1])
    y = jnp.einsum("boh,bhwc->bowc", ry, x.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    return jnp.einsum("bow,bhwc->bhoc", rx, y,
                      preferred_element_type=jnp.float32)


def resize_nearest(x: jnp.ndarray, size) -> jnp.ndarray:
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    _, h, w, _ = x.shape
    out_h, out_w = int(size[0]), int(size[1])
    y = jnp.take(x, jnp.asarray(_nearest_index(h, out_h)), axis=1)
    y = jnp.take(y, jnp.asarray(_nearest_index(w, out_w)), axis=2)
    return y[0] if squeeze else y


def interpolate(x: jnp.ndarray, size, mode: str = "bilinear",
                align_corners: bool = False) -> jnp.ndarray:
    if mode in ("bilinear", "linear"):
        return resize_bilinear(x, size, align_corners)
    if mode == "nearest":
        return resize_nearest(x, size)
    raise ValueError(f"unsupported mode {mode}")
