"""Adaptive average pooling via static averaging matrices.

The reference uses nn.AdaptiveAvgPool2D for the PSP pyramid
(paddle_EMRT.py:50-78) and UperNet's PPM. On TPU we express adaptive
pooling as two einsums with host-built [out, in] averaging matrices
(window [floor(i*In/Out), ceil((i+1)*In/Out)) — the torch/paddle adaptive
rule), so it rides the MXU and fuses with the following 1x1 conv.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _avg_matrix(in_size: int, out_size: int) -> np.ndarray:
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for o in range(out_size):
        start = (o * in_size) // out_size
        end = math.ceil((o + 1) * in_size / out_size)
        m[o, start:end] = 1.0 / (end - start)
    return m


def adaptive_avg_pool(x: jnp.ndarray, output_size) -> jnp.ndarray:
    """NHWC adaptive average pool to (oh, ow) (int -> square)."""
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    _, h, w, _ = x.shape
    oh, ow = output_size
    mh = jnp.asarray(_avg_matrix(h, oh))
    mw = jnp.asarray(_avg_matrix(w, ow))
    y = x.astype(jnp.float32)
    y = jnp.einsum("oh,bhwc->bowc", mh, y, precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("ow,bhwc->bhoc", mw, y, precision=jax.lax.Precision.HIGHEST)
    return y.astype(x.dtype)


def global_avg_pool(x: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)
