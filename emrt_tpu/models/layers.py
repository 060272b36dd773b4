"""Common Flax building blocks (NHWC, TPU-first).

Counterparts of the reference's layer library
(src/models/EMRT_utils/layers.py, backbones/paddleseg_utils) re-designed as
idiomatic Flax modules: explicit compute dtype (bf16-friendly), f32 params
and norm statistics, Kaiming-normal conv init matching the reference's
KaimingNormal sweep (paddle_EMRT.py:217-225).
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

kaiming_normal = nn.initializers.he_normal()
xavier_uniform = nn.initializers.xavier_uniform()


class ConvBNReLU(nn.Module):
    """conv(k, no bias) + BatchNorm + ReLU.

    padding=None (default) pads symmetrically by dilation*(k//2); pass
    "SAME" for TF-style asymmetric padding — paddleseg's ConvBNReLU uses
    Paddle padding='same', which for stride-2 k3 pads (0, 1), NOT (1, 1)
    (hrnet.py:96-110 stems/transitions; verified by the torch oracle)."""
    features: int
    kernel_size: int = 3
    strides: int = 1
    dilation: int = 1
    use_relu: bool = True
    padding: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size
        pad = self.padding if self.padding is not None else \
            [(d * (k // 2),) * 2 for d in (self.dilation, self.dilation)]
        x = nn.Conv(self.features, (k, k), strides=self.strides,
                    kernel_dilation=self.dilation,
                    padding=pad,
                    use_bias=False, dtype=self.dtype,
                    kernel_init=kaiming_normal)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         axis_name=None)(x)
        if self.use_relu:
            x = nn.relu(x)
        return x.astype(self.dtype)


class Mlp(nn.Module):
    """Transformer FFN: Linear -> act -> drop -> Linear -> drop."""
    hidden_features: int
    out_features: int
    act: Callable = nn.gelu
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_features, dtype=self.dtype,
                     kernel_init=xavier_uniform)(x)
        x = self.act(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.out_features, dtype=self.dtype,
                     kernel_init=xavier_uniform)(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class MultiHeadAttention(nn.Module):
    """Standard MHSA/MHA over token sequences (reference layers.py:144-311).

    q/k/v: [bs, len, dim]. Separate projections, scaled dot-product on the
    MXU with f32 accumulation, output projection.
    """
    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    qkv_bias: bool = True      # Trans2Seg's transformer uses bias-free q/k/v
    dtype: Any = jnp.float32   # (trans2seg_transformer.py:102,110 default)

    @nn.compact
    def __call__(self, query, key=None, value=None, deterministic: bool = True):
        key = query if key is None else key
        value = key if value is None else value
        head_dim = self.embed_dim // self.num_heads
        dense = lambda name: nn.DenseGeneral(  # noqa: E731
            (self.num_heads, head_dim), dtype=self.dtype,
            use_bias=self.qkv_bias,
            kernel_init=xavier_uniform, name=name)
        q = dense("q_proj")(query)
        k = dense("k_proj")(key)
        v = dense("v_proj")(value)
        scale = head_dim ** -0.5
        attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                          preferred_element_type=jnp.float32)
        attn = nn.softmax(attn, axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        out = nn.DenseGeneral(self.embed_dim, axis=(-2, -1), dtype=self.dtype,
                              kernel_init=xavier_uniform, name="out_proj")(out)
        return out


class DropPath(nn.Module):
    """Stochastic depth per sample."""
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        import jax
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
        return x / keep * mask


class Identity(nn.Module):
    @nn.compact
    def __call__(self, x, *a, **k):
        return x
