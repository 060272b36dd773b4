"""DETR-style sine position embedding, computed statically.

The reference builds the embedding from a cumsum over an all-ones validity
mask at runtime (src/models/EMRT_utils/position_encoding.py:51-75; EMRT
always passes a full mask — transformer_encoder_decoder.py:440-442). With
static shapes under jit the cumsum of ones is just arange, so we build the
table host-side once per (H, W); XLA constant-folds it.
"""
from __future__ import annotations

import functools
import math

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _sine_table(h: int, w: int, num_pos_feats: int, temperature: float,
                normalize: bool, offset: float, scale: float) -> np.ndarray:
    y_embed = np.tile(np.arange(1, h + 1, dtype=np.float64)[:, None], (1, w))
    x_embed = np.tile(np.arange(1, w + 1, dtype=np.float64)[None, :], (h, 1))
    eps = 1e-6
    if normalize:
        y_embed = (y_embed + offset) / (h + eps) * scale
        x_embed = (x_embed + offset) / (w + eps) * scale
    dim_t = 2 * (np.arange(num_pos_feats) // 2).astype(np.float64)
    dim_t = temperature ** (dim_t / num_pos_feats)
    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    # interleave sin(even) / cos(odd) exactly as the reference stack+flatten
    pos_x = np.stack([np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])],
                     axis=3).reshape(h, w, -1)
    pos_y = np.stack([np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])],
                     axis=3).reshape(h, w, -1)
    pos = np.concatenate([pos_y, pos_x], axis=2)  # [h, w, 2*num_pos_feats]
    return pos.astype(np.float32)


def sine_position_embedding(h: int, w: int, num_pos_feats: int = 128,
                            temperature: float = 10000.0,
                            normalize: bool = True, offset: float = -0.5,
                            dtype=jnp.float32) -> jnp.ndarray:
    """[h*w, 2*num_pos_feats] sine/cosine position embedding (y-first)."""
    table = _sine_table(h, w, num_pos_feats, temperature, normalize, offset,
                        2 * math.pi)
    return jnp.asarray(table.reshape(h * w, -1), dtype=dtype)


class LearnedPositionEmbedding(nn.Module):
    """Learned row/col embedding tables (reference
    position_encoding.py:45-48, 78-92): pos(y, x) = concat(col[x], row[y])
    — x-first, unlike the sine variant's y-first layout. Tables hold
    ``num_embeddings`` positions per axis; indices are the static grid
    coordinates, so the lookup is a constant-index gather XLA folds."""
    num_pos_feats: int = 128
    num_embeddings: int = 50
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, h: int, w: int) -> jnp.ndarray:
        # JAX clamps out-of-bounds gathers instead of erroring (the
        # reference would raise), which would silently reuse the last table
        # row for every position >= num_embeddings — fail loudly instead.
        if h > self.num_embeddings or w > self.num_embeddings:
            raise ValueError(
                f"LearnedPositionEmbedding table holds {self.num_embeddings} "
                f"positions per axis but the feature map is {h}x{w}; "
                f"increase num_embeddings or use the sine embedding")
        row = nn.Embed(self.num_embeddings, self.num_pos_feats,
                       name="row_embed")(jnp.arange(h))
        col = nn.Embed(self.num_embeddings, self.num_pos_feats,
                       name="col_embed")(jnp.arange(w))
        pos = jnp.concatenate([
            jnp.broadcast_to(col[None, :, :], (h, w, self.num_pos_feats)),
            jnp.broadcast_to(row[:, None, :], (h, w, self.num_pos_feats)),
        ], axis=-1)
        return pos.reshape(h * w, 2 * self.num_pos_feats).astype(self.dtype)


@functools.lru_cache(maxsize=None)
def _reference_points_table(spatial_shapes: tuple) -> np.ndarray:
    """Per-query normalized center coords, concatenated level-major.

    Equals TransformerEncoder.get_reference_points with all-valid ratios
    (reference transformer_encoder_decoder.py:213-228): for level (H, W) the
    grid is linspace(0.5, H-0.5, H)/H x linspace(0.5, W-0.5, W)/W, stacked
    (x, y), then broadcast to every level's coordinate frame.
    """
    refs = []
    for h, w in spatial_shapes:
        ref_y, ref_x = np.meshgrid(np.linspace(0.5, h - 0.5, h) / h,
                                   np.linspace(0.5, w - 0.5, w) / w,
                                   indexing="ij")
        refs.append(np.stack([ref_x.reshape(-1), ref_y.reshape(-1)], axis=-1))
    ref = np.concatenate(refs, axis=0)                     # [sum(hw), 2]
    n_levels = len(spatial_shapes)
    return np.tile(ref[:, None, :], (1, n_levels, 1)).astype(np.float32)


def encoder_reference_points(spatial_shapes, dtype=jnp.float32) -> jnp.ndarray:
    """[sum(HW), n_levels, 2] static encoder reference points."""
    return jnp.asarray(_reference_points_table(tuple(spatial_shapes)), dtype=dtype)
