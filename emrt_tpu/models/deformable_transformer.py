"""Multi-scale deformable-attention transformer encoder-decoder (Flax).

Re-design of the reference's EncoderDecoder stack
(src/models/EMRT_utils/transformer_encoder_decoder.py:21-473): deformable
self-attention encoder with a per-level conv-enhancement branch, and a
110-query decoder (PSP tokens as tgt) with MHSA + deformable cross-attention.

TPU-first choices:
  * spatial shapes are static python tuples -> position embeddings and
    encoder reference points are constant tables (XLA folds them);
  * tokens live as [bs, sum(HW), C]; level maps are reshaped views (free
    under XLA), so the conv branch and attention share one layout;
  * the deformable core runs through ops.deformable (jnp gather) or the
    fused Pallas kernel (ops.deformable_pallas) selected by `use_pallas`.
"""
from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.deformable import deformable_attention_core
from .layers import MultiHeadAttention, xavier_uniform
from .position_encoding import (LearnedPositionEmbedding,
                                encoder_reference_points,
                                sine_position_embedding)


def _offset_bias_init(num_heads: int, num_levels: int, num_points: int):
    """Rotated-grid bias (reference transformer_encoder_decoder.py:46-55)."""
    thetas = np.arange(num_heads, dtype=np.float64) * (2.0 * math.pi / num_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid.reshape(num_heads, 1, 1, 2), (1, num_levels, num_points, 1))
    scaling = np.arange(1, num_points + 1, dtype=np.float64).reshape(1, 1, -1, 1)
    grid = grid * scaling
    bias = grid.reshape(-1).astype(np.float32)

    def init(key, shape, dtype=jnp.float32):
        assert shape == bias.shape, (shape, bias.shape)
        return jnp.asarray(bias, dtype)

    return init


class MSDeformableAttention(nn.Module):
    """Multi-scale deformable attention (reference :21-107)."""
    embed_dim: int = 256
    num_heads: int = 8
    num_levels: int = 3
    num_points: int = 4
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, query, reference_points, value, spatial_shapes):
        """
        query: [bs, Lq, C]; reference_points: [bs, Lq, n_levels, 2] in [0,1];
        value: [bs, Lv, C]; spatial_shapes: static ((H,W), ...).
        """
        bs, len_q, _ = query.shape
        len_v = value.shape[1]
        head_dim = self.embed_dim // self.num_heads
        total_points = self.num_heads * self.num_levels * self.num_points

        value = nn.Dense(self.embed_dim, dtype=self.dtype,
                         kernel_init=xavier_uniform, name="value_proj")(value)
        value = value.reshape(bs, len_v, self.num_heads, head_dim)

        offsets = nn.Dense(total_points * 2, dtype=self.dtype,
                           kernel_init=nn.initializers.zeros,
                           bias_init=_offset_bias_init(self.num_heads,
                                                       self.num_levels,
                                                       self.num_points),
                           name="sampling_offsets")(query)
        offsets = offsets.reshape(bs, len_q, self.num_heads, self.num_levels,
                                  self.num_points, 2)

        attn = nn.Dense(total_points, dtype=self.dtype,
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros,
                        name="attention_weights")(query)
        attn = nn.softmax(
            attn.reshape(bs, len_q, self.num_heads,
                         self.num_levels * self.num_points).astype(jnp.float32),
            axis=-1,
        ).reshape(bs, len_q, self.num_heads, self.num_levels,
                  self.num_points).astype(self.dtype)

        # offset normalizer is (W, H) per level (reference :98-102)
        normalizer = jnp.asarray([[w, h] for h, w in spatial_shapes],
                                 dtype=jnp.float32)
        loc = (reference_points[:, :, None, :, None, :].astype(jnp.float32)
               + offsets.astype(jnp.float32) / normalizer[None, None, None, :, None, :])

        if self.use_pallas:
            from ..ops.deformable_pallas import deformable_attention_pallas
            out = deformable_attention_pallas(value, tuple(spatial_shapes), loc, attn)
        else:
            out = deformable_attention_core(value, tuple(spatial_shapes), loc, attn)
        out = nn.Dense(self.embed_dim, dtype=self.dtype,
                       kernel_init=xavier_uniform, name="output_proj")(out)
        return out


def tokens_to_levels(tokens, spatial_shapes):
    """[bs, sum(HW), C] -> list of [bs, H, W, C] views (reference seq2_2D)."""
    bs, _, c = tokens.shape
    maps, start = [], 0
    for h, w in spatial_shapes:
        maps.append(tokens[:, start:start + h * w].reshape(bs, h, w, c))
        start += h * w
    return maps


def levels_to_tokens(maps):
    """list of [bs, H, W, C] -> [bs, sum(HW), C]."""
    bs = maps[0].shape[0]
    c = maps[0].shape[-1]
    return jnp.concatenate([m.reshape(bs, -1, c) for m in maps], axis=1)


class ConvEnhance(nn.Module):
    """Per-level 3x3 conv + GroupNorm(32) + GELU with residual
    (reference TransformerEncoderLayer conv0/1/2, :125-144, :187-189)."""
    d_model: int
    n_levels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens, spatial_shapes):
        maps = tokens_to_levels(tokens, spatial_shapes)
        outs = []
        for i, m in enumerate(maps):
            y = nn.Conv(self.d_model, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=self.dtype,
                        kernel_init=xavier_uniform, name=f"conv{i}")(m)
            y = nn.GroupNorm(num_groups=32, dtype=jnp.float32,
                             name=f"gn{i}")(y).astype(self.dtype)
            y = nn.gelu(y)
            outs.append(y + m)
        return levels_to_tokens(outs)


class EncoderLayer(nn.Module):
    """Deformable self-attn + FFN + conv-branch fusion (reference :109-204)."""
    d_model: int = 256
    n_head: int = 8
    dim_feedforward: int = 1024
    dropout: float = 0.1
    n_levels: int = 3
    n_points: int = 4
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, src, reference_points, spatial_shapes, pos_embed,
                 deterministic: bool = True):
        # conv enhancement branch computed from the incoming tokens
        src_conv = ConvEnhance(self.d_model, self.n_levels,
                               dtype=self.dtype)(src, spatial_shapes)
        # deformable self attention
        src2 = MSDeformableAttention(self.d_model, self.n_head, self.n_levels,
                                     self.n_points, dtype=self.dtype,
                                     use_pallas=self.use_pallas,
                                     name="self_attn")(
            src + pos_embed, reference_points, src, spatial_shapes)
        src = src + nn.Dropout(self.dropout)(src2, deterministic=deterministic)
        src = nn.LayerNorm(dtype=jnp.float32, name="norm1")(src).astype(self.dtype)
        # ffn
        x = nn.Dense(self.dim_feedforward, dtype=self.dtype,
                     kernel_init=xavier_uniform, name="linear1")(src)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.d_model, dtype=self.dtype,
                     kernel_init=xavier_uniform, name="linear2")(x)
        src = src + nn.Dropout(self.dropout)(x, deterministic=deterministic)
        src = nn.LayerNorm(dtype=jnp.float32, name="norm2")(src).astype(self.dtype)
        # conv-branch fusion after the FFN (reference :203)
        return src + src_conv


class DecoderLayer(nn.Module):
    """MHSA over queries + deformable cross-attn + FFN (reference :242-295)."""
    d_model: int = 256
    n_head: int = 8
    dim_feedforward: int = 1024
    dropout: float = 0.1
    n_levels: int = 3
    n_points: int = 4
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, tgt, reference_points, memory, spatial_shapes,
                 query_pos, deterministic: bool = True):
        q = tgt + query_pos
        tgt2 = MultiHeadAttention(self.d_model, self.n_head,
                                  dropout=self.dropout, dtype=self.dtype,
                                  name="self_attn")(q, q, tgt,
                                                    deterministic=deterministic)
        tgt = tgt + nn.Dropout(self.dropout)(tgt2, deterministic=deterministic)
        tgt = nn.LayerNorm(dtype=jnp.float32, name="norm1")(tgt).astype(self.dtype)

        tgt2 = MSDeformableAttention(self.d_model, self.n_head, self.n_levels,
                                     self.n_points, dtype=self.dtype,
                                     use_pallas=self.use_pallas,
                                     name="cross_attn")(
            tgt + query_pos, reference_points, memory, spatial_shapes)
        tgt = tgt + nn.Dropout(self.dropout)(tgt2, deterministic=deterministic)
        tgt = nn.LayerNorm(dtype=jnp.float32, name="norm2")(tgt).astype(self.dtype)

        x = nn.Dense(self.dim_feedforward, dtype=self.dtype,
                     kernel_init=xavier_uniform, name="linear1")(tgt)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.d_model, dtype=self.dtype,
                     kernel_init=xavier_uniform, name="linear2")(x)
        tgt = tgt + nn.Dropout(self.dropout)(x, deterministic=deterministic)
        tgt = nn.LayerNorm(dtype=jnp.float32, name="norm3")(tgt).astype(self.dtype)
        return tgt


class EncoderDecoder(nn.Module):
    """Full deformable encoder-decoder (reference :337-473).

    __call__(src_feats, src_psp): src_feats is a list of NHWC backbone maps
    (c2, c3, c4 after projection here), src_psp is [bs, n_queries, C] pooled
    tokens used as decoder tgt. Returns (hs [bs, n_queries, C], memory
    [bs, sum(HW), C]).
    """
    num_queries: int = 110
    hidden_dim: int = 256
    nhead: int = 8
    num_feature_levels: int = 3
    num_encoder_layers: int = 4
    num_decoder_layers: int = 2
    num_encoder_points: int = 6
    num_decoder_points: int = 6
    dim_feedforward: int = 1024
    dropout: float = 0.1
    dtype: Any = jnp.float32
    use_pallas: bool = False
    position_embed_type: str = "sine"   # 'sine' | 'learned' (reference :340-348)

    @nn.compact
    def __call__(self, src_feats: Sequence[jnp.ndarray], src_psp,
                 deterministic: bool = True):
        assert len(src_feats) == self.num_feature_levels
        # 1x1 input projection + GroupNorm(32) per level (reference :373-387)
        srcs = []
        for i, feat in enumerate(src_feats):
            s = nn.Conv(self.hidden_dim, (1, 1), dtype=self.dtype,
                        kernel_init=xavier_uniform,
                        name=f"input_proj{i}")(feat.astype(self.dtype))
            s = nn.GroupNorm(num_groups=32, dtype=jnp.float32,
                             name=f"input_gn{i}")(s).astype(self.dtype)
            srcs.append(s)

        spatial_shapes = tuple((s.shape[1], s.shape[2]) for s in srcs)
        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (self.num_feature_levels, self.hidden_dim))

        if self.position_embed_type == "learned":
            learned = LearnedPositionEmbedding(self.hidden_dim // 2,
                                               dtype=self.dtype,
                                               name="position_embedding")
        pos_chunks = []
        for lvl, (h, w) in enumerate(spatial_shapes):
            if self.position_embed_type == "learned":
                pos = learned(h, w)
            else:
                pos = sine_position_embedding(h, w, self.hidden_dim // 2,
                                              dtype=self.dtype)
            pos_chunks.append(pos + level_embed[lvl].astype(self.dtype))
        pos_embed = jnp.concatenate(pos_chunks, axis=0)[None]  # [1, sum, C]

        src = levels_to_tokens(srcs)
        ref_points_enc = encoder_reference_points(spatial_shapes,
                                                  dtype=jnp.float32)[None]
        ref_points_enc = jnp.broadcast_to(
            ref_points_enc, (src.shape[0],) + ref_points_enc.shape[1:])

        memory = src
        for i in range(self.num_encoder_layers):
            memory = EncoderLayer(self.hidden_dim, self.nhead,
                                  self.dim_feedforward, self.dropout,
                                  self.num_feature_levels,
                                  self.num_encoder_points, dtype=self.dtype,
                                  use_pallas=self.use_pallas,
                                  name=f"encoder_layer{i}")(
                memory, ref_points_enc, spatial_shapes, pos_embed,
                deterministic=deterministic)

        bs = memory.shape[0]
        query_pos = self.param("query_pos_embed", nn.initializers.normal(1.0),
                               (self.num_queries, self.hidden_dim))
        query_pos = jnp.broadcast_to(query_pos[None].astype(self.dtype),
                                     (bs, self.num_queries, self.hidden_dim))
        # decoder reference points: sigmoid(Linear(query_pos)) (reference :466)
        ref = nn.Dense(2, dtype=jnp.float32, kernel_init=xavier_uniform,
                       name="reference_points")(query_pos.astype(jnp.float32))
        ref = nn.sigmoid(ref)
        ref_points_dec = jnp.broadcast_to(
            ref[:, :, None, :],
            (bs, self.num_queries, self.num_feature_levels, 2))

        tgt = src_psp.astype(self.dtype)
        for i in range(self.num_decoder_layers):
            tgt = DecoderLayer(self.hidden_dim, self.nhead,
                               self.dim_feedforward, self.dropout,
                               self.num_feature_levels,
                               self.num_decoder_points, dtype=self.dtype,
                               use_pallas=self.use_pallas,
                               name=f"decoder_layer{i}")(
                tgt, ref_points_dec, memory, spatial_shapes, query_pos,
                deterministic=deterministic)

        return tgt, memory
