"""Multi-scale deformable attention core — jnp reference implementation.

Behavior-equivalent to the reference's hot kernel
``deformable_attention_core_func`` (src/models/EMRT_utils/utils.py:64-97):
per level, bilinear `grid_sample` (align_corners=False, zero padding) of the
value map at `2*loc-1` grids, weighted by softmaxed attention and summed over
levels x points.

TPU-first formulation: spatial shapes are *static* (python tuple), so each
level's sample reduces to a flat gather over H*W with 4 bilinearly-weighted
corners; out-of-bounds corners get zero weight (zeros padding). The bilinear
corner weights are folded into the attention weight before the gather-sum so
XLA fuses the multiply-accumulate. A Pallas kernel (ops/deformable_pallas.py)
implements the same contract fused in VMEM; this function is the golden
reference and the fallback path.
"""
from __future__ import annotations

import jax.numpy as jnp


def deformable_attention_core(value, spatial_shapes, sampling_locations,
                              attention_weights):
    """
    Args:
      value: [bs, Len_v, n_head, c] multi-level values, flattened level-major.
      spatial_shapes: static tuple ((H0, W0), (H1, W1), ...); sum(H*W) == Len_v.
      sampling_locations: [bs, Len_q, n_head, n_levels, n_points, 2] in [0, 1]
        (x, y) normalized coordinates (including padding area).
      attention_weights: [bs, Len_q, n_head, n_levels, n_points], softmaxed
        over levels*points.

    Returns:
      [bs, Len_q, n_head * c]
    """
    bs, _, n_head, c = value.shape
    _, len_q, _, n_levels, n_points, _ = sampling_locations.shape
    assert n_levels == len(spatial_shapes)

    level_sizes = [h * w for h, w in spatial_shapes]
    offsets = [0]
    for s in level_sizes:
        offsets.append(offsets[-1] + s)

    compute_dtype = value.dtype
    out = jnp.zeros((bs, len_q, n_head, c), dtype=jnp.float32)
    for lvl, (h, w) in enumerate(spatial_shapes):
        value_l = value[:, offsets[lvl]:offsets[lvl + 1]]       # [bs, h*w, nh, c]
        loc = sampling_locations[:, :, :, lvl].astype(jnp.float32)  # [bs, Lq, nh, P, 2]
        attn = attention_weights[:, :, :, lvl].astype(jnp.float32)  # [bs, Lq, nh, P]

        # grid_sample(2*loc-1, align_corners=False) pixel coords:
        #   x_pix = ((2*loc_x - 1 + 1) * W - 1) / 2 = loc_x * W - 0.5
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        acc = jnp.zeros((bs, len_q, n_head, c), dtype=jnp.float32)
        for dy, wy in ((0, 1.0 - fy), (1, fy)):
            for dx, wx in ((0, 1.0 - fx), (1, fx)):
                xi = x0i + dx
                yi = y0i + dy
                valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
                idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
                # fold bilinear corner weight * validity * attention weight
                cw = wx * wy * attn * valid.astype(jnp.float32)      # [bs, Lq, nh, P]
                # gather: value_l [bs, hw, nh, c] at idx [bs, Lq, nh, P]
                idx_r = jnp.swapaxes(idx, 2, 3).reshape(bs, len_q * n_points, n_head)
                g = jnp.take_along_axis(value_l, idx_r[..., None], axis=1)
                g = g.reshape(bs, len_q, n_points, n_head, c)
                g = jnp.swapaxes(g, 2, 3)                            # [bs, Lq, nh, P, c]
                acc = acc + jnp.einsum("blhp,blhpc->blhc", cw, g.astype(jnp.float32))
        out = out + acc
    return out.reshape(bs, len_q, n_head * c).astype(compute_dtype)
