"""Fused Pallas TPU kernel for multi-scale deformable attention.

Same contract as ops.deformable.deformable_attention_core (the jnp golden
reference of the reference's hot kernel, utils.py:64-97). Why a kernel: XLA
lowers the bilinear gather to TPU gather ops that execute near-serially
(~400ms per attention call at bs32); the TPU's fast path is the MXU. This
kernel reformulates sampling as dense linear algebra executed entirely in
VMEM:

    out[q, :] = sum_p attn[q,p] * bilinear(V, loc[q,p])
              = M_q @ V
    M_q[k]    = sum_p sum_{4 corners} bilinear_wgt * attn * onehot_flat(k)

Per (batch*head, query-tile) grid cell it builds the [Tq, H*W] sampling
matrix M with VPU compares/multiplies directly in flat layout (no HBM
round-trip, no unsupported reshapes) and computes out = M @ V on the MXU.
The backward recomputes the corner masks (cheaper than storing M) and
produces analytic grads:

    gV      = M^T @ g                       (MXU)
    gM      = g @ V^T                       (MXU)
    g_attn  = sum_k M_p_noattn * gM
    g_loc_x = attn * W * sum_k (dM/dx_p) * gM   (and likewise for y)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


def _point_taps(lx, ly, h, w):
    """Per-point pixel taps from [tq] x/y normalized coords."""
    x = lx * w - 0.5
    y = ly * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    return x0, y0, fx, fy


def _corners(x0, y0, fx, fy, h, w):
    """4 corner (flat_index, weight_x, weight_y, valid) tuples.

    flat indices are clamped; validity is folded into the weights so a
    clamped hit contributes zero (zeros-padding grid_sample semantics)."""
    out = []
    for dy, wy in ((0, 1.0 - fy), (1, fy)):
        for dx, wx in ((0, 1.0 - fx), (1, fx)):
            xi = x0 + dx
            yi = y0 + dy
            valid = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)).astype(jnp.float32)
            idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
            out.append((idx, wx, wy, valid, dx, dy))
    return out


def _accum_point_m(m_ref, lx, ly, attn_p, h, w, iota, first):
    """Add one sampling point's 4 bilinear corners into the M scratch.

    The point loop lives in the pallas GRID, not unrolled in the kernel
    body: Mosaic's compile helper falls over past ~8 unrolled [tq, 1024]
    corner accumulations, so each grid step handles one point."""
    x0, y0, fx, fy = _point_taps(lx.astype(jnp.float32),
                                 ly.astype(jnp.float32), h, w)
    a = attn_p.astype(jnp.float32)

    @pl.when(first)
    def _():
        m_ref[:] = jnp.zeros_like(m_ref[:])

    for idx, wx, wy, valid, _, _ in _corners(x0, y0, fx, fy, h, w):
        wgt = (wx * wy * valid * a)[:, None]
        m_ref[:] += (iota == idx[:, None]).astype(jnp.float32) * wgt


def _fwd_kernel(v_ref, locx_ref, locy_ref, attn_ref, out_ref, m_scratch,
                *, h, w, tq, n_points):
    iota = jax.lax.broadcasted_iota(jnp.int32, (tq, h * w), 1)
    for p in range(n_points):
        _accum_point_m(m_scratch, locx_ref[0, p, :], locy_ref[0, p, :],
                       attn_ref[0, p, :], h, w, iota, p == 0)
    v = v_ref[0].astype(jnp.float32)                         # [h*w, c]
    out_ref[0] = jnp.dot(m_scratch[:], v, preferred_element_type=jnp.float32
                         ).astype(out_ref.dtype)


def _gv_kernel(locx_ref, locy_ref, attn_ref, g_ref, gv_ref, m_scratch,
               *, h, w, tq, n_points):
    """Accumulates gV = M^T @ g over (query tile, point) grid steps.

    The sampling matrix is built in forward [tq, hw] layout and the
    transpose happens inside dot_general — Mosaic hangs on a transposed
    (lane-indexed) one-hot build but handles the transposed contraction."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        gv_ref[0] = jnp.zeros_like(gv_ref[0])

    iota = jax.lax.broadcasted_iota(jnp.int32, (tq, h * w), 1)
    for p in range(n_points):
        _accum_point_m(m_scratch, locx_ref[0, p, :], locy_ref[0, p, :],
                       attn_ref[0, p, :], h, w, iota, p == 0)
    g = g_ref[0].astype(jnp.float32)                         # [tq, c]
    gv_ref[0] += jax.lax.dot_general(
        m_scratch[:], g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(gv_ref.dtype)


def _gla_kernel(vt_ref, locx_ref, locy_ref, attn_ref, g_ref, gattn_ref,
                glocx_ref, glocy_ref, gm_scratch, *, h, w, tq, n_points):
    """Analytic grads for attention weights and sampling locations.

    One grid step per (tile, point): Mosaic's compile helper crashes past
    ~8 unrolled [tq, 1024] corner terms, so each step handles 4 corners.
    gM = g @ V^T is computed once per tile (at p == 0) into scratch;
    vt_ref holds V transposed ([c, hw]) so that's a plain matmul."""
    g = g_ref[0].astype(jnp.float32)                          # [tq, c]
    gm_scratch[:] = jnp.dot(g, vt_ref[0].astype(jnp.float32),
                            preferred_element_type=jnp.float32)
    gm = gm_scratch[:]
    iota = jax.lax.broadcasted_iota(jnp.int32, (tq, h * w), 1)
    for p in range(n_points):
        lx = locx_ref[0, p, :].astype(jnp.float32)            # [tq]
        ly = locy_ref[0, p, :].astype(jnp.float32)
        attn_p = attn_ref[0, p, :].astype(jnp.float32)
        x0, y0, fx, fy = _point_taps(lx, ly, h, w)
        ga = jnp.zeros((tq, 1), jnp.float32)
        gx = jnp.zeros((tq, 1), jnp.float32)
        gy = jnp.zeros((tq, 1), jnp.float32)
        for idx, wx, wy, valid, dx, dy in _corners(x0, y0, fx, fy, h, w):
            # s[q] = sum_k gm[q,k] * onehot(idx[q])[k]  (kept 2D: [tq, 1])
            s = jnp.sum(jnp.where(iota == idx[:, None], gm, 0.0), axis=1,
                        keepdims=True)
            s = s * valid[:, None]
            ga = ga + (wx * wy)[:, None] * s
            # d(wx)/dx_pix: corner at x0 -> -1, at x0+1 -> +1
            tx = wy[:, None] * s
            gx = gx + tx if dx == 1 else gx - tx
            ty = wx[:, None] * s
            gy = gy + ty if dy == 1 else gy - ty
        gattn_ref[0, p, :] = ga[:, 0].astype(gattn_ref.dtype)
        glocx_ref[0, p, :] = (attn_p * (w * gx[:, 0])).astype(glocx_ref.dtype)
        glocy_ref[0, p, :] = (attn_p * (h * gy[:, 0])).astype(glocy_ref.dtype)


def _level_specs(hw, c, tq, n_points):
    return dict(
        v=pl.BlockSpec((1, hw, c), lambda i, j: (i, 0, 0),
                       memory_space=pltpu.VMEM),


        g=pl.BlockSpec((1, tq, c), lambda i, j: (i, j, 0),
                       memory_space=pltpu.VMEM),
        out=pl.BlockSpec((1, tq, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        gv=pl.BlockSpec((1, hw, c), lambda i, j: (i, 0, 0),
                        memory_space=pltpu.VMEM),
        plane=pl.BlockSpec((1, n_points, tq), lambda i, j: (i, 0, j),
                           memory_space=pltpu.VMEM),
    )


def _level_fwd(v, loc, attn, h, w, tq, interpret=False):
    bh, hw, c = v.shape
    lq, n_points = loc.shape[1], loc.shape[2]
    locx = jnp.swapaxes(loc[..., 0], 1, 2)   # [bh, P, lq]
    locy = jnp.swapaxes(loc[..., 1], 1, 2)
    attn = jnp.swapaxes(attn, 1, 2)
    s = _level_specs(hw, c, tq, n_points)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, h=h, w=w, tq=tq, n_points=n_points),
        grid=(bh, lq // tq),
        in_specs=[s["v"], s["plane"], s["plane"], s["plane"]],
        out_specs=s["out"],
        out_shape=jax.ShapeDtypeStruct((bh, lq, c), v.dtype),
        scratch_shapes=[pltpu.VMEM((tq, hw), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(v, locx, locy, attn)


def _level_bwd(v, loc, attn, g, h, w, tq, interpret=False):
    bh, hw, c = v.shape
    lq, n_points = loc.shape[1], loc.shape[2]
    locx = jnp.swapaxes(loc[..., 0], 1, 2)   # [bh, P, lq]
    locy = jnp.swapaxes(loc[..., 1], 1, 2)
    attn = jnp.swapaxes(attn, 1, 2)
    s = _level_specs(hw, c, tq, n_points)
    gv = pl.pallas_call(
        functools.partial(_gv_kernel, h=h, w=w, tq=tq, n_points=n_points),
        grid=(bh, lq // tq),
        in_specs=[s["plane"], s["plane"], s["plane"], s["g"]],
        out_specs=s["gv"],
        out_shape=jax.ShapeDtypeStruct((bh, hw, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tq, hw), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(locx, locy, attn, g)
    vt = jnp.swapaxes(v, 1, 2)  # [bh, c, hw] so gM = g @ V^T is plain matmul
    vt_spec = pl.BlockSpec((1, c, hw), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    gattn, glocx, glocy = pl.pallas_call(
        functools.partial(_gla_kernel, h=h, w=w, tq=tq, n_points=n_points),
        grid=(bh, lq // tq),
        in_specs=[vt_spec, s["plane"], s["plane"], s["plane"], s["g"]],
        out_specs=[s["plane"]] * 3,
        out_shape=[jax.ShapeDtypeStruct((bh, n_points, lq), jnp.float32)] * 3,
        scratch_shapes=[pltpu.VMEM((tq, hw), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(vt, locx, locy, attn, g)
    # back to [bh, lq, P]
    gattn = jnp.swapaxes(gattn, 1, 2)
    gloc = jnp.stack([jnp.swapaxes(glocx, 1, 2),
                      jnp.swapaxes(glocy, 1, 2)], axis=-1)
    return gv, gloc, gattn


def _pick_tile(lq: int) -> int:
    # small tiles keep the 24-corner unrolled accumulation within Mosaic's
    # vector-register budget (big tiles crash the compile helper)
    for t in (128, 256):
        if lq % t == 0:
            return t
    return lq  # small/odd cases: one tile per call (padded by caller)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4))
def deformable_attention_pallas(value, spatial_shapes, sampling_locations,
                                attention_weights, interpret=False):
    """Drop-in replacement for deformable_attention_core.

    value [bs, Lv, nh, c]; sampling_locations [bs, Lq, nh, L, P, 2] (f32);
    attention_weights [bs, Lq, nh, L, P] -> [bs, Lq, nh*c]."""
    out, _ = _fwd(value, spatial_shapes, sampling_locations,
                  attention_weights, interpret)
    return out


def _pad_queries(loc_all, attn_all, g=None):
    lq = loc_all.shape[1]
    tq = _pick_tile(lq if lq % 128 == 0 else _round_up(lq, 128))
    lq_pad = _round_up(lq, tq)
    pad = lq_pad - lq
    if pad:
        loc_all = jnp.pad(loc_all,
                          ((0, 0), (0, pad)) + ((0, 0),) * (loc_all.ndim - 2),
                          constant_values=-10.0)
        attn_all = jnp.pad(attn_all,
                           ((0, 0), (0, pad)) + ((0, 0),) * (attn_all.ndim - 2))
        if g is not None:
            g = jnp.pad(g, ((0, 0), (0, pad)) + ((0, 0),) * (g.ndim - 2))
    return loc_all, attn_all, g, tq, lq_pad, lq


def _fwd(value, spatial_shapes, loc_all, attn_all, interpret=False):
    bs, lv, nh, c = value.shape
    n_points = loc_all.shape[4]
    residuals = (value, loc_all, attn_all)
    loc_p, attn_p, _, tq, lq_pad, lq = _pad_queries(loc_all, attn_all)

    out = jnp.zeros((bs, lq_pad, nh, c), jnp.float32)
    offset = 0
    for l, (h, w) in enumerate(spatial_shapes):
        hw = h * w
        v_l = jnp.swapaxes(value[:, offset:offset + hw], 1, 2).reshape(
            bs * nh, hw, c)
        loc_l = jnp.swapaxes(loc_p[:, :, :, l], 1, 2).reshape(
            bs * nh, lq_pad, n_points, 2).astype(jnp.float32)
        attn_l = jnp.swapaxes(attn_p[:, :, :, l], 1, 2).reshape(
            bs * nh, lq_pad, n_points).astype(jnp.float32)
        o = _level_fwd(v_l, loc_l, attn_l, h, w, tq, interpret)
        out = out + jnp.swapaxes(o.reshape(bs, nh, lq_pad, c), 1, 2
                                 ).astype(jnp.float32)
        offset += hw
    out = out[:, :lq].reshape(bs, lq, nh * c).astype(value.dtype)
    return out, residuals


def _bwd(spatial_shapes, interpret, residuals, g):
    value, loc_all, attn_all = residuals
    bs, lv, nh, c = value.shape
    n_points = loc_all.shape[4]
    g4 = g.reshape(bs, g.shape[1], nh, c)
    loc_p, attn_p, g_p, tq, lq_pad, lq = _pad_queries(loc_all, attn_all, g4)
    g_bh = jnp.swapaxes(g_p, 1, 2).reshape(bs * nh, lq_pad, c
                                           ).astype(jnp.float32)
    gv_parts, gloc_parts, gattn_parts = [], [], []
    offset = 0
    for l, (h, w) in enumerate(spatial_shapes):
        hw = h * w
        v_l = jnp.swapaxes(value[:, offset:offset + hw], 1, 2).reshape(
            bs * nh, hw, c)
        loc_l = jnp.swapaxes(loc_p[:, :, :, l], 1, 2).reshape(
            bs * nh, lq_pad, n_points, 2).astype(jnp.float32)
        attn_l = jnp.swapaxes(attn_p[:, :, :, l], 1, 2).reshape(
            bs * nh, lq_pad, n_points).astype(jnp.float32)
        gv, gloc, gattn = _level_bwd(v_l, loc_l, attn_l, g_bh, h, w, tq,
                                     interpret)
        gv_parts.append(jnp.swapaxes(gv.reshape(bs, nh, hw, c), 1, 2))
        gloc_parts.append(jnp.swapaxes(
            gloc.reshape(bs, nh, lq_pad, n_points, 2), 1, 2)[:, :lq])
        gattn_parts.append(jnp.swapaxes(
            gattn.reshape(bs, nh, lq_pad, n_points), 1, 2)[:, :lq])
        offset += hw
    gvalue = jnp.concatenate(gv_parts, axis=1).astype(value.dtype)
    gloc = jnp.stack(gloc_parts, axis=3).astype(loc_all.dtype)
    gattn = jnp.stack(gattn_parts, axis=3).astype(attn_all.dtype)
    return gvalue, gloc, gattn


def _fwd_rule(value, spatial_shapes, loc, attn, interpret=False):
    return _fwd(value, spatial_shapes, loc, attn, interpret)


deformable_attention_pallas.defvjp(_fwd_rule, _bwd)
