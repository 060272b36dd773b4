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


def _expansion_tables(h, w, tq):
    """Constant flat-index coordinate tables: col(k) = k % w, row(k) = k // w."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (tq, h * w), 1)
    return (iota % w).astype(jnp.float32), (iota // w).astype(jnp.float32)


def _hat(dist):
    """Bilinear (triangle) weight: relu(1 - |dist|)."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(dist))


def _accum_point_m(m_ref, lx, ly, attn_p, h, w, tables, first):
    """Add one sampling point's bilinear footprint into the M scratch.

    The footprint is a separable 2-D hat (triangle) kernel — exactly the
    4-corner bilinear weight, with out-of-range taps vanishing
    automatically (zeros-padding grid_sample semantics). The
    footprint is evaluated against constant flat row/col coordinate
    tables with a handful of VPU passes per point. Accumulating through the
    scratch ref (not SSA) keeps Mosaic register pressure flat — long
    unrolled SSA chains at hw >= 1024 crash the compile helper."""
    col_t, row_t = tables
    x_pix = lx.astype(jnp.float32) * w - 0.5
    y_pix = ly.astype(jnp.float32) * h - 0.5
    a = attn_p.astype(jnp.float32)

    @pl.when(first)
    def _():
        m_ref[:] = jnp.zeros_like(m_ref[:])

    wx = _hat(col_t - x_pix[:, None])
    wy = _hat(row_t - y_pix[:, None])
    m_ref[:] += (a[:, None] * wx) * wy


def _fwd_kernel(v_ref, locx_ref, locy_ref, attn_ref, out_ref, m_scratch,
                *, h, w, tq, n_points):
    tables = _expansion_tables(h, w, tq)
    for p in range(n_points):
        _accum_point_m(m_scratch, locx_ref[0, p, :], locy_ref[0, p, :],
                       attn_ref[0, p, :], h, w, tables, p == 0)
    v = v_ref[0].astype(jnp.float32)                         # [h*w, c]
    out_ref[0] = jnp.dot(m_scratch[:], v, preferred_element_type=jnp.float32
                         ).astype(out_ref.dtype)


def _bwd_kernel(vt_ref, locx_ref, locy_ref, attn_ref, g_ref, gv_ref,
                gattn_ref, glocx_ref, glocy_ref, m_scratch, gm_scratch,
                *, h, w, tq, n_points):
    """Fused backward: gV, g_attn, g_loc in one kernel.

    Per point, the separable hat weights are built ONCE and reused for the
    sampling-matrix accumulation (-> gV = M^T @ g on the MXU) and for the
    three analytic reductions against gM = g @ V^T:
        g_attn = sum_k (wx*wy) * gM
        g_locx = attn * W * sum_k (dwx*wy) * gM      (dwx = sign on support)
        g_locy = attn * H * sum_k (wx*dwy) * gM
    vt_ref holds V transposed ([c, hw]) so gM is a plain matmul; gV
    accumulates across query-tile grid steps (zeroed at j == 0)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        gv_ref[0] = jnp.zeros_like(gv_ref[0])

    g = g_ref[0].astype(jnp.float32)                          # [tq, c]
    gm_scratch[:] = jnp.dot(g, vt_ref[0].astype(jnp.float32),
                            preferred_element_type=jnp.float32)
    gm = gm_scratch[:]
    iota = jax.lax.broadcasted_iota(jnp.int32, (tq, h * w), 1)
    col_t = (iota % w).astype(jnp.float32)
    row_t = (iota // w).astype(jnp.float32)
    m_scratch[:] = jnp.zeros_like(m_scratch[:])
    for p in range(n_points):
        lx = locx_ref[0, p, :].astype(jnp.float32)            # [tq]
        ly = locy_ref[0, p, :].astype(jnp.float32)
        attn_p = attn_ref[0, p, :].astype(jnp.float32)
        x_pix = lx * w - 0.5
        y_pix = ly * h - 0.5
        dxs = col_t - x_pix[:, None]
        dys = row_t - y_pix[:, None]
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(dxs))
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(dys))
        # d(wx)/dx_pix = sign(dxs) on the open support, 0 outside
        dwx = jnp.where(wx > 0.0, jnp.sign(dxs), 0.0)
        dwy = jnp.where(wy > 0.0, jnp.sign(dys), 0.0)
        gmwy = gm * wy
        wxwy = wx * wy
        m_scratch[:] += attn_p[:, None] * wxwy
        ga = jnp.sum(gm * wxwy, axis=1)
        gx = jnp.sum(gmwy * dwx, axis=1)
        gy = jnp.sum((gm * wx) * dwy, axis=1)
        gattn_ref[0, p, :] = ga.astype(gattn_ref.dtype)
        glocx_ref[0, p, :] = (attn_p * (w * gx)).astype(glocx_ref.dtype)
        glocy_ref[0, p, :] = (attn_p * (h * gy)).astype(glocy_ref.dtype)
    gv_ref[0] += jax.lax.dot_general(
        m_scratch[:], g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(gv_ref.dtype)


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
    vt = jnp.swapaxes(v, 1, 2)  # [bh, c, hw] so gM = g @ V^T is plain matmul
    s = _level_specs(hw, c, tq, n_points)
    vt_spec = pl.BlockSpec((1, c, hw), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    gv, gattn, glocx, glocy = pl.pallas_call(
        functools.partial(_bwd_kernel, h=h, w=w, tq=tq, n_points=n_points),
        grid=(bh, lq // tq),
        in_specs=[vt_spec, s["plane"], s["plane"], s["plane"], s["g"]],
        out_specs=[s["gv"], s["plane"], s["plane"], s["plane"]],
        out_shape=[
            jax.ShapeDtypeStruct((bh, hw, c), jnp.float32),
            jax.ShapeDtypeStruct((bh, n_points, lq), jnp.float32),
            jax.ShapeDtypeStruct((bh, n_points, lq), jnp.float32),
            jax.ShapeDtypeStruct((bh, n_points, lq), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((tq, hw), jnp.float32),
                        pltpu.VMEM((tq, hw), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(vt, locx, locy, attn, g)
    # back to [bh, lq, P]
    gattn = jnp.swapaxes(gattn, 1, 2)
    gloc = jnp.stack([jnp.swapaxes(glocx, 1, 2),
                      jnp.swapaxes(glocy, 1, 2)], axis=-1)
    return gv, gloc, gattn


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
    tq = 128 if lq >= 128 else _round_up(lq, 128)
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
