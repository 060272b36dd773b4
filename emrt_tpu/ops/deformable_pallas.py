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

Forward: ONE pallas_call per attention op (grid = batch x heads x query
tiles). Each cell builds the [Tq, sum(H*W)] sampling matrix M across ALL
levels in VMEM and does a single out = M @ V matmul on the MXU. The
separable bilinear hat is exploited to keep VPU work low: only the x-side
hat is evaluated at full [Tq, H*W] width; the y-side is computed small at
[Tq, H] and expanded on the MXU via a constant one-hot matmul (bf16 path).
Inputs are head-major views of the projection outputs ([bs, nh, Lq, ...],
one cheap transpose each).

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


def _hat(dist):
    """Bilinear (triangle) weight: relu(1 - |dist|)."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(dist))


def _fused_fwd_kernel(loc_ref, attn_ref, v_ref, out_ref, m_ref,
                      *, shapes, tq, n_points):
    """Build M across all levels, then one out = M @ V matmul.

    loc_ref  [1, 1, tq, L*P*2]   (x, y) interleaved, head-major layout
    attn_ref [1, 1, tq, L*P]
    v_ref    [1, 1, sum_hw, c]   this head's value rows
    out_ref  [1, 1, tq, c]
    m_ref    [tq, sum_hw] f32 scratch

    Per point, only the x-side hat runs at full [tq, hw] width against a
    constant col table (k % W). The y-side hat is computed small at
    [tq, H] and expanded to full width:
      * bf16 path: one-hot expansion matmul awy @ E on the MXU
        (E[hh, k] = k//W == hh), overlapping with the VPU's x-side work
        (~7 VPU passes/point instead of ~11; measured 8.8ms vs 16.7ms
        for the bs=32 encoder call);
      * f32 path: full-width VPU hat against the row table (k // W) —
        exact, for strict golden parity.
    Accumulating through the scratch ref (not SSA) keeps Mosaic register
    pressure flat — long unrolled SSA chains at hw >= 1024 crash the
    compile helper."""
    bf16 = v_ref.dtype == jnp.bfloat16
    off = 0
    for l, (h, w) in enumerate(shapes):
        hw = h * w
        col_t = (jax.lax.broadcasted_iota(jnp.int32, (tq, hw), 1) % w
                 ).astype(jnp.float32)
        if bf16:
            rowh = jax.lax.broadcasted_iota(jnp.int32, (tq, h), 1
                                            ).astype(jnp.float32)
            kk = jax.lax.broadcasted_iota(jnp.int32, (h, hw), 1)
            hh = jax.lax.broadcasted_iota(jnp.int32, (h, hw), 0)
            expand = (kk // w == hh).astype(jnp.bfloat16)
        else:
            row_t = (jax.lax.broadcasted_iota(jnp.int32, (tq, hw), 1) // w
                     ).astype(jnp.float32)
        for p in range(n_points):
            j = l * n_points + p
            x_pix = loc_ref[0, 0, :, 2 * j:2 * j + 1] * w - 0.5   # [tq, 1]
            y_pix = loc_ref[0, 0, :, 2 * j + 1:2 * j + 2] * h - 0.5
            a = attn_ref[0, 0, :, j:j + 1]
            wx_exp = _hat(col_t - x_pix)                          # [tq, hw]
            # a * hat(dy) == relu(a - a*|dy|) for a >= 0 (softmaxed)
            if bf16:
                awy_s = jnp.maximum(a - a * jnp.abs(rowh - y_pix), 0.0)
                awy = jnp.dot(awy_s.astype(jnp.bfloat16), expand,
                              preferred_element_type=jnp.float32)
            else:
                awy = jnp.maximum(a - a * jnp.abs(row_t - y_pix), 0.0)
            plane = wx_exp * awy
            if p == 0:
                m_ref[:, off:off + hw] = plane
            else:
                m_ref[:, off:off + hw] += plane
        off += hw
    v = v_ref[0, 0]
    if bf16:
        out = jnp.dot(m_ref[:].astype(jnp.bfloat16), v,
                      preferred_element_type=jnp.float32)
    else:
        out = jax.lax.dot_general(
            m_ref[:], v.astype(jnp.float32), (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    out_ref[0, 0] = out.astype(out_ref.dtype)


def _pick_tq(lq, lv):
    """Query tile: big tiles amortize per-cell overhead, but the kernel's
    VMEM footprint (M scratch + hoisted row tables + per-point
    intermediates) is ~7 f32 buffers of [tq, lv] — stay under the 16MB
    scoped limit with headroom (empirically tq=448 @ lv=1344 ran 192KB
    over)."""
    budget = max(32, int(14.5e6 / (7 * 4 * lv)) // 8 * 8)
    if lq <= budget:
        return _round_up(lq, 8)
    for tq in (512, 448, 384, 336, 256, 224, 192, 160, 128, 96, 64, 32):
        if tq <= budget and lq % tq == 0:
            return tq
    return min(budget, 512)


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
        g=pl.BlockSpec((1, tq, c), lambda i, j: (i, j, 0),
                       memory_space=pltpu.VMEM),
        gv=pl.BlockSpec((1, hw, c), lambda i, j: (i, 0, 0),
                        memory_space=pltpu.VMEM),
        plane=pl.BlockSpec((1, n_points, tq), lambda i, j: (i, 0, j),
                           memory_space=pltpu.VMEM),
    )


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
    """Fused forward: one pallas_call over (batch, heads, query tiles)."""
    bs, lv, nh, c = value.shape
    lq = loc_all.shape[1]
    n_levels, n_points = loc_all.shape[3], loc_all.shape[4]
    assert lv == sum(h * w for h, w in spatial_shapes)
    residuals = (value, loc_all, attn_all)

    tq = _pick_tq(lq, lv)
    lq_pad = _round_up(lq, tq)
    pad = lq_pad - lq
    # head-major layouts (Pallas blocks tile the LAST TWO dims):
    # [bs, Lq, nh, L, P, 2] -> [bs, nh, Lq, L*P*2], value -> [bs, nh, Lv, c]
    loc2 = jnp.swapaxes(
        loc_all.reshape(bs, lq, nh, n_levels * n_points * 2), 1, 2
    ).astype(jnp.float32)
    attn2 = jnp.swapaxes(
        attn_all.reshape(bs, lq, nh, n_levels * n_points), 1, 2
    ).astype(jnp.float32)
    v2 = jnp.swapaxes(value, 1, 2)
    if pad:
        loc2 = jnp.pad(loc2, ((0, 0), (0, 0), (0, pad), (0, 0)))
        attn2 = jnp.pad(attn2, ((0, 0), (0, 0), (0, pad), (0, 0)))

    lp2, lp = loc2.shape[-1], attn2.shape[-1]
    out = pl.pallas_call(
        functools.partial(_fused_fwd_kernel, shapes=tuple(spatial_shapes),
                          tq=tq, n_points=n_points),
        grid=(bs, nh, lq_pad // tq),
        in_specs=[
            pl.BlockSpec((1, 1, tq, lp2), lambda i, h, j: (i, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tq, lp), lambda i, h, j: (i, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lv, c), lambda i, h, j: (i, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tq, c), lambda i, h, j: (i, h, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bs, nh, lq_pad, c), value.dtype),
        scratch_shapes=[pltpu.VMEM((tq, lv), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(loc2, attn2, v2)
    out = jnp.swapaxes(out[:, :, :lq], 1, 2).reshape(bs, lq, nh * c)
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
