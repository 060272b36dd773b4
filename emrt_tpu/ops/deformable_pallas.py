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
                      *, shapes, tq, n_points, n_heads, c,
                      chunk_rows=0, full_h=0):
    """Build M across all levels and heads, one M @ V matmul per head.

    All heads live in LANES (free views of the projection outputs — no
    host-side transposes at all):
      loc_ref  [1, tq, nh*L*P*2]   (head, level, point, xy) lane order
      attn_ref [1, tq, nh*L*P]
      v_ref    [1, sum_hw, nh*c]
      out_ref  [1, tq, nh*c]
      m_ref    [tq, sum_hw] f32 scratch, rebuilt per head
    The constant col/row tables and one-hot expansion matrices are built
    once per cell and shared by every head (8x fewer grid cells than the
    head-per-cell layout).

    Per point, only the x-side hat runs at full [tq, hw] width against a
    constant col table (k % W). The y-side hat is computed small at
    [tq, H] and expanded to full width:
      * bf16 path: one-hot expansion matmul awy @ E on the MXU
        (E[hh, k] = k//W == hh), overlapping with the VPU's x-side work;
      * f32 path: full-width VPU hat against the row table (k // W) —
        exact, for strict golden parity.
    Accumulating through the scratch ref (not SSA) keeps Mosaic register
    pressure flat — long unrolled SSA chains at hw >= 1024 crash the
    compile helper.

    chunk_rows > 0 (single-level big rasters, e.g. the 64x64 level of the
    512^2 path): the value axis is split into row-bands of `chunk_rows`
    rows over a third grid dimension and the output accumulates across
    bands (out = sum_k M[:, band_k] @ V[band_k] — exact since bands
    partition lv). Holding one band instead of the full level shrinks the
    [tq, hw] temporaries ~nc-fold, so tq grows from ~56 to >=256 and the
    M @ V matmuls run with full MXU row utilization. The sampling hat
    tables shift by the band's first row (full_h keeps the y scaling
    global)."""
    bf16 = v_ref.dtype == jnp.bfloat16
    n_levels = len(shapes)
    chunked = chunk_rows > 0
    if chunked:
        row0 = (pl.program_id(2) * chunk_rows).astype(jnp.float32)

        @pl.when(pl.program_id(2) == 0)
        def _():
            out_ref[0] = jnp.zeros_like(out_ref[0])

        # EXACT whole-band skip: a point's bilinear y-hat is nonzero only
        # for rows within 1 of y_pix, so after the band shift its support
        # intersects this band iff y_pix is in (-1, chunk_rows). If NO
        # (query, head, point) in the tile hits, the band's contribution
        # is identically zero and the whole cell (48 plane builds + the
        # M @ V matmuls) is skipped. Deformable offsets are near their
        # reference points both at init (rotated-grid bias, lr x0.1) and
        # after training, so a ~5-row query tile touches 1-2 of the nc
        # bands; the test itself is one [tq, nh*L*P*2] elementwise pass.
        locs = loc_ref[0]
        is_y = (jax.lax.broadcasted_iota(jnp.int32, locs.shape, 1) % 2
                ) == 1
        y_all = locs * full_h - 0.5 - row0
        band_hit = jnp.any(is_y & (y_all > -1.0)
                           & (y_all < float(chunk_rows)))

    tables = []
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
            tables.append((col_t, rowh, expand))
        else:
            row_t = (jax.lax.broadcasted_iota(jnp.int32, (tq, hw), 1) // w
                     ).astype(jnp.float32)
            tables.append((col_t, row_t, None))

    def _heads_body():
        for hd in range(n_heads):
            off = 0
            for l, (h, w) in enumerate(shapes):
                hw = h * w
                y_scale = full_h if chunked else h
                col_t, row_tab, expand = tables[l]
                for p in range(n_points):
                    j = (hd * n_levels + l) * n_points + p
                    x_pix = loc_ref[0, :, 2 * j:2 * j + 1] * w - 0.5
                    y_pix = loc_ref[0, :, 2 * j + 1:2 * j + 2] * y_scale - 0.5
                    if chunked:
                        y_pix = y_pix - row0
                    a = attn_ref[0, :, j:j + 1].astype(jnp.float32)
                    # a * hat(dy) == relu(a - a*|dy|) for a >= 0 (softmaxed)
                    if bf16:
                        awy_s = jnp.maximum(
                            a - a * jnp.abs(row_tab - y_pix), 0.0)
                        awy = jnp.dot(awy_s.astype(jnp.bfloat16), expand,
                                      preferred_element_type=jnp.float32)
                    else:
                        awy = jnp.maximum(
                            a - a * jnp.abs(row_tab - y_pix), 0.0)
                    plane = _hat(col_t - x_pix) * awy
                    if p == 0:
                        m_ref[:, off:off + hw] = plane
                    else:
                        m_ref[:, off:off + hw] += plane
                off += hw
            v = v_ref[0, :, hd * c:(hd + 1) * c]
            if bf16:
                out = jnp.dot(m_ref[:].astype(jnp.bfloat16), v,
                              preferred_element_type=jnp.float32)
            else:
                out = jax.lax.dot_general(
                    m_ref[:], v.astype(jnp.float32), (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
            if chunked:
                out_ref[0, :, hd * c:(hd + 1) * c] += out.astype(out_ref.dtype)
            else:
                out_ref[0, :, hd * c:(hd + 1) * c] = out.astype(out_ref.dtype)

    if chunked:
        pl.when(band_hit)(_heads_body)
    else:
        _heads_body()


def _pick_tq(lq, lv, fixed_bytes=0, buffers=7):
    """Query tile: big tiles amortize per-cell overhead, but the kernel's
    VMEM footprint (M scratch + hoisted row tables + per-point
    intermediates) is ~`buffers` f32 arrays of [tq, lv] on top of the
    fixed blocks (value slab etc.) — stay under the 16MB scoped limit
    with headroom (empirically: fwd tq=448 @ lv=1344 ran 192KB over with
    7 buffers; the g_loc/g_attn kernel at tq=336 ran 176KB over with its
    extra gm products, hence its 9-buffer estimate). Returns 0 if even
    the smallest tile cannot fit (caller falls back to the jnp path)."""
    avail = 14.5e6 - fixed_bytes
    if avail < 32 * buffers * 4 * lv:
        return 0
    budget = max(32, int(avail / (buffers * 4 * lv)) // 8 * 8)
    if lq <= budget:
        return _round_up(lq, 8)
    for tq in (512, 448, 384, 336, 256, 224, 192, 168, 160, 128, 112,
               96, 64, 56, 48, 32):
        if tq <= budget and lq % tq == 0:
            return tq
    return min(budget, 512)


def _bwd_gv_kernel(loc_ref, attn_ref, g_ref, gv_ref, m_scr,
                   *, shapes, tq, n_points, n_heads, c):
    """gV = M^T @ g, heads in LANES (forward layout, zero transposes).

    Rebuilds the sampling matrix exactly like the forward (tables shared
    by all heads — 8x fewer table constructions than the retired
    head-per-cell layout) and accumulates gv across the query-tile grid
    dim:
      loc_ref  [1, tq, nh*L*P*2]; attn_ref [1, tq, nh*L*P];
      g_ref    [1, tq, nh*c];     gv_ref [1, nh*c, lv] f32 (accumulated,
      head-then-lv layout so lv rides the MXU lanes);
      m_scr    [tq, lv] f32, rebuilt per head.
    Holding only ONE [tq, lv] scratch (no value slab, no gm) is what lets
    tq reach 448 at the encoder shape — the round-2 single-kernel
    heads-in-lanes attempt needed both scratches plus V^T and was VMEM
    bound at tq=112."""
    bf16 = g_ref.dtype == jnp.bfloat16
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        gv_ref[0] = jnp.zeros_like(gv_ref[0])

    n_levels = len(shapes)
    tables = []
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
            tables.append((col_t, rowh, expand))
        else:
            row_t = (jax.lax.broadcasted_iota(jnp.int32, (tq, hw), 1) // w
                     ).astype(jnp.float32)
            tables.append((col_t, row_t, None))

    for hd in range(n_heads):
        off = 0
        for l, (h, w) in enumerate(shapes):
            hw = h * w
            col_t, row_tab, expand = tables[l]
            for p in range(n_points):
                jj = (hd * n_levels + l) * n_points + p
                x_pix = loc_ref[0, :, 2 * jj:2 * jj + 1] * w - 0.5
                y_pix = loc_ref[0, :, 2 * jj + 1:2 * jj + 2] * h - 0.5
                a = attn_ref[0, :, jj:jj + 1].astype(jnp.float32)
                if bf16:
                    awy_s = jnp.maximum(a - a * jnp.abs(row_tab - y_pix), 0.0)
                    awy = jnp.dot(awy_s.astype(jnp.bfloat16), expand,
                                  preferred_element_type=jnp.float32)
                else:
                    awy = jnp.maximum(a - a * jnp.abs(row_tab - y_pix), 0.0)
                plane = _hat(col_t - x_pix) * awy
                if p == 0:
                    m_scr[:, off:off + hw] = plane
                else:
                    m_scr[:, off:off + hw] += plane
            off += hw
        g = g_ref[0, :, hd * c:(hd + 1) * c]
        # output-transposed accumulate: [c, lv] puts lv (not c=32) in the
        # MXU's lane dimension; the host view transposes back for free
        if bf16:
            gv_ref[0, hd * c:(hd + 1) * c, :] += jax.lax.dot_general(
                g, m_scr[:].astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            gv_ref[0, hd * c:(hd + 1) * c, :] += jax.lax.dot_general(
                g.astype(jnp.float32), m_scr[:], (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)


def _bwd_gla_kernel(loc_ref, attn_ref, v_ref, g_ref, gloc_ref, gattn_ref,
                    gm_scr, *, shapes, tq, n_points, n_heads, c):
    """g_loc / g_attn, heads in LANES. Per head gM = g_h @ V_h^T (MXU,
    transposed-operand dot_general — value arrives in its natural
    [lv, nh*c] layout), then the three analytic reductions per point:
        g_attn = sum_k (wx*wy) * gM
        g_locx = attn * W * sum_k (dwx*wy) * gM
        g_locy = attn * H * sum_k (wx*dwy) * gM
    bf16 path: y-side hats at [tq, H]; row-reductions u @ E^T ride the
    MXU; only x-side hats and two gM products run full width on the VPU.

      loc_ref [1, tq, nh*L*P*2]; attn_ref [1, tq, nh*L*P];
      v_ref [1, lv, nh*c]; g_ref [1, tq, nh*c];
      gloc_ref [1, tq, nh*L*P*2]; gattn_ref [1, tq, nh*L*P];
      gm_scr [tq, lv] f32."""
    bf16 = v_ref.dtype == jnp.bfloat16
    n_levels = len(shapes)
    P = n_points
    tables = []
    for l, (h, w) in enumerate(shapes):
        hw = h * w
        col_t = (jax.lax.broadcasted_iota(jnp.int32, (tq, hw), 1) % w
                 ).astype(jnp.float32)
        if bf16:
            # grouped y-side finale, OUTPUT-TRANSPOSED: every reduction /
            # one-hot matmul emits [*, tq] so the MXU's lane (N) dimension
            # carries tq (~168) instead of h (<=32) — the untransposed
            # reduces wasted 3/4 of the output lanes, and the per-point
            # [tq, hw] @ [hw, h] form streams tq rows against a 1-tile-N
            # array while [h_rows x tq_lanes] streams only h rows.
            # rowh4T is P sublane-stacked copies of the row index,
            # `spread_t` broadcasts each point's y row into its group,
            # `ones_bt` sums each group back to one sublane.
            kk_t = jax.lax.broadcasted_iota(jnp.int32, (h, hw), 1)
            hh_t = jax.lax.broadcasted_iota(jnp.int32, (h, hw), 0)
            reduce_t = (kk_t // w == hh_t).astype(jnp.bfloat16)  # [h, hw]
            rowh4t = (jax.lax.broadcasted_iota(jnp.int32, (P * h, tq), 0) % h
                      ).astype(jnp.float32)
            ph4 = jax.lax.broadcasted_iota(jnp.int32, (P * h, P), 0)
            pp4 = jax.lax.broadcasted_iota(jnp.int32, (P * h, P), 1)
            spread_t = (ph4 // h == pp4).astype(jnp.float32)
            ones_bt = spread_t.T
            tables.append((col_t, reduce_t, rowh4t, spread_t, ones_bt))
        else:
            row_t = (jax.lax.broadcasted_iota(jnp.int32, (tq, hw), 1) // w
                     ).astype(jnp.float32)
            tables.append((col_t, row_t))
    if bf16:
        # x/y lane interleave for the gloc store (Mosaic has no
        # [tq, P, 2] -> [tq, 2P] shape cast; one-hot matmuls are exact);
        # contracted against the transposed [P, tq] finale outputs these
        # double as the transpose back to store layout. eye_p transposes
        # [tq, P] <-> [P, tq] the same way.
        jj2 = jax.lax.broadcasted_iota(jnp.int32, (P, 2 * P), 1)
        pp2 = jax.lax.broadcasted_iota(jnp.int32, (P, 2 * P), 0)
        ileave_x = (jj2 == 2 * pp2).astype(jnp.float32)
        ileave_y = (jj2 == 2 * pp2 + 1).astype(jnp.float32)
        eye_p = (jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)
                 == jax.lax.broadcasted_iota(jnp.int32, (P, P), 1)
                 ).astype(jnp.float32)

    for hd in range(n_heads):
        g = g_ref[0, :, hd * c:(hd + 1) * c]
        v = v_ref[0, :, hd * c:(hd + 1) * c]
        if bf16:
            gm_scr[:] = jax.lax.dot_general(
                g, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            gm_scr[:] = jax.lax.dot_general(
                g.astype(jnp.float32), v.astype(jnp.float32),
                (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
        off = 0
        for l, (h, w) in enumerate(shapes):
            hw = h * w
            gm = gm_scr[:, off:off + hw]
            j0 = (hd * n_levels + l) * n_points
            if bf16:
                col_t, reduce_t, rowh4t, spread_t, ones_bt = tables[l]
                urs, trs = [], []
                for p in range(n_points):
                    jj = j0 + p
                    x_pix = loc_ref[0, :, 2 * jj:2 * jj + 1] * w - 0.5
                    dxs = col_t - x_pix
                    wx = jnp.maximum(0.0, 1.0 - jnp.abs(dxs))
                    dwx = jnp.where(wx > 0.0, jnp.sign(dxs), 0.0)
                    u = (gm * wx).astype(jnp.bfloat16)
                    t = (gm * dwx).astype(jnp.bfloat16)
                    # output-transposed reduce: [h, tq], N = tq lanes
                    # (contract B's lanes, the same orientation as the
                    # shipping gm matmul)
                    urs.append(jax.lax.dot_general(
                        reduce_t, u, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32))
                    trs.append(jax.lax.dot_general(
                        reduce_t, t, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32))
                u4t = jnp.concatenate(urs, axis=0)           # [P*h, tq]
                t4t = jnp.concatenate(trs, axis=0)
                # per-point y broadcast into its sublane group (exact: the
                # spread matrix is one-hot and runs at HIGHEST precision
                # — bf16-rounded positions corrupt hat boundaries)
                ys = jnp.concatenate(
                    [loc_ref[0, :, 2 * (j0 + p) + 1:2 * (j0 + p) + 2]
                     for p in range(n_points)], axis=1)      # [tq, P]
                y4t = jax.lax.dot_general(
                    spread_t, ys, (((1,), (1,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32) * h - 0.5
                dys4t = rowh4t - y4t
                wy4t = jnp.maximum(0.0, 1.0 - jnp.abs(dys4t))
                dwy4t = jnp.where(wy4t > 0.0, jnp.sign(dys4t), 0.0)

                def segsum_t(x):                             # [P, tq]
                    return jax.lax.dot_general(
                        ones_bt, x, (((1,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)

                ga4t = segsum_t(u4t * wy4t)
                gx4t = segsum_t(t4t * wy4t)
                gy4t = segsum_t(u4t * dwy4t)
                a4 = attn_ref[0, :, j0:j0 + n_points].astype(jnp.float32)
                a4t = jax.lax.dot_general(                   # [P, tq]
                    eye_p, a4, (((1,), (1,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)

                def t_store(x, m):
                    """[P, tq] x one-hot [P, n] -> [tq, n]: interleave /
                    identity and the transpose back to store layout in
                    one exact matmul."""
                    return jax.lax.dot_general(
                        x, m, (((0,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)

                gl4 = (t_store(a4t * (w * gx4t), ileave_x)
                       + t_store(a4t * (h * gy4t), ileave_y))
                gattn_ref[0, :, j0:j0 + n_points] = t_store(
                    ga4t, eye_p).astype(gattn_ref.dtype)
                gloc_ref[0, :, 2 * j0:2 * (j0 + n_points)] = gl4.astype(
                    gloc_ref.dtype)
            else:
                col_t, row_tab = tables[l]
                gas, glocs = [], []
                for p in range(n_points):
                    jj = j0 + p
                    x_pix = loc_ref[0, :, 2 * jj:2 * jj + 1] * w - 0.5
                    y_pix = loc_ref[0, :, 2 * jj + 1:2 * jj + 2] * h - 0.5
                    a = attn_ref[0, :, jj:jj + 1].astype(jnp.float32)
                    dxs = col_t - x_pix
                    wx = jnp.maximum(0.0, 1.0 - jnp.abs(dxs))
                    dwx = jnp.where(wx > 0.0, jnp.sign(dxs), 0.0)
                    dys = row_tab - y_pix
                    wy = jnp.maximum(0.0, 1.0 - jnp.abs(dys))
                    dwy = jnp.where(wy > 0.0, jnp.sign(dys), 0.0)
                    ga = jnp.sum((gm * wx) * wy, axis=1, keepdims=True)
                    gx = jnp.sum((gm * wy) * dwx, axis=1, keepdims=True)
                    gy = jnp.sum((gm * wx) * dwy, axis=1, keepdims=True)
                    gas.append(ga)
                    glocs.append(a * (w * gx))
                    glocs.append(a * (h * gy))
                gattn_ref[0, :, j0:j0 + n_points] = jnp.concatenate(
                    gas, axis=1).astype(gattn_ref.dtype)
                gloc_ref[0, :, 2 * j0:2 * (j0 + n_points)] = jnp.concatenate(
                    glocs, axis=1).astype(gloc_ref.dtype)
            off += hw


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4))
def deformable_attention_pallas(value, spatial_shapes, sampling_locations,
                                attention_weights, interpret=False):
    """Drop-in replacement for deformable_attention_core.

    value [bs, Lv, nh, c]; sampling_locations [bs, Lq, nh, L, P, 2] (f32);
    attention_weights [bs, Lq, nh, L, P] -> [bs, Lq, nh*c]."""
    out, _ = _fwd(value, spatial_shapes, sampling_locations,
                  attention_weights, interpret)
    return out


_warned_fallback: set = set()


def _warn_fallback(what: str, shapes, lq):
    key = (what, tuple(shapes), lq)
    if key not in _warned_fallback:
        _warned_fallback.add(key)
        from ..utils.logger import logger
        logger.warning(
            f"deformable {what} at shapes={tuple(shapes)} lq={lq} exceeds "
            f"the Pallas VMEM budget even level-partitioned — using the "
            f"(~8x slower) jnp gather path")


def _pick_fwd_chunk(lq, h, w, nh, c, itemsize, tq_base):
    """Pick a value-axis row-band split for a single-level call whose
    joint query tile came out small (big rasters: the 64x64 level of the
    512^2 path runs tq=56 unbanded). Returns (chunk_rows, nc, tq) — the
    smallest band count whose per-band tile reaches 256 queries, or the
    best improvement found; (0, 1, tq_base) if banding doesn't help."""
    best = (0, 1, tq_base)
    for nc in (2, 4, 8, 16):
        if h % nc or h // nc < 8:
            continue
        lv_c = (h // nc) * w
        tq_c = _pick_tq(lq, lv_c,
                        fixed_bytes=int(2.5 * lv_c * nh * c * itemsize),
                        buffers=9)
        if tq_c > best[2]:
            best = (h // nc, nc, tq_c)
        if tq_c >= 256:
            break
    return best


def _fwd_tq(lq, lv, nh, c, itemsize, n_levels=3):
    # fixed VMEM: double-buffered value slab + out block. Single-level
    # calls (the level-partitioned 512^2 path) need a higher buffer
    # estimate: every per-point temporary is full [tq, lv] with no small
    # levels averaging the footprint down (measured: lv=1024 tq=448 ran
    # 1.95M over the 16M scoped limit where the estimate said 14.1M)
    return _pick_tq(lq, lv, fixed_bytes=int(2.5 * lv * nh * c * itemsize),
                    buffers=7 if n_levels > 1 else 9)


def _fwd(value, spatial_shapes, loc_all, attn_all, interpret=False):
    """Fused forward; heads stay in lanes, so every input is a FREE
    reshape of the projection outputs (no transposes).

    Big rasters (512^2 EMRT: lv=5376) that would force tiny query tiles
    in the all-levels call are partitioned BY LEVEL: out = sum_l M_l @
    V_l, each level its own pallas_call holding only its own [tq, hw_l]
    scratch and value slab — the levels are independent in the sampling
    matrix, so this is exact (round-2 verdict item 3)."""
    residuals = (value, loc_all, attn_all)
    return _fwd_dispatch(value, tuple(spatial_shapes), loc_all, attn_all,
                         interpret), residuals


def _fwd_dispatch(value, spatial_shapes, loc_all, attn_all, interpret):
    bs, lv, nh, c = value.shape
    lq = loc_all.shape[1]
    n_levels, n_points = loc_all.shape[3], loc_all.shape[4]
    assert lv == sum(h * w for h, w in spatial_shapes)

    tq = _fwd_tq(lq, lv, nh, c, value.dtype.itemsize, n_levels)
    if tq < 128 and n_levels > 1:
        per_l = [_fwd_tq(lq, h * w, nh, c, value.dtype.itemsize, 1)
                 for h, w in spatial_shapes]
        # partition when every level gets a bigger tile, or when the joint
        # call can't run at all but at least one level can (the oversize
        # level alone falls back to jnp instead of dragging all levels)
        if min(per_l) > tq or (tq == 0 and max(per_l) > 0):
            out, off = None, 0   # f32 level accumulation (bf16 adds drift)
            for l, (h, w) in enumerate(spatial_shapes):
                o = _fwd_dispatch(value[:, off:off + h * w], ((h, w),),
                                  loc_all[:, :, :, l:l + 1],
                                  attn_all[:, :, :, l:l + 1], interpret)
                out = o.astype(jnp.float32) if out is None else out + o
                off += h * w
            return out.astype(value.dtype)
    chunk_rows, nc = 0, 1
    if n_levels == 1 and tq < 256:
        h0, w0 = spatial_shapes[0]
        chunk_rows, nc, tq = _pick_fwd_chunk(
            lq, h0, w0, nh, c, value.dtype.itemsize, tq)
    if tq == 0:
        _warn_fallback("forward", spatial_shapes, lq)
        from .deformable import deformable_attention_core
        return deformable_attention_core(value, spatial_shapes, loc_all,
                                         attn_all)
    lq_pad = _round_up(lq, tq)
    pad = lq_pad - lq
    loc2 = loc_all.reshape(bs, lq, nh * n_levels * n_points * 2
                           ).astype(jnp.float32)
    attn2 = attn_all.reshape(bs, lq, nh * n_levels * n_points
                             ).astype(value.dtype)
    v2 = value.reshape(bs, lv, nh * c)
    if pad:
        loc2 = jnp.pad(loc2, ((0, 0), (0, pad), (0, 0)))
        attn2 = jnp.pad(attn2, ((0, 0), (0, pad), (0, 0)))

    lp2, lp = loc2.shape[-1], attn2.shape[-1]
    if chunk_rows:
        # value-axis banding: grid (bs, query tiles, bands), band innermost
        # so the f32 out block stays resident while bands accumulate
        h0, w0 = spatial_shapes[0]
        lv_c = chunk_rows * w0
        out = pl.pallas_call(
            functools.partial(_fused_fwd_kernel,
                              shapes=((chunk_rows, w0),), tq=tq,
                              n_points=n_points, n_heads=nh, c=c,
                              chunk_rows=chunk_rows, full_h=h0),
            grid=(bs, lq_pad // tq, nc),
            in_specs=[
                pl.BlockSpec((1, tq, lp2), lambda i, j, k: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tq, lp), lambda i, j, k: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lv_c, nh * c), lambda i, j, k: (i, k, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tq, nh * c), lambda i, j, k: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bs, lq_pad, nh * c), jnp.float32),
            scratch_shapes=[pltpu.VMEM((tq, lv_c), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary")),
            interpret=interpret,
        )(loc2, attn2, v2)
        return out[:, :lq].astype(value.dtype)
    out = pl.pallas_call(
        functools.partial(_fused_fwd_kernel, shapes=tuple(spatial_shapes),
                          tq=tq, n_points=n_points, n_heads=nh, c=c),
        grid=(bs, lq_pad // tq),
        in_specs=[
            pl.BlockSpec((1, tq, lp2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, lp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lv, nh * c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, nh * c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bs, lq_pad, nh * c), value.dtype),
        scratch_shapes=[pltpu.VMEM((tq, lv), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(loc2, attn2, v2)
    return out[:, :lq]


def _bwd(spatial_shapes, interpret, residuals, g):
    """Backward host wrapper: TWO heads-in-lanes kernels over the
    forward's (batch, query-tile) grid — a gV pass (M^T @ g, no value
    slab in VMEM) and a g_loc/g_attn pass (gM reductions, no M scratch).
    Splitting halves each kernel's [tq, lv] footprint, so both run at the
    forward's large tq, share hat tables across all 8 heads, and need
    ZERO host-side transposes (every operand is a free view of the
    projection outputs — the retired single-kernel layout swapaxed five
    [bs, lq, ...] tensors per call)."""
    value, loc_all, attn_all = residuals
    return _bwd_dispatch(value, tuple(spatial_shapes), loc_all, attn_all,
                         g, interpret)


def _bwd_tqs(lq, lv, nh, c, itemsize, n_levels=3):
    # single-level calls get higher estimates for the same reason as
    # _fwd_tq: every temporary is full [tq, lv] width
    multi = n_levels > 1
    return (_pick_tq(lq, lv, fixed_bytes=lv * nh * c * 4,
                     buffers=7 if multi else 9),
            # 14 effective buffers: the grouped y-side finale's [tq, P*h]
            # concat temporaries add ~1 equivalent [tq, lv] buffer over
            # the 9 of the per-point form, and the measured footprint
            # creeps with batch (tq=224 ran 624KB over the 16M scoped
            # limit in the bs16 train step; tq=192 ran 12KB over at
            # bs32) - 14 pins tq=168 at the lv=1344 train shape
            _pick_tq(lq, lv, fixed_bytes=lv * nh * c * itemsize,
                     buffers=14 if multi else 16))


def _bwd_dispatch(value, spatial_shapes, loc_all, attn_all, g, interpret):
    bs, lv, nh, c = value.shape
    lq = loc_all.shape[1]
    n_levels, n_points = loc_all.shape[3], loc_all.shape[4]

    tq_gv, tq_gla = _bwd_tqs(lq, lv, nh, c, value.dtype.itemsize, n_levels)
    if min(tq_gv, tq_gla) < 128 and n_levels > 1:
        # level partition (see _fwd): gv rows, g_loc/g_attn level slices
        # are disjoint across levels, so per-level calls are exact
        per_l = [min(_bwd_tqs(lq, h * w, nh, c, value.dtype.itemsize, 1))
                 for h, w in spatial_shapes]
        if (min(per_l) > min(tq_gv, tq_gla)
                or (min(tq_gv, tq_gla) == 0 and max(per_l) > 0)):
            parts, off = [], 0
            for l, (h, w) in enumerate(spatial_shapes):
                parts.append(_bwd_dispatch(
                    value[:, off:off + h * w], ((h, w),),
                    loc_all[:, :, :, l:l + 1], attn_all[:, :, :, l:l + 1],
                    g, interpret))
                off += h * w
            return (jnp.concatenate([p[0] for p in parts], axis=1),
                    jnp.concatenate([p[1] for p in parts], axis=3),
                    jnp.concatenate([p[2] for p in parts], axis=3))
    if tq_gv == 0 or tq_gla == 0:
        _warn_fallback("backward", spatial_shapes, lq)
        from .deformable import deformable_attention_core
        _, vjp = jax.vjp(
            lambda v, l, a: deformable_attention_core(
                v, spatial_shapes, l, a), value, loc_all, attn_all)
        return vjp(g)

    loc2 = loc_all.reshape(bs, lq, nh * n_levels * n_points * 2
                           ).astype(jnp.float32)
    attn2 = attn_all.reshape(bs, lq, nh * n_levels * n_points
                             ).astype(value.dtype)
    v2 = value.reshape(bs, lv, nh * c)
    g2 = g.reshape(bs, lq, nh * c)
    lp2, lp = loc2.shape[-1], attn2.shape[-1]

    def padded(x, tq):
        pad = _round_up(lq, tq) - lq
        return jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x

    lq_gv = _round_up(lq, tq_gv)
    gv = pl.pallas_call(
        functools.partial(_bwd_gv_kernel, shapes=tuple(spatial_shapes),
                          tq=tq_gv, n_points=n_points, n_heads=nh, c=c),
        grid=(bs, lq_gv // tq_gv),
        in_specs=[
            pl.BlockSpec((1, tq_gv, lp2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq_gv, lp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq_gv, nh * c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nh * c, lv), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bs, nh * c, lv), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tq_gv, lv), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(padded(loc2, tq_gv), padded(attn2, tq_gv), padded(g2, tq_gv))

    lq_gla = _round_up(lq, tq_gla)
    gloc2, gattn2 = pl.pallas_call(
        functools.partial(_bwd_gla_kernel, shapes=tuple(spatial_shapes),
                          tq=tq_gla, n_points=n_points, n_heads=nh, c=c),
        grid=(bs, lq_gla // tq_gla),
        in_specs=[
            pl.BlockSpec((1, tq_gla, lp2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq_gla, lp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lv, nh * c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq_gla, nh * c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tq_gla, lp2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq_gla, lp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bs, lq_gla, lp2), jnp.float32),
            jax.ShapeDtypeStruct((bs, lq_gla, lp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((tq_gla, lv), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(padded(loc2, tq_gla), padded(attn2, tq_gla), v2, padded(g2, tq_gla))

    gvalue = gv.reshape(bs, nh, c, lv).transpose(0, 3, 1, 2
                                                 ).astype(value.dtype)
    gloc = gloc2[:, :lq].reshape(
        bs, lq, nh, n_levels, n_points, 2).astype(loc_all.dtype)
    gattn = gattn2[:, :lq].reshape(
        bs, lq, nh, n_levels, n_points).astype(attn_all.dtype)
    return gvalue, gloc, gattn


def _fwd_rule(value, spatial_shapes, loc, attn, interpret=False):
    return _fwd(value, spatial_shapes, loc, attn, interpret)


deformable_attention_pallas.defvjp(_fwd_rule, _bwd)
