import jax.numpy as jnp
import numpy as np

from emrt_tpu.ops.deformable import deformable_attention_core
from emrt_tpu.ops.resize import resize_bilinear, resize_nearest


def _np_resize_bilinear(x, out_h, out_w, align_corners):
    """Scalar numpy reference of paddle/torch bilinear interpolate."""
    b, h, w, c = x.shape
    out = np.zeros((b, out_h, out_w, c), dtype=np.float64)
    for oy in range(out_h):
        for ox in range(out_w):
            if align_corners:
                sy = oy * (h - 1) / max(out_h - 1, 1)
                sx = ox * (w - 1) / max(out_w - 1, 1)
            else:
                sy = min(max((oy + 0.5) * h / out_h - 0.5, 0), h - 1)
                sx = min(max((ox + 0.5) * w / out_w - 0.5, 0), w - 1)
            y0, x0 = int(np.floor(sy)), int(np.floor(sx))
            y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
            fy, fx = sy - y0, sx - x0
            out[:, oy, ox] = ((1 - fy) * (1 - fx) * x[:, y0, x0]
                              + (1 - fy) * fx * x[:, y0, x1]
                              + fy * (1 - fx) * x[:, y1, x0]
                              + fy * fx * x[:, y1, x1])
    return out


def test_resize_bilinear_matches_reference():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 7, 9, 3)).astype(np.float32)
    for ac in (False, True):
        for size in ((14, 18), (3, 5), (7, 9)):
            got = np.asarray(resize_bilinear(jnp.asarray(x), size, align_corners=ac))
            want = _np_resize_bilinear(x, *size, ac)
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_resize_nearest():
    x = np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1)
    got = np.asarray(resize_nearest(jnp.asarray(x), (2, 2)))
    np.testing.assert_array_equal(got[0, :, :, 0], [[0, 2], [8, 10]])


def _np_deformable_core(value, spatial_shapes, loc, attn):
    """Scalar numpy reference of utils.py:64-97 semantics (grid_sample
    align_corners=False, zeros padding)."""
    bs, _, nh, c = value.shape
    _, lq, _, nl, npt, _ = loc.shape
    out = np.zeros((bs, lq, nh, c))
    offsets = np.cumsum([0] + [h * w for h, w in spatial_shapes])
    for b in range(bs):
        for q in range(lq):
            for h_ in range(nh):
                for l in range(nl):
                    hh, ww = spatial_shapes[l]
                    vmap = value[b, offsets[l]:offsets[l + 1], h_].reshape(hh, ww, c)
                    for p in range(npt):
                        x = loc[b, q, h_, l, p, 0] * ww - 0.5
                        y = loc[b, q, h_, l, p, 1] * hh - 0.5
                        x0, y0 = int(np.floor(x)), int(np.floor(y))
                        fx, fy = x - x0, y - y0
                        s = np.zeros(c)
                        for dy, wy in ((0, 1 - fy), (1, fy)):
                            for dx, wx in ((0, 1 - fx), (1, fx)):
                                xi, yi = x0 + dx, y0 + dy
                                if 0 <= xi < ww and 0 <= yi < hh:
                                    s += wx * wy * vmap[yi, xi]
                        out[b, q, h_] += attn[b, q, h_, l, p] * s
    return out.reshape(bs, lq, nh * c)


def test_deformable_core_matches_scalar_reference():
    rng = np.random.default_rng(42)
    bs, nh, c = 2, 2, 4
    spatial_shapes = ((4, 4), (2, 2))
    lv = sum(h * w for h, w in spatial_shapes)
    lq, npt = 5, 3
    nl = len(spatial_shapes)
    value = rng.standard_normal((bs, lv, nh, c)).astype(np.float32)
    # sample a bit outside [0,1] to exercise zero padding
    loc = rng.uniform(-0.2, 1.2, (bs, lq, nh, nl, npt, 2)).astype(np.float32)
    attn = rng.uniform(0, 1, (bs, lq, nh, nl, npt)).astype(np.float32)
    attn /= attn.reshape(bs, lq, nh, -1).sum(-1, keepdims=True).reshape(bs, lq, nh, 1, 1)

    got = np.asarray(deformable_attention_core(
        jnp.asarray(value), spatial_shapes, jnp.asarray(loc), jnp.asarray(attn)))
    want = _np_deformable_core(value, spatial_shapes, loc, attn)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
