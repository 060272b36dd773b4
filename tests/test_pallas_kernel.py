"""Golden tests of the fused Pallas deformable-attention kernel against the
jnp reference implementation (interpret mode — runs on any backend)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emrt_tpu.ops.deformable import deformable_attention_core
from emrt_tpu.ops.deformable_pallas import deformable_attention_pallas


@pytest.fixture(scope="module")
def problem():
    bs, nh, c, P = 2, 4, 32, 6
    shapes = ((8, 8), (4, 4))
    lv = sum(h * w for h, w in shapes)
    lq = 80
    rng = np.random.default_rng(0)
    value = jnp.asarray(rng.standard_normal((bs, lv, nh, c)).astype(np.float32))
    loc = jnp.asarray(rng.uniform(-0.1, 1.1, (bs, lq, nh, 2, P, 2)).astype(np.float32))
    attn = jax.nn.softmax(jnp.asarray(
        rng.standard_normal((bs, lq, nh, 2 * P)).astype(np.float32))
    ).reshape(bs, lq, nh, 2, P)
    return shapes, value, loc, attn


def test_pallas_forward_matches_reference(problem):
    shapes, value, loc, attn = problem
    ref = deformable_attention_core(value, shapes, loc, attn)
    out = deformable_attention_pallas(value, shapes, loc, attn, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_grads_match_reference(problem):
    shapes, value, loc, attn = problem

    def loss_ref(v, l, a):
        return jnp.sum(deformable_attention_core(v, shapes, l, a) ** 2)

    def loss_pal(v, l, a):
        return jnp.sum(deformable_attention_pallas(v, shapes, l, a, True) ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(value, loc, attn)
    gp = jax.grad(loss_pal, argnums=(0, 1, 2))(value, loc, attn)
    for a, b in zip(gr, gp):
        scale = float(jnp.abs(a).max()) + 1e-8
        np.testing.assert_allclose(np.asarray(b) / scale, np.asarray(a) / scale,
                                   rtol=2e-4, atol=2e-5)


def test_pallas_bf16_path_matches_reference(problem):
    """bf16 values select the MXU one-hot y-expansion + bf16 M dot path;
    tolerance reflects bf16 weight/value rounding (~0.4% rel)."""
    shapes, value, loc, attn = problem
    ref = deformable_attention_core(value, shapes, loc, attn)
    out = deformable_attention_pallas(value.astype(jnp.bfloat16), shapes,
                                      loc, attn, True)
    scale = float(jnp.abs(ref).max()) + 1e-8
    np.testing.assert_allclose(np.asarray(out, np.float32) / scale,
                               np.asarray(ref) / scale, atol=2e-2)


@pytest.mark.slow
def test_pallas_bf16_grads_close(problem):
    """bf16 values select the MXU expansion/reduction backward; tolerance
    reflects bf16 rounding of weights, values, and gM products."""
    shapes, value, loc, attn = problem

    def loss_ref(v, l, a):
        return jnp.sum(deformable_attention_core(v, shapes, l, a) ** 2)

    def loss_pal(v, l, a):
        return jnp.sum(deformable_attention_pallas(
            v.astype(jnp.bfloat16), shapes, l, a, True).astype(jnp.float32) ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(value, loc, attn)
    gp = jax.grad(loss_pal, argnums=(0, 1, 2))(value, loc, attn)
    for a, b in zip(gr, gp):
        scale = float(jnp.abs(a).max()) + 1e-8
        np.testing.assert_allclose(np.asarray(b, np.float32) / scale,
                                   np.asarray(a) / scale, atol=5e-2)


def test_pallas_oob_zeros(problem):
    shapes, value, loc, attn = problem
    loc_oob = jnp.full_like(loc, 7.0)
    out = deformable_attention_pallas(value, shapes, loc_oob, attn, True)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


@pytest.mark.slow
def test_level_partitioned_path_exact(problem, monkeypatch):
    """Force the by-level dispatch (the 512^2 route: joint tile too small,
    per-level tiles fine) and require bit-level agreement in both the
    forward and all three grads."""
    from emrt_tpu.ops import deformable_pallas as dp

    shapes, value, loc, attn = problem
    real_fwd_tq, real_bwd_tqs = dp._fwd_tq, dp._bwd_tqs
    lv_joint = sum(h * w for h, w in shapes)

    def fake_fwd_tq(lq, lv, nh, c, itemsize, n_levels=3):
        return 8 if lv == lv_joint else real_fwd_tq(lq, lv, nh, c,
                                                    itemsize, n_levels)

    def fake_bwd_tqs(lq, lv, nh, c, itemsize, n_levels=3):
        return (8, 8) if lv == lv_joint else real_bwd_tqs(lq, lv, nh, c,
                                                          itemsize,
                                                          n_levels)

    def loss(v, l, a):
        return jnp.sum(deformable_attention_pallas(v, shapes, l, a, True) ** 2)

    out_joint = deformable_attention_pallas(value, shapes, loc, attn, True)
    g_joint = jax.grad(loss, argnums=(0, 1, 2))(value, loc, attn)

    monkeypatch.setattr(dp, "_fwd_tq", fake_fwd_tq)
    monkeypatch.setattr(dp, "_bwd_tqs", fake_bwd_tqs)
    out_part = deformable_attention_pallas(value, shapes, loc, attn, True)
    g_part = jax.grad(loss, argnums=(0, 1, 2))(value, loc, attn)

    np.testing.assert_allclose(np.asarray(out_part), np.asarray(out_joint),
                               rtol=1e-6, atol=1e-6)
    for a, b in zip(g_joint, g_part):
        scale = float(jnp.abs(a).max()) + 1e-8
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale,
                                   rtol=1e-5, atol=1e-6)


def test_512_shapes_stay_on_pallas_within_vmem():
    """Regression for the round-3 bench crash: at the 512^2 EMRT shapes
    (lq=lv=5376, levels 64^2/32^2/16^2, P=6) the dispatch must (a) take
    the level-partitioned path, not the jnp fallback, and (b) pick
    per-level tiles whose single-level VMEM estimate stays under the
    16MB scoped limit (lv=1024 at tq=448 measured 17.95M and crashed
    the compile helper)."""
    from emrt_tpu.ops import deformable_pallas as dp

    shapes = ((64, 64), (32, 32), (16, 16))
    lq = lv = sum(h * w for h, w in shapes)
    nh, c, P = 8, 32, 6

    joint = dp._fwd_tq(lq, lv, nh, c, 2, len(shapes))
    per_l = [dp._fwd_tq(lq, h * w, nh, c, 2, 1) for h, w in shapes]
    # partition must trigger (joint tile tiny or zero, per-level viable)
    assert joint < 128 and min(per_l) > joint
    for (h, w), tq in zip(shapes, per_l):
        est = 9 * 4 * h * w * tq + int(2.5 * h * w * nh * c * 2)
        assert 0 < est < 15.0e6, ((h, w), tq, est)
    for (h, w) in shapes:
        tq_gv, tq_gla = dp._bwd_tqs(lq, h * w, nh, c, 2, 1)
        assert tq_gv > 0 and tq_gla > 0
        gv_est = 9 * 4 * h * w * tq_gv + h * w * nh * c * 4
        gla_est = 16 * 4 * h * w * tq_gla + h * w * nh * c * 2
        assert gv_est < 15.0e6 and gla_est < 15.0e6, ((h, w), tq_gv, tq_gla)


def test_banded_forward_matches_reference():
    """Value-axis banding (single-level call whose joint query tile came
    out small — the 64x64 level of the 512^2 path): the banded grid must
    trigger and its accumulated output must match the unbanded reference
    exactly (bands partition lv, so the sum is exact in f32)."""
    from emrt_tpu.ops import deformable_pallas as dp

    h, w, lq, nh, c, P = 32, 32, 512, 8, 64, 4
    shapes = ((h, w),)
    lv = h * w
    tq = dp._fwd_tq(lq, lv, nh, c, 4, 1)
    assert tq < 256  # precondition: banding path engages for this problem
    chunk_rows, nc, tq_c = dp._pick_fwd_chunk(lq, h, w, nh, c, 4, tq)
    assert chunk_rows > 0 and nc >= 2 and tq_c > tq

    rng = np.random.default_rng(3)
    value = jnp.asarray(rng.standard_normal((2, lv, nh, c)).astype(np.float32))
    loc = jnp.asarray(rng.uniform(-0.1, 1.1, (2, lq, nh, 1, P, 2)
                                  ).astype(np.float32))
    attn = jax.nn.softmax(jnp.asarray(
        rng.standard_normal((2, lq, nh, P)).astype(np.float32))
    ).reshape(2, lq, nh, 1, P)

    ref = deformable_attention_core(value, shapes, loc, attn)
    out = deformable_attention_pallas(value, shapes, loc, attn, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    out_bf = deformable_attention_pallas(value.astype(jnp.bfloat16), shapes,
                                         loc, attn, True)
    scale = float(jnp.abs(ref).max()) + 1e-8
    np.testing.assert_allclose(np.asarray(out_bf, np.float32) / scale,
                               np.asarray(ref) / scale, atol=2e-2)


def test_banded_forward_skips_unhit_bands_exactly():
    """Local sampling (the trained-offset regime the whole-band hit test
    targets): each query samples within a few pixels of its own grid row,
    so most value bands are skipped — the output must still match the
    unbanded reference exactly, including for queries whose support
    straddles a band boundary."""
    from emrt_tpu.ops import deformable_pallas as dp

    h, w, nh, c, P = 32, 32, 8, 64, 4
    shapes = ((h, w),)
    lv = h * w
    lq = lv
    tq = dp._fwd_tq(lq, lv, nh, c, 4, 1)
    chunk_rows, nc, _ = dp._pick_fwd_chunk(lq, h, w, nh, c, 4, tq)
    assert chunk_rows > 0 and nc >= 2

    rng = np.random.default_rng(7)
    yy, xx = np.meshgrid(np.arange(h) + 0.5, np.arange(w) + 0.5,
                         indexing="ij")
    ref_pts = np.stack([xx / w, yy / h], -1).reshape(1, lq, 1, 1, 1, 2)
    off = rng.uniform(-2.5, 2.5, (2, lq, nh, 1, P, 2)) / np.array([w, h])
    loc = jnp.asarray((ref_pts + off).astype(np.float32))
    value = jnp.asarray(rng.standard_normal((2, lv, nh, c)).astype(np.float32))
    attn = jax.nn.softmax(jnp.asarray(
        rng.standard_normal((2, lq, nh, P)).astype(np.float32))
    ).reshape(2, lq, nh, 1, P)

    ref = deformable_attention_core(value, shapes, loc, attn)
    out = deformable_attention_pallas(value, shapes, loc, attn, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
