import jax
import jax.numpy as jnp
import numpy as np

from emrt_tpu.inference.slide import (ms_inference, slide_inference,
                                      ss_inference, window_grid)


def test_window_grid_covers_image():
    coords = window_grid(512, 512, (256, 256), (171, 171))
    cover = np.zeros((512, 512), dtype=int)
    for h1, w1 in coords:
        cover[h1:h1 + 256, w1:w1 + 256] += 1
    assert cover.min() >= 1
    # corners covered exactly once, center overlaps
    assert cover[0, 0] == 1 and cover[256, 256] >= 1


def test_window_grid_single_window():
    assert window_grid(256, 256, (256, 256), (256, 256)) == [(0, 0)]


def test_slide_inference_identity_model():
    # a "model" that returns a constant per-pixel class score = mean of window
    def forward(x):
        m = jnp.mean(x, axis=-1, keepdims=True)
        return jnp.concatenate([m, -m], axis=-1)

    imgs = jnp.asarray(np.random.default_rng(0)
                       .standard_normal((2, 64, 64, 3)).astype(np.float32))
    out = slide_inference(forward, imgs, (32, 32), (16, 16), 2)
    assert out.shape == (2, 64, 64, 2)
    # stitched logits must equal direct forward because the model is pointwise
    direct = forward(imgs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(direct),
                               rtol=1e-5, atol=1e-5)


def test_ss_inference_pred_shape_and_resize():
    def forward(x):
        m = jnp.mean(x, axis=-1, keepdims=True)
        return jnp.concatenate([m, -m], axis=-1)

    imgs = jnp.asarray(np.random.default_rng(1)
                       .standard_normal((2, 64, 64, 3)).astype(np.float32))
    pred = ss_inference(forward, imgs, (100, 80), True, (64, 64),
                        (32, 32), (32, 32), 2)
    assert pred.shape == (2, 100, 80)
    assert pred.dtype == jnp.int32
    assert set(np.unique(np.asarray(pred))) <= {0, 1}


def test_ms_inference_flip_consistency():
    # pointwise symmetric model: flip TTA must not change the argmax
    def forward(x):
        m = jnp.mean(x, axis=-1, keepdims=True)
        return jnp.concatenate([m, -m], axis=-1)

    imgs = jnp.asarray(np.random.default_rng(2)
                       .standard_normal((1, 64, 64, 3)).astype(np.float32))
    pred_ss = ss_inference(forward, imgs, (64, 64), True, (64, 64),
                           (64, 64), (64, 64), 2)
    pred_ms = ms_inference(forward, imgs, (64, 64), True, (64, 64),
                           (64, 64), (64, 64), 2, scales=(1.0,),
                           flip_horizontal=True)
    np.testing.assert_array_equal(np.asarray(pred_ss), np.asarray(pred_ms))


def test_slide_inference_window_batching():
    """Whole-tile path: many windows chunked into fixed model batches."""
    calls = []

    def forward(x):
        calls.append(x.shape[0])
        m = jnp.mean(x, axis=-1, keepdims=True)
        return jnp.concatenate([m, -m], axis=-1)

    imgs = jnp.asarray(np.random.default_rng(3)
                       .standard_normal((1, 96, 96, 3)).astype(np.float32))
    out = slide_inference(forward, imgs, (32, 32), (32, 32), 2,
                          window_batch=4)
    assert out.shape == (1, 96, 96, 2)
    assert all(c <= 4 for c in calls)          # chunked
    direct = forward(imgs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(direct),
                               rtol=1e-5, atol=1e-5)


def test_ms_inference_multiple_scales():
    def forward(x):
        m = jnp.mean(x, axis=-1, keepdims=True)
        return jnp.concatenate([m, -m], axis=-1)

    imgs = jnp.asarray(np.random.default_rng(4)
                       .standard_normal((1, 64, 64, 3)).astype(np.float32))
    pred = ms_inference(forward, imgs, (64, 64), True, (64, 64),
                        (32, 32), (32, 32), 2, scales=(0.5, 1.0, 1.5),
                        flip_horizontal=True, flip_vertical=True)
    assert pred.shape == (1, 64, 64)
