"""Sliding-window / single-scale / multi-scale TTA inference.

Behavior-equivalent to the reference inference engine
(src/api/infer.py:22-260: overlap sliding window with sum/count stitch,
ss_inference resize-to-ori + softmax + argmax, ms_inference scale x h-flip
TTA) — but TPU-first: window coordinates are static python ints, all windows
of a batch are stacked into one device batch for a single model call (the
reference loops windows in python issuing one forward per grid cell), and
the stitch is a static-slice scatter-add that XLA fuses. No host round-trips
inside a batch.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import resize_bilinear


def window_grid(img_h: int, img_w: int, crop, stride):
    """Static (h1, w1) window origins covering the image
    (reference slide_inference rows/cols + clamping, infer.py:43-60)."""
    w_crop, h_crop = crop
    w_stride, h_stride = stride
    rows = max(img_h - h_crop + h_stride - 1, 0) // h_stride + 1
    cols = max(img_w - w_crop + w_stride - 1, 0) // w_stride + 1
    coords = []
    for r in range(rows):
        for c in range(cols):
            h1 = min(r * h_stride, max(img_h - h_crop, 0))
            w1 = min(c * w_stride, max(img_w - w_crop, 0))
            coords.append((h1, w1))
    # dedupe clamped duplicates, preserve order
    seen, out = set(), []
    for hw in coords:
        if hw not in seen:
            seen.add(hw)
            out.append(hw)
    return out


@functools.lru_cache(maxsize=64)
def _slide_fn(forward, bs: int, img_h: int, img_w: int, ch: int,
              h_crop: int, w_crop: int, coords: tuple, win_per_chunk: int,
              num_classes: int):
    """ONE jitted whole-slide program for a given geometry: a fori_loop
    over uniform window chunks, each iteration extracting its windows with
    dynamic slices, running `forward` once (traced a single time), and
    scatter-adding into the sum/count canvases. Coordinates are data, so
    a 6000^2 Potsdam raster (1225 windows, 39 chunks) is a single dispatch
    that never holds more than one chunk's windows/logits in HBM.

    The returned program takes ``(imgs, *fwd_args)`` and calls
    ``forward(windows, *fwd_args)`` — anything that changes between calls
    (params, batch_stats) MUST flow through fwd_args; values `forward`
    merely closes over are baked into the cached executable as constants
    at first trace and go stale (advisor finding, round 2)."""
    coords_np = np.asarray(coords, np.int32)
    n = coords_np.shape[0]
    n_chunks = -(-n // win_per_chunk)
    # pad the tail chunk by REPEATING the last window: its logits and its
    # count both double, so canvas/count is unchanged — and every chunk
    # shares the single traced (extract, forward, stitch) body
    pad = n_chunks * win_per_chunk - n
    if pad:
        coords_np = np.concatenate(
            [coords_np, np.repeat(coords_np[-1:], pad, 0)], 0)
    coords_np = coords_np.reshape(n_chunks, win_per_chunk, 2)

    @jax.jit
    def slide(imgs, *fwd_args):
        coords_dev = jnp.asarray(coords_np)
        canvas = jnp.zeros((bs, img_h, img_w, num_classes), jnp.float32)
        count = jnp.zeros((bs, img_h, img_w, 1), jnp.float32)
        one = jnp.ones((bs, h_crop, w_crop, 1), jnp.float32)

        def chunk_body(ci, carry):
            canvas, count = carry
            cs = coords_dev[ci]                          # [k, 2]

            def extract(c):
                return jax.lax.dynamic_slice(
                    imgs, (0, c[0], c[1], 0), (bs, h_crop, w_crop, ch))

            wins = jax.lax.map(extract, cs)              # [k, bs, hc, wc, ch]
            logits = forward(
                wins.reshape(win_per_chunk * bs, h_crop, w_crop, ch),
                *fwd_args)
            logits = logits.reshape(win_per_chunk, bs, h_crop, w_crop,
                                    num_classes).astype(jnp.float32)

            def stitch_body(i, carry):
                canvas, count = carry
                h1, w1 = cs[i, 0], cs[i, 1]
                blk = jax.lax.dynamic_slice(
                    canvas, (0, h1, w1, 0), (bs, h_crop, w_crop, num_classes))
                canvas = jax.lax.dynamic_update_slice(
                    canvas, blk + logits[i], (0, h1, w1, 0))
                cnt = jax.lax.dynamic_slice(count, (0, h1, w1, 0),
                                            (bs, h_crop, w_crop, 1))
                count = jax.lax.dynamic_update_slice(count, cnt + one,
                                                     (0, h1, w1, 0))
                return canvas, count

            return jax.lax.fori_loop(0, win_per_chunk, stitch_body,
                                     (canvas, count))

        canvas, count = jax.lax.fori_loop(0, n_chunks, chunk_body,
                                          (canvas, count))
        return canvas / count

    return slide


def _slide_small(forward, imgs, coords, h_crop, w_crop, num_classes,
                 win_per_chunk, fwd_args=()):
    """Unrolled static-slice slide for small window grids: XLA fuses and
    overlaps the slices/stitch freely — measurably faster than the rolled
    fori path at eval-sized grids (581 vs 434 tiles/s at 36 windows)."""
    bs, img_h, img_w, _ = imgs.shape

    def stack_windows(cs):
        return jnp.concatenate(
            [jax.lax.slice(imgs, (0, h1, w1, 0),
                           (bs, h1 + h_crop, w1 + w_crop, imgs.shape[3]))
             for h1, w1 in cs], axis=0)

    chunks = []
    for i in range(0, len(coords), win_per_chunk):
        # ragged tails stay ragged here: padding them costs up to
        # win_per_chunk-1 extra forwards per batch (-25% at 36 windows),
        # while the extra compile shape is one-off
        cs = list(coords[i:i + win_per_chunk])
        chunks.append((forward(stack_windows(cs), *fwd_args)
                       .astype(jnp.float32), cs))

    canvas = jnp.zeros((bs, img_h, img_w, num_classes), jnp.float32)
    count = jnp.zeros((bs, img_h, img_w, 1), jnp.float32)
    one = jnp.ones((bs, h_crop, w_crop, 1), jnp.float32)
    for logits, cs in chunks:
        for i, (h1, w1) in enumerate(cs):
            canvas = canvas.at[:, h1:h1 + h_crop, w1:w1 + w_crop, :].add(
                logits[i * bs:(i + 1) * bs])
            count = count.at[:, h1:h1 + h_crop, w1:w1 + w_crop, :].add(one)
    return canvas / count


_BIG_RASTER_WINDOWS = 128


def slide_inference(forward, imgs: jnp.ndarray, crop, stride,
                    num_classes: int, window_batch: int | None = None,
                    fwd_args=()):
    """Overlap sliding-window logits for a uniform-shape NHWC batch.

    forward: (images [n, ch, cw, 3], *fwd_args) -> logits [n, ch, cw, C].
    Must be a stable callable (the big-raster path caches per
    (forward, geometry)); anything that changes between calls — params,
    batch_stats — must be passed via fwd_args, NOT closed over, or it is
    baked into the cached big-raster executable at first trace.
    Returns [bs, H, W, C] stitched (sum / count) logits.

    Small grids (eval-sized) use the unrolled static-slice path; big
    rasters (> 128 windows, e.g. whole 6000^2 Potsdam tiles) switch to
    the single-dispatch rolled program in _slide_fn.
    """
    bs, img_h, img_w, ch = imgs.shape
    w_crop, h_crop = crop
    h_crop = min(h_crop, img_h)
    w_crop = min(w_crop, img_w)
    coords = window_grid(img_h, img_w, (w_crop, h_crop), stride)
    n = len(coords)
    win_per_chunk = (n if window_batch is None
                     else max(1, min(n, window_batch // max(bs, 1))))
    if n <= _BIG_RASTER_WINDOWS:
        return _slide_small(forward, imgs, coords, h_crop, w_crop,
                            num_classes, win_per_chunk, fwd_args)
    fn = _slide_fn(forward, bs, img_h, img_w, ch, h_crop, w_crop,
                   tuple(coords), win_per_chunk, num_classes)
    return fn(imgs, *fwd_args)


def ss_inference(forward, imgs, ori_shape, is_slide: bool, base_size,
                 stride_size, crop_size, num_classes: int,
                 rescale_from_ori: bool = False,
                 window_batch: int | None = None, fwd_args=()):
    """Single-scale inference -> per-image argmax predictions
    (reference infer.py:82-157). imgs: uniform NHWC batch."""
    if not is_slide:
        logits = forward(imgs, *fwd_args).astype(jnp.float32)
    else:
        if rescale_from_ori and base_size:
            h, w = imgs.shape[1:3]
            if min(h, w) < min(base_size):
                short = min(base_size)
                nh, nw = (int(short * h / w), short) if h > w else (short, int(short * w / h))
                imgs = resize_bilinear(imgs, (nh, nw))
            # fallthrough into slide on the rescaled batch
        logits = slide_inference(forward, imgs, crop_size, stride_size,
                                 num_classes, window_batch, fwd_args)
    if ori_shape is not None:
        logits = resize_bilinear(logits, ori_shape, align_corners=False)
        prob = jax.nn.softmax(logits, axis=-1)
        return jnp.argmax(prob, axis=-1).astype(jnp.int32)
    return logits


def ms_inference(forward, imgs, ori_shape, is_slide: bool, base_size,
                 stride_size, crop_size, num_classes: int,
                 scales=(1.0,), flip_horizontal: bool = True,
                 flip_vertical: bool = False,
                 window_batch: int | None = None, fwd_args=()):
    """Multi-scale + flip TTA -> argmax predictions (reference infer.py:160-260)."""
    bs, h_input, w_input, _ = imgs.shape
    if ori_shape is None:
        ori_shape = (h_input, w_input)
    final = jnp.zeros((bs,) + tuple(ori_shape) + (num_classes,), jnp.float32)
    for scale in scales:
        h = int(h_input * scale + 0.5)
        w = int(w_input * scale + 0.5)
        # keep the short edge >= crop (reference :236-242)
        if min(h, w) < crop_size[0]:
            short = crop_size[0]
            h, w = (int(short * h / w), short) if h > w else (short, int(short * w / h))
        scaled = resize_bilinear(imgs, (h, w))
        logit = slide_inference(forward, scaled, crop_size, stride_size,
                                num_classes, window_batch, fwd_args)
        logit = resize_bilinear(logit, ori_shape, align_corners=False)
        final = final + jax.nn.softmax(logit, axis=-1)
        if flip_horizontal:
            logit = slide_inference(forward, scaled[:, :, ::-1], crop_size,
                                    stride_size, num_classes, window_batch,
                                    fwd_args)
            logit = logit[:, :, ::-1]
            logit = resize_bilinear(logit, ori_shape, align_corners=False)
            final = final + jax.nn.softmax(logit, axis=-1)
        if flip_vertical:
            logit = slide_inference(forward, scaled[:, ::-1], crop_size,
                                    stride_size, num_classes, window_batch,
                                    fwd_args)
            logit = logit[:, ::-1]
            logit = resize_bilinear(logit, ori_shape, align_corners=False)
            final = final + jax.nn.softmax(logit, axis=-1)
    return jnp.argmax(final, axis=-1).astype(jnp.int32)
