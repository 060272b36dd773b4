import jax
import jax.numpy as jnp
import numpy as np
import optax

from emrt_tpu.config import get_config
from emrt_tpu.losses import (CrossEntropyLoss, MixSoftmaxCrossEntropyLoss,
                             MultiCrossEntropyLoss, OhemCrossEntropyLoss,
                             get_loss_function)
from emrt_tpu.solver import get_optimizer, get_scheduler, param_labels
from emrt_tpu.solver.lr_scheduler import polynomial_decay


def test_masked_ce_ignores_ignore_index():
    logits = jnp.zeros((1, 2, 2, 3))
    label = jnp.array([[[0, 255], [255, 255]]])
    loss = CrossEntropyLoss(255)([logits], label)
    # uniform logits -> loss = log(3) on the single valid pixel
    np.testing.assert_allclose(float(loss), np.log(3), rtol=1e-6)


def test_mix_softmax_aux_weighting():
    rng = np.random.default_rng(0)
    main = jnp.asarray(rng.standard_normal((2, 4, 4, 3)).astype(np.float32))
    aux = jnp.asarray(rng.standard_normal((2, 4, 4, 3)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, 3, (2, 4, 4)))
    ce = CrossEntropyLoss(255)
    mix = MixSoftmaxCrossEntropyLoss(255, aux=True, aux_weight=0.4)
    expected = float(ce([main], label)) + 0.4 * float(ce([aux], label))
    np.testing.assert_allclose(float(mix([main, aux], label)), expected, rtol=1e-6)


def test_multi_ce_weights():
    logits = jnp.zeros((1, 2, 2, 3))
    label = jnp.zeros((1, 2, 2), jnp.int32)
    loss = MultiCrossEntropyLoss(255, weights=[1, 0.5])([logits, logits], label)
    np.testing.assert_allclose(float(loss), 1.5 * np.log(3), rtol=1e-6)


def test_ohem_keeps_hard_pixels():
    # one confidently-right pixel, one wrong pixel -> ohem keeps the hard one
    logits = jnp.array([[[[10.0, 0, 0], [0, 10.0, 0]]]])  # [1,1,2,3]
    label = jnp.array([[[0, 2]]])
    loss = OhemCrossEntropyLoss(255, thresh=0.7, min_kept=1)([logits], label)
    assert float(loss) > 5.0  # dominated by the hard pixel


def test_poly_decay_schedule():
    sched = polynomial_decay(0.01, 100, 0.0, 0.9)
    np.testing.assert_allclose(float(sched(jnp.asarray(0))), 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(sched(jnp.asarray(100))), 0.0, atol=1e-8)
    np.testing.assert_allclose(float(sched(jnp.asarray(50))),
                               0.01 * 0.5 ** 0.9, rtol=1e-5)


def test_optimizer_lr_multiplier_for_offsets():
    cfg = get_config()
    cfg.TRAIN.OPTIMIZER.NAME = "SGD"
    cfg.TRAIN.OPTIMIZER.MOMENTUM = 0.0
    cfg.TRAIN.OPTIMIZER.WEIGHT_DECAY = 0.0
    cfg.TRAIN.OPTIMIZER.GRAD_CLIP = None
    params = {"block": {"sampling_offsets": {"kernel": jnp.ones((2,))},
                        "dense": {"kernel": jnp.ones((2,))}}}
    sched = lambda step: 1.0  # noqa: E731
    tx = get_optimizer(cfg, sched, params=params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, tx.init(params), params)
    # offsets get 0.1x the LR of regular params
    np.testing.assert_allclose(
        np.asarray(updates["block"]["sampling_offsets"]["kernel"]), -0.1)
    np.testing.assert_allclose(
        np.asarray(updates["block"]["dense"]["kernel"]), -1.0)


def test_grad_clip_global_norm():
    cfg = get_config()
    cfg.TRAIN.OPTIMIZER.NAME = "SGD"
    cfg.TRAIN.OPTIMIZER.MOMENTUM = 0.0
    cfg.TRAIN.OPTIMIZER.GRAD_CLIP = 1.0
    cfg.TRAIN.OPTIMIZER.WEIGHT_DECAY = 0.0
    params = {"w": jnp.ones((4,))}
    tx = get_optimizer(cfg, lambda s: 1.0, params=params)
    grads = {"w": jnp.full((4,), 10.0)}
    updates, _ = tx.update(grads, tx.init(params), params)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(updates["w"])), 1.0,
                               rtol=1e-5)


def test_get_loss_function_dispatch():
    cfg = get_config()
    cfg.TRAIN.LOSS = "MixSoftmaxCrossEntropyLoss"
    assert isinstance(get_loss_function(cfg), MixSoftmaxCrossEntropyLoss)
    cfg.TRAIN.LOSS = "OhemCrossEntropyLoss"
    assert isinstance(get_loss_function(cfg), OhemCrossEntropyLoss)


def test_warmup_poly_matches_reference_formula():
    # Exact reference WarmupPolyLR.get_lr() (lr_scheduler.py:172-184)
    from emrt_tpu.solver.lr_scheduler import warmup_poly_lr
    base, init, iters, warm, power, lr_min = 0.01, 1e-6, 200, 30, 0.9, 1e-5
    sched = warmup_poly_lr(base, iters, power, warm, init, lr_min)
    for step in [0, 1, 15, 29, 30, 31, 100, 199, 200]:
        if step < warm:
            ref = init + (base - init) * step / warm
        else:
            ref = init + (base - init) * (1 - (step - warm) / (iters - warm)) ** power
        ref = max(ref, lr_min)
        np.testing.assert_allclose(float(sched(jnp.asarray(step))), ref,
                                   rtol=1e-4, atol=1e-9, err_msg=f"step {step}")


def test_warmup_cosine_matches_reference_formula():
    # Exact reference WarmupCosineLR.get_lr() at defaults (lr_scheduler.py:95-118):
    # cosine frac = step / max_iters, NOT shifted by warmup (warmup_prefix=False)
    from emrt_tpu.solver.lr_scheduler import warmup_cosine_lr
    base, init, iters, warm, lr_min = 0.001, 1e-6, 400, 40, 1e-5
    sched = warmup_cosine_lr(base, iters, warm, init, lr_min)
    for step in [0, 10, 39, 40, 41, 200, 399, 400]:
        if step < warm:
            ref = init + (base - init) * step / warm
        else:
            ref = lr_min + 0.5 * (base - lr_min) * (1 + np.cos(np.pi * step / iters))
        np.testing.assert_allclose(float(sched(jnp.asarray(step))), ref,
                                   rtol=1e-5, err_msg=f"step {step}")


def test_decoder_lr_coef_cli_wiring():
    # get_optimizer called exactly the way train.py calls it: prefixes come
    # from the model's decoder_lr_prefixes attribute (reference setr.py:121-151)
    cfg = get_config()
    cfg.TRAIN.OPTIMIZER.NAME = "SGD"
    cfg.TRAIN.OPTIMIZER.MOMENTUM = 0.0
    cfg.TRAIN.OPTIMIZER.WEIGHT_DECAY = 0.0
    cfg.TRAIN.OPTIMIZER.GRAD_CLIP = 0.0

    class FakeModel:
        decoder_lr_prefixes = ("decoder",)

    model = FakeModel()
    params = {"decoder": {"kernel": jnp.ones((2,))},
              "backbone": {"kernel": jnp.ones((2,))}}
    sched = lambda step: 0.1
    tx = get_optimizer(cfg, sched, params=params, decoder_lr_coef=10.0,
                       decoder_prefixes=getattr(model, "decoder_lr_prefixes", ()))
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, tx.init(params), params)
    np.testing.assert_allclose(np.asarray(updates["backbone"]["kernel"]), -0.1)
    np.testing.assert_allclose(np.asarray(updates["decoder"]["kernel"]), -1.0)
