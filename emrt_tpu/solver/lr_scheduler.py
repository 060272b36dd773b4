"""LR schedules as optax-compatible schedule functions.

Behavior-equivalent to the reference solver
(src/models/solver/lr_scheduler.py): PolynomialDecay (default,
lr_scheduler.py:244-248), WarmupCosineLR (:30-117), WarmupPolyLR (:120-184),
WarmupMultiStepLR (:187-240). Schedules are pure step->lr functions, so they
trace into the jitted train step.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def polynomial_decay(base_lr: float, decay_steps: int, end_lr: float = 0.0,
                     power: float = 0.9):
    def schedule(step):
        frac = jnp.minimum(step.astype(jnp.float32) if hasattr(step, "astype")
                           else jnp.float32(step), decay_steps) / decay_steps
        return (base_lr - end_lr) * (1.0 - frac) ** power + end_lr
    return schedule


def warmup_poly_lr(base_lr: float, max_iters: int, power: float = 0.9,
                   warmup_steps: int = 0, warmup_init_lr: float = 0.0,
                   lr_min: float = 0.0):
    """Exact reference WarmupPolyLR.get_lr() (lr_scheduler.py:172-184): the
    poly phase decays (base - warmup_lr_init) toward warmup_lr_init over the
    post-warmup span, floored at lr_min (config TRAIN.END_LR)."""
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_init_lr + (base_lr - warmup_init_lr) * step / max(warmup_steps, 1)
        frac = jnp.clip((step - warmup_steps) / max(max_iters - warmup_steps, 1), 0, 1)
        poly = warmup_init_lr + (base_lr - warmup_init_lr) * (1.0 - frac) ** power
        return jnp.maximum(jnp.where(step < warmup_steps, warm, poly), lr_min)
    return schedule


def warmup_cosine_lr(base_lr: float, max_iters: int, warmup_steps: int = 0,
                     warmup_init_lr: float = 0.0, lr_min: float = 0.0):
    """Exact reference WarmupCosineLR.get_lr() (lr_scheduler.py:95-118) at its
    defaults (t_mul=1, decay_rate=1, cycle_limit=0, warmup_prefix=False): the
    cosine phase uses frac = step / max_iters — NOT shifted by warmup_steps —
    and decays from base_lr to lr_min (config TRAIN.END_LR)."""
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_init_lr + (base_lr - warmup_init_lr) * step / max(warmup_steps, 1)
        frac = jnp.clip(step / max(max_iters, 1), 0, 1)
        cos = lr_min + 0.5 * (base_lr - lr_min) * (1.0 + jnp.cos(jnp.pi * frac))
        return jnp.where(step < warmup_steps, warm, cos)
    return schedule


def warmup_multistep_lr(base_lr: float, milestones, gamma: float = 0.1,
                        warmup_steps: int = 0, warmup_init_lr: float = 0.0):
    milestones = np.asarray(sorted(milestones), dtype=np.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_init_lr + (base_lr - warmup_init_lr) * step / max(warmup_steps, 1)
        n_passed = jnp.sum(step >= jnp.asarray(milestones))
        stepped = base_lr * gamma ** n_passed.astype(jnp.float32)
        return jnp.where(step < warmup_steps, warm, stepped)
    return schedule


def get_scheduler(config):
    """(reference lr_scheduler.py:243-267)."""
    name = config.TRAIN.LR_SCHEDULER.NAME
    if name == "PolynomialDecay":
        return polynomial_decay(config.TRAIN.BASE_LR, config.TRAIN.ITERS,
                                config.TRAIN.END_LR, config.TRAIN.POWER)
    if name == "WarmupPolyLR":
        return warmup_poly_lr(config.TRAIN.BASE_LR, config.TRAIN.ITERS,
                              config.TRAIN.LR_SCHEDULER.POWER,
                              config.TRAIN.LR_SCHEDULER.WARM_UP_STEPS,
                              config.TRAIN.LR_SCHEDULER.WARM_UP_LR_INIT,
                              config.TRAIN.END_LR)
    if name == "WarmupCosineLR":
        return warmup_cosine_lr(config.TRAIN.BASE_LR, config.TRAIN.ITERS,
                                config.TRAIN.LR_SCHEDULER.WARM_UP_STEPS,
                                config.TRAIN.LR_SCHEDULER.WARM_UP_LR_INIT,
                                config.TRAIN.END_LR)
    if name == "WarmupMultiStepLR":
        return warmup_multistep_lr(config.TRAIN.BASE_LR,
                                   config.TRAIN.LR_SCHEDULER.MILESTONES,
                                   config.TRAIN.LR_SCHEDULER.GAMMA,
                                   config.TRAIN.LR_SCHEDULER.WARM_UP_STEPS,
                                   config.TRAIN.LR_SCHEDULER.WARM_UP_LR_INIT)
    raise NotImplementedError(f"scheduler {name} is not supported")
