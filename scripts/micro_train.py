#!/usr/bin/env python3
"""On-device timing: full train step and deformable-attention backward."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from emrt_tpu.config import get_config
from emrt_tpu.losses import get_loss_function
from emrt_tpu.models import get_model
from emrt_tpu.ops.deformable_pallas import deformable_attention_pallas
from emrt_tpu.solver import get_optimizer, get_scheduler
from emrt_tpu.train import make_train_step
from emrt_tpu.train.state import TrainState, init_variables

K = 8
SHAPES = ((32, 32), (16, 16), (8, 8))
LV = sum(h * w for h, w in SHAPES)


def main():
    cfg = get_config()
    cfg.DATA.DATASET = "Synthetic"
    cfg.DATA.NUM_CLASSES = 6
    cfg.DATA.CROP_SIZE = (256, 256)
    cfg.MODEL.NAME = "EMRT"
    cfg.MODEL.ENCODER.TYPE = "resnet50"
    cfg.MODEL.OUTPUT_STRIDE = 32
    cfg.TRAIN.OPTIMIZER.GRAD_CLIP = 1.0
    cfg.TRAIN.OPTIMIZER.WEIGHT_DECAY = 1e-4
    cfg.TRAIN.DTYPE = "bfloat16"

    model = get_model(cfg)
    # match train.py:96 — production uses hardware-RNG keys for dropout
    rng = jax.random.key(0, impl="rbg")
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    batch = {
        "image": jnp.asarray(np.random.default_rng(1).uniform(
            -2, 2, (bs, 256, 256, 3)).astype(np.float32)),
        "label": jnp.asarray(np.random.default_rng(2).integers(
            0, 6, (bs, 256, 256)).astype(np.int32)),
    }
    variables = init_variables(model, rng, batch["image"][:1])
    schedule = get_scheduler(cfg)
    tx = get_optimizer(cfg, schedule, params=variables["params"])
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]), tx=tx)
    train_step = make_train_step(model, get_loss_function(cfg), donate=False)

    @jax.jit
    def loop(state):
        def body(i, s):
            s2, _ = train_step(s, batch, rng)
            return s2
        return jax.lax.fori_loop(0, K, body, state)

    s = loop(state)
    jax.block_until_ready(s.params)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s = loop(state)
        jax.block_until_ready(s.params)
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"train step bs={bs}: {best * 1e3:9.2f} ms  {bs / best:8.1f} tiles/s")

    # backward of the bare op (enc shape, bs=8 to match train)
    rng2 = np.random.default_rng(3)
    value = jnp.asarray(rng2.standard_normal((bs, LV, 8, 32)), dtype=jnp.bfloat16)
    loc = jnp.asarray(rng2.uniform(0, 1, (bs, LV, 8, 3, 6, 2)).astype(np.float32))
    attnw = jnp.asarray((rng2.uniform(0, 1, (bs, LV, 8, 3, 6)) / 18).astype(np.float32))

    def loss(v, l, a):
        return jnp.sum(deformable_attention_pallas(v, SHAPES, l, a)
                       .astype(jnp.float32) ** 2)

    gradfn = jax.grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def gloop(c):
        v, l, a = c
        def body(i, c):
            v, l, a = c
            gv, gl, ga = gradfn(v, l, a)
            return (v * 0.999 + gv.astype(v.dtype) * 1e-4,
                    (l + gl * 1e-6) % 1.0, a + ga * 1e-9)
        return jax.lax.fori_loop(0, K, body, c)

    c = gloop((value, loc, attnw))
    jax.block_until_ready(c)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        c = gloop((value, loc, attnw))
        jax.block_until_ready(c)
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"op fwd+bwd bs={bs}: {best * 1e3:9.2f} ms")


if __name__ == "__main__":
    main()
