"""Functional train state: params + BN stats + optimizer state + step."""
from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)


def init_variables(model, rng, images):
    """Initialize model variables under jit (eager init dispatches hundreds
    of tiny kernels — pathological on remote-compile TPU backends)."""
    @jax.jit
    def _init(rng, images):
        return model.init({"params": rng, "dropout": rng}, images, train=False)
    return _init(rng, images)


def create_train_state(model, tx, rng, sample_batch, train: bool = True) -> TrainState:
    variables = init_variables(model, rng, sample_batch["image"])
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=opt_state, tx=tx)


def num_params(params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))
