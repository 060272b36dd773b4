"""Jitted train / eval steps (the hot loop).

TPU-native counterpart of the reference's dygraph iteration body
(train.py:141-159: forward, loss, backward, optimizer step, lr step, clear
grads): one fused jit with donated state. Batch inputs arrive sharded on
the mesh's 'data' axis; params/opt-state are replicated, so XLA inserts the
gradient all-reduce (DataParallel equivalent) automatically.
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from ..utils.metrics import confusion_matrix


def make_train_step(model, loss_fn: Callable, donate: bool = True):
    """Returns step(state, batch, rng) -> (state, metrics)."""

    def train_step(state, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)

        def loss_of(params):
            outputs, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["image"], train=True,
                mutable=["batch_stats"], rngs={"dropout": step_rng})
            loss = loss_fn(list(outputs), batch["label"])
            return loss, mutated["batch_stats"]

        (loss, new_batch_stats), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads).replace(
            batch_stats=new_batch_stats)
        metrics = {"loss": loss}
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, num_classes: int, ignore_index: int = 255):
    """Returns step(params, batch_stats, batch) -> (pred, confusion areas)."""

    def eval_step(params, batch_stats, batch):
        outputs = model.apply({"params": params, "batch_stats": batch_stats},
                              batch["image"], train=False)
        logits = outputs[0] if isinstance(outputs, (tuple, list)) else outputs
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        cm = confusion_matrix(pred, batch["label"], num_classes, ignore_index)
        return pred, cm

    return jax.jit(eval_step)


def make_forward(model, mesh=None):
    """Jitted inference forward: images -> main logits (NHWC).

    With a mesh, the image batch is sharded over the 'data' axis so eval
    (sliding-window batches included) runs on every chip — the TPU-native
    counterpart of the reference's rank-sharded val loop + all_gather
    (val.py:164-180). Batches are padded to a multiple of the data-axis
    size inside the jit (static shapes) and sliced back."""
    if mesh is None:
        @jax.jit
        def forward(params, batch_stats, images):
            outputs = model.apply(
                {"params": params, "batch_stats": batch_stats},
                images, train=False)
            return outputs[0] if isinstance(outputs, (tuple, list)) else outputs

        return forward

    from jax.sharding import NamedSharding, PartitionSpec as P
    data_s = NamedSharding(mesh, P("data"))
    n_data = mesh.shape["data"]

    @jax.jit
    def forward(params, batch_stats, images):
        n = images.shape[0]
        pad = (-n) % n_data
        if pad:
            images = jnp.concatenate(
                [images, jnp.zeros((pad,) + images.shape[1:], images.dtype)])
        images = jax.lax.with_sharding_constraint(images, data_s)
        outputs = model.apply({"params": params, "batch_stats": batch_stats},
                              images, train=False)
        logits = outputs[0] if isinstance(outputs, (tuple, list)) else outputs
        return logits[:n]

    return forward


def make_predict_step(model):
    """Jitted whole-image prediction: images -> argmax labels (int32)."""

    @jax.jit
    def predict(params, batch_stats, images):
        outputs = model.apply({"params": params, "batch_stats": batch_stats},
                              images, train=False)
        logits = outputs[0] if isinstance(outputs, (tuple, list)) else outputs
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    return predict
