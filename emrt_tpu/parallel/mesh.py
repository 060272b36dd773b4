"""Device mesh + sharding rules.

TPU-native replacement for the reference's distributed stack
(paddle.DataParallel + DistributedBatchSampler + all_gather,
train.py:116-123, val.py:164-170): a jax.sharding.Mesh with a 'data' axis
(and an optional 'model' axis for future tensor sharding). The train step is
jitted with batch inputs sharded on 'data' and state replicated — XLA
inserts the gradient all-reduce over ICI; metric areas are integer trees
that psum for free under the same jit.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    return jax.device_put(batch, batch_sharding(mesh))
