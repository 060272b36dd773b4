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


def create_mesh(data: int = -1, model: int = 1, spatial: int = 1,
                devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        data = n // (model * spatial)
    assert data * model * spatial == n, \
        f"mesh {data}x{model}x{spatial} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model, spatial)
    return Mesh(dev_array, ("data", "model", "spatial"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def spatial_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard batch over 'data' AND image height over 'spatial'.

    Spatial partitioning for large rasters: NHWC images (and BHW labels)
    split their H axis across the 'spatial' mesh axis; GSPMD propagates
    the sharding through the conv stacks with halo exchanges and inserts
    gathers/reductions where the transformer needs full token sets. The
    reference has no analog (single-GPU Paddle); this is the TPU-native
    route to training/evaluating crops that exceed one chip's HBM."""
    return NamedSharding(mesh, P("data", "spatial"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    return jax.device_put(batch, batch_sharding(mesh))


def tp_rule(path, leaf):
    """PartitionSpec for tensor parallelism over the 'model' mesh axis:
    column-shard the up-projections (FFN linear1, attention value_proj),
    row-shard the down-projections (linear2, output_proj) — the classic
    Megatron split. XLA/GSPMD propagates the shardings through the jitted
    step and inserts the reduce-scatter/all-reduce collectives; everything
    else stays replicated (the reference's only strategy was pure DP,
    train.py:116-123)."""
    keys = "/".join(str(getattr(k, "key", k)) for k in path)
    ndim = getattr(leaf, "ndim", 0)
    if "kernel" in keys:
        if ndim == 2:
            if "linear1" in keys or "value_proj" in keys:
                return P(None, "model")
            if "linear2" in keys or "output_proj" in keys:
                return P("model", None)
        # MHA DenseGeneral kernels: q/k/v [embed, heads, hd] shard heads;
        # out_proj [heads, hd, embed] row-shards the same axis, so the
        # whole attention body runs head-parallel with one all-reduce
        if ndim == 3:
            if ("q_proj" in keys or "k_proj" in keys or "v_proj" in keys):
                return P(None, "model", None)
            if "out_proj" in keys:
                return P("model", None, None)
    if ndim == 2 and "bias" in keys and ("q_proj" in keys or "k_proj" in keys
                                         or "v_proj" in keys):
        return P("model", None)       # DenseGeneral bias [heads, hd]
    return P()


def tp_shard_params(params, mesh: Mesh):
    """device_put a param tree with Megatron-style TP shardings."""
    return jax.tree_util.tree_map_with_path(
        lambda p, x: jax.device_put(
            x, NamedSharding(mesh, tp_rule(p, x))), params)
