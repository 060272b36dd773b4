"""FLOPs / parameter reporting via XLA cost analysis.

TPU-native replacement for the reference's paddle.flops + ptflops calls
(train.py:239-260, val.py:211-230, op_flops_funs.py): the jitted forward is
lowered and XLA's own cost model reports exact compiled FLOPs, so no
per-layer op hooks (e.g. the reference's custom SyncBN hook) are needed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def count_params(params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))


def forward_cost(model, variables, input_shape, train: bool = False):
    """Returns {'flops', 'bytes_accessed', 'params'} for one forward pass."""
    def fwd(x):
        return model.apply(variables, x, train=train)

    lowered = jax.jit(fwd).lower(
        jax.ShapeDtypeStruct(input_shape, jnp.float32))
    try:
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
    except Exception:
        analysis = {}
    return {
        "flops": float(analysis.get("flops", -1.0)),
        "bytes_accessed": float(analysis.get("bytes accessed", -1.0)),
        "params": count_params(variables.get("params", variables)),
    }


def format_cost(cost: dict) -> str:
    flops = cost["flops"]
    params = cost["params"]
    gf = f"{flops / 1e9:.2f} GFLOPs" if flops > 0 else "n/a"
    return f"{gf}, {params / 1e6:.2f}M params"
