"""Model registry (reference: src/models/__init__.py:14-40).

Dispatch on MODEL.NAME substrings, ordered most-specific-first like the
reference (EMRT_CSwin / EMRT_ViT before EMRT).
"""
from __future__ import annotations

import jax.numpy as jnp

from .emrt import EMRT, build_emrt


def get_model(config, dtype=None, use_pallas: bool | None = None):
    """Build a model (Flax module) from config.MODEL.NAME.

    use_pallas: None -> auto (fused deformable-attention kernel on TPU,
    jnp gather path elsewhere)."""
    if dtype is None:
        dtype = jnp.bfloat16 if getattr(config.TRAIN, "DTYPE", "float32") == "bfloat16" else jnp.float32
    if use_pallas is None:
        import jax
        use_pallas = jax.default_backend() == "tpu"
    name = config.MODEL.NAME
    if "EMRT" in name:
        return build_emrt(config, dtype=dtype, use_pallas=use_pallas)
    # zoo models are registered lazily as they are implemented
    from .zoo import get_zoo_model
    return get_zoo_model(config, dtype=dtype)
