"""emrt_tpu: TPU-native semantic-segmentation framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of
peach-xiao/EMRT (IEEE TGRS 2023): the EMRT deformable-attention
encoder-decoder model family plus the surrounding framework (configs,
datasets, augmentations, solver, losses, sliding-window inference,
metrics, checkpointing) — designed TPU-first: NHWC layouts, static
shapes under jit, mesh-sharded data parallelism, and a fused Pallas
kernel for the multi-scale deformable-attention core.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: first compile of the big models is
# 20-40s+ (minutes via remote compile); every later process start becomes
# ~instant. Opt out with EMRT_TPU_NO_COMPILE_CACHE=1.
if not _os.environ.get("EMRT_TPU_NO_COMPILE_CACHE"):
    try:
        import jax as _jax

        _jax.config.update("jax_compilation_cache_dir",
                           _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                           _os.path.expanduser("~/.cache/jax")))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # jax config names can drift across versions
        pass

from . import config  # noqa: F401
