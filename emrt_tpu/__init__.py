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

from . import config  # noqa: F401
