"""DPT: Dense Prediction Transformer segmentation
(reference: src/models/dpt.py:26-41 + decoders/dpt_head.py:20-265).

ViT backbone with 4 taps; per-tap readout (ignore/add/project of the cls
token), per-tap resample (4x/2x deconv, identity, stride-2 conv), 3x3
reassemble convs to a common width, then top-down FeatureFusionBlocks
(pre-activation residual blocks + 2x upsample) and a conv head.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import resize_bilinear
from .backbones.vit import VisionTransformer
from .layers import kaiming_normal, xavier_uniform


class ResidualBlock(nn.Module):
    """Pre-activation residual conv block (reference dpt_head.py:105-128)."""
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.relu(x)
        y = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype,
                    kernel_init=kaiming_normal, name="conv1")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         name="bn1")(y).astype(self.dtype)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype,
                    kernel_init=kaiming_normal, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         name="bn2")(y).astype(self.dtype)
        return x + y


class FeatureFusionBlock(nn.Module):
    """Residual fuse + 2x upsample + 1x1 out conv (reference :131-155)."""
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature, x, train: bool = False):
        if x is not None:
            x = x + ResidualBlock(self.channels, dtype=self.dtype,
                                  name="resblock1")(feature, train)
        else:
            x = feature
        x = ResidualBlock(self.channels, dtype=self.dtype,
                          name="resblock2")(x, train)
        x = resize_bilinear(x, (2 * x.shape[1], 2 * x.shape[2]),
                            align_corners=True)
        return nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                       kernel_init=kaiming_normal, name="out_conv")(x)


class DPTSeg(nn.Module):
    num_classes: int
    readout: str = "project"                 # ignore | add | project
    patch_size: int = 16
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    out_indices: Sequence[int] = (5, 11, 17, 23)
    hidden_features: Sequence[int] = (256, 512, 1024, 1024)
    features: int = 256
    dtype: Any = jnp.float32

    decoder_lr_prefixes = ("head", "refine", "process", "layers_rn")

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats, cls_taps = VisionTransformer(
            patch_size=self.patch_size, hidden_size=self.hidden_size,
            num_layers=self.num_layers, num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio, out_indices=tuple(self.out_indices),
            return_cls=True, dtype=self.dtype, name="backbone")(x, train)

        processed = []
        for i, (f, cls) in enumerate(zip(feats, cls_taps)):
            b, gh, gw, d = f.shape
            # readout op (reference dpt_head.py:20-103)
            if self.readout == "add":
                f = f + cls[:, None, None, :]
            elif self.readout == "project":
                cat = jnp.concatenate(
                    [f, jnp.broadcast_to(cls[:, None, None, :], f.shape)], -1)
                f = nn.gelu(nn.Dense(self.hidden_size, dtype=self.dtype,
                                     kernel_init=xavier_uniform,
                                     name=f"readout_proj{i}")(cat))
            # per-tap channel proj + resample (get_process)
            f = nn.Conv(self.hidden_features[i], (1, 1), dtype=self.dtype,
                        kernel_init=kaiming_normal, name=f"process{i}_proj")(f)
            if i == 0:
                f = nn.ConvTranspose(self.hidden_features[i], (4, 4),
                                     strides=(4, 4), dtype=self.dtype,
                                     kernel_init=xavier_uniform,
                                     name="process0_up")(f)
            elif i == 1:
                f = nn.ConvTranspose(self.hidden_features[i], (2, 2),
                                     strides=(2, 2), dtype=self.dtype,
                                     kernel_init=xavier_uniform,
                                     name="process1_up")(f)
            elif i == 3:
                f = nn.Conv(self.hidden_features[i], (3, 3), strides=2,
                            padding=[(1, 1), (1, 1)], dtype=self.dtype,
                            kernel_init=kaiming_normal, name="process3_down")(f)
            # reassemble to common width (get_scratch)
            f = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=self.dtype,
                        kernel_init=kaiming_normal, name=f"layers_rn{i}")(f)
            processed.append(f)

        y = None
        for i in range(3, -1, -1):
            y = FeatureFusionBlock(self.features, dtype=self.dtype,
                                   name=f"refine{i}")(processed[i], y, train)

        y = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype,
                    kernel_init=kaiming_normal, name="head_conv")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         name="head_bn")(y).astype(self.dtype)
        y = nn.relu(y)
        y = nn.Dropout(0.1)(y, deterministic=not train)
        y = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    kernel_init=kaiming_normal, name="head_cls")(y)
        y = resize_bilinear(y, (2 * y.shape[1], 2 * y.shape[2]),
                            align_corners=True)
        return [y.astype(jnp.float32)]


def build_dpt(config, dtype=jnp.float32) -> DPTSeg:
    trans = config.MODEL.TRANS
    return DPTSeg(
        num_classes=config.DATA.NUM_CLASSES,
        readout=config.MODEL.DPT.READOUT_PROCESS,
        patch_size=trans.PATCH_SIZE or 16,
        hidden_size=trans.HIDDEN_SIZE,
        num_layers=trans.NUM_LAYERS or 24,
        num_heads=trans.NUM_HEADS or 16,
        mlp_ratio=trans.MLP_RATIO or 4.0,
        out_indices=tuple(config.MODEL.ENCODER.OUT_INDICES),
        hidden_features=tuple(config.MODEL.DPT.HIDDEN_FEATURES),
        features=config.MODEL.DPT.FEATURES,
        dtype=dtype,
    )
