import jax
import jax.numpy as jnp
import numpy as np

from emrt_tpu.models.fcn import FCN
from emrt_tpu.models.setr import SETR


def test_setr_mla_shapes():
    model = SETR(num_classes=5, encoder_type="ViT_MLA",
                 decoder_type="VIT_MLAHead", patch_size=16, hidden_size=32,
                 num_layers=4, num_heads=2, mlp_ratio=2.0,
                 out_indices=(0, 1, 2, 3), mla_channels=16,
                 mlahead_channels=8, auxihead=True)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init({"params": jax.random.key(0)}, x, train=False)
    preds = model.apply(vars_, x, train=False)
    assert len(preds) == 5  # main + 4 aux
    for p in preds:
        assert p.shape == (1, 64, 64, 5)


def test_setr_pup_shapes():
    model = SETR(num_classes=5, encoder_type="ViT",
                 decoder_type="PUP_VisionTransformerUpHead", patch_size=16,
                 hidden_size=32, num_layers=4, num_heads=2, mlp_ratio=2.0,
                 out_indices=(0, 1, 2, 3), pup_num_conv=4,
                 pup_num_upsample=4, auxpup_num_conv=2, auxpup_num_upsample=2,
                 auxihead=True)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init({"params": jax.random.key(0)}, x, train=False)
    preds = model.apply(vars_, x, train=False)
    assert len(preds) == 5
    for p in preds:
        assert p.shape == (1, 64, 64, 5)


def test_setr_decoder_lr_labels():
    from emrt_tpu.solver.optimizer import param_labels
    model = SETR(num_classes=3, encoder_type="ViT_MLA",
                 decoder_type="VIT_MLAHead", hidden_size=32, num_layers=4,
                 num_heads=2, out_indices=(0, 1, 2, 3), mla_channels=8,
                 mlahead_channels=8, auxihead=False)
    x = jnp.zeros((1, 32, 32, 3))
    vars_ = model.init({"params": jax.random.key(0)}, x, train=False)
    labels = param_labels(vars_["params"],
                          decoder_prefixes=model.decoder_lr_prefixes)
    flat = jax.tree_util.tree_leaves_with_path(labels)
    decoder_labels = {l for p, l in flat if "decoder" in str(p[0])}
    encoder_labels = {l for p, l in flat if "encoder" in str(p[0])}
    assert decoder_labels == {"decoder"}
    assert "base" in encoder_labels


def test_fcn_shapes():
    model = FCN(num_classes=4, backbone="resnet50c", output_stride=16)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init({"params": jax.random.key(0)}, x, train=False)
    preds = model.apply(vars_, x, train=False)
    assert preds[0].shape == (1, 64, 64, 4)
