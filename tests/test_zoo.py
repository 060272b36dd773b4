import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


@pytest.mark.slow
def test_segformer_shapes():
    from emrt_tpu.models.segformer import Segformer
    model = Segformer(num_classes=5, embed_dims=(8, 16, 32, 64),
                      depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
                      sr_ratios=(8, 4, 2, 1), head_channels=16)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init({"params": jax.random.key(0)}, x, train=False)
    preds = model.apply(vars_, x, train=False)
    assert preds[0].shape == (1, 64, 64, 5)


def test_segmenter_shapes():
    from emrt_tpu.models.segmenter import Segmenter
    for dec in ("MaskTransformer", "LinearDecoder"):
        model = Segmenter(num_classes=5, decoder_type=dec, patch_size=16,
                          hidden_size=32, num_layers=2, num_heads=2,
                          seg_num_layers=1)
        x = jnp.zeros((1, 64, 64, 3))
        vars_ = model.init({"params": jax.random.key(0)}, x, train=False)
        preds = model.apply(vars_, x, train=False)
        assert preds[0].shape == (1, 64, 64, 5)


@pytest.mark.slow
def test_upernet_swin_shapes():
    from emrt_tpu.models.upernet import UperNet
    model = UperNet(num_classes=5, encoder_type="SwinTransformer",
                    embed_dim=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
                    window_size=4, uper_channels=32, aux_channels=16)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init({"params": jax.random.key(0)}, x, train=False)
    preds = model.apply(vars_, x, train=False)
    assert len(preds) == 2
    assert preds[0].shape == (1, 64, 64, 5)
    assert preds[1].shape == (1, 64, 64, 5)


def test_swin_shifted_window_mask():
    from emrt_tpu.models.backbones.swin import _shift_attn_mask
    m = _shift_attn_mask(8, 8, 4, 2)
    assert m.shape == (4, 16, 16)
    # windows that span shift boundaries must contain -100 entries
    assert (m == -100.0).any()
    # the top-left window is contiguous -> fully zero mask
    assert (m[0] == 0).all()


def test_trans2seg_shapes():
    from emrt_tpu.models.trans2seg import Trans2Seg
    model = Trans2Seg(num_classes=4, backbone="resnet50c", output_stride=16,
                      embed_dim=32, depth=1, num_heads=4, hid_dim=8)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init({"params": jax.random.key(0)}, x, train=False)
    preds = model.apply(vars_, x, train=False)
    assert preds[0].shape == (1, 64, 64, 4)


def test_dpt_shapes():
    from emrt_tpu.models.dpt import DPTSeg
    for readout in ("ignore", "add", "project"):
        model = DPTSeg(num_classes=4, readout=readout, patch_size=16,
                       hidden_size=32, num_layers=4, num_heads=2,
                       out_indices=(0, 1, 2, 3),
                       hidden_features=(8, 16, 32, 32), features=16)
        x = jnp.zeros((1, 64, 64, 3))
        vars_ = model.init({"params": jax.random.key(0)}, x, train=False)
        preds = model.apply(vars_, x, train=False)
        assert preds[0].shape == (1, 64, 64, 4)


@pytest.mark.slow
def test_cswin_backbone_shapes():
    from emrt_tpu.models.backbones.cswin import CSwinTransformer
    m = CSwinTransformer(embed_dim=16, depths=(1, 1, 1, 1),
                         num_heads=(2, 2, 4, 8), split_sizes=(1, 2, 4, 4))
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init({"params": jax.random.key(0)}, x, train=False)
    feats = m.apply(v, x, train=False)
    assert [f.shape for f in feats] == [(1, 16, 16, 16), (1, 8, 8, 32),
                                        (1, 4, 4, 64), (1, 2, 2, 128)]


@pytest.mark.slow
def test_emrt_backbone_variants():
    from emrt_tpu.config import get_config
    from emrt_tpu.models import get_model
    # cswin variant exercises the shared EncoderDecoder with
    # transformer-backbone channels (no duplicated stack)
    cfg = get_config()
    cfg.MODEL.NAME = "EMRT_CSwin"
    cfg.MODEL.ENCODER.TYPE = "CSwinTransformer"
    cfg.DATA.NUM_CLASSES = 4
    cfg.MODEL.TRANS.EMBED_DIM = 16
    cfg.MODEL.TRANS.STAGE_DEPTHS = [1, 1, 1, 1]
    cfg.MODEL.TRANS.NUM_HEADS = [2, 2, 4, 8]
    cfg.MODEL.TRANS.SPLIT_SIZES = [1, 2, 4, 4]
    model = get_model(cfg, use_pallas=False)
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init({"params": jax.random.key(0)}, x, train=False)
    main, aux = model.apply(v, x, train=False)
    assert main.shape == (1, 64, 64, 4)
    assert aux.shape == (1, 64, 64, 4)


@pytest.mark.slow
def test_hrnet_backbone_shapes():
    from emrt_tpu.models.backbones.hrnet import HRNet
    m = HRNet(width=8, stage_modules=(1, 1, 1))
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init({"params": jax.random.key(0)}, x, train=False)
    c1, st2, st3, st4 = m.apply(v, x, train=False)
    assert len(st2) == 2 and len(st3) == 3 and len(st4) == 4
    assert st4[0].shape == (1, 16, 16, 8)      # stride 4, width W
    assert st4[3].shape == (1, 2, 2, 64)       # stride 32, 8W


@pytest.mark.slow
def test_focal_backbone_shapes():
    from emrt_tpu.models.backbones.focal import FocalTransformer
    m = FocalTransformer(embed_dim=16, depths=(1, 1, 1, 1),
                         num_heads=(1, 2, 4, 8), window_size=4,
                         expand_sizes=(1, 1, 1, 1))
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init({"params": jax.random.key(0)}, x, train=False)
    feats = m.apply(v, x, train=False)
    assert [f.shape for f in feats] == [(1, 16, 16, 16), (1, 8, 8, 32),
                                        (1, 4, 4, 64), (1, 2, 2, 128)]


def test_deit_prefix_tokens():
    from emrt_tpu.models.backbones.vit import VisionTransformer
    m = VisionTransformer(patch_size=16, hidden_size=32, num_layers=2,
                          num_heads=2, num_prefix_tokens=2,
                          out_indices=(1,))
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init({"params": jax.random.key(0)}, x, train=False)
    feats = m.apply(v, x, train=False)
    assert feats[0].shape == (1, 4, 4, 32)
    assert v["params"]["cls_token"].shape == (1, 2, 32)


# ---------------------------------------------------------------------------
# Per-family train-step smokes (VERDICT round-2 item 5): one jitted
# optimizer step through the real solver stack per zoo family — catches
# optimizer/BN/aux-head wiring bugs that shape tests cannot.
# ---------------------------------------------------------------------------

def _zoo_family(name):
    if name == "setr_mla":
        return SETR(num_classes=4, encoder_type="ViT_MLA",
                    decoder_type="VIT_MLAHead", hidden_size=32, num_layers=4,
                    num_heads=2, out_indices=(0, 1, 2, 3), mla_channels=16,
                    mlahead_channels=8, auxihead=True)
    if name == "upernet_swin":
        from emrt_tpu.models.upernet import UperNet
        return UperNet(num_classes=4, encoder_type="SwinTransformer",
                       embed_dim=16, depths=(1, 1, 1, 1),
                       num_heads=(1, 2, 4, 8), window_size=4,
                       uper_channels=32, aux_channels=16)
    if name == "upernet_focal":
        from emrt_tpu.models.upernet import UperNet
        return UperNet(num_classes=4, encoder_type="FocalTransformer",
                       embed_dim=16, depths=(1, 1, 1, 1),
                       num_heads=(1, 2, 4, 8), window_size=4,
                       expand_sizes=(1, 1, 1, 1), use_conv_embed=True,
                       uper_channels=32, aux_channels=16)
    if name == "segformer":
        from emrt_tpu.models.segformer import Segformer
        return Segformer(num_classes=4, embed_dims=(8, 16, 32, 64),
                         depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
                         sr_ratios=(8, 4, 2, 1), head_channels=16)
    if name == "segmenter":
        from emrt_tpu.models.segmenter import Segmenter
        return Segmenter(num_classes=4, decoder_type="MaskTransformer",
                         patch_size=16, hidden_size=32, num_layers=2,
                         num_heads=2, seg_num_layers=1)
    if name == "dpt":
        from emrt_tpu.models.dpt import DPTSeg
        return DPTSeg(num_classes=4, readout="project", patch_size=16,
                      hidden_size=32, num_layers=4, num_heads=2,
                      out_indices=(0, 1, 2, 3),
                      hidden_features=(8, 16, 32, 32), features=16)
    if name == "trans2seg":
        from emrt_tpu.models.trans2seg import Trans2Seg
        return Trans2Seg(num_classes=4, backbone="resnet50c",
                         output_stride=16, embed_dim=32, depth=1,
                         num_heads=4, hid_dim=8)
    if name == "fcn":
        return FCN(num_classes=4, backbone="resnet50c", output_stride=16)
    raise ValueError(name)


def _one_train_step(model, steps=1):
    from emrt_tpu.config import get_config
    from emrt_tpu.losses import get_loss_function
    from emrt_tpu.solver import get_optimizer, get_scheduler
    from emrt_tpu.train import make_train_step
    from emrt_tpu.train.state import TrainState, init_variables

    cfg = get_config()
    cfg.DATA.NUM_CLASSES = 4
    cfg.TRAIN.BASE_LR = 0.01
    cfg.TRAIN.ITERS = max(steps, 10)
    rng = jax.random.key(0)
    data_rng = np.random.default_rng(0)
    batch = {"image": jnp.asarray(data_rng.uniform(
                 -2, 2, (2, 64, 64, 3)).astype(np.float32)),
             "label": jnp.asarray(data_rng.integers(
                 0, 4, (2, 64, 64)).astype(np.int32))}
    variables = init_variables(model, rng, batch["image"])
    schedule = get_scheduler(cfg)
    tx = get_optimizer(cfg, schedule, params=variables["params"],
                       decoder_lr_coef=cfg.TRAIN.DECODER_LR_COEF,
                       decoder_prefixes=getattr(model, "decoder_lr_prefixes",
                                                ()))
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]), tx=tx)
    step_fn = make_train_step(model, get_loss_function(cfg), donate=False)
    losses = []
    for _ in range(steps):
        state, metrics = step_fn(state, batch, rng)
        losses.append(float(metrics["loss"]))
    return variables["params"], state.params, losses


@pytest.mark.parametrize("family", ["setr_mla", "upernet_swin",
                                    "upernet_focal", "segformer",
                                    "segmenter", "dpt", "trans2seg", "fcn"])
@pytest.mark.slow
def test_zoo_family_train_step(family):
    model = _zoo_family(family)
    p0, p1, losses = _one_train_step(model, steps=1)
    assert np.isfinite(losses[0]), family
    # the optimizer must actually be wired to the whole model: most leaves
    # change, and EVERY top-level module (backbone, head(s), aux) has at
    # least one updated leaf — a head silently disconnected from the loss
    # would otherwise hide behind the backbone's leaf count
    flat0 = jax.tree_util.tree_leaves_with_path(p0)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(p1))
    changed = {tuple(path): not np.allclose(np.asarray(v),
                                            np.asarray(flat1[tuple(path)]))
               for path, v in flat0}
    frac = sum(changed.values()) / max(len(flat0), 1)
    assert frac > 0.5, (family, f"only {frac:.0%} of params changed")
    top_changed = {}
    for path, ch in changed.items():
        top = getattr(path[0], "key", str(path[0]))
        top_changed[top] = top_changed.get(top, False) or ch
    dead = sorted(k for k, ch in top_changed.items() if not ch)
    assert not dead, (family, f"modules with no updated leaves: {dead}")


@pytest.mark.slow
def test_zoo_loss_decreases_segformer():
    model = _zoo_family("segformer")
    _, _, losses = _one_train_step(model, steps=8)
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], losses
