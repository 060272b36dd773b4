"""Converter coverage for the EMRT backbone variants + SETR.

Strategy (VERDICT round-2 item 1): for each family, generate a synthetic
``.pdparams`` state dict whose KEY INVENTORY mirrors the reference model's
state_dict (shapes inverted from our flax tree through the declared
transforms), then run the converter and require a clean report — zero
missing, zero unused, zero unmatched-flax. Independently-derived key
samples (hand-read from the reference sources, cited per family) guard
against the fixture and the map sharing a systematic naming bug.
"""
from __future__ import annotations

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.traverse_util as tu

from emrt_tpu.utils.pdparams import build_key_map, convert_pdparams


def _flat(tree):
    return dict(tu.flatten_dict(jax.tree.map(np.asarray, tree), sep="/"))


def _invert_shape(tag: str, flax_shape):
    s = tuple(int(x) for x in flax_shape)
    if tag == "conv":
        kh, kw, cin, cout = s
        return (cout, cin, kh, kw)
    if tag in ("id", "pos_embed"):
        return s
    if tag.startswith("qkvb:"):
        return (3 * int(np.prod(s)),)
    if tag.startswith("qkv:"):
        d = s[0]
        return (d, 3 * int(np.prod(s[1:])))
    if tag == "out_heads":
        return (int(np.prod(s[:-1])), s[-1])
    if tag == "conv1x1_dense":
        return (s[1], s[0], 1, 1)
    if tag == "convt":
        kh, kw, cin, cout = s
        return (cin, cout, kh, kw)
    raise ValueError(tag)


def synth_pdparams(params, batch_stats, model_name, encoder_type, seed=0):
    """Synthetic pd state dict with the reference's key inventory."""
    flat_p, flat_s = _flat(params), _flat(batch_stats or {})
    pmap, smap, fold, _ = build_key_map(flat_p, model_name, encoder_type)
    rng = np.random.default_rng(seed)
    pd = {}
    for flat, mapping in ((flat_p, pmap), (flat_s, smap)):
        for fkey, (pdkey, tag) in mapping.items():
            if fkey not in flat:
                continue
            if tag.startswith("cat:"):   # DeiT class_token + distill_token
                d = flat[fkey].shape[-1]
                for k in (pdkey, tag[4:]):
                    pd[k] = rng.normal(scale=0.05, size=(1, 1, d)
                                       ).astype(np.float32)
                continue
            shape = _invert_shape(tag, flat[fkey].shape)
            if pdkey not in pd:
                if pdkey.endswith("_variance"):
                    pd[pdkey] = rng.uniform(0.5, 1.5, size=shape
                                            ).astype(np.float32)
                else:
                    pd[pdkey] = rng.normal(scale=0.05, size=shape
                                           ).astype(np.float32)
            else:
                assert pd[pdkey].shape == shape, (pdkey, tag)
    for _, bias_key in fold.items():
        if bias_key not in pd:
            dim = None
            # fold keys are uphead conv biases; find the matching conv
            conv_key = bias_key.replace(".bias", ".weight")
            dim = pd[conv_key].shape[0]
            pd[bias_key] = rng.normal(scale=0.05, size=(dim,)
                                      ).astype(np.float32)
    if "EMRT" in model_name:
        # reference registers tgt_embed though the forward never reads it
        # (transformer_encoder_decoder.py:367-369, 469-471)
        q, d = pd["model.query_pos_embed.weight"].shape
        pd["model.tgt_embed.weight"] = rng.normal(
            scale=0.05, size=(q, d)).astype(np.float32)
    return pd


def _init(model, hw=64):
    v = model.init(jax.random.key(0), jnp.zeros((1, hw, hw, 3), jnp.float32))
    return v["params"], v.get("batch_stats", {})


def _roundtrip(model, model_name, encoder_type, hw=64, extra_pd=None,
               expect_samples=()):
    params, stats = _init(model, hw)
    pd = synth_pdparams(params, stats, model_name, encoder_type)
    for k in expect_samples:
        assert k in pd, f"reference key {k} not produced by the map"
    if extra_pd:
        pd.update(extra_pd)
    new_p, new_s, report = convert_pdparams(pd, params, stats,
                                            model_name, encoder_type)
    assert report["missing"] == [], report["missing"][:5]
    assert report["unused"] == [], report["unused"][:5]
    assert report["unmatched_flax"] == [], report["unmatched_flax"][:5]
    # converted params must actually run
    out = model.apply({"params": new_p, "batch_stats": new_s},
                      jnp.zeros((1, hw, hw, 3), jnp.float32), train=False)
    first = out[0] if isinstance(out, (tuple, list)) else out
    assert np.isfinite(np.asarray(first)).all()
    return report


def _tiny_emrt(backbone, **kw):
    from emrt_tpu.models.emrt import EMRT
    return EMRT(num_classes=4, backbone=backbone, num_encoder_layers=2,
                num_decoder_layers=1, use_pallas=False, **kw)


@pytest.mark.slow
def test_convert_emrt_cswin():
    # key samples read from cswin_transformer.py:87-568 +
    # paddle_EMRT_cswin_backbone.py:236-251
    model = _tiny_emrt("cswintransformer", trans_embed_dim=64,
                       trans_depths=(1, 1, 1, 1), trans_heads=(2, 4, 8, 16),
                       trans_splits=(1, 2, 2, 2))
    _roundtrip(model, "EMRT_CSwin", "CSwinTransformer", hw=64,
               expect_samples=(
                   "encoder.patch_embedding.patch_embed.weight",
                   "encoder.patch_embedding.norm.weight",
                   "encoder.stages.0.blocks.0.attns.0.get_v.weight",
                   "encoder.stages.0.blocks.0.attns.1.get_v.bias",
                   "encoder.stages.3.blocks.0.attns.0.get_v.weight",
                   "encoder.stages.2.merge.conv.weight",
                   "encoder.stages.2.merge.norm.bias",
                   "encoder.stages.1.blocks.0.mlp.fc1.weight",
                   "layer_norms.3.weight",
                   "spatial_branch.Enc0.encode.0.weight",
                   "model.encoder.layers.1.self_attn.sampling_offsets.bias",
               ))


@pytest.mark.slow
def test_convert_emrt_vit():
    # vit.py:25-327 (fused qkv chunk(3) -> q/k/v; attn_norm / mlp_norm)
    model = _tiny_emrt("vit", vit_hidden=64, vit_layers=3, vit_heads=4,
                       vit_out_indices=(0, 1, 2))
    # our EMRT-vit taps 4 norms only when 4 out_indices exist; use 4
    model = _tiny_emrt("vit", vit_hidden=64, vit_layers=4, vit_heads=4,
                       vit_out_indices=(0, 1, 2, 3))
    _roundtrip(model, "EMRT_ViT", "ViT", hw=64,
               expect_samples=(
                   "encoder.transformer.embeddings.patch_embeddings.weight",
                   "encoder.transformer.embeddings.position_embeddings",
                   "encoder.transformer.embeddings.cls_token",
                   "encoder.transformer.encoder.layers.0.attn.qkv.weight",
                   "encoder.transformer.encoder.layers.3.attn.out.bias",
                   "encoder.transformer.encoder.layers.2.mlp_norm.weight",
                   "layer_norms.0.weight",
               ))


@pytest.mark.slow
def test_convert_emrt_hrnet():
    # hrnet.py:93-663 naming: la1/bb_layer2_N, tr{1..3}, st{2..4} with
    # branches_func/fuse_func; paddleseg ConvBNReLU -> ._conv/._batch_norm
    model = _tiny_emrt("hrnet")
    _roundtrip(model, "EMRT_HRNet", "HRNet", hw=64,
               expect_samples=(
                   "backbone.conv_layer1_1._conv.weight",
                   "backbone.conv_layer1_2._batch_norm._variance",
                   "backbone.la1.bb_layer2_1.conv_down._conv.weight",
                   "backbone.la1.bb_layer2_4.conv3._batch_norm._mean",
                   "backbone.tr1.transition_tr1_layer_1._conv.weight",
                   "backbone.tr1.transition_tr1_layer_2._conv.weight",
                   "backbone.tr2.transition_tr2_layer_3._conv.weight",
                   "backbone.tr3.transition_tr3_layer_4._conv.weight",
                   "backbone.st2.stage_st2_1.branches_func."
                   "bb_st2_1_branch_layer_1_1.conv1._conv.weight",
                   "backbone.st2.stage_st2_1.fuse_func."
                   "residual_st2_1_layer_1_2._conv.weight",
                   "backbone.st2.stage_st2_1.fuse_func."
                   "residual_st2_1_layer_2_1_1._conv.weight",
                   "backbone.st4.stage_st4_3.fuse_func."
                   "residual_st4_3_layer_4_1_3._batch_norm._variance",
                   "backbone.st3.stage_st3_4.branches_func."
                   "bb_st3_4_branch_layer_3_4.conv2._batch_norm.weight",
                   "input_proj.0.0.weight",
                   "input_proj.2.1._variance",
               ))


@pytest.mark.slow
def test_convert_emrt_segformer_b4():
    # paddleseg_segformer/mix_transformer.py:258-380 under the SegFormer
    # wrapper (backbone.backbone.*); wrapper head layers are dead weight
    model = _tiny_emrt("segformer_b4")
    # dead wrapper-head keys must be tolerated (expected-unused)
    rng = np.random.default_rng(1)
    extra = {f"backbone.linear_c{i}.proj.weight":
             rng.normal(size=(8, 8)).astype(np.float32) for i in (1, 2, 3, 4)}
    extra["backbone.linear_fuse._conv.weight"] = rng.normal(
        size=(8, 32, 1, 1)).astype(np.float32)
    extra["backbone.linear_pred.weight"] = rng.normal(
        size=(4, 8, 1, 1)).astype(np.float32)
    # the shipped config's MODEL.NAME is 'EMRT_Segformer' — the zoo
    # 'Segformer' substring must NOT shadow the EMRT dispatch
    _roundtrip(model, "EMRT_Segformer", "segformer_b4", hw=64, extra_pd=extra,
               expect_samples=(
                   "backbone.backbone.patch_embed1.proj.weight",
                   "backbone.backbone.patch_embed4.norm.weight",
                   "backbone.backbone.block1.0.attn.sr.weight",
                   "backbone.backbone.block1.0.attn.norm.weight",
                   "backbone.backbone.block4.0.attn.q.weight",
                   "backbone.backbone.block2.0.mlp.dwconv.dwconv.weight",
                   "backbone.backbone.norm4.weight",
               ))


def _tiny_setr(decoder_type, encoder_type):
    from emrt_tpu.models.setr import SETR
    return SETR(num_classes=4, encoder_type=encoder_type,
                decoder_type=decoder_type, patch_size=16, hidden_size=64,
                num_layers=4, num_heads=4, out_indices=(0, 1, 2, 3),
                mla_channels=64, mlahead_channels=32,
                pup_num_conv=4, pup_num_upsample=4)


def test_convert_setr_mla():
    # setr.py:44-76 + vit_mla.py:309-460 + vit_mla_head.py:32-124 +
    # vit_mla_auxi_head.py:33-40 (256-ch branch -> single bias-free 'aux')
    model = _tiny_setr("VIT_MLAHead", "ViT_MLA")
    _roundtrip(model, "SETR_MLA", "ViT_MLA", hw=64,
               expect_samples=(
                   "encoder.transformer.embeddings.patch_embeddings.weight",
                   "encoder.transformer.encoder.layers.0.attn.qkv.weight",
                   "encoder.mla.mla_p2_1x1.0.weight",
                   "encoder.mla.mla_p5.1._variance",
                   "encoder.norm_3.weight",
                   "decoder.head2.0.weight",
                   "decoder.head5.4._mean",
                   "decoder.cls.weight",
                   "aux_decoder2.aux.weight",
               ))


def test_convert_setr_pup():
    # vit_up_head.py:43-62 (num_conv=4: conv_0..4 + syncbn_fc_0..3 + norm)
    model = _tiny_setr("PUP_VisionTransformerUpHead", "ViT")
    _roundtrip(model, "SETR_PUP", "ViT", hw=64,
               expect_samples=(
                   "encoder.transformer.embeddings.cls_token",
                   "decoder.norm.weight",
                   "decoder.conv_4.bias",
                   "decoder.syncbn_fc_3._variance",
                   "aux_decoder5.conv_1.weight",
                   "aux_decoder2.syncbn_fc_0.weight",
               ))


@pytest.mark.slow
def test_convert_segformer_zoo():
    # zoo MixViT copy (mix_transformer.py:354-463: nested layers.{i}.{0,1,2},
    # conv-based MixFFN with pe_conv) + SegformerHead ConvModules
    from emrt_tpu.models.segformer import Segformer
    model = Segformer(num_classes=4, embed_dims=(8, 16, 32, 64),
                      depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
                      sr_ratios=(8, 4, 2, 1), head_channels=16)
    _roundtrip(model, "Segformer", "MixViT", hw=64,
               expect_samples=(
                   "backbone.layers.0.0.projection.weight",
                   "backbone.layers.3.0.norm.weight",
                   "backbone.layers.0.1.0.attn.sr.weight",
                   "backbone.layers.0.1.0.attn.norm.weight",
                   "backbone.layers.2.1.0.ffn.fc1.weight",
                   "backbone.layers.1.1.0.ffn.pe_conv.weight",
                   "backbone.layers.3.2.weight",
                   "decode_head.convs.0.conv.weight",
                   "decode_head.convs.3.bn._variance",
                   "decode_head.fusion_conv.conv.weight",
                   "decode_head.conv_seg.bias",
               ))


def test_convert_segmenter_vit_mask_and_deit_linear():
    # segmentor.py:10-44 + segmentor_head.py:21-109; DeiT per deit.py:236-288
    from emrt_tpu.models.segmenter import Segmenter
    vit = Segmenter(num_classes=4, decoder_type="MaskTransformer",
                    patch_size=16, hidden_size=32, num_layers=2,
                    num_heads=2, seg_num_layers=1)
    _roundtrip(vit, "Segmenter", "ViT", hw=64,
               expect_samples=(
                   "encoder.transformer.embeddings.patch_embeddings.weight",
                   "norm.weight",
                   "decoder.layers.0.attn.qkv.weight",
                   "decoder.layers.0.attn_norm.weight",
                   "decoder.mask_tokens",
                   "decoder.proj_patch.weight",
                   "decoder.proj_class.weight",
                   "decoder.decoder_norm.weight",
                   "decoder.mask_norm.bias",
               ))
    deit = Segmenter(num_classes=4, decoder_type="LinearDecoder",
                     patch_size=16, hidden_size=32, num_layers=2,
                     num_heads=2, distilled=True)
    _roundtrip(deit, "Segmenter_Linear", "DeiT", hw=64,
               expect_samples=(
                   "encoder.patch_embed.proj.weight",
                   "encoder.class_token",
                   "encoder.distill_token",
                   "encoder.pos_embed",
                   "encoder.layers.1.attn.proj.weight",
                   "encoder.layers.0.norm1.weight",
                   "decoder.head.weight",
               ))


@pytest.mark.slow
def test_convert_upernet_swin_and_cswin():
    # swin_transformer.py:95-651 (patch_embedding, stages.{s}.blocks.{b},
    # downsample) + upernet.py:60-78 (layer_norms, decoder, aux_decoder) +
    # uper_head.py:40-69 / psp_head.py:38-44 Sequential indices
    from emrt_tpu.models.upernet import UperNet
    swin = UperNet(num_classes=4, encoder_type="SwinTransformer",
                   embed_dim=8, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
                   window_size=4, uper_channels=16, aux_channels=8)
    _roundtrip(swin, "UperNet", "SwinTransformer", hw=64,
               expect_samples=(
                   "encoder.patch_embedding.patch_embed.weight",
                   "encoder.stages.0.blocks.0.attn.qkv.weight",
                   "encoder.stages.0.blocks.0.attn.relative_position_bias_table",
                   "encoder.stages.2.downsample.reduction.weight",
                   "encoder.stages.0.blocks.0.mlp.fc1.weight",
                   "layer_norms.3.weight",
                   "decoder.psp_modules.pool_branches.0.1.weight",
                   "decoder.psp_modules.pool_branches.3.2._variance",
                   "decoder.bottleneck.0.weight",
                   "decoder.lateral_convs.2.0.weight",
                   "decoder.fpn_convs.0.1.weight",
                   "decoder.fpn_bottleneck.0.weight",
                   "decoder.conv_seg.bias",
                   "aux_decoder.convs.0.0.weight",
                   "aux_decoder.conv_seg.weight",
               ))
    cswin = UperNet(num_classes=4, encoder_type="CSwinTransformer",
                    embed_dim=8, depths=(1, 1, 1, 1), num_heads=(2, 4, 8, 8),
                    split_sizes=(1, 2, 2, 2), uper_channels=16,
                    aux_channels=8)
    _roundtrip(cswin, "UperNet_CSwin", "CSwinTransformer", hw=64,
               expect_samples=(
                   "encoder.patch_embedding.patch_embed.weight",
                   "encoder.stages.0.blocks.0.attns.0.get_v.weight",
                   "encoder.stages.0.merge.conv.weight",
                   "layer_norms.0.weight",
                   "decoder.conv_seg.bias",
               ))


@pytest.mark.slow
def test_convert_upernet_focal():
    # focal_transformer.py:87-191 (qkv, three bias-table families,
    # pool_layers) + :739-816 (conv PatchEmbed stem/downsample) +
    # upernet.py:60-78 (layer_norms, decoder, aux_decoder)
    from emrt_tpu.models.upernet import UperNet
    focal = UperNet(num_classes=4, encoder_type="FocalTransformer",
                    embed_dim=8, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
                    window_size=4, expand_sizes=(1, 1, 1, 1),
                    use_conv_embed=True, uper_channels=16, aux_channels=8)
    _roundtrip(focal, "UperNet_Focal", "FocalTransformer", hw=64,
               expect_samples=(
                   "encoder.patch_embed.proj.weight",
                   "encoder.patch_embed.norm.weight",
                   "encoder.layers.0.blocks.0.attn.qkv.weight",
                   "encoder.layers.0.blocks.0.attn."
                   "relative_position_bias_table",
                   "encoder.layers.0.blocks.0.attn."
                   "relative_position_bias_table_to_neighbors",
                   "encoder.layers.0.blocks.0.attn."
                   "relative_position_bias_table_to_windows.0",
                   "encoder.layers.0.blocks.0.pool_layers.0.weight",
                   "encoder.layers.0.downsample.proj.weight",
                   "encoder.layers.0.downsample.norm.weight",
                   "layer_norms.3.weight",
                   "decoder.conv_seg.bias",
                   "aux_decoder.conv_seg.weight",
               ))


@pytest.mark.slow
def test_convert_fcn():
    # fcn.py:22-64: paddleseg resnet50c cnn_encoder + conv_1/cls head;
    # the head conv's bias (bias_attr=True) folds into the BN mean
    from emrt_tpu.models.fcn import FCN
    model = FCN(num_classes=4, backbone="resnet50c", output_stride=32)
    _roundtrip(model, "FCN", "resnet50c", hw=64,
               expect_samples=(
                   "cnn_encoder.conv1.0.weight",
                   "cnn_encoder.conv1.4._variance",
                   "cnn_encoder.bn1.weight",
                   "cnn_encoder.layer1.0.downsample.0.weight",
                   "cnn_encoder.layer1.0.downsample.1._mean",
                   "cnn_encoder.layer3.5.conv3.weight",
                   "cnn_encoder.layer4.2.bn3._variance",
                   "head.conv_1.0.weight",
                   "head.conv_1.0.bias",
                   "head.conv_1.1._mean",
                   "head.cls.bias",
               ))


@pytest.mark.slow
def test_convert_trans2seg():
    # trans2seg.py:24-108 + trans2seg_transformer.py:88-421 (bias-free
    # fused qkv / fc_q / fc_kv, biased proj) + trans2seg_head.py:61-130
    from emrt_tpu.models.trans2seg import Trans2Seg
    model = Trans2Seg(num_classes=4, embed_dim=32, depth=2, num_heads=4,
                      mlp_ratio=3.0, hid_dim=8, output_stride=16)
    _roundtrip(model, "Trans2Seg", "resnet50c", hw=64,
               expect_samples=(
                   "cnn_encoder.conv1.0.weight",
                   "cnn_encoder.layer3.5.bn3._mean",
                   "hybrid_embed.proj.weight",
                   "transformer_encoder.cls_token",
                   "transformer_encoder.pos_embed",
                   "transformer_encoder.blocks_encoder.0.attn.qkv.weight",
                   "transformer_encoder.blocks_encoder.1.attn.proj.bias",
                   "transformer_encoder.blocks_encoder.0.mlp.fc1.weight",
                   "transformer_encoder.norm.weight",
                   "transformer_decoder.cls_embed",
                   "transformer_decoder.blocks_decoder.0.norm1_clsembed.weight",
                   "transformer_decoder.blocks_decoder.1.attn.fc_kv.weight",
                   "transformer_decoder.blocks_decoder.0.norm4.weight",
                   "transformer_decoder.blocks_decoder.0.mlp3.fc1.weight",
                   "cnn_head.conv_c1.conv.weight",
                   "cnn_head.lay1.block.depthwise.weight",
                   "cnn_head.lay3.block.bn_point._variance",
                   "cnn_head.pred.bias",
               ))


def test_convert_dpt():
    # dpt.py:25-41 + dpt_head.py:157-260; refine.3.resblock1 is dead
    # weight in the checkpoint (top fusion gets x=None) and must be
    # tolerated as expected-unused
    from emrt_tpu.models.dpt import DPTSeg
    model = DPTSeg(num_classes=4, readout="project", patch_size=16,
                   hidden_size=32, num_layers=4, num_heads=2,
                   mlp_ratio=2.0, out_indices=(0, 1, 2, 3),
                   hidden_features=(8, 16, 32, 32), features=8)
    rng = np.random.default_rng(2)
    extra = {}
    for c in ("conv1", "conv2"):
        extra[f"head.refine.3.resblock1.{c}.weight"] = rng.normal(
            size=(8, 8, 3, 3)).astype(np.float32)
    for b in ("bn1", "bn2"):
        for suf, shape in (("weight", (8,)), ("bias", (8,)),
                           ("_mean", (8,)), ("_variance", (8,))):
            extra[f"head.refine.3.resblock1.{b}.{suf}"] = rng.uniform(
                0.5, 1.0, size=shape).astype(np.float32)
    _roundtrip(model, "DPT", "ViT", hw=64, extra_pd=extra,
               expect_samples=(
                   "backbone.transformer.embeddings.patch_embeddings.weight",
                   "backbone.transformer.embeddings.cls_token",
                   "backbone.transformer.encoder.layers.0.attn.qkv.weight",
                   "head.readout_oper.0.proj.0.weight",
                   "head.process.0.0.weight",
                   "head.process.0.1.weight",
                   "head.process.3.1.weight",
                   "head.layers_rn.2.weight",
                   "head.refine.0.resblock1.conv1.weight",
                   "head.refine.3.resblock2.bn2._variance",
                   "head.refine.1.out_conv.bias",
                   "head.head.0.weight",
                   "head.head.1._mean",
                   "head.head.4.bias",
               ))


def test_convt_matches_torch():
    """The 'convt' tag must make flax ConvTranspose reproduce paddle/torch
    transposed-conv semantics exactly (paddle and torch share the
    [in, out, kh, kw] layout and convolve rather than correlate)."""
    import torch
    import flax.linen as nn

    from emrt_tpu.utils.pdparams import _apply

    rng = np.random.default_rng(0)
    cin, cout, k, s = 3, 5, 4, 4
    w_pd = rng.normal(size=(cin, cout, k, k)).astype(np.float32)
    x = rng.normal(size=(1, cin, 6, 6)).astype(np.float32)
    ref = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w_pd), stride=s).numpy()

    mod = nn.ConvTranspose(cout, (k, k), strides=(s, s), padding="VALID",
                           use_bias=False)
    v = mod.init(jax.random.key(0), jnp.zeros((1, 6, 6, cin)))
    kernel = _apply("convt", w_pd, np.asarray(v["params"]["kernel"]))
    out = mod.apply({"params": {"kernel": jnp.asarray(kernel)}},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_pos_embed_interp_on_convert():
    """A pd position embedding trained at a different resolution is
    bilinearly re-interpolated (reference checkpoint.py:55-71)."""
    model = _tiny_emrt("vit", vit_hidden=64, vit_layers=4, vit_heads=4,
                       vit_out_indices=(0, 1, 2, 3))
    params, stats = _init(model, 64)
    pd = synth_pdparams(params, stats, "EMRT_ViT", "ViT")
    key = "encoder.transformer.embeddings.position_embeddings"
    d = pd[key].shape[-1]
    rng = np.random.default_rng(3)
    pd[key] = rng.normal(scale=0.05, size=(1, 10 * 10 + 1, d)
                         ).astype(np.float32)  # 160^2 input worth of tokens
    _, _, report = convert_pdparams(pd, params, stats, "EMRT_ViT", "ViT")
    assert report["missing"] == [] and report["unused"] == []


@pytest.mark.slow
def test_pdparams_end_to_end_val_and_pretrained(tmp_path):
    """Full accuracy-gate pipeline on the flagship config: a synthetic
    reference-inventory .pdparams drives `val.py --model_path x.pdparams`
    to a real mIoU, and `train.py` with MODEL.PRETRAINED logs the
    pretrained-load report (reference src/models/__init__.py:29)."""
    import os
    import pickle
    import subprocess
    import sys

    from emrt_tpu.config import get_config
    from emrt_tpu.models import get_model

    root = os.path.join(os.path.dirname(__file__), "..")
    cfg_path = os.path.join(root, "configs", "EMRT",
                            "EMRT_smoke_synthetic.yaml")
    cfg = get_config(cfg_path)
    model = get_model(cfg, use_pallas=False)
    params, stats = _init(model, hw=cfg.DATA.CROP_SIZE[0])
    pd = synth_pdparams(params, stats, cfg.MODEL.NAME,
                        cfg.MODEL.ENCODER.TYPE)
    ckpt = tmp_path / "weights.pdparams"
    with open(ckpt, "wb") as f:
        pickle.dump(pd, f)

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    out = subprocess.run(
        [sys.executable, "val.py", "--config", cfg_path,
         "--model_path", str(ckpt)],
        cwd=root, env=env, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    log = out.stdout + out.stderr
    assert "pretrained load:" in log and " 0 skipped" in log, log[-2000:]
    assert "final mIoU:" in log

    out = subprocess.run(
        [sys.executable, "train.py", "--config", cfg_path, "--iters", "1",
         "SAVE_DIR", str(tmp_path / "run"), "MODEL.PRETRAINED", str(ckpt),
         "VALIDATE_FREQ", "100000", "SAVE_FREQ_CHECKPOINT", "100000"],
        cwd=root, env=env, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    log = out.stdout + out.stderr
    assert "pretrained load:" in log and " 0 skipped" in log, log[-2000:]
    assert "initialized from MODEL.PRETRAINED" in log


def test_emrt_variant_names_route_to_emrt_maps():
    """Shipped EMRT configs embed zoo family names in MODEL.NAME
    ('EMRT_Segformer', 'EMRT_ViT', ...); dispatch must reach the EMRT
    branch, not the zoo branch the substring would otherwise match."""
    for name, enc in [("EMRT_Segformer", "segformer_b4"),
                      ("EMRT_CSwin", "cswintransformer"),
                      ("EMRT_ViT", "vit"), ("EMRT_HRNet", "hrnet"),
                      ("EMRT", "resnet50")]:
        pmap, _, _, _ = build_key_map({}, name, enc)
        assert any(k.startswith("encoder_decoder/") for k in pmap), name
