"""Per-family Paddle `.pdparams` key maps beyond EMRT-r50.

Each builder returns ``(pmap, smap, fold)`` in the same format as
``pdparams.emrt_r50_key_map``: flax '/'-path -> (pd key, transform tag).
Structure counts (block depths, stage widths) are derived from the flax
tree itself, so the maps track whatever the config built.

Reference attribute layouts being mapped (all under
``/root/reference/semantic_segmentation/``):

* CSwin backbone: ``src/models/backbones/cswin_transformer.py`` —
  ``patch_embedding.{patch_embed,norm}``, ``stages.{s}.blocks.{b}.{norm1,
  qkv,attns.{0,1}.get_v,proj,norm2,mlp.{fc1,fc2}}``, ``stages.{s}.merge.
  {conv,norm}`` (s<3); EMRT_CSwin adds top-level ``layer_norms.{0..3}``
  (``paddle_EMRT_cswin_backbone.py:236-251``).
* ViT backbone: ``src/models/backbones/vit.py`` —
  ``transformer.embeddings.{patch_embeddings,position_embeddings,
  cls_token}``, ``transformer.encoder.layers.{i}.{attn_norm,mlp_norm,
  attn.{qkv,out},mlp.{fc1,fc2}}`` (fused qkv chunk(3) -> q/k/v slices).
* ViT_MLA: ``src/models/backbones/vit_mla.py:309-460`` — ViT plus
  ``mla.mla_p{2..5}{_1x1,}.{0 conv,1 syncbn}`` and ``norm_{0..3}``.
* MixViT (SegFormer): ``src/models/backbones/paddleseg_segformer/
  mix_transformer.py`` — ``patch_embed{1..4}.{proj,norm}``,
  ``block{s}.{b}.{norm1,attn.{q,kv,proj,sr,norm},norm2,mlp.{fc1,
  dwconv.dwconv,fc2}}``, ``norm{1..4}``; EMRT wraps it in the SegFormer
  model whose head layers are dead weight (``segformer_paddleSeg.py:80-84``).
* HRNet-W48: ``src/models/backbones/hrnet.py`` — paddleseg ConvBNReLU
  naming (``._conv`` / ``._batch_norm``), ``la1.bb_layer2_{1..4}``,
  ``tr{1..3}.transition_tr{n}_layer_{i}``, ``st{n}.stage_st{n}_{m}.
  {branches_func.bb_st{n}_{m}_branch_layer_{i}_{j}, fuse_func.
  residual_st{n}_{m}_layer_{i}_{j}[_{k}]}``.
* SETR: ``src/models/setr.py:28-170`` + ``decoders/vit_up_head.py`` +
  ``decoders/vit_mla_head.py`` + ``decoders/vit_mla_auxi_head.py``.
"""
from __future__ import annotations

import re
from typing import Dict, Tuple

Maps = Tuple[Dict[str, tuple], Dict[str, tuple], Dict[str, str]]


def _mk():
    return {}, {}, {}


def _bn(pmap, smap, flax_prefix: str, pd_prefix: str):
    pmap[f"{flax_prefix}/scale"] = (f"{pd_prefix}.weight", "id")
    pmap[f"{flax_prefix}/bias"] = (f"{pd_prefix}.bias", "id")
    smap[f"{flax_prefix}/mean"] = (f"{pd_prefix}._mean", "id")
    smap[f"{flax_prefix}/var"] = (f"{pd_prefix}._variance", "id")


def _ln(pmap, flax_prefix: str, pd_prefix: str):
    pmap[f"{flax_prefix}/scale"] = (f"{pd_prefix}.weight", "id")
    pmap[f"{flax_prefix}/bias"] = (f"{pd_prefix}.bias", "id")


def _dense(pmap, flax_prefix: str, pd_prefix: str, bias: bool = True):
    pmap[f"{flax_prefix}/kernel"] = (f"{pd_prefix}.weight", "id")
    if bias:
        pmap[f"{flax_prefix}/bias"] = (f"{pd_prefix}.bias", "id")


def _convp(pmap, flax_prefix: str, pd_prefix: str, bias: bool = False):
    pmap[f"{flax_prefix}/kernel"] = (f"{pd_prefix}.weight", "conv")
    if bias:
        pmap[f"{flax_prefix}/bias"] = (f"{pd_prefix}.bias", "id")


def _conv_bn(pmap, smap, flax_prefix: str, pd_conv: str, pd_bn: str):
    """Our ConvBNReLU (Conv_0 + BatchNorm_0) <- pd conv + norm pair."""
    _convp(pmap, f"{flax_prefix}/Conv_0", pd_conv)
    _bn(pmap, smap, f"{flax_prefix}/BatchNorm_0", pd_bn)


def _stage_blocks(flat_p, pat: str):
    """Sorted (stage, block) pairs present in the flax tree."""
    found = set()
    rx = re.compile(pat)
    for k in flat_p:
        m = rx.match(k)
        if m:
            found.add((int(m.group(1)), int(m.group(2))))
    return sorted(found)


# ---------------------------------------------------------------------------
# Backbones
# ---------------------------------------------------------------------------

def cswin_backbone_map(flat_p, flax="backbone", pd="encoder") -> Maps:
    """CSwinTransformer; our stage{s}_block{b} naming, attn_h <-> attns.0
    (horizontal stripes), attn_w <-> attns.1, single attn on the last
    stage (split_heads=False, cswin_transformer.py:317-336)."""
    pmap, smap, fold = _mk()
    _convp(pmap, f"{flax}/patch_embed", f"{pd}.patch_embedding.patch_embed",
           bias=True)
    _ln(pmap, f"{flax}/patch_norm", f"{pd}.patch_embedding.norm")
    blocks = _stage_blocks(flat_p, rf"{flax}/stage(\d+)_block(\d+)/norm1/scale")
    n_stages = max(s for s, _ in blocks) + 1 if blocks else 0
    for s, b in blocks:
        fl = f"{flax}/stage{s}_block{b}"
        pdb = f"{pd}.stages.{s}.blocks.{b}"
        _ln(pmap, f"{fl}/norm1", f"{pdb}.norm1")
        _ln(pmap, f"{fl}/norm2", f"{pdb}.norm2")
        _dense(pmap, f"{fl}/qkv", f"{pdb}.qkv")
        _dense(pmap, f"{fl}/proj", f"{pdb}.proj")
        _dense(pmap, f"{fl}/mlp/Dense_0", f"{pdb}.mlp.fc1")
        _dense(pmap, f"{fl}/mlp/Dense_1", f"{pdb}.mlp.fc2")
        if f"{fl}/attn/get_v/kernel" in flat_p:   # last stage: one branch
            _convp(pmap, f"{fl}/attn/get_v", f"{pdb}.attns.0.get_v", bias=True)
        else:
            _convp(pmap, f"{fl}/attn_h/get_v", f"{pdb}.attns.0.get_v", bias=True)
            _convp(pmap, f"{fl}/attn_w/get_v", f"{pdb}.attns.1.get_v", bias=True)
    for s in range(max(n_stages - 1, 0)):
        _convp(pmap, f"{flax}/merge{s}", f"{pd}.stages.{s}.merge.conv", bias=True)
        _ln(pmap, f"{flax}/merge_norm{s}", f"{pd}.stages.{s}.merge.norm")
    return pmap, smap, fold


def vit_backbone_map(flat_p, flax="backbone", pd="encoder.transformer",
                     block_fmt="block{i}") -> Maps:
    """VisualTransformer (vit.py): fused qkv -> per-head q/k/v slices."""
    pmap, smap, fold = _mk()
    emb = f"{pd}.embeddings"
    _convp(pmap, f"{flax}/patch_embed", f"{emb}.patch_embeddings", bias=True)
    pmap[f"{flax}/pos_embed"] = (f"{emb}.position_embeddings", "pos_embed")
    pmap[f"{flax}/cls_token"] = (f"{emb}.cls_token", "id")
    i = 0
    while f"{flax}/{block_fmt.format(i=i)}/norm1/scale" in flat_p:
        fl = f"{flax}/{block_fmt.format(i=i)}"
        pdb = f"{pd}.encoder.layers.{i}"
        _ln(pmap, f"{fl}/norm1", f"{pdb}.attn_norm")
        _ln(pmap, f"{fl}/norm2", f"{pdb}.mlp_norm")
        for j, proj in enumerate(("q_proj", "k_proj", "v_proj")):
            pmap[f"{fl}/attn/{proj}/kernel"] = (f"{pdb}.attn.qkv.weight",
                                                f"qkv:{j}")
            pmap[f"{fl}/attn/{proj}/bias"] = (f"{pdb}.attn.qkv.bias",
                                              f"qkvb:{j}")
        pmap[f"{fl}/attn/out_proj/kernel"] = (f"{pdb}.attn.out.weight",
                                              "out_heads")
        pmap[f"{fl}/attn/out_proj/bias"] = (f"{pdb}.attn.out.bias", "id")
        _dense(pmap, f"{fl}/mlp/Dense_0", f"{pdb}.mlp.fc1")
        _dense(pmap, f"{fl}/mlp/Dense_1", f"{pdb}.mlp.fc2")
        i += 1
    return pmap, smap, fold


def vit_mla_backbone_map(flat_p, flax="encoder", pd="encoder") -> Maps:
    """ViT_MLA = ViT core + Conv_MLA aggregation + per-tap norm_{i}."""
    pmap, smap, fold = vit_backbone_map(
        flat_p, flax=f"{flax}/transformer", pd=f"{pd}.transformer",
        block_fmt="block{i}")
    for i in range(4):
        _ln(pmap, f"{flax}/norm_{i}", f"{pd}.norm_{i}")
    for n in (2, 3, 4, 5):
        for suffix in ("_1x1", ""):
            _conv_bn(pmap, smap, f"{flax}/mla/mla_p{n}{suffix}",
                     f"{pd}.mla.mla_p{n}{suffix}.0",
                     f"{pd}.mla.mla_p{n}{suffix}.1")
    return pmap, smap, fold


def mixvit_backbone_map(flat_p, flax="backbone", pd="backbone") -> Maps:
    """MixVisionTransformer (paddleseg_segformer/mix_transformer.py);
    pd block/stage indices are 1-based."""
    pmap, smap, fold = _mk()
    blocks = _stage_blocks(flat_p, rf"{flax}/stage(\d+)_block(\d+)/norm1/scale")
    n_stages = max(s for s, _ in blocks) + 1 if blocks else 0
    for s in range(n_stages):
        _convp(pmap, f"{flax}/patch_embed{s}", f"{pd}.patch_embed{s + 1}.proj",
               bias=True)
        _ln(pmap, f"{flax}/embed_norm{s}", f"{pd}.patch_embed{s + 1}.norm")
        _ln(pmap, f"{flax}/norm{s}", f"{pd}.norm{s + 1}")
    for s, b in blocks:
        fl = f"{flax}/stage{s}_block{b}"
        pdb = f"{pd}.block{s + 1}.{b}"
        _ln(pmap, f"{fl}/norm1", f"{pdb}.norm1")
        _ln(pmap, f"{fl}/norm2", f"{pdb}.norm2")
        _dense(pmap, f"{fl}/attn/q", f"{pdb}.attn.q")
        _dense(pmap, f"{fl}/attn/kv", f"{pdb}.attn.kv")
        _dense(pmap, f"{fl}/attn/proj", f"{pdb}.attn.proj")
        if f"{fl}/attn/sr/kernel" in flat_p:
            _convp(pmap, f"{fl}/attn/sr", f"{pdb}.attn.sr", bias=True)
            _ln(pmap, f"{fl}/attn/sr_norm", f"{pdb}.attn.norm")
        _dense(pmap, f"{fl}/ffn/fc1", f"{pdb}.mlp.fc1")
        _convp(pmap, f"{fl}/ffn/dwconv", f"{pdb}.mlp.dwconv.dwconv", bias=True)
        _dense(pmap, f"{fl}/ffn/fc2", f"{pdb}.mlp.fc2")
    return pmap, smap, fold


def mixvit_zoo_map(flat_p, flax="encoder", pd="backbone") -> Maps:
    """The SegFormer ZOO model's MixViT copy (src/models/backbones/
    mix_transformer.py:354-463) nests LayerLists — keys are
    ``layers.{i}.0`` (PatchEmbed: projection+norm), ``layers.{i}.1.{b}``
    (blocks) and ``layers.{i}.2`` (stage norm) — and its MixFFN uses 1x1
    Conv2D fc1/fc2 with a depthwise pe_conv (:167-215), unlike the
    paddleseg copy's Linears."""
    pmap, smap, fold = _mk()
    blocks = _stage_blocks(flat_p, rf"{flax}/stage(\d+)_block(\d+)/norm1/scale")
    n_stages = max(s for s, _ in blocks) + 1 if blocks else 0
    for s in range(n_stages):
        _convp(pmap, f"{flax}/patch_embed{s}", f"{pd}.layers.{s}.0.projection",
               bias=True)
        _ln(pmap, f"{flax}/embed_norm{s}", f"{pd}.layers.{s}.0.norm")
        _ln(pmap, f"{flax}/norm{s}", f"{pd}.layers.{s}.2")
    for s, b in blocks:
        fl = f"{flax}/stage{s}_block{b}"
        pdb = f"{pd}.layers.{s}.1.{b}"
        _ln(pmap, f"{fl}/norm1", f"{pdb}.norm1")
        _ln(pmap, f"{fl}/norm2", f"{pdb}.norm2")
        _dense(pmap, f"{fl}/attn/q", f"{pdb}.attn.q")
        _dense(pmap, f"{fl}/attn/kv", f"{pdb}.attn.kv")
        _dense(pmap, f"{fl}/attn/proj", f"{pdb}.attn.proj")
        if f"{fl}/attn/sr/kernel" in flat_p:
            _convp(pmap, f"{fl}/attn/sr", f"{pdb}.attn.sr", bias=True)
            _ln(pmap, f"{fl}/attn/sr_norm", f"{pdb}.attn.norm")
        pmap[f"{fl}/ffn/fc1/kernel"] = (f"{pdb}.ffn.fc1.weight", "conv1x1_dense")
        pmap[f"{fl}/ffn/fc1/bias"] = (f"{pdb}.ffn.fc1.bias", "id")
        _convp(pmap, f"{fl}/ffn/dwconv", f"{pdb}.ffn.pe_conv", bias=True)
        pmap[f"{fl}/ffn/fc2/kernel"] = (f"{pdb}.ffn.fc2.weight", "conv1x1_dense")
        pmap[f"{fl}/ffn/fc2/bias"] = (f"{pdb}.ffn.fc2.bias", "id")
    return pmap, smap, fold


def segformer_key_map(flat_p) -> Maps:
    """SegFormer zoo model: zoo MixViT + SegformerHead
    (decoders/segformer_head.py:27-98: convs.{i}/fusion_conv ConvModules
    with BatchNorm, conv_seg classifier)."""
    pmap, smap, fold = mixvit_zoo_map(flat_p, flax="encoder", pd="backbone")
    i = 0
    while f"decoder/conv{i}/Conv_0/kernel" in flat_p:
        _conv_bn(pmap, smap, f"decoder/conv{i}",
                 f"decode_head.convs.{i}.conv", f"decode_head.convs.{i}.bn")
        i += 1
    _conv_bn(pmap, smap, "decoder/fusion_conv",
             "decode_head.fusion_conv.conv", "decode_head.fusion_conv.bn")
    _convp(pmap, "decoder/conv_seg", "decode_head.conv_seg", bias=True)
    return pmap, smap, fold


def hrnet_backbone_map(flat_p, flax="backbone", pd="backbone") -> Maps:
    """HRNet-W{w}: paddleseg ConvBNReLU/ConvBN register ._conv and
    ._batch_norm; fuse-layer BNs on our side are positional (_BN_{idx} in
    FuseLayer.__call__ creation order, which equals the reference's
    (i, j) registration order)."""
    pmap, smap, fold = _mk()

    def cbr(fl, pd_layer):
        _conv_bn(pmap, smap, fl, f"{pd_layer}._conv", f"{pd_layer}._batch_norm")

    cbr(f"{flax}/stem1", f"{pd}.conv_layer1_1")
    cbr(f"{flax}/stem2", f"{pd}.conv_layer1_2")

    # la1: 4 bottlenecks named bb_layer2_{i+1}
    for i in range(4):
        fl = f"{flax}/layer1_block{i}"
        pdb = f"{pd}.la1.bb_layer2_{i + 1}"
        for j in range(3):
            _convp(pmap, f"{fl}/Conv_{j}", f"{pdb}.conv{j + 1}._conv")
            _bn(pmap, smap, f"{fl}/_BN_{j}/BatchNorm_0",
                f"{pdb}.conv{j + 1}._batch_norm")
        if f"{fl}/Conv_3/kernel" in flat_p:
            _convp(pmap, f"{fl}/Conv_3", f"{pdb}.conv_down._conv")
            _bn(pmap, smap, f"{fl}/_BN_3/BatchNorm_0",
                f"{pdb}.conv_down._batch_norm")

    # transitions (hrnet.py:235-276: only channel-changing/new branches
    # get a conv; tr1 -> layers 1,2; tr2 -> layer 3; tr3 -> layer 4)
    cbr(f"{flax}/trans1_b0", f"{pd}.tr1.transition_tr1_layer_1")
    cbr(f"{flax}/trans1_b1", f"{pd}.tr1.transition_tr1_layer_2")
    cbr(f"{flax}/trans2_new", f"{pd}.tr2.transition_tr2_layer_3")
    cbr(f"{flax}/trans3_new", f"{pd}.tr3.transition_tr3_layer_4")

    # stages 2..4
    for stage, attr in ((2, "st2"), (3, "st3"), (4, "st4")):
        n_br = stage  # branches per stage
        m = 0
        while f"{flax}/stage{stage}_m{m}/branch0_block0/Conv_0/kernel" in flat_p:
            fl_m = f"{flax}/stage{stage}_m{m}"
            pd_m = f"{pd}.{attr}.stage_{attr}_{m + 1}"
            for br in range(n_br):
                b = 0
                while f"{fl_m}/branch{br}_block{b}/Conv_0/kernel" in flat_p:
                    fl = f"{fl_m}/branch{br}_block{b}"
                    pdb = (f"{pd_m}.branches_func."
                           f"bb_{attr}_{m + 1}_branch_layer_{br + 1}_{b + 1}")
                    for j in (0, 1):
                        _convp(pmap, f"{fl}/Conv_{j}", f"{pdb}.conv{j + 1}._conv")
                        _bn(pmap, smap, f"{fl}/_BN_{j}/BatchNorm_0",
                            f"{pdb}.conv{j + 1}._batch_norm")
                    b += 1
            # fuse: iterate exactly like FuseLayer.__call__ / the reference
            # FuseLayers registration (i outer, j inner, k down-chain)
            idx = 0
            for i in range(n_br):
                for j in range(n_br):
                    if j > i:
                        name = (f"{pd_m}.fuse_func."
                                f"residual_{attr}_{m + 1}_layer_{i + 1}_{j + 1}")
                        _convp(pmap, f"{fl_m}/fuse/up{i}_{j}", f"{name}._conv")
                        _bn(pmap, smap, f"{fl_m}/fuse/_BN_{idx}/BatchNorm_0",
                            f"{name}._batch_norm")
                        idx += 1
                    elif j < i:
                        for k in range(i - j):
                            name = (f"{pd_m}.fuse_func.residual_{attr}_{m + 1}"
                                    f"_layer_{i + 1}_{j + 1}_{k + 1}")
                            _convp(pmap, f"{fl_m}/fuse/down{i}_{j}_{k}",
                                   f"{name}._conv")
                            _bn(pmap, smap,
                                f"{fl_m}/fuse/_BN_{idx}/BatchNorm_0",
                                f"{name}._batch_norm")
                            idx += 1
            m += 1
    return pmap, smap, fold


def swin_backbone_map(flat_p, flax="encoder", pd="encoder") -> Maps:
    """SwinTransformer (swin_transformer.py:575-651): patch_embedding
    conv+norm, stages.{s}.blocks.{b} with fused-qkv WindowAttention and a
    relative_position_bias_table, stages.{s}.downsample PatchMerging.
    Our per-out-stage norm{s} correspond to the reference UperNet's
    top-level layer_norms (upernet.py:60-63) and are mapped by the
    caller."""
    pmap, smap, fold = _mk()
    _convp(pmap, f"{flax}/patch_embed", f"{pd}.patch_embedding.patch_embed",
           bias=True)
    _ln(pmap, f"{flax}/patch_norm", f"{pd}.patch_embedding.norm")
    blocks = _stage_blocks(flat_p, rf"{flax}/stage(\d+)_block(\d+)/norm1/scale")
    n_stages = max(s for s, _ in blocks) + 1 if blocks else 0
    for s, b in blocks:
        fl = f"{flax}/stage{s}_block{b}"
        pdb = f"{pd}.stages.{s}.blocks.{b}"
        _ln(pmap, f"{fl}/norm1", f"{pdb}.norm1")
        _ln(pmap, f"{fl}/norm2", f"{pdb}.norm2")
        _dense(pmap, f"{fl}/attn/qkv", f"{pdb}.attn.qkv")
        _dense(pmap, f"{fl}/attn/proj", f"{pdb}.attn.proj")
        pmap[f"{fl}/attn/relative_position_bias_table"] = (
            f"{pdb}.attn.relative_position_bias_table", "id")
        _dense(pmap, f"{fl}/mlp/Dense_0", f"{pdb}.mlp.fc1")
        _dense(pmap, f"{fl}/mlp/Dense_1", f"{pdb}.mlp.fc2")
    for s in range(max(n_stages - 1, 0)):
        _ln(pmap, f"{flax}/merge{s}/norm", f"{pd}.stages.{s}.downsample.norm")
        _dense(pmap, f"{flax}/merge{s}/reduction",
               f"{pd}.stages.{s}.downsample.reduction", bias=False)
    return pmap, smap, fold


def focal_backbone_map(flat_p, flax="encoder", pd="encoder") -> Maps:
    """FocalTransformer (focal_transformer.py:819-1000): patch_embed
    conv+norm PatchEmbed, layers.{s}.blocks.{b} with fused-qkv focal
    WindowAttention (three bias-table families + fc pool_layers), and a
    conv PatchEmbed ``layers.{s}.downsample``. Our parameters correspond
    1:1 (all index/mask tables are constants on both sides)."""
    pmap, smap, fold = _mk()
    _convp(pmap, f"{flax}/patch_embed/proj", f"{pd}.patch_embed.proj",
           bias=True)
    _ln(pmap, f"{flax}/patch_embed/norm", f"{pd}.patch_embed.norm")
    blocks = _stage_blocks(flat_p, rf"{flax}/stage(\d+)_block(\d+)/norm1/scale")
    n_stages = max(s for s, _ in blocks) + 1 if blocks else 0
    for s, b in blocks:
        fl = f"{flax}/stage{s}_block{b}"
        pdb = f"{pd}.layers.{s}.blocks.{b}"
        _ln(pmap, f"{fl}/norm1", f"{pdb}.norm1")
        _ln(pmap, f"{fl}/norm2", f"{pdb}.norm2")
        k = 0
        while f"{fl}/pool_layers{k}/kernel" in flat_p:
            _dense(pmap, f"{fl}/pool_layers{k}", f"{pdb}.pool_layers.{k}")
            k += 1
        _dense(pmap, f"{fl}/attn/qkv", f"{pdb}.attn.qkv")
        _dense(pmap, f"{fl}/attn/proj", f"{pdb}.attn.proj")
        pmap[f"{fl}/attn/relative_position_bias_table"] = (
            f"{pdb}.attn.relative_position_bias_table", "id")
        if f"{fl}/attn/relative_position_bias_table_to_neighbors" in flat_p:
            pmap[f"{fl}/attn/relative_position_bias_table_to_neighbors"] = (
                f"{pdb}.attn.relative_position_bias_table_to_neighbors", "id")
        k = 0
        while (f"{fl}/attn/relative_position_bias_table_to_windows{k}"
               in flat_p):
            pmap[f"{fl}/attn/relative_position_bias_table_to_windows{k}"] = (
                f"{pdb}.attn.relative_position_bias_table_to_windows.{k}",
                "id")
            k += 1
        _dense(pmap, f"{fl}/mlp/Dense_0", f"{pdb}.mlp.fc1")
        _dense(pmap, f"{fl}/mlp/Dense_1", f"{pdb}.mlp.fc2")
    for s in range(max(n_stages - 1, 0)):
        _convp(pmap, f"{flax}/downsample{s}/proj",
               f"{pd}.layers.{s}.downsample.proj", bias=True)
        _ln(pmap, f"{flax}/downsample{s}/norm",
            f"{pd}.layers.{s}.downsample.norm")
    return pmap, smap, fold


def _uper_head_map(pmap, smap, flat_p, flax="decoder", pd="decoder"):
    """UperHead (decoders/uper_head.py:29-69 + psp_head.py:30-44):
    psp branches (Sequential: pool/conv/bn), bottleneck, lateral_convs,
    fpn_convs, fpn_bottleneck, conv_seg."""
    i = 0
    while f"{flax}/psp{i}/Conv_0/kernel" in flat_p:
        _conv_bn(pmap, smap, f"{flax}/psp{i}",
                 f"{pd}.psp_modules.pool_branches.{i}.1",
                 f"{pd}.psp_modules.pool_branches.{i}.2")
        i += 1
    _conv_bn(pmap, smap, f"{flax}/bottleneck", f"{pd}.bottleneck.0",
             f"{pd}.bottleneck.1")
    i = 0
    while f"{flax}/lateral{i}/Conv_0/kernel" in flat_p:
        _conv_bn(pmap, smap, f"{flax}/lateral{i}",
                 f"{pd}.lateral_convs.{i}.0", f"{pd}.lateral_convs.{i}.1")
        _conv_bn(pmap, smap, f"{flax}/fpn{i}",
                 f"{pd}.fpn_convs.{i}.0", f"{pd}.fpn_convs.{i}.1")
        i += 1
    _conv_bn(pmap, smap, f"{flax}/fpn_bottleneck", f"{pd}.fpn_bottleneck.0",
             f"{pd}.fpn_bottleneck.1")
    _convp(pmap, f"{flax}/conv_seg", f"{pd}.conv_seg", bias=True)


def _fcn_head_map(pmap, smap, flat_p, flax="aux_decoder", pd="aux_decoder"):
    """Zoo FCNHead (decoders/fcn_head.py:45-67): convs.{i} Sequential
    pairs + conv_seg classifier."""
    i = 0
    while f"{flax}/conv{i}/Conv_0/kernel" in flat_p:
        _conv_bn(pmap, smap, f"{flax}/conv{i}",
                 f"{pd}.convs.{i}.0", f"{pd}.convs.{i}.1")
        i += 1
    if f"{flax}/conv_cat/Conv_0/kernel" in flat_p:
        _conv_bn(pmap, smap, f"{flax}/conv_cat",
                 f"{pd}.conv_cat.0", f"{pd}.conv_cat.1")
    _convp(pmap, f"{flax}/conv_seg", f"{pd}.conv_seg", bias=True)


def upernet_key_map(flat_p) -> Maps:
    """UperNet (upernet.py:41-106): Swin, CSwin, or Focal encoder +
    top-level layer_norms + UperHead decoder + FCNHead aux."""
    if any(k.endswith("relative_position_bias_table_to_neighbors")
           or "relative_position_bias_table_to_windows" in k
           for k in flat_p):
        pmap, smap, fold = focal_backbone_map(flat_p, flax="encoder",
                                              pd="encoder")
        s = 0
        while f"layer_norm{s}/scale" in flat_p:
            _ln(pmap, f"layer_norm{s}", f"layer_norms.{s}")
            s += 1
    elif any(k.startswith("encoder/stage0_block0/attn/qkv") for k in flat_p):
        pmap, smap, fold = swin_backbone_map(flat_p, flax="encoder",
                                             pd="encoder")
        # our swin's per-out-stage norms ARE the reference's layer_norms
        s = 0
        while f"encoder/norm{s}/scale" in flat_p:
            _ln(pmap, f"encoder/norm{s}", f"layer_norms.{s}")
            s += 1
    elif any(k.startswith("encoder/stage0_block0/qkv") for k in flat_p):
        pmap, smap, fold = cswin_backbone_map(flat_p, flax="encoder",
                                              pd="encoder")
        s = 0
        while f"layer_norm{s}/scale" in flat_p:
            _ln(pmap, f"layer_norm{s}", f"layer_norms.{s}")
            s += 1
    else:
        raise NotImplementedError(
            "no .pdparams map for this UperNet encoder (Focal's TPU "
            "re-design has no 1:1 parameter correspondence)")
    _uper_head_map(pmap, smap, flat_p)
    _fcn_head_map(pmap, smap, flat_p)
    return pmap, smap, fold


def resnet_seg_backbone_map(flat_p, flax="cnn_encoder",
                            pd="cnn_encoder") -> Maps:
    """Paddleseg-style ResNetV1 (backbones/resnet.py:102-199): deep-stem
    ``conv1.{0,1,3,4,6}`` Sequential + ``bn1`` (or plain ``conv1``/``bn1``),
    then ``layer{1..4}.{b}.{conv,bn}{1..n}`` + ``downsample.{0,1}``.
    Our flax ResNet uses auto-named modules: stem Conv_{0..2}/_BN_{0..2},
    then one sequentially-numbered Bottleneck_{i}/BasicBlock_{i} per block
    across all four stages."""
    pmap, smap, fold = _mk()

    def bnw(fl, pdp):
        _bn(pmap, smap, f"{fl}/BatchNorm_0", pdp)

    deep = f"{flax}/Conv_2/kernel" in flat_p
    if deep:
        for j, pdi in enumerate((0, 3, 6)):
            _convp(pmap, f"{flax}/Conv_{j}", f"{pd}.conv1.{pdi}")
        bnw(f"{flax}/_BN_0", f"{pd}.conv1.1")
        bnw(f"{flax}/_BN_1", f"{pd}.conv1.4")
        bnw(f"{flax}/_BN_2", f"{pd}.bn1")
    else:
        _convp(pmap, f"{flax}/Conv_0", f"{pd}.conv1")
        bnw(f"{flax}/_BN_0", f"{pd}.bn1")

    block = "Bottleneck" if f"{flax}/Bottleneck_0/Conv_0/kernel" in flat_p \
        else "BasicBlock"
    n_convs = 3 if block == "Bottleneck" else 2
    n_blocks = 0
    while f"{flax}/{block}_{n_blocks}/Conv_0/kernel" in flat_p:
        n_blocks += 1
    layers = {8: (2, 2, 2, 2), 16: (3, 4, 6, 3), 33: (3, 4, 23, 3),
              52: (3, 8, 36, 3)}[n_blocks]
    i = 0
    for stage, depth in enumerate(layers):
        for b in range(depth):
            fl = f"{flax}/{block}_{i}"
            pdb = f"{pd}.layer{stage + 1}.{b}"
            for j in range(n_convs):
                _convp(pmap, f"{fl}/Conv_{j}", f"{pdb}.conv{j + 1}")
                bnw(f"{fl}/_BN_{j}", f"{pdb}.bn{j + 1}")
            if f"{fl}/Conv_{n_convs}/kernel" in flat_p:
                _convp(pmap, f"{fl}/Conv_{n_convs}", f"{pdb}.downsample.0")
                bnw(f"{fl}/_BN_{n_convs}", f"{pdb}.downsample.1")
            i += 1
    return pmap, smap, fold


def fcn_key_map(flat_p) -> Maps:
    """FCN baseline (fcn.py:22-64): paddleseg resnet50c ``cnn_encoder`` +
    ``head.conv_1.{0 conv(bias),1 syncbn}`` + ``head.cls``. The head conv's
    bias (bias_attr=True, fcn.py:54) is folded into the BN running mean."""
    pmap, smap, fold = resnet_seg_backbone_map(flat_p)
    _conv_bn(pmap, smap, "head_conv", "head.conv_1.0", "head.conv_1.1")
    fold["head_conv/BatchNorm_0/mean"] = "head.conv_1.0.bias"
    _convp(pmap, "head_cls", "head.cls", bias=True)
    return pmap, smap, fold


def trans2seg_key_map(flat_p) -> Maps:
    """Trans2Seg (trans2seg.py:24-108 + trans2seg_transformer.py:88-421 +
    trans2seg_head.py:21-130): paddleseg resnet50c, flat encoder blocks
    with fused bias-free qkv, class-prototype decoder blocks
    (fc_q/fc_kv bias-free, proj biased), separable-conv head."""
    pmap, smap, fold = resnet_seg_backbone_map(flat_p)
    enc = "transformer_encoder"
    dec = "transformer_decoder"
    _dense(pmap, "hybrid_embed", "hybrid_embed.proj")
    pmap["cls_token"] = (f"{enc}.cls_token", "id")
    pmap["pos_embed"] = (f"{enc}.pos_embed", "pos_embed")
    i = 0
    while f"enc_block{i}/norm1/scale" in flat_p:
        fl = f"enc_block{i}"
        pdb = f"{enc}.blocks_encoder.{i}"
        _ln(pmap, f"{fl}/norm1", f"{pdb}.norm1")
        _ln(pmap, f"{fl}/norm2", f"{pdb}.norm2")
        for j, proj in enumerate(("q_proj", "k_proj", "v_proj")):
            pmap[f"{fl}/attn/{proj}/kernel"] = (f"{pdb}.attn.qkv.weight",
                                                f"qkv:{j}")
        pmap[f"{fl}/attn/out_proj/kernel"] = (f"{pdb}.attn.proj.weight",
                                              "out_heads")
        pmap[f"{fl}/attn/out_proj/bias"] = (f"{pdb}.attn.proj.bias", "id")
        _dense(pmap, f"{fl}/mlp/Dense_0", f"{pdb}.mlp.fc1")
        _dense(pmap, f"{fl}/mlp/Dense_1", f"{pdb}.mlp.fc2")
        i += 1
    _ln(pmap, "enc_norm", f"{enc}.norm")
    pmap["cls_embed"] = (f"{dec}.cls_embed", "id")
    i = 0
    while f"dec_block{i}/norm1/scale" in flat_p:
        fl = f"dec_block{i}"
        pdb = f"{dec}.blocks_decoder.{i}"
        for n in ("norm1", "norm1_clsembed", "norm2", "norm3", "norm4"):
            _ln(pmap, f"{fl}/{n}", f"{pdb}.{n}")
        _dense(pmap, f"{fl}/attn/fc_q", f"{pdb}.attn.fc_q", bias=False)
        _dense(pmap, f"{fl}/attn/fc_kv", f"{pdb}.attn.fc_kv", bias=False)
        _dense(pmap, f"{fl}/attn/proj", f"{pdb}.attn.proj")
        for m in ("mlp", "mlp2", "mlp3"):
            _dense(pmap, f"{fl}/{m}/Dense_0", f"{pdb}.{m}.fc1")
            _dense(pmap, f"{fl}/{m}/Dense_1", f"{pdb}.{m}.fc2")
        i += 1
    for lay in ("lay1", "lay2", "lay3"):
        pdl = f"cnn_head.{lay}.block"
        _convp(pmap, f"{lay}/depthwise", f"{pdl}.depthwise")
        _bn(pmap, smap, f"{lay}/bn_depth", f"{pdl}.bn_depth")
        _convp(pmap, f"{lay}/pointwise", f"{pdl}.pointwise")
        _bn(pmap, smap, f"{lay}/bn_point", f"{pdl}.bn_point")
    _convp(pmap, "conv_c1", "cnn_head.conv_c1.conv")
    _bn(pmap, smap, "conv_c1_bn", "cnn_head.conv_c1.bn")
    _convp(pmap, "pred", "cnn_head.pred", bias=True)
    return pmap, smap, fold


def dpt_key_map(flat_p) -> Maps:
    """DPT (dpt.py:25-41 + dpt_head.py:157-230): ViT backbone under
    ``backbone.transformer``, project-readout ``head.readout_oper.{i}.
    proj.0``, per-tap process stacks ``head.process.{i}.{0,1}``
    (transposed convs for taps 0/1, stride-2 conv for tap 3),
    ``head.layers_rn.{i}``, four FeatureFusionBlocks ``head.refine.{i}``
    (refine.3's resblock1 is registered but never runs - the top fusion
    gets x=None, dpt_head.py:144-148), and the 5-layer ``head.head``."""
    pmap, smap, fold = vit_backbone_map(flat_p, flax="backbone",
                                        pd="backbone.transformer")
    for i in range(4):
        if f"readout_proj{i}/kernel" in flat_p:
            _dense(pmap, f"readout_proj{i}", f"head.readout_oper.{i}.proj.0")
        _convp(pmap, f"process{i}_proj", f"head.process.{i}.0", bias=True)
        _convp(pmap, f"layers_rn{i}", f"head.layers_rn.{i}")
    pmap["process0_up/kernel"] = ("head.process.0.1.weight", "convt")
    pmap["process0_up/bias"] = ("head.process.0.1.bias", "id")
    pmap["process1_up/kernel"] = ("head.process.1.1.weight", "convt")
    pmap["process1_up/bias"] = ("head.process.1.1.bias", "id")
    _convp(pmap, "process3_down", "head.process.3.1", bias=True)

    def resblock(fl, pdb):
        for c in ("conv1", "conv2"):
            _convp(pmap, f"{fl}/{c}", f"{pdb}.{c}")
        for b in ("bn1", "bn2"):
            _bn(pmap, smap, f"{fl}/{b}", f"{pdb}.{b}")

    for i in range(4):
        if f"refine{i}/resblock1/conv1/kernel" in flat_p:
            resblock(f"refine{i}/resblock1", f"head.refine.{i}.resblock1")
        resblock(f"refine{i}/resblock2", f"head.refine.{i}.resblock2")
        _convp(pmap, f"refine{i}/out_conv", f"head.refine.{i}.out_conv",
               bias=True)
    _convp(pmap, "head_conv", "head.head.0")
    _bn(pmap, smap, "head_bn", "head.head.1")
    _convp(pmap, "head_cls", "head.head.4", bias=True)
    return pmap, smap, fold


def deit_backbone_map(flat_p, flax="encoder", pd="encoder") -> Maps:
    """DeiT (deit.py:225-288): flat ``layers.{i}`` blocks with norm1/norm2
    + attn.{qkv,proj} naming (unlike vit.py's attn_norm/attn.out), a
    class_token AND a distill_token (our flax holds both in one
    [1, 2, D] cls_token — 'cat:' transform)."""
    pmap, smap, fold = _mk()
    _convp(pmap, f"{flax}/patch_embed", f"{pd}.patch_embed.proj", bias=True)
    pmap[f"{flax}/pos_embed"] = (f"{pd}.pos_embed", "pos_embed")
    pmap[f"{flax}/cls_token"] = (f"{pd}.class_token",
                                 f"cat:{pd}.distill_token")
    i = 0
    while f"{flax}/block{i}/norm1/scale" in flat_p:
        fl = f"{flax}/block{i}"
        pdb = f"{pd}.layers.{i}"
        _ln(pmap, f"{fl}/norm1", f"{pdb}.norm1")
        _ln(pmap, f"{fl}/norm2", f"{pdb}.norm2")
        for j, proj in enumerate(("q_proj", "k_proj", "v_proj")):
            pmap[f"{fl}/attn/{proj}/kernel"] = (f"{pdb}.attn.qkv.weight",
                                                f"qkv:{j}")
            pmap[f"{fl}/attn/{proj}/bias"] = (f"{pdb}.attn.qkv.bias",
                                              f"qkvb:{j}")
        pmap[f"{fl}/attn/out_proj/kernel"] = (f"{pdb}.attn.proj.weight",
                                              "out_heads")
        pmap[f"{fl}/attn/out_proj/bias"] = (f"{pdb}.attn.proj.bias", "id")
        _dense(pmap, f"{fl}/mlp/Dense_0", f"{pdb}.mlp.fc1")
        _dense(pmap, f"{fl}/mlp/Dense_1", f"{pdb}.mlp.fc2")
        i += 1
    return pmap, smap, fold


def segmenter_key_map(flat_p) -> Maps:
    """Segmenter (segmentor.py:10-44): ViT or DeiT encoder, shared
    post-encoder LayerNorm, MaskTransformer (segmentor_head.py:21-86 —
    its layers reuse vit.py's EncoderLayer, so attn_norm/mlp_norm naming)
    or LinearDecoder (:89-109)."""
    is_deit = ("encoder/cls_token" in flat_p
               and flat_p["encoder/cls_token"].shape[1] == 2)
    if is_deit:
        pmap, smap, fold = deit_backbone_map(flat_p, flax="encoder",
                                             pd="encoder")
    else:
        pmap, smap, fold = vit_backbone_map(flat_p, flax="encoder",
                                            pd="encoder.transformer")
    _ln(pmap, "norm", "norm")
    if "decoder/head/kernel" in flat_p:   # LinearDecoder
        _dense(pmap, "decoder/head", "decoder.head")
        return pmap, smap, fold
    i = 0
    while f"decoder/layer{i}/norm1/scale" in flat_p:
        fl = f"decoder/layer{i}"
        pdb = f"decoder.layers.{i}"
        _ln(pmap, f"{fl}/norm1", f"{pdb}.attn_norm")
        _ln(pmap, f"{fl}/norm2", f"{pdb}.mlp_norm")
        for j, proj in enumerate(("q_proj", "k_proj", "v_proj")):
            pmap[f"{fl}/attn/{proj}/kernel"] = (f"{pdb}.attn.qkv.weight",
                                                f"qkv:{j}")
            pmap[f"{fl}/attn/{proj}/bias"] = (f"{pdb}.attn.qkv.bias",
                                              f"qkvb:{j}")
        pmap[f"{fl}/attn/out_proj/kernel"] = (f"{pdb}.attn.out.weight",
                                              "out_heads")
        pmap[f"{fl}/attn/out_proj/bias"] = (f"{pdb}.attn.out.bias", "id")
        _dense(pmap, f"{fl}/mlp/Dense_0", f"{pdb}.mlp.fc1")
        _dense(pmap, f"{fl}/mlp/Dense_1", f"{pdb}.mlp.fc2")
        i += 1
    pmap["decoder/mask_tokens"] = ("decoder.mask_tokens", "id")
    _dense(pmap, "decoder/proj_decoder", "decoder.proj_decoder")
    _dense(pmap, "decoder/proj_patch", "decoder.proj_patch", bias=False)
    _dense(pmap, "decoder/proj_class", "decoder.proj_class", bias=False)
    _ln(pmap, "decoder/decoder_norm", "decoder.decoder_norm")
    _ln(pmap, "decoder/mask_norm", "decoder.mask_norm")
    return pmap, smap, fold


# ---------------------------------------------------------------------------
# SETR (zoo)
# ---------------------------------------------------------------------------

def setr_key_map(flat_p) -> Maps:
    """SETR MLA / PUP / Naive: encoder + decoder + aux decoders
    (setr.py:28-170). Decoder family is detected from the flax tree."""
    is_mla = any(k.startswith("decoder/head2_conv0") for k in flat_p)
    if is_mla:
        pmap, smap, fold = vit_mla_backbone_map(flat_p, flax="encoder",
                                                pd="encoder")
        for n in (2, 3, 4, 5):
            for c, seq in ((0, 0), (1, 3)):
                _conv_bn(pmap, smap, f"decoder/head{n}_conv{c}",
                         f"decoder.head{n}.{seq}", f"decoder.head{n}.{seq + 1}")
        _convp(pmap, "decoder/cls", "decoder.cls", bias=True)
        for n in (2, 3, 4, 5):
            fl = f"aux_decoder{n}"
            if f"{fl}/aux/kernel" in flat_p:
                _convp(pmap, f"{fl}/aux", f"aux_decoder{n}.aux")
            elif f"{fl}/aux_0/kernel" in flat_p:
                _convp(pmap, f"{fl}/aux_0", f"aux_decoder{n}.aux_0")
                _convp(pmap, f"{fl}/aux_1", f"aux_decoder{n}.aux_1")
    else:
        # PUP / Naive: plain ViT encoder directly under 'encoder'
        pmap, smap, fold = vit_backbone_map(flat_p, flax="encoder",
                                            pd="encoder.transformer")

        def up_head(fl_prefix, pd_prefix):
            _ln(pmap, f"{fl_prefix}/norm", f"{pd_prefix}.norm")
            i = 0
            while f"{fl_prefix}/conv_{i}/kernel" in flat_p:
                _convp(pmap, f"{fl_prefix}/conv_{i}", f"{pd_prefix}.conv_{i}",
                       bias=True)
                if f"{fl_prefix}/syncbn_fc_{i}/scale" in flat_p:
                    _bn(pmap, smap, f"{fl_prefix}/syncbn_fc_{i}",
                        f"{pd_prefix}.syncbn_fc_{i}")
                i += 1

        up_head("decoder", "decoder")
        for n in (2, 3, 4, 5):
            if f"aux_decoder{n}/conv_0/kernel" in flat_p:
                up_head(f"aux_decoder{n}", f"aux_decoder{n}")
    return pmap, smap, fold
