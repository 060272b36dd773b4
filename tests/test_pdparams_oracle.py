"""External-oracle tests for the .pdparams converter (round-3 verdict #4).

The round-trip tests (test_pdparams_zoo.py) invert our own key maps to
build fixtures, so a systematic misreading of Paddle layout shared by the
map and the fixture generator would pass silently. These tests close that
hole: each one re-implements the relevant REFERENCE module in torch,
directly from the cited reference source (not from our maps), loads the
same synthetic pd dict into it using Paddle's documented layouts
(Conv2D [out, in, kh, kw]; nn.Linear [in, out] computing y = x @ W + b;
LayerNorm/BatchNorm per-channel vectors), and requires the converted flax
model to reproduce the torch activations numerically.

Torch shares Paddle's Conv2D layout and cross-correlation semantics, and
`F.linear(x, W.T)` realizes Paddle's `x @ W` — so a wrong transpose or a
swapped q/k/v slice anywhere in the map or in `_apply` produces grossly
different activations here.

Covered families (verdict ask): EMRT-r50 (resnet50 backbone end-to-end,
decoder fused-qkv MHA, UpHead conv-bias->BN-mean fold), SETR (ViT
backbone end-to-end), SegFormer (zoo MixViT backbone end-to-end).
"""
from __future__ import annotations

import numpy as np
import pytest
import jax
import jax.numpy as jnp

# torch is an oracle-only dependency: skip (don't fail collection) when absent
torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from emrt_tpu.utils.pdparams import convert_pdparams

from test_pdparams_zoo import _flat, _init, _tiny_emrt, synth_pdparams

torch.manual_seed(0)


def _t(a):
    return torch.from_numpy(np.asarray(a, dtype=np.float32))


def _pd_linear(x, pd, key):
    """Paddle nn.Linear semantics: weight [in, out], y = x @ W + b
    (used with column slices by the reference, EMRT_utils/layers.py:224-227)."""
    return x @ _t(pd[f"{key}.weight"]) + _t(pd[f"{key}.bias"])


def _pd_ln(x, pd, key, eps=1e-5):
    """Paddle nn.LayerNorm: default epsilon 1e-5."""
    return F.layer_norm(x, (x.shape[-1],), _t(pd[f"{key}.weight"]),
                        _t(pd[f"{key}.bias"]), eps)


def _pd_conv(x, pd, key, stride=1, padding=0, dilation=1, groups=1,
             bias=True):
    """Paddle nn.Conv2D: weight [out, in/groups, kh, kw], cross-correlation
    — identical to torch F.conv2d."""
    b = _t(pd[f"{key}.bias"]) if bias and f"{key}.bias" in pd else None
    return F.conv2d(x, _t(pd[f"{key}.weight"]), b, stride=stride,
                    padding=padding, dilation=dilation, groups=groups)


def _pd_bn(x, pd, key, eps=1e-5):
    """Paddle nn.BatchNorm2D eval mode: running stats `_mean`/`_variance`."""
    return F.batch_norm(x, _t(pd[f"{key}._mean"]), _t(pd[f"{key}._variance"]),
                        _t(pd[f"{key}.weight"]), _t(pd[f"{key}.bias"]),
                        training=False, eps=eps)


def _close(flax_out, torch_out, atol=2e-3, rtol=2e-3):
    # layout bugs produce order-1 errors; tolerance absorbs the paddle-vs-
    # flax LayerNorm epsilon difference (1e-5 vs 1e-6) and f32 reduction
    # order only
    np.testing.assert_allclose(np.asarray(flax_out),
                               torch_out.detach().numpy(),
                               atol=atol, rtol=rtol)


# ---------------------------------------------------------------------------
# EMRT-r50: resnet50 backbone end-to-end vs a torch re-implementation of
# the reference torchvision-style ResNet (paddle_vision_resnet.py:91-266)
# ---------------------------------------------------------------------------

def _torch_bottleneck(x, pd, base, stride, has_down):
    """BottleneckBlock (paddle_vision_resnet.py:91-143): 1x1 -> 3x3(stride)
    -> 1x1 with BN+ReLU, downsample 1x1(stride)+BN on stage starts."""
    identity = x
    out = F.relu(_pd_bn(_pd_conv(x, pd, f"{base}.conv1", bias=False),
                        pd, f"{base}.bn1"))
    out = F.relu(_pd_bn(_pd_conv(out, pd, f"{base}.conv2", stride=stride,
                                 padding=1, bias=False), pd, f"{base}.bn2"))
    out = _pd_bn(_pd_conv(out, pd, f"{base}.conv3", bias=False),
                 pd, f"{base}.bn3")
    if has_down:
        identity = _pd_bn(
            _pd_conv(x, pd, f"{base}.downsample.0", stride=stride, bias=False),
            pd, f"{base}.downsample.1")
    return F.relu(out + identity)


def _torch_resnet50_feats(x, pd):
    """Reference forward (paddle_vision_resnet.py:245-266): stem conv7x7 s2
    + BN + ReLU + maxpool3x3 s2 p1, then layer1..4 returning (c1..c4)."""
    x = F.relu(_pd_bn(_pd_conv(x, pd, "backbone.conv1", stride=2, padding=3,
                               bias=False), pd, "backbone.bn1"))
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    feats = []
    for stage, (blocks, stride) in enumerate(
            [(3, 1), (4, 2), (6, 2), (3, 2)], start=1):
        for b in range(blocks):
            x = _torch_bottleneck(x, pd, f"backbone.layer{stage}.{b}",
                                  stride if b == 0 else 1, b == 0)
        feats.append(x)
    return feats


@pytest.mark.slow
def test_emrt_r50_backbone_matches_torch_reference():
    from emrt_tpu.models.backbones.resnet import resnet

    model = _tiny_emrt("resnet50")
    params, stats = _init(model, 64)
    pd = synth_pdparams(params, stats, "EMRT", "resnet50")
    new_p, new_s, report = convert_pdparams(pd, params, stats,
                                            "EMRT", "resnet50")
    assert report["missing"] == [] and report["unused"] == []

    x = np.random.default_rng(1).normal(size=(1, 3, 64, 64)).astype(np.float32)
    ref_feats = _torch_resnet50_feats(_t(x), pd)

    bb = resnet(50, deep_stem=False, output_stride=32)
    flax_feats = bb.apply(
        {"params": new_p["backbone"], "batch_stats": new_s["backbone"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    for ours, ref in zip(flax_feats, ref_feats):
        _close(jnp.transpose(ours, (0, 3, 1, 2)), ref)


# ---------------------------------------------------------------------------
# EMRT decoder MHSA: the fused in_proj_weight [E, 3E] column slicing
# (EMRT_utils/layers.py:221-247) vs our per-head DenseGeneral kernels
# ---------------------------------------------------------------------------

def _torch_pd_mha(x, pd, base, num_heads):
    """Reference MultiHeadAttention.compute_qkv + forward
    (EMRT_utils/layers.py:221-296): q/k/v = in_proj_weight[:, i*E:(i+1)*E]
    column slices applied as Paddle F.linear, per-head reshape
    [B, L, heads, hd] -> [B, heads, L, hd], product scaled by hd**-0.5,
    softmax, out_proj Linear."""
    bsz, n, e = x.shape
    hd = e // num_heads
    w = _t(pd[f"{base}.in_proj_weight"])          # [E, 3E]
    b = _t(pd[f"{base}.in_proj_bias"])            # [3E]
    qkv = []
    for i in range(3):
        t = x @ w[:, i * e:(i + 1) * e] + b[i * e:(i + 1) * e]
        qkv.append(t.reshape(bsz, n, num_heads, hd).permute(0, 2, 1, 3))
    q, k, v = qkv
    attn = torch.softmax((q @ k.transpose(-1, -2)) * hd ** -0.5, dim=-1)
    out = (attn @ v).permute(0, 2, 1, 3).reshape(bsz, n, e)
    return out @ _t(pd[f"{base}.out_proj.weight"]) + _t(
        pd[f"{base}.out_proj.bias"])


@pytest.mark.slow
def test_emrt_decoder_mha_matches_torch_reference():
    from emrt_tpu.models.layers import MultiHeadAttention

    model = _tiny_emrt("resnet50")
    params, stats = _init(model, 64)
    pd = synth_pdparams(params, stats, "EMRT", "resnet50")
    new_p, _, _ = convert_pdparams(pd, params, stats, "EMRT", "resnet50")

    attn_params = new_p["encoder_decoder"]["decoder_layer0"]["self_attn"]
    x = np.random.default_rng(2).normal(
        size=(2, 10, 256)).astype(np.float32)
    ref = _torch_pd_mha(_t(x), pd, "model.decoder.layers.0.self_attn",
                        num_heads=8)
    ours = MultiHeadAttention(embed_dim=256, num_heads=8).apply(
        {"params": attn_params}, jnp.asarray(x))
    _close(ours, ref, atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# EMRT UpHead: conv bias folded into the following BN's running mean
# (paddle_EMRT.py:133-142 conv_i + syncbn_fc_i; fold rule mean' = mean - b)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_uphead_conv_bn_fold_matches_torch():
    from emrt_tpu.models.layers import ConvBNReLU

    model = _tiny_emrt("resnet50")
    params, stats = _init(model, 64)
    pd = synth_pdparams(params, stats, "EMRT", "resnet50")
    new_p, new_s, _ = convert_pdparams(pd, params, stats, "EMRT", "resnet50")

    x = np.random.default_rng(3).normal(size=(1, 256, 8, 8)).astype(np.float32)
    # reference UpHead stage 0: conv_0 (3x3, WITH bias) -> syncbn_fc_0 -> relu
    ref = F.relu(_pd_bn(_pd_conv(_t(x), pd, "uphead.conv_0", padding=1),
                        pd, "uphead.syncbn_fc_0"))
    ours = ConvBNReLU(256, 3).apply(
        {"params": new_p["uphead"]["conv0"],
         "batch_stats": new_s["uphead"]["conv0"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)), False)
    _close(jnp.transpose(ours, (0, 3, 1, 2)), ref, atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# SETR: ViT backbone end-to-end vs a torch re-implementation of the
# reference vit.py Encoder (fused qkv chunk(3, axis=-1), pre-norm blocks)
# ---------------------------------------------------------------------------

def _torch_vit_tokens(x, pd, num_layers, num_heads, patch):
    """Reference forward: Embeddings (vit.py:75-94: conv patch embed,
    cls_token concat FIRST, + position_embeddings) then EncoderLayer
    pre-norm blocks (vit.py:236-250) with Attention (vit.py:146-169:
    qkv chunk(3, axis=-1), heads-major split, scale hd**-0.5) and Mlp
    (fc1 -> GELU -> fc2, vit.py:211-217). LayerNorm epsilon 1e-6
    (vit.py:237-238)."""
    b = x.shape[0]
    emb = "encoder.transformer.embeddings"
    h = _pd_conv(x, pd, f"{emb}.patch_embeddings", stride=patch)
    d = h.shape[1]
    h = h.flatten(2).transpose(1, 2)                       # [B, N, D]
    cls = _t(pd[f"{emb}.cls_token"]).expand(b, -1, -1)
    h = torch.cat([cls, h], dim=1)
    h = h + _t(pd[f"{emb}.position_embeddings"])
    hd = d // num_heads
    for i in range(num_layers):
        base = f"encoder.transformer.encoder.layers.{i}"
        y = _pd_ln(h, pd, f"{base}.attn_norm", eps=1e-6)
        qkv = _pd_linear(y, pd, f"{base}.attn.qkv").chunk(3, dim=-1)
        q, k, v = [t.reshape(b, -1, num_heads, hd).permute(0, 2, 1, 3)
                   for t in qkv]
        attn = torch.softmax((q @ k.transpose(-1, -2)) * hd ** -0.5, dim=-1)
        z = (attn @ v).permute(0, 2, 1, 3).reshape(b, -1, d)
        h = h + _pd_linear(z, pd, f"{base}.attn.out")
        y = _pd_ln(h, pd, f"{base}.mlp_norm", eps=1e-6)
        y = F.gelu(_pd_linear(y, pd, f"{base}.mlp.fc1"))
        h = h + _pd_linear(y, pd, f"{base}.mlp.fc2")
    return h


def test_setr_vit_backbone_matches_torch_reference():
    from emrt_tpu.models.backbones.vit import VisionTransformer
    from emrt_tpu.models.setr import SETR

    model = SETR(num_classes=4, encoder_type="ViT", decoder_type="PUP",
                 patch_size=8, hidden_size=32, num_layers=4, num_heads=2,
                 mlp_ratio=2.0, out_indices=(0, 1, 2, 3), pup_num_conv=2,
                 pup_num_upsample=2, auxihead=False)
    params, stats = _init(model, 32)
    pd = synth_pdparams(params, stats, "SETR_PUP", "ViT")
    new_p, _, report = convert_pdparams(pd, params, stats, "SETR_PUP", "ViT")
    assert report["missing"] == [] and report["unused"] == []

    x = np.random.default_rng(4).normal(size=(1, 3, 32, 32)).astype(np.float32)
    ref = _torch_vit_tokens(_t(x), pd, num_layers=4, num_heads=2, patch=8)

    vit = VisionTransformer(patch_size=8, hidden_size=32, num_layers=4,
                            num_heads=2, mlp_ratio=2.0, out_indices=(3,),
                            return_cls=True)
    feats, cls_taps = vit.apply({"params": new_p["encoder"]},
                                jnp.asarray(x.transpose(0, 2, 3, 1)),
                                train=False)
    gh = 32 // 8
    _close(feats[-1].reshape(1, gh * gh, 32), ref[:, 1:])
    _close(cls_taps[-1], ref[:, 0])


# ---------------------------------------------------------------------------
# SegFormer: zoo MixViT backbone end-to-end vs a torch re-implementation of
# the reference mix_transformer.py (463-line zoo copy)
# ---------------------------------------------------------------------------

def _torch_mixvit_feats(x, pd, dims, heads, srs, depths):
    """Reference MixVisionTransformer.forward (mix_transformer.py:452-463):
    per stage PatchEmbed (conv k7s4p3 / k3s2p1 + LN, :120-165) ->
    TransformerEncoderLayer blocks (:352-356: x + attn(norm1(x)),
    x + ffn(norm2(x))) -> stage LayerNorm -> NCHW map.

    EfficientAttention (:275-300): q Linear; kv over sr-reduced tokens
    (conv k=s=sr + LN) reshaped [B, -1, 2, C] so k = columns 0:C and
    v = columns C:2C; heads-major split; scale hd**-0.5 applied to the
    product. MixFFN (:211-221): fc1 1x1 conv -> pe_conv depthwise 3x3
    -> GELU -> fc2 1x1 conv."""
    outs = []
    for s in range(len(depths)):
        base = f"backbone.layers.{s}"
        k_sz, stride = (7, 4) if s == 0 else (3, 2)
        x = _pd_conv(x, pd, f"{base}.0.projection", stride=stride,
                     padding=k_sz // 2)
        b, c, hh, ww = x.shape
        t = x.flatten(2).transpose(1, 2)                   # [B, N, C]
        t = _pd_ln(t, pd, f"{base}.0.norm")
        hd = dims[s] // heads[s]
        for blk in range(depths[s]):
            bb = f"{base}.1.{blk}"
            y = _pd_ln(t, pd, f"{bb}.norm1")
            q = _pd_linear(y, pd, f"{bb}.attn.q")
            kv_in = y
            if srs[s] > 1:
                ym = y.transpose(1, 2).reshape(b, c, hh, ww)
                ym = _pd_conv(ym, pd, f"{bb}.attn.sr", stride=srs[s])
                kv_in = _pd_ln(ym.flatten(2).transpose(1, 2),
                               pd, f"{bb}.attn.norm")
            kv = _pd_linear(kv_in, pd, f"{bb}.attn.kv").reshape(
                b, -1, 2, c)
            k, v = kv[:, :, 0], kv[:, :, 1]
            q = q.reshape(b, -1, heads[s], hd).permute(0, 2, 1, 3)
            k = k.reshape(b, -1, heads[s], hd).permute(0, 2, 1, 3)
            v = v.reshape(b, -1, heads[s], hd).permute(0, 2, 1, 3)
            attn = torch.softmax((q @ k.transpose(-1, -2)) * hd ** -0.5, -1)
            z = (attn @ v).permute(0, 2, 1, 3).reshape(b, -1, c)
            t = t + z @ _t(pd[f"{bb}.attn.proj.weight"]) + _t(
                pd[f"{bb}.attn.proj.bias"])
            y = _pd_ln(t, pd, f"{bb}.norm2")
            ym = y.transpose(1, 2).reshape(b, c, hh, ww)
            ym = _pd_conv(ym, pd, f"{bb}.ffn.fc1")
            ym = _pd_conv(ym, pd, f"{bb}.ffn.pe_conv", padding=1,
                          groups=ym.shape[1])
            ym = F.gelu(ym)
            ym = _pd_conv(ym, pd, f"{bb}.ffn.fc2")
            t = t + ym.flatten(2).transpose(1, 2)
        t = _pd_ln(t, pd, f"{base}.2")
        x = t.transpose(1, 2).reshape(b, c, hh, ww)
        outs.append(x)
    return outs


def test_segformer_backbone_matches_torch_reference():
    from emrt_tpu.models.backbones.mix_transformer import MixVisionTransformer
    from emrt_tpu.models.segformer import Segformer

    dims, heads, srs, depths = (8, 16, 16, 16), (1, 2, 2, 2), \
        (2, 2, 1, 1), (1, 1, 1, 1)
    model = Segformer(num_classes=4, embed_dims=dims, depths=depths,
                      num_heads=heads, sr_ratios=srs, mlp_ratio=2.0,
                      head_channels=16, drop_path=0.0)
    params, stats = _init(model, 32)
    pd = synth_pdparams(params, stats, "SegFormer", "")
    new_p, _, report = convert_pdparams(pd, params, stats, "SegFormer", "")
    assert report["missing"] == [] and report["unused"] == []

    x = np.random.default_rng(5).normal(size=(1, 3, 32, 32)).astype(np.float32)
    ref_feats = _torch_mixvit_feats(_t(x), pd, dims, heads, srs, depths)

    mv = MixVisionTransformer(embed_dims=dims, depths=depths,
                              num_heads=heads, sr_ratios=srs, mlp_ratio=2.0,
                              drop_path_rate=0.0)
    flax_feats = mv.apply({"params": new_p["encoder"]},
                          jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    for ours, ref in zip(flax_feats, ref_feats):
        _close(jnp.transpose(ours, (0, 3, 1, 2)), ref)
