"""Paddle `.pdparams` checkpoint reader + EMRT-r50 weight converter.

Parity infrastructure for the accuracy gate (BASELINE.md: per-class IoU /
mIoU vs the released EMRT checkpoints). A `.pdparams` file written by
``paddle.save(model.state_dict())`` is a plain pickle of
``{name: np.ndarray}`` (Paddle converts tensors to numpy before pickling),
so it can be read without Paddle installed.

Key layout being converted (reference, relative to
``/root/reference/semantic_segmentation/``):

* module attribute names: ``src/models/paddle_EMRT.py:183-250`` (EMRT:
  spatial_branch / psp_module / uphead / cls_psp / EFP / auxlayer /
  backbone / model), ``src/models/EMRT_utils/transformer_encoder_decoder.py:
  337-389`` (EncoderDecoder: encoder.layers.N / decoder.layers.N /
  level_embed / tgt_embed / query_pos_embed / reference_points /
  input_proj.N);
* fused-qkv MultiHeadAttention: ``in_proj_weight [E, 3E]`` sliced as
  q/k/v = columns ``[iE:(i+1)E]`` (``EMRT_utils/layers.py:221-230``);
* loading semantics: ``src/utils/checkpoint.py:38-93``.

Layout rules (Paddle NCHW -> Flax NHWC):

* Conv2D weight ``[out, in, kh, kw]`` -> kernel ``[kh, kw, in, out]``;
* nn.Linear weight ``[in, out]`` -> Dense kernel (no transpose);
* BatchNorm ``weight/bias/_mean/_variance`` -> ``scale/bias`` params +
  ``mean/var`` batch_stats;
* convs followed by a BatchNorm where the Flax module has no conv bias
  (UpHead conv_0..2) fold the Paddle conv bias into the BN running mean
  (``mean' = mean - b`` — exact);
* attention Dense kernels keep Paddle's row-major
  ``[heads, levels, points, 2]`` output ordering (identical on both sides).
"""
from __future__ import annotations

import io
import pickle
from typing import Any, Dict

import numpy as np

from .logger import logger


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------

class _PermissiveUnpickler(pickle.Unpickler):
    """Unpickler that tolerates paddle-internal classes by substituting
    inert stand-ins (state dicts saved by paddle>=2.0 are numpy-only, but
    older files may reference paddle modules for metadata objects)."""

    def find_class(self, module: str, name: str):
        if module.startswith(("paddle", "fluid")):
            class _Stub:  # pragma: no cover - only hit on legacy files
                def __init__(self, *a, **k):
                    self.args = a

                def __setstate__(self, state):
                    self.state = state
            _Stub.__name__ = name
            return _Stub
        return super().find_class(module, name)


def read_pdparams(path: str) -> Dict[str, np.ndarray]:
    """Read a ``paddle.save``d state dict as ``{key: np.ndarray}``."""
    with open(path, "rb") as f:
        data = f.read()
    obj = _PermissiveUnpickler(io.BytesIO(data), encoding="latin1").load()
    if not isinstance(obj, dict):
        raise ValueError(f"{path}: expected a pickled state dict, "
                         f"got {type(obj)}")
    out = {}
    for k, v in obj.items():
        arr = np.asarray(getattr(v, "numpy", lambda: v)())
        out[str(k)] = arr
    return out


# ---------------------------------------------------------------------------
# Transforms
# ---------------------------------------------------------------------------

def _conv(w: np.ndarray) -> np.ndarray:
    """[out, in, kh, kw] -> [kh, kw, in, out]."""
    return np.transpose(w, (2, 3, 1, 0))


def _heads(w: np.ndarray, num_heads: int) -> np.ndarray:
    """[in, E] dense -> [in, heads, head_dim] (flax attention kernel)."""
    e = w.shape[-1]
    return w.reshape(*w.shape[:-1], num_heads, e // num_heads)


# ---------------------------------------------------------------------------
# EMRT-r50 mapping
# ---------------------------------------------------------------------------

_RESNET50_DEPTHS = (3, 4, 6, 3)


def _resnet_block_map():
    """Flat Bottleneck_N index -> reference 'layer{i}.{j}'."""
    table = {}
    n = 0
    for stage, depth in enumerate(_RESNET50_DEPTHS, start=1):
        for block in range(depth):
            table[n] = f"layer{stage}.{block}"
            n += 1
    return table


def emrt_trunk_key_map(num_enc_layers: int = 4, num_dec_layers: int = 2):
    """EMRT trunk mapping shared by ALL backbone variants: flax '/'-path ->
    (pdparams key, transform tag).

    Covers spatial_branch / psp_module / uphead / cls_psp / EFP / auxlayer
    and the 'model.' EncoderDecoder (identical attribute layout across
    paddle_EMRT.py, paddle_EMRT_cswin_backbone.py and
    paddle_EMRT_hrnet_backbone.py — the _cswin EncoderDecoder is a byte
    duplicate of the base one).

    Tags: 'conv' (NCHW->NHWC), 'id' (copy), 'qkv:i' (fused in_proj slice),
    'out_heads' (out_proj -> per-head in-dim), 'pos_embed' (grid interp).
    Returns (param_map, stats_map, fold_bias) where fold_bias maps a flax
    BN-mean stats path to the pd conv-bias key subtracted from it.
    """
    pmap: Dict[str, tuple] = {}
    smap: Dict[str, tuple] = {}
    fold: Dict[str, str] = {}

    def bn(flax_prefix: str, pd_prefix: str):
        pmap[f"{flax_prefix}/scale"] = (f"{pd_prefix}.weight", "id")
        pmap[f"{flax_prefix}/bias"] = (f"{pd_prefix}.bias", "id")
        smap[f"{flax_prefix}/mean"] = (f"{pd_prefix}._mean", "id")
        smap[f"{flax_prefix}/var"] = (f"{pd_prefix}._variance", "id")

    def gn(flax_prefix: str, pd_prefix: str):
        pmap[f"{flax_prefix}/scale"] = (f"{pd_prefix}.weight", "id")
        pmap[f"{flax_prefix}/bias"] = (f"{pd_prefix}.bias", "id")

    def dense(flax_prefix: str, pd_prefix: str):
        pmap[f"{flax_prefix}/kernel"] = (f"{pd_prefix}.weight", "id")
        pmap[f"{flax_prefix}/bias"] = (f"{pd_prefix}.bias", "id")

    # --- spatial branch (paddle_EMRT.py:80-113) ---
    for i in range(3):
        for conv_name, seq in (("conv1", 0), ("conv2", 3)):
            base = f"spatial_branch/enc{i}_{conv_name}"
            pmap[f"{base}/Conv_0/kernel"] = (
                f"spatial_branch.Enc{i}.encode.{seq}.weight", "conv")
            bn(f"{base}/BatchNorm_0", f"spatial_branch.Enc{i}.encode.{seq + 1}")

    # --- PSP module (paddle_EMRT.py:50-78) ---
    for i in range(4):
        base = f"psp_module/pool_branch{i}"
        pmap[f"{base}/Conv_0/kernel"] = (
            f"psp_module.pool_branches.{i}.1.weight", "conv")
        bn(f"{base}/BatchNorm_0", f"psp_module.pool_branches.{i}.2")

    # --- UpHead (paddle_EMRT.py:133-142): conv_0..2 carry biases folded
    # into the following BN's running mean; conv_3 is the classifier ---
    for i in range(3):
        pmap[f"uphead/conv{i}/Conv_0/kernel"] = (f"uphead.conv_{i}.weight", "conv")
        bn(f"uphead/conv{i}/BatchNorm_0", f"uphead.syncbn_fc_{i}")
        fold[f"uphead/conv{i}/BatchNorm_0/mean"] = f"uphead.conv_{i}.bias"
    pmap["uphead/cls/kernel"] = ("uphead.conv_3.weight", "conv")
    pmap["uphead/cls/bias"] = ("uphead.conv_3.bias", "id")

    # --- cls_psp (paddle_EMRT.py:201-209) ---
    for i, seq in ((0, 0), (1, 3)):
        pmap[f"cls_psp{i}/Conv_0/kernel"] = (f"cls_psp.{seq}.weight", "conv")
        bn(f"cls_psp{i}/BatchNorm_0", f"cls_psp.{seq + 1}")

    # --- EFP (paddle_EMRT.py:13-48) ---
    for i in range(3):
        for j in (1, 2):
            base = f"efp/conv{i}/conv{j}"
            pmap[f"{base}/Conv_0/kernel"] = (f"EFP.conv{i}.conv{j}.{0}.weight", "conv")
            bn(f"{base}/BatchNorm_0", f"EFP.conv{i}.conv{j}.{1}")

    # --- aux FCNHead (decoders/fcn_head.py:46-67) ---
    pmap["auxlayer/conv0/Conv_0/kernel"] = ("auxlayer.convs.0.0.weight", "conv")
    bn("auxlayer/conv0/BatchNorm_0", "auxlayer.convs.0.1")
    pmap["auxlayer/conv_seg/kernel"] = ("auxlayer.conv_seg.weight", "conv")
    pmap["auxlayer/conv_seg/bias"] = ("auxlayer.conv_seg.bias", "id")

    # --- EncoderDecoder ('model.' prefix, transformer_encoder_decoder.py) ---
    ed = "encoder_decoder"
    for i in range(3):
        pmap[f"{ed}/input_proj{i}/kernel"] = (f"model.input_proj.{i}.0.weight", "conv")
        pmap[f"{ed}/input_proj{i}/bias"] = (f"model.input_proj.{i}.0.bias", "id")
        gn(f"{ed}/input_gn{i}", f"model.input_proj.{i}.1")
    pmap[f"{ed}/level_embed"] = ("model.level_embed.weight", "id")
    pmap[f"{ed}/query_pos_embed"] = ("model.query_pos_embed.weight", "id")
    dense(f"{ed}/reference_points", "model.reference_points")

    def deform(flax_prefix: str, pd_prefix: str):
        for part in ("sampling_offsets", "attention_weights", "value_proj",
                     "output_proj"):
            dense(f"{flax_prefix}/{part}", f"{pd_prefix}.{part}")

    for l in range(num_enc_layers):
        fl = f"{ed}/encoder_layer{l}"
        pd = f"model.encoder.layers.{l}"
        deform(f"{fl}/self_attn", f"{pd}.self_attn")
        for j in range(3):
            pmap[f"{fl}/ConvEnhance_0/conv{j}/kernel"] = (
                f"{pd}.conv{j}.0.weight", "conv")
            gn(f"{fl}/ConvEnhance_0/gn{j}", f"{pd}.conv{j}.1")
        dense(f"{fl}/linear1", f"{pd}.linear1")
        dense(f"{fl}/linear2", f"{pd}.linear2")
        gn(f"{fl}/norm1", f"{pd}.norm1")  # LayerNorm: same scale/bias naming
        gn(f"{fl}/norm2", f"{pd}.norm2")

    for l in range(num_dec_layers):
        fl = f"{ed}/decoder_layer{l}"
        pd = f"model.decoder.layers.{l}"
        # fused-qkv MHSA (layers.py:221-230: column slices q/k/v)
        for i, proj in enumerate(("q_proj", "k_proj", "v_proj")):
            pmap[f"{fl}/self_attn/{proj}/kernel"] = (
                f"{pd}.self_attn.in_proj_weight", f"qkv:{i}")
            pmap[f"{fl}/self_attn/{proj}/bias"] = (
                f"{pd}.self_attn.in_proj_bias", f"qkvb:{i}")
        pmap[f"{fl}/self_attn/out_proj/kernel"] = (
            f"{pd}.self_attn.out_proj.weight", "out_heads")
        pmap[f"{fl}/self_attn/out_proj/bias"] = (
            f"{pd}.self_attn.out_proj.bias", "id")
        deform(f"{fl}/cross_attn", f"{pd}.cross_attn")
        dense(f"{fl}/linear1", f"{pd}.linear1")
        dense(f"{fl}/linear2", f"{pd}.linear2")
        gn(f"{fl}/norm1", f"{pd}.norm1")
        gn(f"{fl}/norm2", f"{pd}.norm2")
        gn(f"{fl}/norm3", f"{pd}.norm3")

    return pmap, smap, fold


def emrt_r50_key_map(num_enc_layers: int = 4, num_dec_layers: int = 2):
    """EMRT-r50: trunk + torchvision-style resnet50 backbone
    (paddle_vision_resnet.py)."""
    pmap, smap, fold = emrt_trunk_key_map(num_enc_layers, num_dec_layers)

    def bn(flax_prefix: str, pd_prefix: str):
        pmap[f"{flax_prefix}/scale"] = (f"{pd_prefix}.weight", "id")
        pmap[f"{flax_prefix}/bias"] = (f"{pd_prefix}.bias", "id")
        smap[f"{flax_prefix}/mean"] = (f"{pd_prefix}._mean", "id")
        smap[f"{flax_prefix}/var"] = (f"{pd_prefix}._variance", "id")

    pmap["backbone/Conv_0/kernel"] = ("backbone.conv1.weight", "conv")
    bn("backbone/_BN_0/BatchNorm_0", "backbone.bn1")
    for n, ref in _resnet_block_map().items():
        base = f"backbone/Bottleneck_{n}"
        for j in range(3):
            pmap[f"{base}/Conv_{j}/kernel"] = (
                f"backbone.{ref}.conv{j + 1}.weight", "conv")
            bn(f"{base}/_BN_{j}/BatchNorm_0", f"backbone.{ref}.bn{j + 1}")
        if ref.endswith(".0"):  # downsample on the first block of each stage
            pmap[f"{base}/Conv_3/kernel"] = (
                f"backbone.{ref}.downsample.0.weight", "conv")
            bn(f"{base}/_BN_3/BatchNorm_0", f"backbone.{ref}.downsample.1")
    return pmap, smap, fold


def is_backbone_only_pdparams(pd_keys) -> bool:
    """True for a prefix-less ImageNet resnet state dict (the reference's
    published recipe inits the EMRT backbone from such files:
    ``load_backbone_pretrained`` does ``model.set_state_dict(paddle.load(...))``
    directly on the backbone, resnet.py:238-243, weights fetched by
    resnet_utils/download.py:79-180)."""
    keys = set(pd_keys)
    has_stem = "conv1.weight" in keys or "conv1.0.weight" in keys
    has_blocks = "layer1.0.conv1.weight" in keys
    prefixed = any(k.startswith(("backbone.", "model.", "spatial_branch.",
                                 "encoder.", "decode_head.", "uphead."))
                   for k in keys)
    return has_stem and has_blocks and not prefixed


def resnet_backbone_key_map(flat_p, pd_keys, prefix: str = "backbone"):
    """Backbone-only map: prefix-less ImageNet resnet ``.pdparams`` keys ->
    the ``backbone/...`` flax subtree.

    Handles BOTH reference layouts:

    * torchvision-style (``paddle_vision_resnet.py``, weights from
      ``resnet_utils/download.py``): ``conv1.weight`` 7x7 stem, ``bn1``,
      ``layer{s}.{b}.conv{j}/bn{j}/downsample.{0,1}``;
    * deep-stem ``resnet50c`` (``resnet.py:122-137``): ``conv1`` is a
      Sequential of three 3x3 convs at indices 0/3/6 with BNs at 1/4
      (the third BN is the top-level ``bn1``), then the same layer blocks.

    The classifier head (``fc.*``, ``avgpool``) is legitimately unused.
    Depths and block type are inferred from the flax tree so the same map
    serves resnet18..152.
    """
    pd_keys = set(pd_keys)
    deep_stem_pd = "conv1.0.weight" in pd_keys
    block_name = "Bottleneck" if f"{prefix}/Bottleneck_0/Conv_0/kernel" \
        in flat_p else "BasicBlock"
    n_blocks = len({k.split("/")[1] for k in flat_p
                    if k.startswith(f"{prefix}/{block_name}_")})
    depths = {8: (2, 2, 2, 2), 16: (3, 4, 6, 3), 33: (3, 4, 23, 3),
              50: (3, 8, 36, 3)}[n_blocks]
    n_conv = 3 if block_name == "Bottleneck" else 2

    pmap: Dict[str, tuple] = {}
    smap: Dict[str, tuple] = {}

    def bn(flax_prefix: str, pd_prefix: str):
        pmap[f"{flax_prefix}/scale"] = (f"{pd_prefix}.weight", "id")
        pmap[f"{flax_prefix}/bias"] = (f"{pd_prefix}.bias", "id")
        smap[f"{flax_prefix}/mean"] = (f"{pd_prefix}._mean", "id")
        smap[f"{flax_prefix}/var"] = (f"{pd_prefix}._variance", "id")

    if deep_stem_pd:
        # conv1 Sequential indices: conv 0, bn 1, relu 2, conv 3, bn 4,
        # relu 5, conv 6; the third BN is the module-level bn1
        for i, seq in enumerate((0, 3, 6)):
            pmap[f"{prefix}/Conv_{i}/kernel"] = (f"conv1.{seq}.weight", "conv")
        bn(f"{prefix}/_BN_0/BatchNorm_0", "conv1.1")
        bn(f"{prefix}/_BN_1/BatchNorm_0", "conv1.4")
        bn(f"{prefix}/_BN_2/BatchNorm_0", "bn1")
    else:
        pmap[f"{prefix}/Conv_0/kernel"] = ("conv1.weight", "conv")
        bn(f"{prefix}/_BN_0/BatchNorm_0", "bn1")

    n = 0
    for stage, depth in enumerate(depths, start=1):
        for b in range(depth):
            base = f"{prefix}/{block_name}_{n}"
            ref = f"layer{stage}.{b}"
            for j in range(n_conv):
                pmap[f"{base}/Conv_{j}/kernel"] = (
                    f"{ref}.conv{j + 1}.weight", "conv")
                bn(f"{base}/_BN_{j}/BatchNorm_0", f"{ref}.bn{j + 1}")
            if b == 0 and f"{ref}.downsample.0.weight" in pd_keys:
                pmap[f"{base}/Conv_{n_conv}/kernel"] = (
                    f"{ref}.downsample.0.weight", "conv")
                bn(f"{base}/_BN_{n_conv}/BatchNorm_0", f"{ref}.downsample.1")
            n += 1
    return pmap, smap, {}, ("fc.",)


def _apply(tag: str, value: np.ndarray, target: np.ndarray) -> np.ndarray:
    if tag == "conv":
        return _conv(value)
    if tag == "convt":
        # paddle Conv2DTranspose [in, out, kh, kw] -> flax ConvTranspose
        # [kh, kw, in, out]; flax (transpose_kernel=False) CORRELATES the
        # dilated input while paddle/torch transposed conv convolves, so
        # the spatial taps must be flipped (verified vs torch in
        # tests/test_pdparams_zoo.py::test_convt_matches_torch)
        return np.ascontiguousarray(
            np.transpose(value, (2, 3, 0, 1))[::-1, ::-1])
    if tag == "id":
        return value.reshape(target.shape) if value.shape != target.shape \
            else value
    if tag.startswith("qkvb:"):
        i = int(tag.split(":")[1])
        e = value.shape[0] // 3
        return value[i * e:(i + 1) * e].reshape(target.shape)
    if tag.startswith("qkv:"):
        i = int(tag.split(":")[1])
        e = value.shape[0]
        return value[:, i * e:(i + 1) * e].reshape(target.shape)
    if tag == "out_heads":
        # paddle [E_in, E_out] -> flax [heads, head_dim, E_out]
        return value.reshape(target.shape)
    if tag == "pos_embed":
        if value.shape == tuple(target.shape):
            return value
        from .checkpoint import _interp_pos_embed
        return _interp_pos_embed(value, target.shape)
    if tag == "conv1x1_dense":
        # paddle 1x1 Conv2D [out, in, 1, 1] -> flax Dense kernel [in, out]
        return np.transpose(value, (2, 3, 1, 0)).reshape(value.shape[1],
                                                         value.shape[0])
    raise ValueError(f"unknown transform {tag}")


def build_key_map(flat_p, model_name: str, encoder_type: str = ""):
    """Dispatch to the right per-family key map.

    Returns (pmap, smap, fold, expect_unused) where expect_unused is a
    tuple of pd-key substrings that are legitimately dead weight in the
    checkpoint (e.g. tgt_embed, the SegFormer wrapper's unused head).
    Model dispatch mirrors the reference registry's substring rules
    (src/models/__init__.py:14-40).
    """
    from . import pdparams_maps as M

    def merge(a, b):
        for d, s in zip(a, b):
            d.update(s)

    name = model_name or ""
    enc = (encoder_type or "").lower()
    n_enc = sum(1 for k in flat_p if k.startswith("encoder_decoder/encoder_layer")
                and k.endswith("norm1/scale"))
    n_dec = sum(1 for k in flat_p if k.startswith("encoder_decoder/decoder_layer")
                and k.endswith("norm1/scale"))
    expect_unused = ("tgt_embed.weight",)

    # EMRT dispatch must run FIRST: variant names embed zoo family names
    # ('EMRT_Segformer', 'EMRT_ViT') that would otherwise shadow-match the
    # zoo branches below and return a key map with zero trunk entries
    if "EMRT" not in name:
        if "SETR" in name:
            return (*M.setr_key_map(flat_p), ())

        if "Segformer" in name or "SegFormer" in name:
            return (*M.segformer_key_map(flat_p), ())

        if "Segmenter" in name:
            return (*M.segmenter_key_map(flat_p), ())

        if "UperNet" in name or "Upernet" in name:
            return (*M.upernet_key_map(flat_p), ())

        if "Trans2Seg" in name or "Trans2seg" in name:
            return (*M.trans2seg_key_map(flat_p), ())

        if "DPT" in name:
            # refine.3.resblock1 is registered but unreachable (the top
            # fusion block gets x=None, dpt_head.py:144-148)
            return (*M.dpt_key_map(flat_p), ("refine.3.resblock1",))

        if "FCN" in name:
            return (*M.fcn_key_map(flat_p), ())

        raise NotImplementedError(
            f"no .pdparams key map for model {model_name!r} "
            f"(families covered: EMRT r50/cswin/vit/hrnet/segformer_b4, "
            f"SETR, SegFormer, Segmenter, UperNet swin/cswin, Trans2Seg, "
            f"DPT, FCN)")

    maps = emrt_trunk_key_map(n_enc, n_dec)
    if "EMRT_CSwin" in name or enc == "cswintransformer":
        merge(maps, M.cswin_backbone_map(flat_p, flax="backbone",
                                         pd="encoder"))
        for i in range(4):   # per-tap LayerNorms (cswin_backbone.py:236-251)
            maps[0][f"tap_norm{i}/scale"] = (f"layer_norms.{i}.weight", "id")
            maps[0][f"tap_norm{i}/bias"] = (f"layer_norms.{i}.bias", "id")
    elif "EMRT_ViT" in name or enc == "vit":
        merge(maps, M.vit_backbone_map(flat_p, flax="backbone",
                                       pd="encoder.transformer"))
        for i in range(4):
            maps[0][f"tap_norm{i}/scale"] = (f"layer_norms.{i}.weight", "id")
            maps[0][f"tap_norm{i}/bias"] = (f"layer_norms.{i}.bias", "id")
    elif "EMRT_HRNet" in name or enc == "hrnet":
        merge(maps, M.hrnet_backbone_map(flat_p, flax="backbone",
                                         pd="backbone"))
        for i in range(3):   # strided pre-projections (hrnet_backbone.py:190-197)
            maps[0][f"input_pre{i}/Conv_0/kernel"] = (
                f"input_proj.{i}.0.weight", "conv")
            maps[0][f"input_pre{i}/BatchNorm_0/scale"] = (
                f"input_proj.{i}.1.weight", "id")
            maps[0][f"input_pre{i}/BatchNorm_0/bias"] = (
                f"input_proj.{i}.1.bias", "id")
            maps[1][f"input_pre{i}/BatchNorm_0/mean"] = (
                f"input_proj.{i}.1._mean", "id")
            maps[1][f"input_pre{i}/BatchNorm_0/var"] = (
                f"input_proj.{i}.1._variance", "id")
    elif enc == "segformer_b4":
        merge(maps, M.mixvit_backbone_map(flat_p, flax="backbone",
                                          pd="backbone.backbone"))
        # the SegFormer wrapper's decoder layers are dead weight: its
        # forward early-returns the feature maps (segformer_paddleSeg.py:80-84)
        expect_unused = expect_unused + (
            "backbone.linear_c1.", "backbone.linear_c2.", "backbone.linear_c3.",
            "backbone.linear_c4.", "backbone.linear_fuse.",
            "backbone.linear_pred.")
    elif enc in ("resnet50", ""):
        r50 = emrt_r50_key_map(n_enc, n_dec)
        maps = r50
    else:
        raise NotImplementedError(
            f"no .pdparams key map for EMRT backbone {encoder_type!r}")
    return (*maps, expect_unused)


def convert_pdparams(pd: Dict[str, np.ndarray], params, batch_stats,
                     model_name: str = "EMRT", encoder_type: str = "resnet50"):
    """Convert a reference state dict into (params, batch_stats).

    Returns new trees plus a report dict {matched, missing, unused,
    unmatched_flax}.
    """
    import flax.traverse_util as tu
    import jax

    flat_p = dict(tu.flatten_dict(jax.tree.map(np.asarray, params), sep="/"))
    flat_s = dict(tu.flatten_dict(jax.tree.map(np.asarray, batch_stats or {}),
                                  sep="/"))
    if is_backbone_only_pdparams(pd) and any(
            k.startswith("backbone/") for k in flat_p):
        # MODEL.PRETRAINED pointing at a prefix-less ImageNet resnet file:
        # init only the backbone subtree (reference resnet.py:238-243)
        logger.info("pdparams: backbone-only ImageNet checkpoint detected")
        pmap, smap, fold, expect_unused = resnet_backbone_key_map(flat_p, pd)
    else:
        pmap, smap, fold, expect_unused = build_key_map(flat_p, model_name,
                                                        encoder_type)

    used, missing = set(), []
    for flat, mapping in ((flat_p, pmap), (flat_s, smap)):
        for fkey, (pdkey, tag) in mapping.items():
            if fkey not in flat:
                continue
            if pdkey not in pd:
                missing.append(pdkey)
                continue
            if tag.startswith("cat:"):
                # two pd tensors concatenated on the token axis (DeiT
                # class_token + distill_token -> one [1, 2, D] cls_token)
                other = tag[4:]
                if other not in pd:
                    missing.append(other)
                    continue
                used.add(other)
                src = np.concatenate(
                    [np.asarray(pd[pdkey]), np.asarray(pd[other])], axis=1)
                tag = "id"
            else:
                src = np.asarray(pd[pdkey])
            converted = _apply(tag, src, flat[fkey])
            if converted.shape != flat[fkey].shape:
                raise ValueError(f"{fkey}: converted shape {converted.shape} "
                                 f"!= target {flat[fkey].shape} (pd {pdkey})")
            flat[fkey] = converted.astype(flat[fkey].dtype)
            used.add(pdkey)

    # fold UpHead conv biases into BN running means (exactness)
    for stats_key, bias_key in fold.items():
        if stats_key in flat_s and bias_key in pd:
            flat_s[stats_key] = (flat_s[stats_key]
                                 - np.asarray(pd[bias_key])).astype(
                flat_s[stats_key].dtype)
            used.add(bias_key)

    unused = [k for k in pd if k not in used
              and not any(tag in k for tag in expect_unused)]
    unmatched = [k for k in list(pmap) + list(smap)
                 if k not in flat_p and k not in flat_s]
    report = {"matched": len(used), "missing": sorted(set(missing)),
              "unused": sorted(unused), "unmatched_flax": sorted(unmatched)}
    logger.info(f"pdparams convert: {report['matched']} tensors loaded, "
                f"{len(report['missing'])} missing, "
                f"{len(report['unused'])} unused")
    for k in report["missing"][:20]:
        logger.warning(f"  missing in pdparams: {k}")
    new_params = tu.unflatten_dict(flat_p, sep="/")
    new_stats = tu.unflatten_dict(flat_s, sep="/") if flat_s else batch_stats
    return new_params, new_stats, report


def convert_emrt_r50(pd: Dict[str, np.ndarray], params, batch_stats):
    """Convert a reference EMRT-r50 state dict (back-compat wrapper)."""
    return convert_pdparams(pd, params, batch_stats, "EMRT", "resnet50")


def main(argv=None):
    """CLI: convert a reference EMRT-r50 .pdparams into an orbax best_model.

    Usage::

        python -m emrt_tpu.utils.pdparams CKPT.pdparams OUT_DIR \
            --config configs/EMRT/EMRT_256x256_160k_potsdam.yaml

    OUT_DIR is written in the same format as train.py's ``best_model``
    directory, so ``val.py --model_path OUT_DIR`` runs the parity eval.
    """
    import argparse

    parser = argparse.ArgumentParser(description=main.__doc__)
    parser.add_argument("ckpt")
    parser.add_argument("out_dir")
    parser.add_argument("--config", required=True)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..config import get_config
    from ..models import get_model
    from ..train.state import init_variables

    config = get_config(args.config)
    model = get_model(config)
    ch, cw = config.DATA.CROP_SIZE
    variables = init_variables(model, jax.random.key(0),
                               jnp.zeros((1, ch, cw, 3), jnp.float32))
    pd = read_pdparams(args.ckpt)
    params, stats, report = convert_pdparams(
        pd, variables["params"], variables.get("batch_stats", {}),
        config.MODEL.NAME, config.MODEL.ENCODER.TYPE)
    if report["missing"] or report["unmatched_flax"]:
        logger.warning(f"incomplete conversion: missing={report['missing']} "
                       f"unmatched={report['unmatched_flax']}")

    import os

    import orbax.checkpoint as ocp
    path = os.path.abspath(args.out_dir)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": params, "batch_stats": stats})
    ckptr.wait_until_finished()
    logger.info(f"wrote converted checkpoint to {path}; run "
                f"`python val.py --config {args.config} --model_path {path}` "
                f"for the parity eval")


if __name__ == "__main__":
    main()
