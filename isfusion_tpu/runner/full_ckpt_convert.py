"""Full-detector PyTorch -> flax checkpoint conversion for IS-Fusion.

Extends the Swin-only converter (`runner/ckpt_convert.py`) to the whole
`ISFusionDetector` tree, mapping the reference's state_dict naming
(modules cited below) onto this framework's flax variables:

  img_backbone.*        mmdet3d/models/backbones/swin.py (via ckpt_convert)
  img_neck.*            necks/generalized_lss.py (lateral_convs/fpn_convs)
  pts_voxel_encoder.*   voxel_encoders/voxel_encoder.py:288 (vfe_layers)
  pts_middle_encoder.*  middle_encoders/sparse_encoder.py:19
                        (conv_input / encoder_layers / conv_out; spconv2
                        checkpoints store 5-D weights (out, D, H, W, in) —
                        see ops/spconv/overwrite_spconv/write_spconv2.py:66)
  fusion_encoder.*      middle_encoders/fusion_encoder.py:833
  pts_backbone.*        backbones/second.py:99 (SECONDV2 blocks/ds_layer)
  pts_neck.*            necks/second_fpn.py:12 (deblocks)
  pts_bbox_head.*       dense_heads/transfusion_head_v2.py:593

Layout conversions: torch Linear (out, in) -> flax (in, out); Conv2d OIHW
-> HWIO; Conv1d (out, in, 1) -> dense (in, out); ConvTranspose2d
(in, out, kh, kw) -> (kh, kw, out... flax ConvTranspose (kh, kw, in, out);
nn.MultiheadAttention in_proj (3E, E) -> per-head q/k/v kernels
(E, H, D); BN weight/bias/running stats -> scale/bias + batch_stats.

One real architecture divergence is handled explicitly: this framework's
SparseEncoder emits the dense BEV with channel order z*C+c while the
reference's `.dense()` + reshape gives c*D+z (`sparse_encoder.py:135`),
so the input channels of the first consumer (`fusion_encoder.conv_fusion`)
are permuted on the lidar block.

No public IS-Fusion checkpoint ships in this environment; correctness is
guarded by a roundtrip test (tests/test_runtime/test_full_ckpt_convert.py)
that synthesizes a reference-layout state dict covering OUR complete
parameter tree and asserts exact tree/shape agreement after conversion.
"""
from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

from .ckpt_convert import convert_swin_torch_to_flax


def _t(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


# ---------------------------------------------------------------- helpers
def dense_w(v):
    return _t(v).T


def conv2d_w(v):
    return _t(v).transpose(2, 3, 1, 0)


def conv1d_w(v):
    return _t(v)[:, :, 0].T


def deconv2d_w(v):
    return _t(v).transpose(2, 3, 0, 1)


def sparse5d_w(v):
    """spconv2 checkpoint layout (out, kz, ky, kx, in) -> ours
    (kz, ky, kx, in, out)."""
    return _t(v).transpose(1, 2, 3, 4, 0)


def mha_qkv(sd, base, which, heads):
    w = _t(sd[base + "in_proj_weight"])
    b = _t(sd[base + "in_proj_bias"])
    e = w.shape[1]
    i = {"q": 0, "k": 1, "v": 2}[which]
    wi = w[i * e:(i + 1) * e]           # (E, E)
    bi = b[i * e:(i + 1) * e]
    return wi.T.reshape(e, heads, e // heads), bi.reshape(heads, e // heads)


def mha_out(sd, base, heads):
    w = _t(sd[base + "out_proj.weight"])   # (E, E)
    b = _t(sd[base + "out_proj.bias"])
    e = w.shape[0]
    return w.T.reshape(heads, e // heads, e), b


# ------------------------------------------------------------ conversion
def convert_isfusion_torch_to_flax(sd: Dict[str, "object"],
                                   variables: Dict) -> Tuple[Dict, list]:
    """sd: reference-format state_dict; variables: our
    {'params', 'batch_stats'} template (shapes used only for head counts).
    Returns (new variables dict, list of unmatched our-paths)."""
    import copy
    out = copy.deepcopy(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})})
    missing = []

    def visit(tree, path):
        for k in list(tree.keys()):
            v = tree[k]
            if isinstance(v, dict):
                visit(v, path + (k,))
            else:
                r = resolve(path + (k,), v)
                if r is None:
                    missing.append("/".join(path + (k,)))
                else:
                    tree[k] = np.asarray(r, dtype=np.asarray(v).dtype)

    def convmodule(base, sub, leaf, col, v):
        """ConvModule: base.conv / base.bn."""
        if sub == "Conv_0":
            return conv2d_w(sd[base + ".conv.weight"]) if leaf == "kernel" \
                else _t(sd[base + ".conv.bias"])
        table = {("scale", "params"): ".bn.weight",
                 ("bias", "params"): ".bn.bias",
                 ("mean", "stats"): ".bn.running_mean",
                 ("var", "stats"): ".bn.running_var"}
        return _t(sd[base + table[(leaf, col)]])

    def bn(base, leaf, col):
        table = {("scale", "params"): ".weight", ("bias", "params"): ".bias",
                 ("mean", "stats"): ".running_mean",
                 ("var", "stats"): ".running_var"}
        return _t(sd[base + table[(leaf, col)]])

    def ln(base, leaf):
        return _t(sd[base + (".weight" if leaf == "scale" else ".bias")])

    def posembed(base, name, leaf, col):
        # PositionEmbeddingLearned: position_embedding_head = Sequential(
        # Conv1d, BN1d, ReLU, Conv1d) (transfusion_head_v2.py:30)
        b = base + ".position_embedding_head"
        if name == "fc1":
            return conv1d_w(sd[b + ".0.weight"]) if leaf == "kernel" \
                else _t(sd[b + ".0.bias"])
        if name == "fc2":
            return conv1d_w(sd[b + ".3.weight"]) if leaf == "kernel" \
                else _t(sd[b + ".3.bias"])
        return bn(b + ".1", leaf, col)

    def attn_layer(base, name, leaf, v, heads=None):
        # head count from the leaf layout: q/k/v kernel (E, H, D),
        # q/k/v bias (H, D), out kernel (H, D, E)
        if name in ("query", "key", "value"):
            h = v.shape[1] if v.ndim == 3 else v.shape[0]
            w, b_ = mha_qkv(sd, base + ".", {"query": "q", "key": "k",
                                             "value": "v"}[name], h)
            return w if leaf == "kernel" else b_
        h = v.shape[0] if v.ndim == 3 else 1
        w, b_ = mha_out(sd, base + ".", h)
        return w if leaf == "kernel" else b_

    def deform_attn(base, name, leaf):
        key = f"{base}.{name}.{'weight' if leaf == 'kernel' else 'bias'}"
        return dense_w(sd[key]) if leaf == "kernel" else _t(sd[key])

    def sst_layer(tbase, rest, v):
        """rest like ('win_attn', 'query', 'kernel') or
        ('linear1', 'kernel') / ('norm1', 'scale')."""
        name = rest[0]
        if name == "win_attn":
            return attn_layer(tbase + ".win_attn.self_attn", rest[1],
                              rest[2], v)
        if name.startswith("linear"):
            k = f"{tbase}.{name}.{'weight' if rest[1] == 'kernel' else 'bias'}"
            return dense_w(sd[k]) if rest[1] == "kernel" else _t(sd[k])
        return ln(f"{tbase}.{name}", rest[1])

    def resolve(path, v):
        col = "stats" if path[0] == "batch_stats" else "params"
        p = path[1:]
        mod = p[0]
        try:
            # -------------------------------------------------- img branch
            # (leaf-driven inverse of ckpt_convert.convert_swin_torch_to
            # _flax: mmdet Swin key naming)
            if mod == "img_backbone_m":
                ib = "img_backbone"
                name, leaf = p[1], p[-1]
                if name == "patch_embed":
                    key = f"{ib}.patch_embed.projection." + (
                        "weight" if leaf == "kernel" else "bias")
                    return conv2d_w(sd[key]) if leaf == "kernel" \
                        else _t(sd[key])
                if name == "patch_norm":
                    return ln(f"{ib}.patch_embed.norm", leaf)
                if m := re.match(r"out_norm(\d+)", name):
                    return ln(f"{ib}.norm{m.group(1)}", leaf)
                if m := re.match(r"downsample(\d+)", name):
                    db = f"{ib}.stages.{m.group(1)}.downsample"
                    if p[2] == "norm":
                        return ln(f"{db}.norm", leaf)
                    return dense_w(sd[f"{db}.reduction.weight"]) \
                        if leaf == "kernel" \
                        else _t(sd[f"{db}.reduction.bias"])
                m = re.match(r"stage(\d+)_block(\d+)", name)
                bb = f"{ib}.stages.{m.group(1)}.blocks.{m.group(2)}"
                sub = p[2]
                if sub in ("norm1", "norm2"):
                    return ln(f"{bb}.{sub}", leaf)
                if sub == "ffn_fc1":
                    key = f"{bb}.ffn.layers.0.0." + (
                        "weight" if leaf == "kernel" else "bias")
                    return dense_w(sd[key]) if leaf == "kernel" \
                        else _t(sd[key])
                if sub == "ffn_fc2":
                    key = f"{bb}.ffn.layers.1." + (
                        "weight" if leaf == "kernel" else "bias")
                    return dense_w(sd[key]) if leaf == "kernel" \
                        else _t(sd[key])
                if sub == "attn":       # attn/w_msa/{qkv,proj,rpbt}
                    inner = p[4] if len(p) > 4 else p[3]
                    if p[3] == "w_msa" and \
                            inner == "relative_position_bias_table":
                        return _t(sd[
                            f"{bb}.attn.w_msa.relative_position_bias_table"])
                    key = f"{bb}.attn.w_msa.{inner}." + (
                        "weight" if leaf == "kernel" else "bias")
                    return dense_w(sd[key]) if leaf == "kernel" \
                        else _t(sd[key])
            if mod == "img_neck_m":
                m = re.match(r"(lateral|fpn)_(\d+)", p[1])
                base = (f"img_neck.{'lateral_convs' if m.group(1) == 'lateral' else 'fpn_convs'}"
                        f".{m.group(2)}")
                leaf = p[-1]
                sub = p[2] if p[2] in ("Conv_0",) else "bn"
                if p[2] == "Conv_0":
                    return convmodule(base, "Conv_0", leaf, col, v)
                return convmodule(base, "bn", leaf, col, v)
            # ----------------------------------------------------- lidar
            if mod == "pts_voxel_encoder_m":
                i = int(re.match(r"LinearNormAct_(\d+)", p[1]).group(1))
                base = f"pts_voxel_encoder.vfe_layers.{i}"
                if p[2] == "Dense_0":
                    return dense_w(sd[base + ".linear.weight"]) \
                        if p[-1] == "kernel" else _t(sd[base + ".linear.bias"])
                return bn(base + ".norm", p[-1], col)
            if mod == "pts_middle_encoder_m":
                name = p[1]
                if name == "conv_input":
                    base = "pts_middle_encoder.conv_input"
                    if p[2] == "kernel":
                        return sparse5d_w(sd[base + ".0.weight"])
                    return bn(base + ".1", p[-1], col)
                if name == "conv_out":
                    base = "pts_middle_encoder.conv_out"
                    if p[2] == "kernel":
                        return sparse5d_w(sd[base + ".0.weight"])
                    return bn(base + ".1", p[-1], col)
                m = re.match(r"encoder_layer(\d+)_(\d+)(_proj)?", name)
                i, j = int(m.group(1)), int(m.group(2))
                base = f"pts_middle_encoder.encoder_layers.encoder_layer{i}.{j}"
                if p[2] == "kernel":           # strided conv module
                    return sparse5d_w(sd[base + ".0.weight"])
                if p[2] == "MaskedBatchNorm_0":
                    return bn(base + ".1", p[-1], col)
                # basicblock: _SparseConvModule_{0,1} -> conv1/bn1, conv2/bn2
                k = int(re.match(r"_SparseConvModule_(\d+)", p[2]).group(1))
                if p[3] == "kernel":
                    return sparse5d_w(sd[f"{base}.conv{k + 1}.weight"])
                return bn(f"{base}.bn{k + 1}", p[-1], col)
            # ----------------------------------------------------- fusion
            if mod == "fusion_encoder_m":
                name = p[1]
                fb = "fusion_encoder"
                if name in ("conv_fusion", "conv_ins", "conv_scene",
                            "conv_heatmap", "heatmap_head_1",
                            "heatmap_head_2"):
                    sub = p[2] if p[2] == "Conv_0" else "bn"
                    val = convmodule(f"{fb}.{name}", sub, p[-1], col, v)
                    if name == "conv_fusion" and p[-1] == "kernel":
                        # lidar block channel order: ref c*D+z -> ours z*C+c
                        val = np.array(val)
                        nimg = 256 if val.shape[2] > 512 else \
                            val.shape[2] - 512
                        lid = val[:, :, nimg:, :]
                        c_l = lid.shape[2]
                        d = 2
                        cc = c_l // d
                        perm = np.arange(c_l).reshape(cc, d).T.reshape(-1)
                        val[:, :, nimg:, :] = lid[:, :, perm, :]
                    return val
                if name == "heatmap_head_3":
                    key = f"{fb}.heatmap_head_3." + (
                        "weight" if p[-1] == "kernel" else "bias")
                    return conv2d_w(sd[key]) if p[-1] == "kernel" \
                        else _t(sd[key])
                m = re.match(r"grid2region_(\d+)", name)
                if m:
                    lvl = int(m.group(1))
                    tb = f"{fb}.grid2region_att.{lvl}"
                    if p[2] == "linear0":
                        k = f"{tb}.linear0." + (
                            "weight" if p[-1] == "kernel" else "bias")
                        return dense_w(sd[k]) if p[-1] == "kernel" \
                            else _t(sd[k])
                    bm = re.match(r"block(\d+)_layer(\d+)", p[2])
                    eb = f"{tb}.block_list.{bm.group(1)}.encoder_list." \
                         f"{bm.group(2)}"
                    return sst_layer(eb, p[3:], v)
                if name == "instance_att":
                    ib = f"{fb}.instance_att"
                    if p[2] in ("key_pos_embed", "query_pos_embed"):
                        return posembed(f"{ib}.{p[2]}", p[3], p[-1], col)
                    lm = re.match(r"layer_(\d+)", p[2])
                    # reference InsContextAtt holds layers directly
                    # (`fusion_encoder.py:946`: self.layers = _get_clones)
                    lb = f"{ib}.layers.{lm.group(1)}"
                    sub = p[3]
                    if sub == "cross_attn":
                        return deform_attn(f"{lb}.cross_attn", p[4], p[-1])
                    if sub == "self_attn":
                        return attn_layer(f"{lb}.self_attn", p[4], p[-1], v)
                    return sst_layer(lb, p[3:], v)
                if name == "instance_to_scene_att":
                    ib = f"{fb}.instance_to_scene_att"
                    if p[2] == "multihead_attn":
                        return attn_layer(f"{ib}.multihead_attn", p[3],
                                          p[-1], v)
                    return ln(f"{ib}.norm", p[-1])
            # ------------------------------------------------- pts 2D BEV
            if mod == "pts_backbone_m":
                if p[1] == "ds_layer":
                    base = "pts_backbone.ds_layer"
                    if p[2] == "Conv_0":
                        return conv2d_w(sd[base + ".0.weight"])
                    return bn(base + ".1", p[-1], col)
                bm = re.match(r"block(\d+)", p[1])
                cm = re.match(r"ConvModule_(\d+)", p[2])
                j = int(cm.group(1))
                base = f"pts_backbone.blocks.{bm.group(1)}"
                if p[3] == "Conv_0":
                    return conv2d_w(sd[f"{base}.{3 * j}.weight"])
                return bn(f"{base}.{3 * j + 1}", p[-1], col)
            if mod == "pts_neck_m":
                # deblocks ordered by scale; ConvModule = stride-1 deblock,
                # ConvTransposeModule = stride>1 (flagship: [conv, deconv])
                if p[1].startswith("ConvModule"):
                    i = int(p[1].split("_")[1])
                    base = f"pts_neck.deblocks.{i}"
                    if p[2] == "Conv_0":
                        return conv2d_w(sd[base + ".0.weight"])
                    return bn(base + ".1", p[-1], col)
                i = int(p[1].split("_")[1]) + 1
                base = f"pts_neck.deblocks.{i}"
                if p[2] == "ConvTranspose_0":
                    return deconv2d_w(sd[base + ".0.weight"])
                return bn(base + ".1", p[-1], col)
            # -------------------------------------------------------- head
            if mod == "pts_bbox_head_m":
                hb = "pts_bbox_head"
                name = p[1]
                if name == "shared_conv":
                    key = f"{hb}.shared_conv." + (
                        "weight" if p[-1] == "kernel" else "bias")
                    return conv2d_w(sd[key]) if p[-1] == "kernel" \
                        else _t(sd[key])
                if name == "heatmap_conv":
                    sub = p[2] if p[2] == "Conv_0" else "bn"
                    return convmodule(f"{hb}.heatmap_head.0", sub, p[-1],
                                      col, v)
                if name == "heatmap_out":
                    key = f"{hb}.heatmap_head.1." + (
                        "weight" if p[-1] == "kernel" else "bias")
                    return conv2d_w(sd[key]) if p[-1] == "kernel" \
                        else _t(sd[key])
                if name == "class_encoding":
                    key = f"{hb}.class_encoding." + (
                        "weight" if p[-1] == "kernel" else "bias")
                    return conv1d_w(sd[key]) if p[-1] == "kernel" \
                        else _t(sd[key])
                dm = re.match(r"decoder_(\d+)", name)
                if dm:
                    db = f"{hb}.decoder.{dm.group(1)}"
                    sub = p[2]
                    if sub in ("self_attn", "cross_attn"):
                        tname = "self_attn" if sub == "self_attn" \
                            else "multihead_attn"
                        return attn_layer(f"{db}.{tname}", p[3], p[-1], v)
                    if sub in ("self_posembed", "cross_posembed"):
                        return posembed(f"{db}.{sub}", p[3], p[-1], col)
                    return sst_layer(db, p[2:], v)
                pm = re.match(r"pred_(\d+)", name)
                if pm:
                    pb = f"{hb}.prediction_heads.{pm.group(1)}"
                    tm = re.match(r"([a-z]+)_(0|final)(_bn)?", p[2])
                    task, idx, is_bn = tm.group(1), tm.group(2), tm.group(3)
                    # FFN task Sequential: ConvModule(conv1d+bn) x n then
                    # final conv1d (transfusion_head_v2.py:505)
                    if is_bn:
                        return bn(f"{pb}.{task}.{idx}.bn", p[-1], col)
                    if idx == "final":
                        key = f"{pb}.{task}.1." + (
                            "weight" if p[-1] == "kernel" else "bias")
                    else:
                        key = f"{pb}.{task}.0.conv." + (
                            "weight" if p[-1] == "kernel" else "bias")
                    return conv1d_w(sd[key]) if p[-1] == "kernel" \
                        else _t(sd[key])
        except (KeyError, AttributeError):
            return None
        return None

    visit(out["params"], ("params",))
    if out["batch_stats"]:
        visit(out["batch_stats"], ("batch_stats",))
    return out, missing


def convert_lidar_torch_to_flax(sd: Dict[str, "object"],
                                variables: Dict) -> Tuple[Dict, list]:
    """Converter for the LiDAR-only detector families the reference also
    publishes checkpoints for (CenterPoint, TransFusion-L, SECOND-family
    — `/root/reference/README.md` model zoo): DynamicVFE/HardVFE +
    SparseEncoder + plain SECOND (`_SECONDBlock_*` module naming) +
    SECONDFPN + CenterHead task heads. TransFusionHead trees resolve via
    `convert_isfusion_torch_to_flax`; use `convert_detector_torch_to_flax`
    to compose both."""
    import copy
    out = copy.deepcopy(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})})
    missing = []

    def bn(base, leaf, col):
        table = {("scale", "params"): ".weight", ("bias", "params"): ".bias",
                 ("mean", "stats"): ".running_mean",
                 ("var", "stats"): ".running_var"}
        return _t(sd[base + table[(leaf, col)]])

    def resolve(path, v):
        col = "stats" if path[0] == "batch_stats" else "params"
        p = path[1:]
        mod = p[0]
        try:
            if mod == "pts_voxel_encoder_m":
                i = int(re.match(r"LinearNormAct_(\d+)", p[1]).group(1))
                base = f"pts_voxel_encoder.vfe_layers.{i}"
                if p[2] == "Dense_0":
                    return dense_w(sd[base + ".linear.weight"]) \
                        if p[-1] == "kernel" else _t(sd[base + ".linear.bias"])
                return bn(base + ".norm", p[-1], col)
            if mod == "pts_middle_encoder_m":
                name = p[1]
                if name in ("conv_input", "conv_out"):
                    base = f"pts_middle_encoder.{name}"
                    if p[2] == "kernel":
                        return sparse5d_w(sd[base + ".0.weight"])
                    return bn(base + ".1", p[-1], col)
                m = re.match(r"encoder_layer(\d+)_(\d+)(_proj)?", name)
                base = (f"pts_middle_encoder.encoder_layers."
                        f"encoder_layer{m.group(1)}.{m.group(2)}")
                if p[2] == "kernel":
                    return sparse5d_w(sd[base + ".0.weight"])
                if p[2] == "MaskedBatchNorm_0":
                    return bn(base + ".1", p[-1], col)
                k = int(re.match(r"_SparseConvModule_(\d+)", p[2]).group(1))
                if p[3] == "kernel":
                    return sparse5d_w(sd[f"{base}.conv{k + 1}.weight"])
                return bn(f"{base}.bn{k + 1}", p[-1], col)
            if mod == "pts_backbone_m":
                # plain SECOND: blocks.{i} = Sequential([Conv2d, BN,
                # ReLU] * n) (`mmdet3d/models/backbones/second.py:11`)
                bm = re.match(r"_SECONDBlock_(\d+)", p[1])
                j = int(re.match(r"ConvModule_(\d+)", p[2]).group(1))
                base = f"pts_backbone.blocks.{bm.group(1)}"
                if p[3] == "Conv_0":
                    return conv2d_w(sd[f"{base}.{3 * j}.weight"])
                return bn(f"{base}.{3 * j + 1}", p[-1], col)
            if mod == "pts_neck_m":
                # SECONDFPN deblocks.{i} = Sequential(ConvTranspose2d |
                # Conv2d, BN, ReLU); stride-1 deblocks are plain convs in
                # the reference — disambiguate by weight layout
                i = int(p[1].split("_")[1])
                base = f"pts_neck.deblocks.{i}"
                if p[2] in ("ConvTranspose_0", "Conv_0"):
                    w = _t(sd[base + ".0.weight"])
                    kh, kw, ci, co = v.shape
                    if p[2] == "Conv_0":
                        return conv2d_w(w)
                    if w.shape == (ci, co, kh, kw):     # ConvTranspose2d
                        return deconv2d_w(w)
                    # reference stride-1 deblock is a plain Conv2d
                    # (co, ci, kh, kw); as a stride-1 transpose kernel
                    # that's the spatially-flipped conv kernel (identical
                    # for the 1x1 kernels SECONDFPN uses at stride 1)
                    return np.flip(conv2d_w(w), (0, 1))
                return bn(base + ".1", p[-1], col)
            if mod == "pts_bbox_head_m":
                hb = "pts_bbox_head"
                if p[1] == "shared_conv":
                    if p[2] == "Conv_0":
                        return conv2d_w(sd[f"{hb}.shared_conv.conv.weight"])
                    return bn(f"{hb}.shared_conv.bn", p[-1], col)
                tm = re.match(r"task_heads_(\d+)", p[1])
                if tm:
                    t = int(tm.group(1))
                    hm = re.match(r"([a-z]+)_(\d+|final)", p[2])
                    task, idx = hm.group(1), hm.group(2)
                    tb = f"{hb}.task_heads.{t}.{task}"
                    if idx == "final":
                        key = f"{tb}.{_centerhead_final_idx(sd, tb)}." + (
                            "weight" if p[-1] == "kernel" else "bias")
                        return conv2d_w(sd[key]) if p[-1] == "kernel" \
                            else _t(sd[key])
                    if p[3] == "Conv_0":
                        return conv2d_w(sd[f"{tb}.{idx}.conv.weight"])
                    return bn(f"{tb}.{idx}.bn", p[-1], col)
        except (KeyError, AttributeError):
            return None
        return None

    def visit(tree, path):
        for k in list(tree.keys()):
            v = tree[k]
            if isinstance(v, dict):
                visit(v, path + (k,))
            else:
                r = resolve(path + (k,), v)
                if r is None:
                    missing.append("/".join(path + (k,)))
                else:
                    tree[k] = np.asarray(r, dtype=np.asarray(v).dtype)

    visit(out["params"], ("params",))
    if out["batch_stats"]:
        visit(out["batch_stats"], ("batch_stats",))
    return out, missing


def convert_camera_torch_to_flax(sd: Dict[str, "object"],
                                 variables: Dict) -> Tuple[Dict, list]:
    """Converter for the camera-only detector families (FCOS3D,
    ImVoxelNet — `/root/reference/configs/fcos3d/`,
    `mmdet3d/models/detectors/imvoxelnet.py`): mmdet ResNet
    (`backbone.conv1/bn1/layer{i}.{j}.conv{k}/bn{k}/downsample`) + FPN
    (`neck.lateral_convs/fpn_convs`, extra levels appended to fpn_convs)
    + FCOSMono3DHead branches
    (`mmdet3d/models/dense_heads/anchor_free_mono3d_head.py:181-274`:
    cls_convs/reg_convs ConvModules with GN, conv_*_prev towers, plain
    conv_cls/conv_regs.{g}/conv_dir_cls/conv_attr/conv_centerness,
    per-level scales.{lvl}.{0..2}.scale) or the plain Anchor3DHead convs
    (ImVoxelNet). ImVoxelNet's `neck_3d_m` has no weight-level mapping —
    this repo's OutdoorImVoxelNeck is a documented simplification of the
    reference's ResModule stack — and is reported as missing."""
    import copy
    out = copy.deepcopy(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})})
    missing = []

    # our FPN names laterals by ABSOLUTE input index (`lateral_{i}`,
    # i from start_level); the reference's ModuleList is 0-based
    lat_idx = sorted(
        int(k.split("_")[-1])
        for k in variables["params"].get("neck_m", {})
        if k.startswith("lateral_"))
    lat_base = lat_idx[0] if lat_idx else 0
    n_lat = len(lat_idx)

    def bn(base, leaf, col):
        table = {("scale", "params"): ".weight", ("bias", "params"): ".bias",
                 ("mean", "stats"): ".running_mean",
                 ("var", "stats"): ".running_var"}
        return _t(sd[base + table[(leaf, col)]])

    def convmodule(base, rest, col, norm="gn"):
        """Our ConvModule subtree (Conv_0 | Norm_0/{GroupNorm_0,
        BatchNorm_0}) -> mmcv ConvModule (.conv + .{gn|bn})."""
        if rest[0] == "Conv_0":
            return conv2d_w(sd[base + ".conv.weight"]) \
                if rest[-1] == "kernel" else _t(sd[base + ".conv.bias"])
        if rest[1] == "GroupNorm_0":
            return _t(sd[f"{base}.{norm}." +
                         ("weight" if rest[-1] == "scale" else "bias")])
        return bn(f"{base}.{norm}", rest[-1], col)

    def resolve(path, v):
        col = "stats" if path[0] == "batch_stats" else "params"
        p = path[1:]
        mod = p[0]
        try:
            if mod == "backbone_m":
                if p[1] == "conv1":
                    return conv2d_w(sd["backbone.conv1.weight"])
                if p[1] == "bn1":
                    return bn("backbone.bn1", p[-1], col)
                m = re.match(r"layer(\d+)_(\d+)", p[1])
                base = f"backbone.layer{m.group(1)}.{m.group(2)}"
                if p[2] == "downsample":
                    return conv2d_w(sd[base + ".downsample.0.weight"])
                if p[2] == "downsample_bn":
                    return bn(base + ".downsample.1", p[-1], col)
                cm = re.match(r"(conv|bn)(\d)", p[2])
                if cm.group(1) == "conv":
                    return conv2d_w(sd[f"{base}.conv{cm.group(2)}.weight"])
                return bn(f"{base}.bn{cm.group(2)}", p[-1], col)
            if mod == "neck_m":
                nm = re.match(r"(lateral|fpn_conv|extra_conv)_(\d+)", p[1])
                kind, i = nm.group(1), int(nm.group(2))
                ref_i = {"lateral": i - lat_base, "fpn_conv": i,
                         "extra_conv": n_lat + i}[kind]
                lst = "lateral_convs" if kind == "lateral" else "fpn_convs"
                return convmodule(f"neck.{lst}.{ref_i}", p[2:], col)
            if mod == "bbox_head_m":
                hb = "bbox_head"
                name = p[1]
                sm = re.match(r"scale(\d+)_(offset|depth|size)", name)
                if sm:
                    k = {"offset": 0, "depth": 1, "size": 2}[sm.group(2)]
                    return _t(sd[f"{hb}.scales.{sm.group(1)}.{k}.scale"])
                tm = re.match(r"(cls_convs|reg_convs|conv_cls_prev|"
                              r"conv_dir_prev|conv_attr_prev|"
                              r"conv_centerness_prev)_(\d+)", name)
                if tm:
                    ref = {"conv_dir_prev": "conv_dir_cls_prev"}.get(
                        tm.group(1), tm.group(1))
                    return convmodule(f"{hb}.{ref}.{tm.group(2)}",
                                      p[2:], col)
                gm = re.match(r"conv_reg_prev_(\d+)_(\d+)", name)
                if gm:
                    return convmodule(
                        f"{hb}.conv_reg_prevs.{gm.group(1)}.{gm.group(2)}",
                        p[2:], col)
                rm = re.match(r"conv_reg_(\d+)", name)
                base = f"{hb}.conv_regs.{rm.group(1)}" if rm \
                    else f"{hb}.{name}"
                key = base + (".weight" if p[-1] == "kernel" else ".bias")
                return conv2d_w(sd[key]) if p[-1] == "kernel" \
                    else _t(sd[key])
        except (KeyError, AttributeError):
            return None
        return None

    def visit(tree, path):
        for k in list(tree.keys()):
            v = tree[k]
            if isinstance(v, dict):
                visit(v, path + (k,))
            else:
                r = resolve(path + (k,), v)
                if r is None:
                    missing.append("/".join(path + (k,)))
                else:
                    tree[k] = np.asarray(r, dtype=np.asarray(v).dtype)

    visit(out["params"], ("params",))
    if out["batch_stats"]:
        visit(out["batch_stats"], ("batch_stats",))
    return out, missing


def _centerhead_final_idx(sd, task_base: str) -> int:
    """SeparateHead branch Sequential: ConvModule x (convs-1) then a
    final plain Conv2d; its index is the first `{i}.weight` key."""
    i = 0
    while f"{task_base}.{i}.conv.weight" in sd:
        i += 1
    return i


def convert_detector_torch_to_flax(sd: Dict[str, "object"],
                                   variables: Dict,
                                   lidar_mods=None) -> Tuple[Dict, list]:
    """Family-agnostic conversion with STRUCTURAL routing: each top-level
    module resolves through exactly one family's resolver, chosen from
    OUR parameter tree's layout (a try-one-then-the-other composition is
    value-unsafe — e.g. the flagship resolver maps `ConvTransposeModule_i`
    to `deblocks.{i+1}`, which also EXISTS in a CenterPoint checkpoint
    and would silently convert the wrong deblock). ``lidar_mods`` can
    pin the routing explicitly (a set of top-level module names) when
    `variables` is a partial tree without the distinguishing siblings."""
    params = variables["params"]

    def lidar_family(mod: str, subtree: Dict) -> bool:
        if mod == "pts_backbone_m":
            return any(k.startswith("_SECONDBlock") for k in subtree)
        if mod == "pts_neck_m":
            return not any(k.startswith("ConvModule") for k in subtree)
        if mod == "pts_bbox_head_m":
            return any(k.startswith("task_heads") for k in subtree)
        # voxel/middle encoders resolve identically in both families
        return False

    # camera-only trees (FCOS3D/ImVoxelNet) use distinct top-level names
    # (backbone_m/neck_m/bbox_head_m without the pts_/img_ prefixes), so
    # their routing never collides with the two LiDAR/fusion families
    camera_mods = {m for m in ("backbone_m", "neck_m", "neck_3d_m",
                               "bbox_head_m") if m in params}
    out_a, miss_a = convert_isfusion_torch_to_flax(sd, variables)
    out_b, miss_b = convert_lidar_torch_to_flax(sd, variables)
    miss_b_set = set(miss_b)
    if lidar_mods is None:
        lidar_mods = {m for m, sub in params.items()
                      if isinstance(sub, dict) and lidar_family(m, sub)}
    still = sorted((set(miss_a) - {p for p in miss_a
                                   if p.split("/")[1] in lidar_mods}) |
                   {p for p in miss_b_set
                    if p.split("/")[1] in lidar_mods})
    if camera_mods:
        out_c, miss_c = convert_camera_torch_to_flax(sd, variables)
        still = sorted((set(still) -
                        {p for p in still
                         if p.split("/")[1] in camera_mods}) |
                       {p for p in miss_c
                        if p.split("/")[1] in camera_mods})

        def merge_cam(a, b, path):
            for k in list(a.keys()):
                pa = path + (k,)
                if isinstance(a[k], dict):
                    merge_cam(a[k], b[k], pa)
                elif pa[1] in camera_mods:
                    a[k] = b[k]

        merge_cam(out_a["params"], out_c["params"], ("params",))
        if out_a.get("batch_stats"):
            merge_cam(out_a["batch_stats"], out_c["batch_stats"],
                      ("batch_stats",))

    def merge(a, b, path):
        for k in list(a.keys()):
            pa = path + (k,)
            if isinstance(a[k], dict):
                merge(a[k], b[k], pa)
            elif pa[1] in lidar_mods:
                a[k] = b[k]

    merge(out_a["params"], out_b["params"], ("params",))
    if out_a.get("batch_stats"):
        merge(out_a["batch_stats"], out_b["batch_stats"], ("batch_stats",))
    return out_a, still
