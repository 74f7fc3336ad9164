"""Camera-family (FCOS3D / ImVoxelNet) checkpoint converter tests.

1. Coverage: the capture/materialize harness from
   test_full_ckpt_convert.py proves `convert_camera_torch_to_flax`
   resolves EVERY leaf of a tiny FCOS3D tree (and everything but the
   documented `neck_3d_m` divergence for ImVoxelNet).
2. Forward parity: the reference modules (mmcv ResNet `backbone.*`, FPN
   `neck.lateral_convs/fpn_convs`, FCOSMono3DHead branch towers —
   `/root/reference/mmdet3d/models/dense_heads/anchor_free_mono3d_head.py:181-274`,
   `fcos_mono3d_head.py:144-193`) are re-typed in plain torch as a test
   oracle (the pattern the reference itself uses, `ops/test.py:32-41`); a
   randomly-initialized reference-layout state_dict is converted and the
   flax model's per-level outputs must match the torch oracle's.
"""
import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from tests.test_runtime.test_full_ckpt_convert import (  # noqa: E402
    _Capture, _Recording, _torch_shape, _single_leaf_tree)

NC, NA = 3, 4
# power-of-two level sizes so every FPN upsample is an exact 2x — jax
# nearest resize and torch F.interpolate(mode='nearest') agree exactly
# there; odd sizes differ in the tie-rounding of one row/column
H, W = 32, 64


def tiny_cfg():
    return dict(
        type="FCOSMono3D",
        backbone=dict(type="ResNet", depth=18, base_channels=8,
                      out_indices=(1, 2, 3)),
        neck=dict(type="FPN", in_channels=[16, 32, 64], out_channels=16,
                  start_level=1, num_outs=3, add_extra_convs="on_output",
                  relu_before_extra_convs=True),
        bbox_head=dict(
            type="FCOSMono3DHead", num_classes=NC, in_channels=16,
            feat_channels=16, stacked_convs=1,
            strides=(16, 32, 64),
            regress_ranges=((-1, 48), (48, 96), (96, 1e8)),
            cls_branch=(16,), reg_branch=((16,), (16,), (16,), (16,), ()),
            dir_branch=(16,), attr_branch=(16,), centerness_branch=(8,),
            num_attrs=NA,
            norm_cfg=dict(type="GN", num_groups=4)),
        test_cfg=dict(max_per_img=16),
    )


@pytest.fixture(scope="module")
def fcos_model_and_vars():
    from isfusion_tpu.models import build_detector
    model = build_detector(tiny_cfg())
    batch = dict(img=jax.numpy.zeros((1, H, W, 3), jax.numpy.float32),
                 cam2img=jax.numpy.eye(4)[None])
    variables = model.init(jax.random.PRNGKey(0), batch, train=False,
                           mode="feats")
    return model, jax.tree_util.tree_map(np.asarray, variables), batch


# ----------------------------------------------------------- torch oracle
class TorchConvGN(tnn.Module):
    """mmcv ConvModule(conv_cfg=Conv2d, norm_cfg=GN, act ReLU): conv has
    no bias under a norm (bias='auto')."""

    def __init__(self, cin, cout, k, groups=4):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, padding=k // 2, bias=False)
        self.gn = tnn.GroupNorm(groups, cout)

    def forward(self, x):
        return F.relu(self.gn(self.conv(x)))


class TorchBasicBlock(tnn.Module):
    def __init__(self, cin, planes, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = None
        if stride != 1 or cin != planes:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + idn)


class TorchResNet18(tnn.Module):
    def __init__(self, base=8, out_indices=(1, 2, 3)):
        super().__init__()
        self.out_indices = out_indices
        self.conv1 = tnn.Conv2d(3, base, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(base)
        cin = base
        for i, stride in enumerate((1, 2, 2, 2)):
            planes = base * 2 ** i
            setattr(self, f"layer{i + 1}", tnn.Sequential(
                TorchBasicBlock(cin, planes, stride),
                TorchBasicBlock(planes, planes, 1)))
            cin = planes

    def forward(self, x):
        x = F.max_pool2d(F.relu(self.bn1(self.conv1(x))), 3, 2, 1)
        outs = []
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
            if i in self.out_indices:
                outs.append(x)
        return outs


class TorchFPN(tnn.Module):
    """mmdet FPN: start_level=1, add_extra_convs='on_output',
    relu_before_extra_convs=True; extras live at the tail of fpn_convs."""

    def __init__(self, in_channels=(16, 32, 64), out=16, start=1,
                 num_outs=3):
        super().__init__()
        used = len(in_channels) - start
        self.lateral_convs = tnn.ModuleList(
            [tnn.Sequential() for _ in range(used)])
        self.fpn_convs = tnn.ModuleList()
        for c in in_channels[start:]:
            pass
        self.lateral_convs = tnn.ModuleList()
        for c in in_channels[start:]:
            m = tnn.Module()
            m.conv = tnn.Conv2d(c, out, 1)
            self.lateral_convs.append(m)
        for _ in range(used):
            m = tnn.Module()
            m.conv = tnn.Conv2d(out, out, 3, padding=1)
            self.fpn_convs.append(m)
        for _ in range(num_outs - used):
            m = tnn.Module()
            m.conv = tnn.Conv2d(out, out, 3, stride=2, padding=1)
            self.fpn_convs.append(m)
        self.used, self.num_outs = used, num_outs

    def forward(self, feats):
        lat = [self.lateral_convs[i].conv(feats[i + 1])
               for i in range(self.used)]
        for i in range(self.used - 1, 0, -1):
            lat[i - 1] = lat[i - 1] + F.interpolate(
                lat[i], size=lat[i - 1].shape[-2:], mode="nearest")
        outs = [self.fpn_convs[i].conv(lat[i]) for i in range(self.used)]
        for k in range(self.num_outs - self.used):
            src = outs[-1] if k == 0 else F.relu(outs[-1])
            outs.append(self.fpn_convs[self.used + k].conv(src))
        return outs


class TorchScale(tnn.Module):
    def __init__(self):
        super().__init__()
        self.scale = tnn.Parameter(torch.tensor(1.0))

    def forward(self, x):
        return x * self.scale


class TorchFCOSHead(tnn.Module):
    group_dims = (2, 1, 3, 1, 2)

    def __init__(self, c=16, levels=3):
        super().__init__()
        self.cls_convs = tnn.ModuleList([TorchConvGN(c, c, 3)])
        self.reg_convs = tnn.ModuleList([TorchConvGN(c, c, 3)])
        self.conv_cls_prev = tnn.ModuleList([TorchConvGN(c, c, 1)])
        self.conv_cls = tnn.Conv2d(c, NC, 1)
        self.conv_reg_prevs = tnn.ModuleList()
        self.conv_regs = tnn.ModuleList()
        for gi, d in enumerate(self.group_dims):
            if gi < 4:
                self.conv_reg_prevs.append(
                    tnn.ModuleList([TorchConvGN(c, c, 1)]))
            else:           # empty reg_branch group (velo) — no tower
                self.conv_reg_prevs.append(None)
            self.conv_regs.append(tnn.Conv2d(c, d, 1))
        self.conv_dir_cls_prev = tnn.ModuleList([TorchConvGN(c, c, 1)])
        self.conv_dir_cls = tnn.Conv2d(c, 2, 1)
        self.conv_attr_prev = tnn.ModuleList([TorchConvGN(c, c, 1)])
        self.conv_attr = tnn.Conv2d(c, NA, 1)
        self.conv_centerness_prev = tnn.ModuleList([TorchConvGN(c, 8, 1)])
        self.conv_centerness = tnn.Conv2d(8, 1, 1)
        self.scales = tnn.ModuleList([
            tnn.ModuleList([TorchScale() for _ in range(3)])
            for _ in range(levels)])

    def forward_single(self, x, lvl):
        cls_feat, reg_feat = x, x
        for m in self.cls_convs:
            cls_feat = m(cls_feat)
        for m in self.reg_convs:
            reg_feat = m(reg_feat)
        t = cls_feat
        for m in self.conv_cls_prev:
            t = m(t)
        cls_score = self.conv_cls(t)
        preds = []
        for gi in range(len(self.group_dims)):
            t = reg_feat
            if self.conv_reg_prevs[gi] is not None:
                for m in self.conv_reg_prevs[gi]:
                    t = m(t)
            preds.append(self.conv_regs[gi](t))
        bbox = torch.cat(preds, 1)
        s_off, s_dep, s_size = self.scales[lvl]
        off = s_off(bbox[:, :2])
        dep = s_dep(bbox[:, 2:3]).exp()
        size = s_size(bbox[:, 3:6]).exp() + 1e-6
        bbox = torch.cat([off, dep, size, bbox[:, 6:]], 1)
        t = reg_feat
        for m in self.conv_dir_cls_prev:
            t = m(t)
        dir_pred = self.conv_dir_cls(t)
        t = cls_feat
        for m in self.conv_attr_prev:
            t = m(t)
        attr = self.conv_attr(t)
        t = reg_feat
        for m in self.conv_centerness_prev:
            t = m(t)
        ctr = self.conv_centerness(t)
        return cls_score, bbox, dir_pred, attr, ctr


class TorchFCOS3D(tnn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = TorchResNet18()
        self.neck = TorchFPN()
        self.bbox_head = TorchFCOSHead()

    def forward(self, img):
        feats = self.neck(self.backbone(img))
        return [self.bbox_head.forward_single(f, i)
                for i, f in enumerate(feats)]


# ---------------------------------------------------------------- tests
def test_camera_converter_covers_fcos3d_tree(fcos_model_and_vars):
    from isfusion_tpu.runner.full_ckpt_convert import (
        convert_camera_torch_to_flax, convert_detector_torch_to_flax)
    _, variables, _ = fcos_model_and_vars

    cap = _Capture()
    _, missing1 = convert_camera_torch_to_flax(cap, variables)
    n_leaves = len(jax.tree_util.tree_leaves(variables))
    assert len(missing1) == n_leaves
    assert cap.requested

    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    sd = {}
    for path, leaf in flat:
        pstr = "/".join(str(p.key) for p in path)
        single = _single_leaf_tree(path, leaf)
        # lateral indexing needs the sibling keys — patch them in
        single["params"].setdefault("neck_m", {})
        for i in (1, 2):
            single["params"]["neck_m"].setdefault(f"lateral_{i}", {})
        for _ in range(5):
            probe = _Recording(sd)
            _, miss = convert_camera_torch_to_flax(probe, single)
            new = probe.missed - set(sd)
            if not miss or not new:
                break
            for key in new:
                rng = np.random.default_rng(abs(hash(key)) % (2 ** 31))
                sd[key] = rng.normal(size=_torch_shape(
                    key, leaf.shape, pstr)).astype(np.float32)

    out, missing = convert_camera_torch_to_flax(sd, variables)
    assert missing == [], f"unconverted params: {missing[:10]}"
    # the detector-level router reaches the same result
    out2, missing2 = convert_detector_torch_to_flax(sd, variables)
    assert missing2 == []
    for (path, leaf), (_, conv) in zip(
            flat, jax.tree_util.tree_flatten_with_path(out)[0]):
        assert np.asarray(conv).shape == leaf.shape, \
            "/".join(str(p.key) for p in path)
    # layout spot checks
    w = sd["backbone.layer2.0.conv1.weight"]
    got = out["params"]["backbone_m"]["layer2_0"]["conv1"]["kernel"]
    np.testing.assert_allclose(np.asarray(got), w.transpose(2, 3, 1, 0))
    # our lateral_1 (start_level=1) is the reference's lateral_convs.0
    w = sd["neck.lateral_convs.0.conv.weight"]
    got = out["params"]["neck_m"]["lateral_1"]["Conv_0"]["kernel"]
    np.testing.assert_allclose(np.asarray(got), w.transpose(2, 3, 1, 0))
    # our extra_conv_0 is the reference's fpn_convs.{n_laterals}
    w = sd["neck.fpn_convs.2.conv.weight"]
    got = out["params"]["neck_m"]["extra_conv_0"]["Conv_0"]["kernel"]
    np.testing.assert_allclose(np.asarray(got), w.transpose(2, 3, 1, 0))
    w = sd["bbox_head.scales.1.1.scale"]
    got = out["params"]["bbox_head_m"]["scale1_depth"]["scale"]
    np.testing.assert_allclose(np.asarray(got), w)


def test_camera_converter_forward_parity(fcos_model_and_vars):
    """Random reference state dict -> convert -> identical per-level
    outputs between the torch oracle and the flax model."""
    from isfusion_tpu.runner.full_ckpt_convert import \
        convert_camera_torch_to_flax
    model, variables, _ = fcos_model_and_vars

    torch.manual_seed(0)
    oracle = TorchFCOS3D().eval()
    with torch.no_grad():
        for p in oracle.parameters():
            p.copy_(torch.randn_like(p) * 0.1)
        for m in oracle.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(
                    torch.rand_like(m.running_var) * 0.5 + 0.75)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}

    out, missing = convert_camera_torch_to_flax(sd, variables)
    assert missing == [], missing[:10]

    rng = np.random.default_rng(1)
    img = rng.normal(size=(1, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(img.transpose(0, 3, 1, 2)))

    batch = dict(img=jax.numpy.asarray(img),
                 cam2img=jax.numpy.eye(4)[None])
    preds = model.apply(jax.tree_util.tree_map(jax.numpy.asarray, out),
                        batch, train=False, mode="feats")
    assert len(preds) == len(ref) == 3
    for lvl, (p, r) in enumerate(zip(preds, ref)):
        for key, t in zip(("cls_score", "bbox_pred", "dir_cls_pred",
                           "attr_pred", "centerness"), r):
            ours = np.asarray(p[key])
            theirs = t.numpy().transpose(0, 2, 3, 1)
            np.testing.assert_allclose(
                ours, theirs, rtol=2e-4, atol=2e-4,
                err_msg=f"level {lvl} {key}")


def test_camera_converter_imvoxelnet_scope():
    """ImVoxelNet: backbone/neck/bbox_head convert; the simplified
    neck_3d_m is the only reported gap."""
    from isfusion_tpu.models import build_detector
    from isfusion_tpu.runner.full_ckpt_convert import \
        convert_camera_torch_to_flax
    from tests.test_models import test_imvoxelnet as tiv

    model = build_detector(tiv.tiny_cfg())
    rng = np.random.default_rng(0)
    cam2img = np.array([[40, 0, tiv.W / 2, 0], [0, 40, tiv.H / 2, 0],
                        [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    batch = dict(
        img=jax.numpy.asarray(
            rng.uniform(size=(1, tiv.H, tiv.W, 3)).astype(np.float32)),
        cam2img=jax.numpy.asarray(cam2img[None]))
    variables = jax.tree_util.tree_map(np.asarray, model.init(
        jax.random.PRNGKey(0), batch, train=False, mode="feats"))

    cap = _Capture()
    _, missing = convert_camera_torch_to_flax(cap, variables)
    n_leaves = len(jax.tree_util.tree_leaves(variables))
    assert len(missing) == n_leaves
    # every leaf outside neck_3d_m consulted the state dict; neck_3d_m
    # leaves did not (documented divergence — no weight-level mapping)
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    sd = {}
    for path, leaf in flat:
        if str(path[1].key) == "neck_3d_m":
            continue
        pstr = "/".join(str(p.key) for p in path)
        single = _single_leaf_tree(path, leaf)
        for _ in range(5):
            probe = _Recording(sd)
            _, miss = convert_camera_torch_to_flax(probe, single)
            new = probe.missed - set(sd)
            if not miss or not new:
                break
            for key in new:
                rng = np.random.default_rng(abs(hash(key)) % (2 ** 31))
                sd[key] = rng.normal(size=_torch_shape(
                    key, leaf.shape, pstr)).astype(np.float32)
    out, missing = convert_camera_torch_to_flax(sd, variables)
    assert all(m.split("/")[1] == "neck_3d_m" for m in missing), \
        [m for m in missing if m.split("/")[1] != "neck_3d_m"][:10]
    assert any(m.split("/")[1] == "neck_3d_m" for m in missing)
