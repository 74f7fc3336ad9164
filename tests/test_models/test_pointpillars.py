"""PointPillars end-to-end forward/loss/decode on tiny shapes (pattern of
reference tests/test_models/test_detectors.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isfusion_tpu.models import build_detector


def tiny_pointpillars_cfg():
    pcr = [-8, -8, -5, 8, 8, 3]
    vs = [0.5, 0.5, 8]
    return dict(
        type="MVXFasterRCNN",
        pts_voxel_layer=dict(
            max_num_points=8, point_cloud_range=pcr, voxel_size=vs,
            max_voxels=(256, 256)),
        pts_voxel_encoder=dict(
            type="HardVFE", in_channels=5, feat_channels=[16, 16],
            with_distance=False, with_cluster_center=True,
            with_voxel_center=True, voxel_size=vs, point_cloud_range=pcr,
            norm_cfg=dict(type="BN1d", eps=1e-3, momentum=0.01)),
        pts_middle_encoder=dict(
            type="PointPillarsScatter", in_channels=16,
            output_shape=[32, 32]),
        pts_backbone=dict(
            type="SECOND", in_channels=16, out_channels=[16, 32, 64],
            layer_nums=[1, 1, 1], layer_strides=[2, 2, 2],
            norm_cfg=dict(type="BN", eps=1e-3, momentum=0.01)),
        pts_neck=dict(
            type="SECONDFPN", in_channels=[16, 32, 64],
            out_channels=[16, 16, 16], upsample_strides=[1, 2, 4],
            norm_cfg=dict(type="BN", eps=1e-3, momentum=0.01)),
        pts_bbox_head=dict(
            type="Anchor3DHead", num_classes=3, in_channels=48,
            feat_channels=48,
            anchor_generator=dict(
                type="AlignedAnchor3DRangeGenerator",
                ranges=[[-8, -8, -1.8, 8, 8, -1.8]],
                sizes=[[1.95, 4.6, 1.72], [0.6, 1.68, 1.27],
                       [0.66, 0.72, 1.75]],
                custom_values=[0, 0], rotations=[0, 1.57],
                reshape_out=True),
            bbox_coder=dict(type="DeltaXYZWLHRBBoxCoder", code_size=9),
            loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                          alpha=0.25, loss_weight=1.0),
            loss_bbox=dict(type="SmoothL1Loss", beta=1.0 / 9.0,
                           loss_weight=1.0),
            loss_dir=dict(type="CrossEntropyLoss", use_sigmoid=False,
                          loss_weight=0.2)),
        train_cfg=dict(pts=dict(
            assigner=dict(pos_iou_thr=0.6, neg_iou_thr=0.3,
                          min_pos_iou=0.3),
            code_weight=[1.0] * 7 + [0.2, 0.2])),
        test_cfg=dict(pts=dict(nms_pre=64, nms_thr=0.2, score_thr=0.05,
                               max_num=32)),
    )


def tiny_batch(b=2, p=512, g=4, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-8, 8, size=(b, p, 5)).astype(np.float32)
    pts[..., 2] = rng.uniform(-3, 1, size=(b, p))
    mask = rng.uniform(size=(b, p)) > 0.1
    boxes = np.zeros((b, g, 9), np.float32)
    boxes[..., :2] = rng.uniform(-6, 6, size=(b, g, 2))
    boxes[..., 2] = -1.8
    boxes[..., 3:6] = rng.uniform(0.5, 4, size=(b, g, 3))
    boxes[..., 6] = rng.uniform(-np.pi, np.pi, size=(b, g))
    labels = rng.integers(0, 3, size=(b, g))
    gt_mask = np.ones((b, g), bool)
    gt_mask[:, -1] = False  # exercise padded GTs
    return dict(points=jnp.asarray(pts), points_mask=jnp.asarray(mask),
                gt_bboxes_3d=jnp.asarray(boxes),
                gt_labels_3d=jnp.asarray(labels),
                gt_mask=jnp.asarray(gt_mask))


@pytest.fixture(scope="module")
def model_and_vars():
    model = build_detector(tiny_pointpillars_cfg())
    batch = tiny_batch()
    variables = jax.jit(
        lambda r, b: model.init(r, b, train=False, mode="feats"))(
            jax.random.PRNGKey(0), batch)
    return model, variables, batch


def test_forward_feats(model_and_vars):
    model, variables, batch = model_and_vars
    preds = jax.jit(
        lambda v, b: model.apply(v, b, train=False, mode="feats"))(
            variables, batch)
    assert len(preds) == 1  # one concat SECONDFPN level
    cls, reg, dirp = preds[0]
    # 32-grid, first SECOND stride 2 -> 16x16 head map
    assert cls.shape == (2, 16, 16, 6 * 3)
    assert reg.shape == (2, 16, 16, 6 * 9)
    assert dirp.shape == (2, 16, 16, 6 * 2)


def test_loss_finite(model_and_vars):
    model, variables, batch = model_and_vars
    losses, mutated = jax.jit(
        lambda v, b: model.apply(v, b, train=True, mode="loss",
                                 mutable=["batch_stats"]))(variables, batch)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses["loss_cls"]) > 0
    assert "batch_stats" in mutated


def test_loss_grad_flows(model_and_vars):
    model, variables, batch = model_and_vars

    def loss_fn(params):
        losses, _ = model.apply(
            {**variables, "params": params}, batch, train=True,
            mode="loss", mutable=["batch_stats"])
        return sum(jnp.asarray(v) for v in losses.values())

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # at least some parameters must receive nonzero grad
    total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    assert total > 0


def test_predict(model_and_vars):
    model, variables, batch = model_and_vars
    out = jax.jit(
        lambda v, b: model.apply(v, b, train=False, mode="predict"))(
            variables, batch)
    assert out["bboxes"].shape == (2, 32, 9)
    assert out["scores"].shape == (2, 32)
    assert out["labels"].shape == (2, 32)
    assert out["mask"].dtype == jnp.bool_


def test_predict_finite(model_and_vars):
    model, variables, batch = model_and_vars
    out = jax.jit(
        lambda v, b: model.apply(v, b, train=False, mode="predict"))(
            variables, batch)
    assert np.isfinite(np.asarray(out["bboxes"])).all()
