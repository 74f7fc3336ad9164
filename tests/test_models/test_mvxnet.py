"""MVX-Net point-wise fusion: projection correctness + end-to-end detector
with an image branch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isfusion_tpu.models import build_detector
from isfusion_tpu.ops.projection import (project_points_to_cameras,
                                         uv_valid_mask)

H, W = 32, 48


def pinhole_lidar2img(f=24.0):
    """Camera looking along +x (lidar frame): cam_x=-y, cam_y=-z, cam_z=x."""
    K = np.array([[f, 0, W / 2, 0],
                  [0, f, H / 2, 0],
                  [0, 0, 1, 0],
                  [0, 0, 0, 1]], np.float32)
    R = np.array([[0, -1, 0, 0],
                  [0, 0, -1, 0],
                  [1, 0, 0, 0],
                  [0, 0, 0, 1]], np.float32)
    return K @ R


def test_projection_center_point():
    l2i = jnp.asarray(pinhole_lidar2img())[None]  # one camera
    pts = jnp.asarray([[5.0, 0.0, 0.0],    # straight ahead -> image center
                       [-5.0, 0.0, 0.0]])  # behind camera
    uv, depth, front = project_points_to_cameras(pts, l2i)
    np.testing.assert_allclose(np.asarray(uv[0, 0]), [W / 2, H / 2],
                               atol=1e-4)
    assert bool(front[0, 0]) and not bool(front[0, 1])
    assert float(depth[0, 0]) == pytest.approx(5.0)


def test_projection_undo_lidar_aug():
    l2i = jnp.asarray(pinhole_lidar2img())[None]
    # 90-deg rotation about z as the lidar aug: augmented points must be
    # un-rotated before projection.
    th = np.pi / 2
    aug = np.eye(4, dtype=np.float32)
    aug[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
    p_orig = jnp.asarray([[5.0, 1.0, 0.5]])
    p_aug = p_orig @ jnp.asarray(aug[:3, :3]).T
    uv0, _, _ = project_points_to_cameras(p_orig, l2i)
    uv1, _, _ = project_points_to_cameras(p_aug, l2i,
                                          lidar_aug_matrix=jnp.asarray(aug))
    np.testing.assert_allclose(np.asarray(uv0), np.asarray(uv1), atol=1e-3)


def tiny_mvxnet_cfg():
    pcr = [-8, -8, -5, 8, 8, 3]
    vs = [0.5, 0.5, 8]
    return dict(
        type="DynamicMVXFasterRCNN",
        img_backbone=dict(
            type="SECOND", in_channels=3, out_channels=[8, 16],
            layer_nums=[1, 1], layer_strides=[2, 2],
            norm_cfg=dict(type="BN", eps=1e-3, momentum=0.01)),
        img_neck=dict(
            type="SECONDFPN", in_channels=[8, 16], out_channels=[8, 8],
            upsample_strides=[1, 2],
            norm_cfg=dict(type="BN", eps=1e-3, momentum=0.01)),
        pts_voxel_layer=dict(
            max_num_points=-1, point_cloud_range=pcr, voxel_size=vs,
            max_voxels=256),
        pts_voxel_encoder=dict(
            type="DynamicVFE", in_channels=4, feat_channels=[16, 16],
            with_cluster_center=True, with_voxel_center=True,
            voxel_size=vs, point_cloud_range=pcr,
            fusion_layer=dict(
                type="PointFusion", img_channels=16, pts_channels=16,
                mid_channels=16, out_channels=8, img_levels=[0],
                activate_out=True, fuse_out=False)),
        pts_middle_encoder=dict(
            type="PointPillarsScatter", in_channels=16,
            output_shape=[32, 32]),
        pts_backbone=dict(
            type="SECOND", in_channels=16, out_channels=[16, 32],
            layer_nums=[1, 1], layer_strides=[2, 2],
            norm_cfg=dict(type="BN", eps=1e-3, momentum=0.01)),
        pts_neck=dict(
            type="SECONDFPN", in_channels=[16, 32], out_channels=[16, 16],
            upsample_strides=[1, 2],
            norm_cfg=dict(type="BN", eps=1e-3, momentum=0.01)),
        pts_bbox_head=dict(
            type="Anchor3DHead", num_classes=1, in_channels=32,
            feat_channels=32,
            anchor_generator=dict(
                type="AlignedAnchor3DRangeGenerator",
                ranges=[[-8, -8, -1.8, 8, 8, -1.8]],
                sizes=[[1.95, 4.6, 1.72]], rotations=[0, 1.57],
                reshape_out=True),
            bbox_coder=dict(type="DeltaXYZWLHRBBoxCoder", code_size=7),
            loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                          alpha=0.25, loss_weight=1.0),
            loss_bbox=dict(type="SmoothL1Loss", beta=1.0 / 9.0,
                           loss_weight=1.0),
            loss_dir=dict(type="CrossEntropyLoss", use_sigmoid=False,
                          loss_weight=0.2)),
        train_cfg=dict(pts=dict(
            assigner=dict(pos_iou_thr=0.6, neg_iou_thr=0.3,
                          min_pos_iou=0.3),
            code_weight=[1.0] * 7)),
        test_cfg=dict(pts=dict(nms_pre=64, nms_thr=0.2, score_thr=0.05,
                               max_num=16)),
    )


def tiny_batch(b=2, p=256, nv=2, g=3, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-7, 7, size=(b, p, 4)).astype(np.float32)
    pts[..., 2] = rng.uniform(-3, 1, size=(b, p))
    mask = rng.uniform(size=(b, p)) > 0.1
    img = rng.uniform(size=(b, nv, H, W, 3)).astype(np.float32)
    l2i = np.stack([pinhole_lidar2img()] * nv)
    l2i = np.broadcast_to(l2i, (b, nv, 4, 4)).copy()
    boxes = np.zeros((b, g, 7), np.float32)
    boxes[..., :2] = rng.uniform(-6, 6, size=(b, g, 2))
    boxes[..., 2] = -1.8
    boxes[..., 3:6] = rng.uniform(1, 4, size=(b, g, 3))
    labels = np.zeros((b, g), np.int64)
    return dict(points=jnp.asarray(pts), points_mask=jnp.asarray(mask),
                img=jnp.asarray(img), lidar2img=jnp.asarray(l2i),
                gt_bboxes_3d=jnp.asarray(boxes),
                gt_labels_3d=jnp.asarray(labels),
                gt_mask=jnp.ones((b, g), bool))


@pytest.fixture(scope="module")
def model_and_vars():
    model = build_detector(tiny_mvxnet_cfg())
    batch = tiny_batch()
    variables = jax.jit(
        lambda r, b: model.init(r, b, train=False, mode="feats"))(
            jax.random.PRNGKey(0), batch)
    return model, variables, batch


def test_loss_and_img_grad(model_and_vars):
    model, variables, batch = model_and_vars

    def loss_fn(params):
        losses, _ = model.apply(
            {**variables, "params": params}, batch, train=True,
            mode="loss", mutable=["batch_stats"])
        return sum(jnp.asarray(v) for v in losses.values())

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    # the image branch must receive gradient through the fusion layer
    img_total = sum(
        float(jnp.sum(jnp.abs(g))) for kp, g in flat
        if "img_backbone" in jax.tree_util.keystr(kp))
    assert img_total > 0


def test_predict(model_and_vars):
    model, variables, batch = model_and_vars
    out = jax.jit(
        lambda v, b: model.apply(v, b, train=False, mode="predict"))(
            variables, batch)
    assert out["bboxes"].shape[0] == 2
    assert np.isfinite(np.asarray(out["bboxes"])).all()
