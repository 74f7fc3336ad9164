"""CenterPoint (dynamic voxelization + SparseEncoder + CenterHead)
end-to-end forward/loss/decode on tiny shapes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isfusion_tpu.models import build_detector

PCR = [-8, -8, -5, 8, 8, 3]
VOXEL = [0.25, 0.25, 0.2]


def tiny_centerpoint_cfg():
    return dict(
        type="DynamicCenterPoint",
        pts_voxel_layer=dict(
            max_num_points=-1, point_cloud_range=PCR, voxel_size=VOXEL,
            max_voxels=512),
        pts_voxel_encoder=dict(
            type="DynamicVFE", in_channels=5, feat_channels=[16, 16],
            with_cluster_center=True, with_voxel_center=True,
            voxel_size=VOXEL, point_cloud_range=PCR,
            norm_cfg=dict(type="BN1d", eps=1e-3, momentum=0.01)),
        pts_middle_encoder=dict(
            type="SparseEncoder", in_channels=16,
            sparse_shape=[40, 64, 64], base_channels=8, output_channels=16,
            encoder_channels=((8,), (16, 16), (16, 16), (16, 16)),
            encoder_paddings=((1,), (1, 1), (1, 1), ((0, 1, 1), 1))),
        pts_backbone=dict(
            type="SECOND", in_channels=32, out_channels=[16, 32],
            layer_nums=[1, 1], layer_strides=[1, 2],
            norm_cfg=dict(type="BN", eps=1e-3, momentum=0.01)),
        pts_neck=dict(
            type="SECONDFPN", in_channels=[16, 32], out_channels=[16, 16],
            upsample_strides=[1, 2],
            norm_cfg=dict(type="BN", eps=1e-3, momentum=0.01)),
        pts_bbox_head=dict(
            type="CenterHead", in_channels=32,
            tasks=[dict(num_class=1, class_names=["car"]),
                   dict(num_class=2, class_names=["pedestrian", "cyclist"])],
            common_heads=dict(reg=(2, 2), height=(1, 2), dim=(3, 2),
                              rot=(2, 2), vel=(2, 2)),
            share_conv_channel=16,
            bbox_coder=dict(
                type="CenterPointBBoxCoder", pc_range=PCR,
                out_size_factor=8, voxel_size=VOXEL[:2],
                post_center_range=[-10, -10, -6, 10, 10, 4],
                max_num=16, score_threshold=0.0, code_size=9),
            separate_head=dict(init_bias=-2.19, final_kernel=3),
            norm_bbox=True),
        train_cfg=dict(pts=dict(
            point_cloud_range=PCR, voxel_size=VOXEL, out_size_factor=8,
            gaussian_overlap=0.1, min_radius=2, max_objs=100,
            code_weights=[1.0] * 8 + [0.2, 0.2])),
        test_cfg=dict(pts=dict(
            nms_type="circle", min_radius=[4, 0.5], post_max_size=16,
            post_center_limit_range=[-10, -10, -6, 10, 10, 4],
            score_threshold=0.0)),
    )


def tiny_batch(b=2, p=512, g=6, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-8, 8, size=(b, p, 5)).astype(np.float32)
    pts[..., 2] = rng.uniform(-4, 2, size=(b, p))
    mask = rng.uniform(size=(b, p)) > 0.1
    boxes = np.zeros((b, g, 9), np.float32)
    boxes[..., :2] = rng.uniform(-6, 6, size=(b, g, 2))
    boxes[..., 2] = -1.5
    boxes[..., 3:6] = rng.uniform(0.5, 4, size=(b, g, 3))
    boxes[..., 6] = rng.uniform(-np.pi, np.pi, size=(b, g))
    boxes[..., 7:9] = rng.uniform(-1, 1, size=(b, g, 2))
    labels = rng.integers(0, 3, size=(b, g))
    gt_mask = np.ones((b, g), bool)
    gt_mask[:, -1] = False
    return dict(points=jnp.asarray(pts), points_mask=jnp.asarray(mask),
                gt_bboxes_3d=jnp.asarray(boxes),
                gt_labels_3d=jnp.asarray(labels),
                gt_mask=jnp.asarray(gt_mask))


@pytest.fixture(scope="module")
def model_and_vars():
    model = build_detector(tiny_centerpoint_cfg())
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
    assert len(preds) == 1          # one FPN level
    assert len(preds[0]) == 2       # two tasks
    t0 = preds[0][0]
    assert t0["heatmap"].shape == (2, 8, 8, 1)
    assert preds[0][1]["heatmap"].shape == (2, 8, 8, 2)
    for k, c in [("reg", 2), ("height", 1), ("dim", 3), ("rot", 2),
                 ("vel", 2)]:
        assert t0[k].shape == (2, 8, 8, c), k


def test_loss_finite_and_positive(model_and_vars):
    model, variables, batch = model_and_vars
    losses, _ = jax.jit(
        lambda v, b: model.apply(v, b, train=True, mode="loss",
                                 mutable=["batch_stats"]))(variables, batch)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses["task0.loss_heatmap"]) > 0
    assert float(losses["task1.loss_bbox"]) >= 0


@pytest.mark.slow
def test_grad_flows_into_sparse_encoder(model_and_vars):
    model, variables, batch = model_and_vars

    def loss_fn(params):
        losses, _ = model.apply(
            {**variables, "params": params}, batch, train=True,
            mode="loss", mutable=["batch_stats"])
        return sum(jnp.asarray(v) for v in losses.values())

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    sparse_total = sum(
        float(jnp.sum(jnp.abs(g)))
        for kp, g in flat if "middle_encoder" in jax.tree_util.keystr(kp))
    assert np.isfinite(sparse_total) and sparse_total > 0
    assert all(np.isfinite(np.asarray(g)).all() for _, g in flat)


def test_predict_shapes_and_finite(model_and_vars):
    model, variables, batch = model_and_vars
    out = jax.jit(
        lambda v, b: model.apply(v, b, train=False, mode="predict"))(
            variables, batch)
    assert out["bboxes"].shape == (2, 32, 9)  # 2 tasks x post_max 16
    assert out["scores"].shape == (2, 32)
    assert out["labels"].shape == (2, 32)
    assert np.isfinite(np.asarray(out["bboxes"])).all()
    # labels from task 1 must be offset into global label space
    labels = np.asarray(out["labels"])
    assert labels.min() >= 0 and labels.max() <= 2
