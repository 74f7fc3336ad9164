"""PartA2 (SparseUNet + part-aware ROI) end-to-end on tiny shapes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isfusion_tpu.models import build_detector

PCR = [-8, -8, -5, 8, 8, 3]
VOXEL = [0.5, 0.5, 0.2]


def tiny_parta2_cfg():
    return dict(
        type="PartA2",
        voxel_layer=dict(max_num_points=5, point_cloud_range=PCR,
                         voxel_size=VOXEL, max_voxels=(512, 512)),
        voxel_encoder=dict(type="HardSimpleVFE", num_features=4),
        middle_encoder=dict(
            type="SparseUNet", in_channels=4, sparse_shape=[40, 32, 32],
            base_channels=8, output_channels=16,
            encoder_channels=((8,), (16, 16), (16, 16), (16, 16)),
            encoder_paddings=((1,), (1, 1), (1, 1), ((0, 1, 1), 1)),
            decoder_channels=((16, 16, 16), (16, 16, 16), (16, 16, 8),
                              (8, 8, 8)),
            decoder_paddings=((1, 0), (1, 0), (0, 0), (0, 1))),
        backbone=dict(type="SECOND", in_channels=32,
                      out_channels=[16, 32], layer_nums=[1, 1],
                      layer_strides=[1, 2]),
        neck=dict(type="SECONDFPN", in_channels=[16, 32],
                  out_channels=[16, 16], upsample_strides=[1, 2]),
        rpn_head=dict(
            type="Anchor3DHead", num_classes=2, in_channels=32,
            feat_channels=32,
            anchor_generator=dict(
                type="AlignedAnchor3DRangeGenerator",
                ranges=[[-8, -8, -1.8, 8, 8, -1.8]],
                sizes=[[1.9, 4.5, 1.7], [0.6, 0.8, 1.7]],
                rotations=[0, 1.57], reshape_out=True),
            bbox_coder=dict(type="DeltaXYZWLHRBBoxCoder", code_size=7),
            loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                          alpha=0.25, loss_weight=1.0),
            loss_bbox=dict(type="SmoothL1Loss", beta=1.0 / 9.0,
                           loss_weight=1.0),
            loss_dir=dict(type="CrossEntropyLoss", loss_weight=0.2)),
        roi_head=dict(type="PartAggregationROIHead", grid_size=4,
                      shared_channels=(32, 32)),
        num_proposals=16,
        train_cfg=dict(rpn=dict(
            assigner=dict(pos_iou_thr=0.6, neg_iou_thr=0.3,
                          min_pos_iou=0.3),
            code_weight=[1.0] * 7)),
        test_cfg=dict(rpn=dict(nms_pre=32, nms_thr=0.3, score_thr=0.0,
                               max_num=16)),
    )


def tiny_batch(b=2, p=512, g=3, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-7, 7, size=(b, p, 4)).astype(np.float32)
    pts[..., 2] = rng.uniform(-4, 2, (b, p))
    mask = rng.uniform(size=(b, p)) > 0.1
    boxes = np.zeros((b, g, 7), np.float32)
    boxes[..., :2] = rng.uniform(-6, 6, (b, g, 2))
    boxes[..., 2] = -1.8
    boxes[..., 3:6] = rng.uniform(1, 4, (b, g, 3))
    boxes[..., 6] = rng.uniform(-np.pi, np.pi, (b, g))
    labels = rng.integers(0, 2, (b, g))
    return dict(points=jnp.asarray(pts), points_mask=jnp.asarray(mask),
                gt_bboxes_3d=jnp.asarray(boxes),
                gt_labels_3d=jnp.asarray(labels),
                gt_mask=jnp.ones((b, g), bool))


@pytest.fixture(scope="module")
def model_and_vars():
    model = build_detector(tiny_parta2_cfg())
    batch = tiny_batch()
    variables = jax.jit(
        lambda r, b: model.init(r, b, train=False, mode="feats"))(
            jax.random.PRNGKey(0), batch)
    return model, variables, batch


@pytest.mark.slow
def test_loss(model_and_vars):
    model, variables, batch = model_and_vars
    losses, _ = jax.jit(
        lambda v, b: model.apply(v, b, train=True, mode="loss",
                                 mutable=["batch_stats"]))(variables, batch)
    for k in ("rpn_loss_cls", "rpn_loss_bbox", "loss_roi_cls",
              "loss_roi_reg", "loss_seg", "loss_part"):
        assert k in losses and np.isfinite(float(losses[k])), k


@pytest.mark.slow
def test_grads(model_and_vars):
    model, variables, batch = model_and_vars

    def loss_fn(params):
        out, _ = model.apply({**variables, "params": params}, batch,
                             train=True, mode="loss",
                             mutable=["batch_stats"])
        return sum(jnp.asarray(v) for k, v in out.items() if "loss" in k)

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    assert all(np.isfinite(np.asarray(g)).all() for _, g in flat)
    unet_total = sum(float(jnp.sum(jnp.abs(g))) for kp, g in flat
                     if "middle_encoder" in jax.tree_util.keystr(kp))
    assert unet_total > 0


@pytest.mark.slow
def test_predict(model_and_vars):
    model, variables, batch = model_and_vars
    out = jax.jit(
        lambda v, b: model.apply(v, b, train=False, mode="predict"))(
            variables, batch)
    assert out["bboxes"].shape == (2, 16, 7)
    assert np.isfinite(np.asarray(out["bboxes"])).all()
