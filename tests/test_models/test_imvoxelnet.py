"""ImVoxelNet (image -> voxel volume -> BEV detection) smoke test."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isfusion_tpu.models import build_detector

H, W = 48, 64
PCR = [-8, -8, -3, 8, 8, 1]


def tiny_cfg():
    return dict(
        type="ImVoxelNet",
        backbone=dict(type="ResNet", depth=18, base_channels=8,
                      out_indices=(2,)),
        neck=dict(type="FPN", in_channels=[32], out_channels=16,
                  num_outs=1),
        neck_3d=dict(type="OutdoorImVoxelNeck", in_channels=16,
                     out_channels=16),
        n_voxels=(16, 16, 4),
        voxel_size=(1.0, 1.0, 1.0),
        point_cloud_range=PCR,
        bbox_head=dict(
            type="Anchor3DHead", num_classes=1, in_channels=16,
            feat_channels=16,
            anchor_generator=dict(
                type="AlignedAnchor3DRangeGenerator",
                ranges=[[-8, -8, -1.8, 8, 8, -1.8]],
                sizes=[[1.9, 4.5, 1.7]], rotations=[0, 1.57],
                reshape_out=True),
            bbox_coder=dict(type="DeltaXYZWLHRBBoxCoder", code_size=7),
            loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                          alpha=0.25, loss_weight=1.0),
            loss_bbox=dict(type="SmoothL1Loss", beta=1.0 / 9.0,
                           loss_weight=1.0),
            loss_dir=dict(type="CrossEntropyLoss", loss_weight=0.2)),
        train_cfg=dict(assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.3,
                                     min_pos_iou=0.3),
                       code_weight=[1.0] * 7),
        test_cfg=dict(nms_pre=32, nms_thr=0.3, score_thr=0.0, max_num=8),
    )


@pytest.mark.slow
def test_imvoxelnet_e2e():
    rng = np.random.default_rng(0)
    model = build_detector(tiny_cfg())
    cam2img = np.array([[40, 0, W / 2, 0], [0, 40, H / 2, 0],
                        [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    boxes = np.zeros((2, 2, 7), np.float32)
    boxes[..., :2] = rng.uniform(-6, 6, (2, 2, 2))
    boxes[..., 2] = -1.8
    boxes[..., 3:6] = rng.uniform(1, 4, (2, 2, 3))
    batch = dict(
        img=jnp.asarray(rng.uniform(size=(2, H, W, 3)).astype(np.float32)),
        cam2img=jnp.asarray(np.broadcast_to(cam2img, (2, 4, 4)).copy()),
        gt_bboxes_3d=jnp.asarray(boxes),
        gt_labels_3d=jnp.zeros((2, 2), jnp.int32),
        gt_mask=jnp.ones((2, 2), bool))
    variables = model.init(jax.random.PRNGKey(0), batch, train=False,
                           mode="feats")
    losses, _ = model.apply(variables, batch, train=True, mode="loss",
                            mutable=["batch_stats"])
    assert all(np.isfinite(float(v)) for v in losses.values())
    out = model.apply(variables, batch, train=False, mode="predict")
    assert out["bboxes"].shape[0] == 2
    assert np.isfinite(np.asarray(out["bboxes"])).all()
