"""End-to-end runtime: config -> dataset -> train_model (2 epochs) ->
checkpoint -> single_device_test -> evaluate. (Pattern of reference
tests/test_runtime/test_apis.py, but actually exercising training.)"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from test_data.test_nuscenes_dataset import make_fixture  # noqa: E402

from isfusion_tpu.config import Config  # noqa: E402
from isfusion_tpu.apis import train_model  # noqa: E402
from isfusion_tpu.apis.test import single_device_test  # noqa: E402
from isfusion_tpu.datasets import build_dataset, build_dataloader  # noqa: E402
from isfusion_tpu.models import build_detector  # noqa: E402

PCR = [-20, -20, -5, 20, 20, 3]
VOXEL = [1.25, 1.25, 8]
CLASSES = ("car", "pedestrian")


def tiny_cfg(ann_file, tmpdir):
    pipeline = [
        dict(type="LoadPointsFromFile", coord_type="LIDAR", load_dim=5,
             use_dim=[0, 1, 2, 3, 4]),
        dict(type="LoadAnnotations3D"),
        dict(type="GlobalRotScaleTransV2", resize_lim=(0.95, 1.05),
             rot_lim=(-0.2, 0.2), trans_lim=0.1, is_train=True),
        dict(type="RandomFlip3DV2"),
        dict(type="PointsRangeFilter", point_cloud_range=PCR),
        dict(type="ObjectRangeFilter", point_cloud_range=PCR),
        dict(type="PointShuffle"),
        dict(type="DefaultFormatBundle3D", max_points=512, max_gt=8),
        dict(type="Collect3DV2",
             keys=["points", "gt_bboxes_3d", "gt_labels_3d"]),
    ]
    test_pipeline = [
        dict(type="LoadPointsFromFile", coord_type="LIDAR", load_dim=5,
             use_dim=[0, 1, 2, 3, 4]),
        dict(type="PointsRangeFilter", point_cloud_range=PCR),
        dict(type="DefaultFormatBundle3D", max_points=512, max_gt=8,
             with_label=False),
        dict(type="Collect3DV2", keys=["points"]),
    ]
    return Config(dict(
        model=dict(
            type="MVXFasterRCNN",
            pts_voxel_layer=dict(
                max_num_points=8, point_cloud_range=PCR, voxel_size=VOXEL,
                max_voxels=(128, 128)),
            pts_voxel_encoder=dict(
                type="HardVFE", in_channels=5, feat_channels=[16, 16],
                voxel_size=VOXEL, point_cloud_range=PCR),
            pts_middle_encoder=dict(
                type="PointPillarsScatter", in_channels=16,
                output_shape=[32, 32]),
            pts_backbone=dict(
                type="SECOND", in_channels=16, out_channels=[16, 32],
                layer_nums=[1, 1], layer_strides=[2, 2]),
            pts_neck=dict(
                type="SECONDFPN", in_channels=[16, 32],
                out_channels=[16, 16], upsample_strides=[1, 2]),
            pts_bbox_head=dict(
                type="Anchor3DHead", num_classes=2, in_channels=32,
                feat_channels=32,
                anchor_generator=dict(
                    type="AlignedAnchor3DRangeGenerator",
                    ranges=[[-20, -20, -1.8, 20, 20, -1.8]],
                    sizes=[[1.95, 4.6, 1.72], [0.66, 0.72, 1.75]],
                    custom_values=[0, 0], rotations=[0, 1.57],
                    reshape_out=True),
                bbox_coder=dict(type="DeltaXYZWLHRBBoxCoder", code_size=9),
                loss_cls=dict(type="FocalLoss", use_sigmoid=True,
                              gamma=2.0, alpha=0.25, loss_weight=1.0),
                loss_bbox=dict(type="SmoothL1Loss", beta=1.0 / 9.0,
                               loss_weight=1.0),
                loss_dir=dict(type="CrossEntropyLoss", use_sigmoid=False,
                              loss_weight=0.2)),
            train_cfg=dict(pts=dict(
                assigner=dict(pos_iou_thr=0.6, neg_iou_thr=0.3,
                              min_pos_iou=0.3),
                code_weight=[1.0] * 7 + [0.2, 0.2])),
            test_cfg=dict(pts=dict(nms_pre=64, nms_thr=0.2, score_thr=0.0,
                                   max_num=16))),
        data=dict(
            samples_per_gpu=2, workers_per_gpu=1,
            train=dict(type="NuScenesDataset", ann_file=ann_file,
                       data_root=tmpdir, pipeline=pipeline,
                       classes=CLASSES),
            val=dict(type="NuScenesDataset", ann_file=ann_file,
                     data_root=tmpdir, pipeline=test_pipeline,
                     classes=CLASSES, test_mode=True)),
        optimizer=dict(type="AdamW", lr=1e-3, weight_decay=0.01),
        optimizer_config=dict(grad_clip=dict(max_norm=35.0)),
        lr_config=dict(policy="cyclic", target_ratio=(10, 1e-4),
                       cyclic_times=1, step_ratio_up=0.4),
        total_epochs=2,
        checkpoint_config=dict(interval=1),
        log_config=dict(interval=1),
        seed=0,
    ))


def test_train_eval_roundtrip(tmp_path):
    ann = make_fixture(str(tmp_path), num_samples=4)
    cfg = tiny_cfg(ann, str(tmp_path))
    model = build_detector(dict(cfg.model))
    dataset = build_dataset(cfg.data["train"])
    work_dir = str(tmp_path / "work")

    state = train_model(model, dataset, cfg, work_dir=work_dir,
                        distributed=False)
    assert int(state.step) == 2 * 2  # 2 epochs x (4 samples / batch 2)
    assert os.path.isdir(work_dir)
    log = open(os.path.join(work_dir, "train_log.jsonl")).read()
    assert "loss" in log
    # checkpoint written each epoch
    assert any(os.path.isdir(os.path.join(work_dir, d))
               for d in os.listdir(work_dir))

    # eval path: inference over the val split + internal nuScenes metrics
    val = build_dataset(cfg.data["val"])
    loader = build_dataloader(val, samples_per_gpu=2, shuffle=False)
    results = single_device_test(model, state, loader)
    assert len(results) == 4
    metrics = val.evaluate(results)
    assert "mAP" in metrics and 0.0 <= metrics["mAP"] <= 1.0

    # resume restores epoch + optimizer step
    state2 = train_model(model, dataset, cfg, work_dir=work_dir,
                         resume_from=work_dir, distributed=False)
    assert int(state2.step) >= int(state.step)
