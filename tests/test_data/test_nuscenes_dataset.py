"""nuScenes dataset + pipeline + evaluator on synthetic fixtures (pattern
of reference tests/test_data/test_datasets/*: tiny info pkls, assertions
on getitem outputs and evaluate() numbers)."""
import os
import pickle

import numpy as np
import pytest

from isfusion_tpu.datasets import (CBGSDataset, DataLoader, NuScenesDataset,
                                   build_dataset)
from isfusion_tpu.core.evaluation import nuscenes_style_eval

CLASSES = ("car", "pedestrian")


def make_fixture(tmpdir, num_samples=4, num_points=256):
    rng = np.random.default_rng(0)
    infos = []
    for i in range(num_samples):
        pts = rng.uniform(-20, 20, size=(num_points, 5)).astype(np.float32)
        pts_path = os.path.join(tmpdir, f"pts_{i}.npy")
        np.save(pts_path, pts)
        n_gt = 3
        boxes = np.zeros((n_gt, 7), np.float32)
        boxes[:, :2] = rng.uniform(-15, 15, (n_gt, 2))
        boxes[:, 2] = -1.0
        boxes[:, 3:6] = rng.uniform(0.5, 4, (n_gt, 3))
        boxes[:, 6] = rng.uniform(-np.pi, np.pi, n_gt)
        names = np.array(["car", "car", "pedestrian"])[:n_gt]
        infos.append(dict(
            token=f"tok{i}",
            lidar_path=pts_path,
            sweeps=[],
            timestamp=i * 1e6,
            gt_boxes=boxes,
            gt_names=names,
            gt_velocity=rng.uniform(-1, 1, (n_gt, 2)).astype(np.float32),
            num_lidar_pts=np.full(n_gt, 10),
            valid_flag=np.ones(n_gt, bool),
            lidar2ego_rotation=[1, 0, 0, 0],
            lidar2ego_translation=[0, 0, 1.8],
            ego2global_rotation=[np.cos(0.3), 0, 0, np.sin(0.3)],
            ego2global_translation=[100.0 + i, 50.0, 0.0],
        ))
    ann = os.path.join(tmpdir, "infos.pkl")
    with open(ann, "wb") as f:
        pickle.dump(dict(infos=infos, metadata=dict(version="v1.0-mini")),
                    f)
    return ann


def train_pipeline():
    return [
        dict(type="LoadPointsFromFile", coord_type="LIDAR", load_dim=5,
             use_dim=[0, 1, 2, 3, 4]),
        dict(type="LoadAnnotations3D", with_bbox_3d=True,
             with_label_3d=True),
        dict(type="GlobalRotScaleTransV2", resize_lim=(0.9, 1.1),
             rot_lim=(-0.5, 0.5), trans_lim=0.2, is_train=True),
        dict(type="RandomFlip3DV2"),
        dict(type="PointsRangeFilter",
             point_cloud_range=[-20, -20, -5, 20, 20, 3]),
        dict(type="ObjectRangeFilter",
             point_cloud_range=[-20, -20, -5, 20, 20, 3]),
        dict(type="PointShuffle"),
        dict(type="DefaultFormatBundle3D", max_points=512, max_gt=8),
        dict(type="Collect3DV2",
             keys=["points", "gt_bboxes_3d", "gt_labels_3d"]),
    ]


@pytest.fixture()
def dataset(tmp_path):
    ann = make_fixture(str(tmp_path))
    return NuScenesDataset(
        ann_file=ann, pipeline=train_pipeline(), classes=CLASSES,
        data_root=str(tmp_path), test_mode=False, filter_empty_gt=True)


def test_getitem_contract(dataset):
    sample = dataset[0]
    assert sample["points"].shape == (512, 5)
    assert sample["points_mask"].dtype == bool
    assert sample["gt_bboxes_3d"].shape == (8, 9)
    assert sample["gt_labels_3d"].shape == (8,)
    assert sample["gt_mask"].sum() > 0
    assert "img_metas" in sample and "token" in sample["img_metas"]
    # lidar_aug_matrix must reflect the applied augmentation
    assert "lidar_aug_matrix" in sample
    assert sample["lidar_aug_matrix"].shape == (4, 4)


def test_epoch_propagation(dataset):
    dataset.set_epoch(7)
    assert dataset.epoch == 7


def test_dataloader_batching(dataset):
    loader = DataLoader(dataset, batch_size=2, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == len(loader) == 2
    b = batches[0]
    assert b["points"].shape == (2, 512, 5)
    assert b["gt_bboxes_3d"].shape == (2, 8, 9)
    assert len(b["img_metas"]) == 2


def test_cbgs_wrapper(dataset):
    cbgs = CBGSDataset(dataset)
    assert len(cbgs) > 0
    _ = cbgs[0]


def test_format_and_global_frame(dataset, tmp_path):
    n = len(dataset)
    results = []
    for i in range(n):
        ann = dataset.get_ann_info(i)
        boxes = ann["gt_bboxes_3d"].numpy()
        results.append(dict(
            bboxes=boxes, scores=np.linspace(0.9, 0.5, len(boxes)),
            labels=ann["gt_labels_3d"],
            mask=np.ones(len(boxes), bool)))
    path = dataset._format_bbox(results, str(tmp_path / "out"))
    import json
    sub = json.load(open(path))
    assert set(sub["results"].keys()) == {f"tok{i}" for i in range(n)}
    first = sub["results"]["tok0"][0]
    assert {"translation", "size", "rotation", "velocity",
            "detection_name", "detection_score",
            "attribute_name"} <= set(first)
    # global translation should include the ego2global offset (~100 m)
    assert abs(first["translation"][0]) > 50


def test_global_yaw_roundtrip_matches_converter(dataset):
    """Contract between tools/data_converter/nuscenes_converter.py and
    `_box_to_global`: the converter stores lidar yaw = -phi - pi/2 (phi =
    CCW heading in lidar, the reference's `-rots - pi/2` at
    `nuscenes_converter.py:299`); the formatter must recover the global
    CCW heading exactly, for arbitrary ego/lidar z-rotations."""
    rng = np.random.default_rng(4)
    for _ in range(10):
        th_l2e = rng.uniform(-np.pi, np.pi)
        th_e2g = rng.uniform(-np.pi, np.pi)
        phi_g = rng.uniform(-np.pi, np.pi)
        info = dict(
            lidar2ego_rotation=[np.cos(th_l2e / 2), 0, 0,
                                np.sin(th_l2e / 2)],
            lidar2ego_translation=[1.0, -0.5, 1.8],
            ego2global_rotation=[np.cos(th_e2g / 2), 0, 0,
                                 np.sin(th_e2g / 2)],
            ego2global_translation=[100.0, 50.0, 0.0])
        # converter math: global heading -> lidar heading -> stored yaw
        phi_l = phi_g - th_l2e - th_e2g
        stored = -phi_l - np.pi / 2
        box = np.array([5.0, 2.0, -1.0, 1.9, 4.6, 1.7, stored, 0.1, 0.2],
                       np.float32)
        _, _, yaw_g, _ = dataset._box_to_global(info, box)
        d = (yaw_g - phi_g + np.pi) % (2 * np.pi) - np.pi
        assert abs(d) < 1e-5


def test_internal_eval_perfect_predictions(dataset):
    results = []
    for i in range(len(dataset)):
        ann = dataset.get_ann_info(i)
        results.append(dict(
            bboxes=ann["gt_bboxes_3d"].numpy(),
            scores=np.full(len(ann["gt_labels_3d"]), 0.9),
            labels=ann["gt_labels_3d"],
            mask=np.ones(len(ann["gt_labels_3d"]), bool)))
    metrics = dataset.evaluate(results)
    assert metrics["mAP"] == pytest.approx(1.0, abs=1e-6)
    assert metrics["NDS"] > 0.9


def test_internal_eval_ranks_noise_below_perfect(dataset):
    rng = np.random.default_rng(3)
    noisy = []
    for i in range(len(dataset)):
        ann = dataset.get_ann_info(i)
        b = ann["gt_bboxes_3d"].numpy().copy()
        b[:, :2] += rng.normal(0, 1.5, size=b[:, :2].shape)
        noisy.append(dict(
            bboxes=b, scores=np.full(len(b), 0.9),
            labels=ann["gt_labels_3d"], mask=np.ones(len(b), bool)))
    m_noisy = dataset.evaluate(noisy)
    assert 0.0 < m_noisy["mAP"] < 1.0


def test_eval_loader_keeps_partial_batches(tmp_path):
    """Regression: batch > len(dataset) with drop_last silently produced
    ZERO eval batches (metrics over empty results)."""
    ann = make_fixture(str(tmp_path), num_samples=2)
    ds = NuScenesDataset(ann_file=ann, pipeline=train_pipeline(),
                         classes=CLASSES, data_root=str(tmp_path),
                         test_mode=False, filter_empty_gt=False)
    from isfusion_tpu.datasets import build_dataloader
    loader = build_dataloader(ds, samples_per_gpu=4, shuffle=False)
    batches = list(loader)
    assert sum(b["points"].shape[0] for b in batches) == 2
    # training loaders still drop ragged tails for static shapes
    tr = build_dataloader(ds, samples_per_gpu=4, shuffle=True)
    assert len(tr) == 0
