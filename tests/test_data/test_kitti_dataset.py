"""KITTI dataset + evaluator on synthetic fixtures."""
import os
import pickle

import numpy as np
import pytest

from isfusion_tpu.datasets import KittiDataset
from isfusion_tpu.core.evaluation.kitti_eval import kitti_eval


def make_kitti_fixture(tmpdir, num_samples=3):
    rng = np.random.default_rng(0)
    infos = []
    rect = np.eye(4, dtype=np.float32)
    trv2c = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0],
                      [0, 0, 0, 1]], np.float32)
    p2 = np.array([[700, 0, 600, 0], [0, 700, 180, 0],
                   [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    for i in range(num_samples):
        pts = rng.uniform(0, 40, size=(512, 4)).astype(np.float32)
        path = os.path.join(tmpdir, f"kpts_{i}.npy")
        np.save(path, pts)
        n = 3
        # camera frame: x right, y down, z forward
        loc = np.stack([rng.uniform(-10, 10, n),
                        rng.uniform(1.2, 1.8, n),
                        rng.uniform(5, 40, n)], -1).astype(np.float32)
        dims = rng.uniform(1, 4, (n, 3)).astype(np.float32)
        rots = rng.uniform(-np.pi, np.pi, n).astype(np.float32)
        infos.append(dict(
            point_cloud=dict(idx=i, velodyne_path=path),
            calib=dict(R0_rect=rect, Tr_velo_to_cam=trv2c, P2=p2),
            annos=dict(
                name=np.array(["Car", "Pedestrian", "DontCare"])[:n],
                location=loc, dimensions=dims, rotation_y=rots,
                bbox=np.tile([100, 100, 200, 160], (n, 1)).astype(
                    np.float32),
                occluded=np.zeros(n), truncated=np.zeros(n))))
    ann = os.path.join(tmpdir, "kitti_infos.pkl")
    with open(ann, "wb") as f:
        pickle.dump(infos, f)
    return ann


@pytest.fixture()
def dataset(tmp_path):
    ann = make_kitti_fixture(str(tmp_path))
    return KittiDataset(ann_file=ann, data_root=str(tmp_path),
                        pipeline=None, test_mode=True)


def test_ann_conversion_to_lidar(dataset):
    ann = dataset.get_ann_info(0)
    boxes = ann["gt_bboxes_3d"].numpy()
    assert boxes.shape[-1] == 7
    # DontCare dropped
    assert len(boxes) == 2
    # camera z (depth 5..40) becomes lidar x
    assert (boxes[:, 0] > 0).all()
    assert "lidar2img" in dataset.get_data_info(0)


def test_kitti_eval_perfect(dataset):
    results = []
    for i in range(len(dataset)):
        ann = dataset.get_ann_info(i)
        results.append(dict(boxes=ann["gt_bboxes_3d"].numpy(),
                            scores=np.full(2, 0.9),
                            labels=ann["gt_labels_3d"]))
    metrics = dataset.evaluate(results)
    assert metrics["car_3d_moderate"] == pytest.approx(1.0, abs=0.03)
    assert metrics["mAP_3d_moderate"] > 0.9


def test_kitti_eval_misses_score_zero(dataset):
    results = []
    for i in range(len(dataset)):
        ann = dataset.get_ann_info(i)
        b = ann["gt_bboxes_3d"].numpy().copy()
        b[:, :2] += 10.0  # far off
        results.append(dict(boxes=b, scores=np.full(2, 0.9),
                            labels=ann["gt_labels_3d"]))
    metrics = dataset.evaluate(results)
    assert metrics["mAP_3d_moderate"] < 0.1
