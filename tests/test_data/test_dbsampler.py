"""MMDataBaseSamplerV2 GT-paste: sampling counts, collision avoidance,
point loading, epoch-scheduled wrapper."""
import os
import pickle

import numpy as np
import pytest

from isfusion_tpu.datasets.pipelines.dbsampler import MMDataBaseSamplerV2
from isfusion_tpu.datasets.pipelines.transforms_3d import ObjectSampleV2
from isfusion_tpu.core.bbox.structures import LiDARInstance3DBoxes
from isfusion_tpu.core.points import LiDARPoints


def make_db(tmpdir, n_per_class=8):
    rng = np.random.default_rng(0)
    db = {}
    for ci, name in enumerate(("car", "pedestrian")):
        infos = []
        for i in range(n_per_class):
            pts = rng.normal(scale=0.5, size=(24, 5)).astype(np.float32)
            fname = f"db_{name}_{i}.npy"
            np.save(os.path.join(tmpdir, fname), pts)
            box = np.array([20 + 6 * i, 10 * ci - 20, -1.5,
                            1.8, 4.2, 1.6, 0.3, 0, 0], np.float32)
            infos.append(dict(name=name, path=fname, box3d_lidar=box,
                              num_points_in_gt=24, difficulty=0))
        db[name] = infos
    path = os.path.join(tmpdir, "dbinfos.pkl")
    with open(path, "wb") as f:
        pickle.dump(db, f)
    return path


@pytest.fixture()
def sampler(tmp_path):
    info = make_db(str(tmp_path))
    return MMDataBaseSamplerV2(
        info_path=info, data_root=str(tmp_path), rate=1.0,
        prepare=dict(filter_by_min_points=dict(car=5, pedestrian=5)),
        classes=["car", "pedestrian"],
        sample_groups=dict(car=4, pedestrian=3))


def test_sample_counts_and_points(sampler):
    gt = np.zeros((1, 9), np.float32)
    gt[0, :3] = [-30, -30, -1.5]
    gt[0, 3:6] = [2, 4, 1.6]
    out = sampler.sample_all(gt, np.array([0]))
    assert out is not None
    # 4 cars requested minus 1 existing = 3; pedestrians 3
    labels = out["gt_labels_3d"]
    assert (labels == 0).sum() == 3
    assert (labels == 1).sum() == 3
    # object points shifted to their box centers
    assert len(out["points"]) == 6 * 24
    first_box = out["gt_bboxes_3d"][0]
    d = np.linalg.norm(out["points"][:24, :2] - first_box[:2], axis=1)
    assert d.mean() < 3.0


def test_collision_avoidance(sampler):
    # existing GT exactly on top of the db boxes -> those samples rejected
    gt = np.zeros((2, 9), np.float32)
    gt[0] = [20, -20, -1.5, 3, 6, 1.6, 0.3, 0, 0]
    gt[1] = [26, -20, -1.5, 3, 6, 1.6, 0.3, 0, 0]
    out = sampler.sample_all(gt, np.array([0, 0]))
    if out is not None:
        new = out["gt_bboxes_3d"]
        from isfusion_tpu.core.bbox.box_np_ops import box_collision_test
        bev_new = new[:, [0, 1, 3, 4, 6]]
        bev_gt = gt[:, [0, 1, 3, 4, 6]]
        coll = box_collision_test(bev_new, bev_gt)
        assert not coll.any()


def test_object_sample_v2_stop_epoch(tmp_path):
    info = make_db(str(tmp_path))
    t = ObjectSampleV2(
        db_sampler=dict(info_path=info, data_root=str(tmp_path),
                        classes=["car", "pedestrian"],
                        sample_groups=dict(car=2, pedestrian=2)),
        sample_2d=False, stop_epoch=8)
    data = dict(
        gt_bboxes_3d=LiDARInstance3DBoxes(
            np.array([[0, 0, -1.5, 2, 4, 1.5, 0, 0, 0]], np.float32),
            box_dim=9),
        gt_labels_3d=np.array([0]),
        points=LiDARPoints(np.random.default_rng(1).normal(
            size=(100, 5)).astype(np.float32) * 20, points_dim=5))
    t.set_epoch(0)
    out = t(dict(data))
    assert len(out["gt_labels_3d"]) > 1  # pasted
    t.set_epoch(9)  # past stop_epoch: no pasting
    data2 = dict(
        gt_bboxes_3d=LiDARInstance3DBoxes(
            np.array([[0, 0, -1.5, 2, 4, 1.5, 0, 0, 0]], np.float32),
            box_dim=9),
        gt_labels_3d=np.array([0]),
        points=LiDARPoints(np.zeros((10, 5), np.float32), points_dim=5))
    out2 = t(data2)
    assert len(out2["gt_labels_3d"]) == 1
