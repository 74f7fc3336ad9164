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


def make_db_2d(tmpdir, n=6):
    """db infos with 2D boxes that ALL overlap heavily in image space."""
    rng = np.random.default_rng(1)
    infos = []
    for i in range(n):
        pts = rng.normal(scale=0.5, size=(24, 5)).astype(np.float32)
        fname = f"db2_car_{i}.npy"
        np.save(os.path.join(tmpdir, fname), pts)
        box = np.array([15 + 7 * i, -20, -1.5, 1.8, 4.2, 1.6, 0.0, 0, 0],
                       np.float32)
        infos.append(dict(name="car", path=fname, box3d_lidar=box,
                          num_points_in_gt=24, difficulty=0, cam_idx=0,
                          bbox=[100 + 2 * i, 100, 220 + 2 * i, 200]))
    path = os.path.join(tmpdir, "dbinfos2.pkl")
    with open(path, "wb") as f:
        pickle.dump(dict(car=infos), f)
    return path


def test_2d_collision_rejects_overlapping_patches(tmp_path):
    info = make_db_2d(str(tmp_path))
    s = MMDataBaseSamplerV2(
        info_path=info, data_root=str(tmp_path), rate=1.0,
        classes=["car"], sample_groups=dict(car=6),
        check_2D_collision=True, collision_thr=0.3)
    out = s.sample_all(np.zeros((0, 9), np.float32),
                       np.zeros((0,), np.int64))
    # BEV boxes are far apart, but the image patches overlap with
    # IoF >> 0.3 -> at most one paste survives the 2D check
    assert out is not None and len(out["gt_labels_3d"]) == 1

    s_off = MMDataBaseSamplerV2(
        info_path=info, data_root=str(tmp_path), rate=1.0,
        classes=["car"], sample_groups=dict(car=6),
        check_2D_collision=False, collision_thr=0.3)
    out = s_off.sample_all(np.zeros((0, 9), np.float32),
                           np.zeros((0,), np.int64))
    assert len(out["gt_labels_3d"]) == 6  # no 2D filtering


def test_2d_collision_against_existing_gt(tmp_path):
    info = make_db_2d(str(tmp_path))
    s = MMDataBaseSamplerV2(
        info_path=info, data_root=str(tmp_path), rate=1.0,
        classes=["car"], sample_groups=dict(car=6),
        check_2D_collision=True, collision_thr=0.3)
    # a real GT whose 2D box covers the db patches entirely
    gt = np.array([[0.0, 20.0, -1.5, 1.8, 4.2, 1.6, 0.0, 0, 0]],
                  np.float32)
    out = s.sample_all(gt, np.zeros((1,), np.int64),
                       gt_bboxes_2d=np.array([[90, 90, 260, 220]],
                                             np.float32))
    assert out is None or len(out["gt_labels_3d"]) == 0


def test_collision_thr_selection_modes(tmp_path):
    info = make_db_2d(str(tmp_path))
    for thr in (0.5, [0.2, 0.5], dict(mode="range", thr_range=(0.1, 0.6)),
                dict(mode="value", thr_range=[0.3, 0.4])):
        s = MMDataBaseSamplerV2(
            info_path=info, data_root=str(tmp_path), rate=1.0,
            classes=["car"], sample_groups=dict(car=2),
            check_2D_collision=True, collision_thr=thr)
        v = s._pick_collision_thr()
        assert 0.0 < v <= 0.7


def test_paste_margin_mask_blending(tmp_path):
    """paste_obj_v2 parity: the 5% margin ring keeps the original pixels,
    the interior is mixup-blended."""
    from PIL import Image
    info = make_db_2d(str(tmp_path), n=1)
    # write a white 120x100 patch next to the points file
    patch = np.full((100, 120, 3), 255, np.uint8)
    Image.fromarray(patch).save(os.path.join(str(tmp_path),
                                             "db2_car_0.png"))
    with open(info, "rb") as f:
        db = pickle.load(f)
    db["car"][0]["image_path"] = "db2_car_0.png"
    with open(info, "wb") as f:
        pickle.dump(db, f)
    s = MMDataBaseSamplerV2(
        info_path=info, data_root=str(tmp_path), rate=1.0,
        classes=["car"], sample_groups=dict(car=1),
        check_2D_collision=True, collision_thr=0.0, mixup=0.7)
    imgs = [np.zeros((300, 400, 3), np.uint8)]
    out = s.sample_all(np.zeros((0, 9), np.float32),
                       np.zeros((0,), np.int64), imgs=imgs)
    img = np.asarray(out["imgs"][0])
    x1, y1, x2, y2 = db["car"][0]["bbox"]
    # interior blended to mixup * 255
    assert abs(int(img[150, 160, 0]) - int(0.7 * 255)) <= 2
    # margin ring (first rows/cols of the box) untouched
    assert img[y1 + 1, x1 + 1, 0] == 0
    # outside untouched
    assert img[50, 50, 0] == 0


def test_2d_collision_rows_align_without_gt_2d(tmp_path):
    """GT WITHOUT 2D boxes + multi-group sampling: the 2D collision
    matrix attaches each stored patch box to its true `avoid` row via
    avoid_2d_rows. (The pre-r3 first-rows alignment happened to be
    suppression-equivalent because only any-over-earlier-rows is
    consumed, but relied on that accident; this pins the behavior.)"""
    rng = np.random.default_rng(2)
    infos_car, infos_ped = [], []
    for i in range(3):
        pts = rng.normal(scale=0.3, size=(16, 5)).astype(np.float32)
        f1 = f"align_car_{i}.npy"
        np.save(os.path.join(str(tmp_path), f1), pts)
        infos_car.append(dict(
            name="car", path=f1, num_points_in_gt=16, difficulty=0,
            cam_idx=0,
            box3d_lidar=np.array([10 + 8 * i, -20, -1.5, 1.8, 4.2, 1.6,
                                  0, 0, 0], np.float32),
            bbox=[100, 100, 220, 200]))       # all same patch region
        f2 = f"align_ped_{i}.npy"
        np.save(os.path.join(str(tmp_path), f2), pts)
        infos_ped.append(dict(
            name="pedestrian", path=f2, num_points_in_gt=16, difficulty=0,
            cam_idx=0,
            box3d_lidar=np.array([10 + 8 * i, 20, -1.5, 0.7, 0.7, 1.7,
                                  0, 0, 0], np.float32),
            bbox=[102, 100, 222, 200]))       # overlaps the car patches
    path = os.path.join(str(tmp_path), "dbinfos_align.pkl")
    with open(path, "wb") as f:
        pickle.dump(dict(car=infos_car, pedestrian=infos_ped), f)
    s = MMDataBaseSamplerV2(
        info_path=path, data_root=str(tmp_path), rate=1.0,
        classes=["car", "pedestrian"],
        sample_groups=dict(car=3, pedestrian=3),
        check_2D_collision=True, collision_thr=0.3)
    # GT present but NO gt_bboxes_2d: kept car patches occupy avoid rows
    # AFTER the GT rows; the pedestrian group's 2D check must still see
    # them (every patch overlaps, so at most ONE paste total survives)
    gt = np.array([[0.0, 0.0, -1.5, 1.8, 4.2, 1.6, 0.0, 0, 0]], np.float32)
    out = s.sample_all(gt, np.zeros((1,), np.int64))
    assert out is not None
    assert len(out["gt_labels_3d"]) == 1
