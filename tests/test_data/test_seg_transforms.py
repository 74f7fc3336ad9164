"""Segmentation-path and alignment transforms.

Parity targets: `mmdet3d/datasets/pipelines/transforms_3d.py` —
GlobalAlignment:1577, RandomDropPointsColor:840, RandomJitterPoints:1208,
BackgroundPointsFilter:2461, IndoorPatchPointSample:2216,
VoxelBasedPointSampler:2526 — with hand-computed golden values.
"""
import numpy as np
import pytest

import isfusion_tpu.datasets  # noqa: F401  (register pipelines)
from isfusion_tpu.core.bbox.structures import DepthInstance3DBoxes
from isfusion_tpu.core.points import DepthPoints, LiDARPoints
from isfusion_tpu.core.voxel_generator import VoxelGenerator
from isfusion_tpu.registry import PIPELINES, build_from_cfg


def _build(cfg):
    return build_from_cfg(dict(cfg), PIPELINES)


def test_global_alignment_golden():
    t = _build(dict(type="GlobalAlignment", rotation_axis=2))
    # 90-degree z rotation + translation: aligned = R @ p + t
    th = np.pi / 2
    mat = np.array([
        [np.cos(th), -np.sin(th), 0, 1.0],
        [np.sin(th), np.cos(th), 0, -2.0],
        [0, 0, 1, 0.5],
        [0, 0, 0, 1]], np.float32)
    pts = DepthPoints(np.array([[1.0, 0.0, 0.0, 7.0],
                                [0.0, 2.0, 1.0, 8.0]], np.float32),
                      points_dim=4)
    data = dict(points=pts, ann_info=dict(axis_align_matrix=mat))
    out = t(data)["points"].numpy()
    # R @ (1,0,0) = (0,1,0); + t = (1,-1,0.5)
    np.testing.assert_allclose(out[0, :3], [1.0, -1.0, 0.5], atol=1e-5)
    # R @ (0,2,1) = (-2,0,1); + t = (-1,-2,1.5)
    np.testing.assert_allclose(out[1, :3], [-1.0, -2.0, 1.5], atol=1e-5)
    np.testing.assert_allclose(out[:, 3], [7.0, 8.0])  # attrs untouched


def test_global_alignment_rejects_bad_matrix():
    t = _build(dict(type="GlobalAlignment", rotation_axis=2))
    mat = np.eye(4, dtype=np.float32)
    mat[0, 0] = 2.0  # det != 1
    pts = DepthPoints(np.zeros((1, 3), np.float32), points_dim=3)
    with pytest.raises(AssertionError):
        t(dict(points=pts, ann_info=dict(axis_align_matrix=mat)))


def test_random_drop_points_color():
    t = _build(dict(type="RandomDropPointsColor", drop_ratio=1.0))
    arr = np.ones((4, 6), np.float32)
    pts = DepthPoints(arr, points_dim=6,
                      attribute_dims=dict(color=[3, 4, 5]))
    out = t(dict(points=pts))["points"]
    assert np.all(out.numpy()[:, 3:6] == 0.0)
    assert np.all(out.numpy()[:, :3] == 1.0)
    t0 = _build(dict(type="RandomDropPointsColor", drop_ratio=0.0))
    pts2 = DepthPoints(np.ones((4, 6), np.float32), points_dim=6,
                       attribute_dims=dict(color=[3, 4, 5]))
    out2 = t0(dict(points=pts2))["points"]
    assert np.all(out2.numpy()[:, 3:6] == 1.0)


def test_random_jitter_points_clip():
    t = _build(dict(type="RandomJitterPoints", jitter_std=10.0,
                    clip_range=(-0.05, 0.05)))
    base = np.zeros((100, 3), np.float32)
    pts = LiDARPoints(base.copy(), points_dim=3)
    out = t(dict(points=pts))["points"].numpy()
    assert np.abs(out).max() <= 0.05 + 1e-6
    assert np.abs(out).max() > 0.0   # jitter actually applied


def test_background_points_filter_golden():
    # one axis-aligned box at origin, dims 2x2x2 bottom at z=0
    boxes = DepthInstance3DBoxes(
        np.array([[0, 0, 0, 2, 2, 2, 0]], np.float32))
    pts_arr = np.array([
        [0.0, 0.0, 1.0],    # inside the box           -> kept (foreground)
        [1.2, 0.0, 1.0],    # in enlarged shell only   -> dropped
        [5.0, 5.0, 1.0],    # far away                 -> kept
    ], np.float32)
    t = _build(dict(type="BackgroundPointsFilter",
                    bbox_enlarge_range=(1.0, 1.0, 1.0)))
    data = dict(points=DepthPoints(pts_arr.copy(), points_dim=3),
                gt_bboxes_3d=boxes,
                pts_semantic_mask=np.array([1, 2, 3]),
                pts_instance_mask=np.array([10, 20, 30]))
    out = t(data)
    got = out["points"].numpy()
    np.testing.assert_allclose(got, pts_arr[[0, 2]])
    np.testing.assert_array_equal(out["pts_semantic_mask"], [1, 3])
    np.testing.assert_array_equal(out["pts_instance_mask"], [10, 30])


def test_indoor_patch_point_sample():
    rng = np.random.default_rng(0)
    n = 500
    coords = rng.uniform(0, 4, size=(n, 3)).astype(np.float32)
    colors = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    pts = DepthPoints(np.concatenate([coords, colors], 1), points_dim=6,
                      attribute_dims=dict(color=[3, 4, 5]))
    sem = rng.integers(0, 5, size=(n,))
    t = _build(dict(type="IndoorPatchPointSample", num_points=128,
                    block_size=1.5, ignore_index=None,
                    use_normalized_coord=True))
    np.random.seed(1)
    out = t(dict(points=pts, pts_semantic_mask=sem,
                 pts_instance_mask=sem.copy()))
    p = out["points"]
    assert p.shape == (128, 9)   # xyz + rgb + normalized xyz
    assert out["pts_semantic_mask"].shape == (128,)
    assert out["pts_instance_mask"].shape == (128,)
    got = p.numpy()
    # xy re-centered around the chosen patch center: the sampled patch is
    # (block + 2*enlarge) wide at most
    assert np.abs(got[:, 0]).max() <= 1.5 / 2 + 0.2 + 1e-4
    assert np.abs(got[:, 1]).max() <= 1.5 / 2 + 0.2 + 1e-4
    # normalized coords in [0, 1]
    assert got[:, 6:9].min() >= -1e-6 and got[:, 6:9].max() <= 1.0 + 1e-6
    assert p.attribute_dims["normalized_coord"] == [6, 7, 8]


def test_voxel_generator_golden():
    vg = VoxelGenerator(voxel_size=[1, 1, 1],
                        point_cloud_range=[0, 0, 0, 4, 4, 4],
                        max_num_points=2, max_voxels=3)
    pts = np.array([
        [0.5, 0.5, 0.5, 0.0],   # voxel (0,0,0)
        [0.6, 0.4, 0.5, 1.0],   # same voxel
        [0.7, 0.3, 0.5, 2.0],   # same voxel, over max_num_points -> drop
        [1.5, 0.5, 0.5, 3.0],   # voxel (0,0,1)
        [2.5, 2.5, 0.5, 4.0],   # voxel (0,2,2)
        [3.5, 3.5, 3.5, 5.0],   # 4th voxel -> dropped by max_voxels
        [9.0, 0.0, 0.0, 6.0],   # out of range
    ], np.float32)
    voxels, coors, num = vg.generate(pts)
    assert voxels.shape == (3, 2, 4)
    np.testing.assert_array_equal(num, [2, 1, 1])
    np.testing.assert_array_equal(coors, [[0, 0, 0], [0, 0, 1], [0, 2, 2]])
    np.testing.assert_allclose(voxels[0, :, 3], [0.0, 1.0])
    np.testing.assert_allclose(voxels[1, 0, 3], 3.0)
    np.testing.assert_allclose(voxels[2, 0, 3], 4.0)


def test_voxel_based_point_sampler():
    rng = np.random.default_rng(3)
    cur = np.concatenate([rng.uniform(0, 4, (40, 3)),
                          np.zeros((40, 1))], 1)
    prev = np.concatenate([rng.uniform(0, 4, (60, 3)),
                           np.ones((60, 1))], 1)
    arr = np.concatenate([cur, prev], 0).astype(np.float32)
    pts = LiDARPoints(arr, points_dim=4)
    t = _build(dict(
        type="VoxelBasedPointSampler",
        cur_sweep_cfg=dict(voxel_size=[0.5, 0.5, 4],
                           point_cloud_range=[0, 0, 0, 4, 4, 4],
                           max_num_points=1, max_voxels=16),
        prev_sweep_cfg=dict(voxel_size=[0.5, 0.5, 4],
                            point_cloud_range=[0, 0, 0, 4, 4, 4],
                            max_num_points=1, max_voxels=24),
        time_dim=3))
    sem = np.arange(100)
    out = t(dict(points=pts, pts_mask_fields=[], pts_seg_fields=["sem"],
                 sem=sem))
    p = out["points"]
    assert p.shape == (40, 4)       # 16 cur + 24 prev, squeezed
    assert out["sem"].shape == (40,)
    # sampled current-sweep points keep time 0, prev keep 1
    assert np.all(p.numpy()[:16, 3] == 0.0)
    assert np.all(p.numpy()[16:, 3] == 1.0)
