"""Box structure invariants (pattern of reference tests/test_utils/test_box3d.py)."""
import numpy as np
import pytest

from isfusion_tpu.core import (
    Box3DMode, CameraInstance3DBoxes, DepthInstance3DBoxes,
    LiDARInstance3DBoxes, limit_period)
from isfusion_tpu.core.bbox import box_np_ops


def make_boxes(n=4, box_dim=7, seed=0):
    rng = np.random.default_rng(seed)
    t = rng.uniform(-10, 10, size=(n, box_dim)).astype(np.float32)
    t[:, 3:6] = np.abs(t[:, 3:6]) + 0.5
    return LiDARInstance3DBoxes(t, box_dim=box_dim)


def test_basic_props():
    boxes = make_boxes()
    assert len(boxes) == 4
    np.testing.assert_allclose(boxes.volume,
                               boxes.dims.prod(-1), rtol=1e-5)
    gc = boxes.gravity_center
    np.testing.assert_allclose(gc[:, 2],
                               boxes.tensor[:, 2] + boxes.tensor[:, 5] / 2,
                               rtol=1e-5)
    np.testing.assert_allclose(boxes.bev,
                               boxes.tensor[:, [0, 1, 3, 4, 6]])


def test_origin_shift():
    t = np.array([[0, 0, 0, 2, 2, 2, 0]], np.float32)
    boxes = LiDARInstance3DBoxes(t, origin=(0.5, 0.5, 0.5))
    # gravity-center input -> stored bottom center z = -1
    np.testing.assert_allclose(boxes.tensor[0, 2], -1.0)
    np.testing.assert_allclose(boxes.gravity_center[0], [0, 0, 0], atol=1e-6)


def test_corners_axis_aligned():
    t = np.array([[1, 2, 3, 2, 4, 6, 0]], np.float32)
    corners = LiDARInstance3DBoxes(t).corners
    assert corners.shape == (1, 8, 3)
    np.testing.assert_allclose(corners[0].min(0), [0, 0, 3], atol=1e-5)
    np.testing.assert_allclose(corners[0].max(0), [2, 4, 9], atol=1e-5)


def test_rotate_roundtrip():
    boxes = make_boxes(box_dim=9)
    orig = boxes.tensor.copy()
    pts = np.random.default_rng(1).normal(size=(100, 5)).astype(np.float32)
    pts_orig = pts.copy()
    boxes.rotate(0.3, pts)
    boxes.rotate(-0.3, pts)
    np.testing.assert_allclose(boxes.tensor, orig, atol=1e-4)
    np.testing.assert_allclose(pts, pts_orig, atol=1e-4)


def test_rotate_matches_corner_rotation():
    boxes = make_boxes()
    corners_before = boxes.corners.copy()
    rot_mat_T = boxes.rotate(0.5)
    corners_after = boxes.corners
    expected = corners_before @ rot_mat_T
    np.testing.assert_allclose(corners_after, expected, atol=1e-4)


def test_flip_involution():
    for d in ("horizontal", "vertical"):
        boxes = make_boxes(box_dim=9)
        orig = boxes.tensor.copy()
        boxes.flip(d)
        boxes.flip(d)
        t = boxes.tensor.copy()
        t[:, 6] = limit_period(t[:, 6], 0.5, 2 * np.pi)
        o = orig.copy()
        o[:, 6] = limit_period(o[:, 6], 0.5, 2 * np.pi)
        np.testing.assert_allclose(t, o, atol=1e-4)


def test_flip_horizontal_semantics():
    t = np.array([[1, 2, 0, 2, 2, 2, 0.3, 0.5, 0.7]], np.float32)
    boxes = LiDARInstance3DBoxes(t, box_dim=9)
    boxes.flip("horizontal")
    np.testing.assert_allclose(boxes.tensor[0, 1], -2)
    np.testing.assert_allclose(boxes.tensor[0, 6], -0.3 + np.pi, atol=1e-6)
    np.testing.assert_allclose(boxes.tensor[0, 8], -0.7)


def test_in_range():
    t = np.array([[0, 0, 0, 1, 1, 1, 0], [100, 0, 0, 1, 1, 1, 0]],
                 np.float32)
    boxes = LiDARInstance3DBoxes(t)
    np.testing.assert_array_equal(
        boxes.in_range_bev([-54, -54, 54, 54]), [True, False])
    np.testing.assert_array_equal(
        boxes.in_range_3d([-54, -54, -5, 54, 54, 3]), [True, False])


def test_cat_getitem_iter():
    b1, b2 = make_boxes(3), make_boxes(2, seed=5)
    cat = LiDARInstance3DBoxes.cat([b1, b2])
    assert len(cat) == 5
    sub = cat[1:3]
    assert len(sub) == 2
    single = cat[0]
    assert len(single) == 1


def test_mode_conversion_roundtrip():
    boxes = make_boxes(box_dim=7)
    cam = boxes.convert_to(Box3DMode.CAM)
    assert isinstance(cam, CameraInstance3DBoxes)
    back = cam.convert_to(Box3DMode.LIDAR)
    np.testing.assert_allclose(back.tensor[:, :6], boxes.tensor[:, :6],
                               atol=1e-4)
    depth = boxes.convert_to(Box3DMode.DEPTH)
    assert isinstance(depth, DepthInstance3DBoxes)
    back2 = depth.convert_to(Box3DMode.LIDAR)
    np.testing.assert_allclose(back2.tensor[:, :6], boxes.tensor[:, :6],
                               atol=1e-4)


def test_lidar_to_cam_geometry():
    # a box 5m in front of the lidar maps to z=5 in camera coords
    t = np.array([[5, 0, 0, 1, 1, 1, 0]], np.float32)
    cam = LiDARInstance3DBoxes(t).convert_to(Box3DMode.CAM)
    np.testing.assert_allclose(cam.tensor[0, :3], [0, 0, 5], atol=1e-6)


def test_points_in_rbbox():
    boxes = np.array([[0, 0, 0, 2, 2, 2, 0],
                      [10, 10, 0, 2, 2, 2, np.pi / 4]], np.float32)
    pts = np.array([
        [0, 0, 1],        # inside box 0
        [0.9, 0.9, 0.1],  # inside box 0
        [1.5, 0, 1],      # outside both
        [10, 10, 1],      # inside box 1
        [10 + 1.2, 10, 1],  # dist 1.2 along x: inside rotated (diag 1.414)
    ], np.float32)
    mask = box_np_ops.points_in_rbbox(pts, boxes)
    assert mask.shape == (5, 2)
    np.testing.assert_array_equal(
        mask[:, 0], [True, True, False, False, False])
    np.testing.assert_array_equal(
        mask[:, 1], [False, False, False, True, True])


def test_box_collision():
    boxes = np.array([[0, 0, 2, 2, 0]], np.float32)
    q = np.array([[1.5, 0, 2, 2, 0],     # overlap
                  [3.0, 0, 2, 2, 0],     # separate
                  [2.3, 0, 2, 2, np.pi / 4]], np.float32)  # rotated: left
    # vertex of the rotated square is at x = 2.3 - sqrt(2) < 1 -> overlap
    hit = box_np_ops.box_collision_test(boxes, q)
    assert hit.shape == (1, 3)
    assert hit[0, 0]
    assert not hit[0, 1]
    assert hit[0, 2]


def test_nearest_bev():
    t = np.array([[0, 0, 0, 4, 2, 1, np.pi / 2]], np.float32)
    bev = LiDARInstance3DBoxes(t).nearest_bev
    # rotated 90 deg -> swaps extents
    np.testing.assert_allclose(bev[0], [-1, -2, 1, 2], atol=1e-5)


def test_enlarged_box():
    boxes = make_boxes(2)
    big = boxes.enlarged_box(0.5)
    np.testing.assert_allclose(big.dims, boxes.dims + 1.0, atol=1e-6)
    np.testing.assert_allclose(big.tensor[:, 2],
                               boxes.tensor[:, 2] - 0.5, atol=1e-6)
