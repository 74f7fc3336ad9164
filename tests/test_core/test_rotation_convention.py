"""Sign-SENSITIVE rotation-convention regression tests.

Round-3 found `BasePoints.rotate` built the NON-transposed axis-2 matrix
(reference `mmdet3d/core/points/base_points.py:140-180` transposes), so
`points.rotate(phi)` rotated by −phi: every GlobalRotScaleTrans aug
sheared points OFF their boxes (zero train-time positives on the
learnability fixture). The pre-existing tests only checked roundtrips
(rotate(+a) then rotate(−a)), which are sign-INSENSITIVE. These tests
pin the absolute convention: a point glued to a box corner must still
coincide with that corner after every paired box+points rotation, for
all three box classes, and the full GlobalRotScaleTrans/V2 transforms
must keep points inside their boxes.
"""
import numpy as np

from isfusion_tpu.core import (
    CameraInstance3DBoxes, CameraPoints, DepthInstance3DBoxes, DepthPoints,
    LiDARInstance3DBoxes, LiDARPoints)
from isfusion_tpu.core.bbox import box_np_ops
from isfusion_tpu.datasets.pipelines.transforms_3d import (
    GlobalRotScaleTrans, GlobalRotScaleTransV2)


def _corner_attachment(box_cls, pts_cls, theta):
    """Points at box corners stay at those corners under the PAIRED call
    `boxes.rotate(theta, points)` — a wrong points sign lands the points
    on a rotated-by-2*theta ghost box and the per-corner match breaks."""
    rng = np.random.default_rng(0)
    t = rng.uniform(-8, 8, size=(3, 7)).astype(np.float32)
    t[:, 3:6] = np.abs(t[:, 3:6]) + 1.0
    boxes = box_cls(t)
    corners_before = boxes.corners.reshape(-1, 3)
    pts = pts_cls(corners_before.copy())
    boxes.rotate(theta, pts)
    np.testing.assert_allclose(
        pts.coord, boxes.corners.reshape(-1, 3), atol=1e-4)


def test_lidar_paired_rotation_is_rigid():
    _corner_attachment(LiDARInstance3DBoxes, LiDARPoints, 0.4)
    _corner_attachment(LiDARInstance3DBoxes, LiDARPoints, -0.7)


def test_depth_paired_rotation_is_rigid():
    _corner_attachment(DepthInstance3DBoxes, DepthPoints, 0.4)
    _corner_attachment(DepthInstance3DBoxes, DepthPoints, -0.7)


def test_camera_paired_rotation_is_rigid():
    _corner_attachment(CameraInstance3DBoxes, CameraPoints, 0.4)
    _corner_attachment(CameraInstance3DBoxes, CameraPoints, -0.7)


def test_points_scalar_rotate_is_ccw():
    """Absolute sign: rotate(+pi/2) about z takes +x to +y for row-vector
    points (counter-clockwise), matching the reference's transposed
    matrix (`base_points.py:140-180`)."""
    pts = LiDARPoints(np.array([[1.0, 0.0, 0.0]], np.float32))
    pts.rotate(np.pi / 2)
    np.testing.assert_allclose(pts.coord, [[0.0, 1.0, 0.0]], atol=1e-6)


def _in_box_count(points, boxes):
    mask = box_np_ops.points_in_rbbox(points.coord, boxes.tensor[:, :7])
    return int(mask.any(-1).sum())


def _make_scene(seed=3):
    rng = np.random.default_rng(seed)
    t = rng.uniform(-20, 20, size=(6, 9)).astype(np.float32)
    t[:, 3:6] = rng.uniform(2.0, 4.0, size=(6, 3)).astype(np.float32)
    boxes = LiDARInstance3DBoxes(t, box_dim=9)
    # points strictly inside each box (shrunk local offsets), rotated to
    # the box frame exactly as the corners are
    locals_ = rng.uniform(-0.4, 0.4, size=(6, 40, 3)).astype(np.float32)
    pts = locals_ * t[:, None, 3:6]
    c, s = np.cos(t[:, 6]), np.sin(t[:, 6])
    # world-from-local per the box convention: wx = lx*c + ly*s
    x = pts[..., 0] * c[:, None] + pts[..., 1] * s[:, None]
    y = -pts[..., 0] * s[:, None] + pts[..., 1] * c[:, None]
    pts = np.stack([x, y, pts[..., 2]], -1) + boxes.gravity_center[:, None]
    pts = pts.reshape(-1, 3).astype(np.float32)
    return boxes, LiDARPoints(np.concatenate(
        [pts, np.zeros((len(pts), 2), np.float32)], -1), points_dim=5)


def test_points_in_rbbox_agrees_with_corners():
    """Containment must be derived from the SAME convention as
    `boxes.corners` (reference derives it from corner surfaces):
    shrunk-corner points are inside, inflated-corner points are not."""
    rng = np.random.default_rng(7)
    t = rng.uniform(-10, 10, size=(5, 7)).astype(np.float32)
    t[:, 3:6] = rng.uniform(1.0, 6.0, size=(5, 3)).astype(np.float32)
    b = LiDARInstance3DBoxes(t)
    for i in range(5):
        gc = b.gravity_center[i]
        corners = b.corners[i]
        inner = gc + 0.9 * (corners - gc)
        outer = gc + 1.6 * (corners - gc)
        m_in = box_np_ops.points_in_rbbox(inner, t[i:i + 1])
        m_out = box_np_ops.points_in_rbbox(outer, t[i:i + 1])
        assert m_in.all(), f"box {i}: corner points not inside"
        assert not m_out.any(), f"box {i}: inflated points inside"


def test_bev_corner_conventions_agree():
    """jax `rotated_corners_2d`, numpy `center_to_corner_box2d` and the
    structure `.corners` BEV projection must produce the same vertex SET
    for the same box (orders differ by construction)."""
    from isfusion_tpu.ops.box_ops import rotated_corners_2d
    t = np.array([[2.0, -1.0, 0.0, 6.0, 1.5, 2.0, 0.8]], np.float32)
    b = LiDARInstance3DBoxes(t)
    bev3d = np.unique(np.round(b.corners[0][:, :2], 4), axis=0)
    c_np = box_np_ops.center_to_corner_box2d(
        t[:, :2], t[:, 3:5], t[:, 6])[0]
    c_jax = np.asarray(rotated_corners_2d(t[:, [0, 1, 3, 4, 6]]))[0]
    np.testing.assert_allclose(
        np.unique(np.round(c_np, 4), axis=0), bev3d, atol=1e-3)
    np.testing.assert_allclose(
        np.unique(np.round(c_jax, 4), axis=0), bev3d, atol=1e-3)


def test_global_rot_scale_trans_keeps_points_in_boxes():
    for cls, kw in [
            (GlobalRotScaleTrans,
             dict(rot_range=[-0.785, 0.785], scale_ratio_range=[0.9, 1.1],
                  translation_std=[0.5, 0.5, 0.5])),
            (GlobalRotScaleTransV2,
             dict(resize_lim=(0.9, 1.1), rot_lim=(-0.785, 0.785),
                  trans_lim=0.5, is_train=True))]:
        for seed in range(4):
            boxes, points = _make_scene(seed)
            n0 = _in_box_count(points, boxes)
            assert n0 == len(points.coord)
            np.random.seed(100 + seed)
            data = cls(**kw)(
                {"points": points, "gt_bboxes_3d": boxes})
            assert _in_box_count(data["points"], data["gt_bboxes_3d"]) == n0
