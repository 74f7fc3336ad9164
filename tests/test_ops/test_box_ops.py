"""Rotated IoU / NMS device ops vs analytic oracles."""
import jax.numpy as jnp
import numpy as np

from isfusion_tpu.ops import (
    boxes_iou_bev, boxes_iou_3d, circle_nms_mask, nms_bev_mask,
    rotated_corners_2d)
from isfusion_tpu.ops.box_ops import rotated_rect_intersection_area


def test_corners_axis_aligned():
    b = jnp.array([[1.0, 2.0, 4.0, 2.0, 0.0]])
    c = np.asarray(rotated_corners_2d(b))[0]
    np.testing.assert_allclose(sorted(c[:, 0]), [-1, -1, 3, 3], atol=1e-5)
    np.testing.assert_allclose(sorted(c[:, 1]), [1, 1, 3, 3], atol=1e-5)


def test_iou_identical():
    b = jnp.array([[0.0, 0, 2, 2, 0.3], [5.0, 5, 3, 1, -0.7]])
    iou = np.asarray(boxes_iou_bev(b, b))
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-4)


def test_iou_axis_aligned_overlap():
    b1 = jnp.array([[0.0, 0, 2, 2, 0]])
    b2 = jnp.array([[1.0, 0, 2, 2, 0]])
    iou = float(boxes_iou_bev(b1, b2)[0, 0])
    # inter = 1*2 = 2, union = 4+4-2 = 6
    np.testing.assert_allclose(iou, 2 / 6, atol=1e-4)


def test_iou_rotated_45():
    # unit square vs same square rotated 45 deg: intersection is a regular
    # octagon with area 2*(sqrt(2)-1) ~ 0.8284
    b1 = jnp.array([[0.0, 0, 1, 1, 0]])
    b2 = jnp.array([[0.0, 0, 1, 1, np.pi / 4]])
    inter = float(rotated_rect_intersection_area(b1, b2)[0, 0])
    np.testing.assert_allclose(inter, 2 * (np.sqrt(2) - 1), atol=1e-3,
                               rtol=0)
    # containment: big box contains small
    b3 = jnp.array([[0.0, 0, 4, 4, 0.3]])
    b4 = jnp.array([[0.0, 0, 1, 1, 1.0]])
    inter2 = float(rotated_rect_intersection_area(b3, b4)[0, 0])
    np.testing.assert_allclose(inter2, 1.0, atol=1e-3)


def test_iou_disjoint():
    b1 = jnp.array([[0.0, 0, 2, 2, 0.5]])
    b2 = jnp.array([[10.0, 10, 2, 2, 1.0]])
    np.testing.assert_allclose(
        float(boxes_iou_bev(b1, b2)[0, 0]), 0.0, atol=1e-6)


def test_iou3d():
    # identical boxes -> 1; half-shifted in z -> volume overlap 0.5
    b1 = jnp.array([[0.0, 0, 0, 2, 2, 2, 0.0]])
    b2 = jnp.array([[0.0, 0, 1, 2, 2, 2, 0.0]])
    np.testing.assert_allclose(float(boxes_iou_3d(b1, b1)[0, 0]), 1.0,
                               atol=1e-4)
    # inter = 4*1 = 4, union = 8+8-4 = 12
    np.testing.assert_allclose(float(boxes_iou_3d(b1, b2)[0, 0]), 4 / 12,
                               atol=1e-4)


def test_nms_bev():
    boxes = jnp.array([
        [0.0, 0, 2, 2, 0],
        [0.2, 0, 2, 2, 0],   # heavy overlap with 0
        [10.0, 0, 2, 2, 0],  # separate
    ])
    scores = jnp.array([0.9, 0.8, 0.7])
    keep = np.asarray(nms_bev_mask(boxes, scores, 0.5))
    np.testing.assert_array_equal(keep, [True, False, True])


def test_nms_bev_chain_suppression():
    # box1 suppressed by box0; box2 overlaps box1 but not box0 -> box2 kept
    boxes = jnp.array([
        [0.0, 0, 2, 2, 0],
        [1.0, 0, 2, 2, 0],
        [2.2, 0, 2, 2, 0],
    ])
    scores = jnp.array([0.9, 0.8, 0.7])
    keep = np.asarray(nms_bev_mask(boxes, scores, 0.3))
    np.testing.assert_array_equal(keep, [True, False, True])


def test_circle_nms():
    centers = jnp.array([[0.0, 0], [0.5, 0], [5.0, 0]])
    scores = jnp.array([0.9, 0.5, 0.8])
    keep = np.asarray(circle_nms_mask(centers, scores, thresh=1.0))
    np.testing.assert_array_equal(keep, [True, False, True])


def test_nms_valid_mask():
    boxes = jnp.array([[0.0, 0, 2, 2, 0], [10.0, 0, 2, 2, 0]])
    scores = jnp.array([0.9, 0.8])
    keep = np.asarray(nms_bev_mask(boxes, scores, 0.5,
                                   valid=jnp.array([True, False])))
    np.testing.assert_array_equal(keep, [True, False])
