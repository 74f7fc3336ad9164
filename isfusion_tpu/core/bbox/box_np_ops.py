"""Numpy box ops for the host path (GT-paste sampler, data prep, eval).

Parity target: `mmdet3d/core/bbox/box_np_ops.py` (points_in_rbbox,
corner utilities). Fresh implementation: points-in-rotated-box is done by
transforming points into each box's canonical frame instead of the
reference's surface-normal test.
"""
from __future__ import annotations

import numpy as np

from .structures import limit_period, rotation_3d_in_axis  # noqa: F401


def corners_nd(dims: np.ndarray, origin=0.5) -> np.ndarray:
    """Corners of axis-aligned nd boxes given dims; (N, 2**ndim, ndim)."""
    ndim = int(dims.shape[1])
    corners_norm = np.stack(
        np.unravel_index(np.arange(2 ** ndim), [2] * ndim), axis=1
    ).astype(dims.dtype)
    if ndim == 2:
        corners_norm = corners_norm[[0, 1, 3, 2]]
    elif ndim == 3:
        corners_norm = corners_norm[[0, 1, 3, 2, 4, 5, 7, 6]]
    corners_norm = corners_norm - np.array(origin, dtype=dims.dtype)
    return dims.reshape(-1, 1, ndim) * corners_norm.reshape(1, -1, ndim)


def rotation_2d(points: np.ndarray, angles: np.ndarray) -> np.ndarray:
    """Rotate (N, M, 2) corners by (N,) angles — SAME convention as
    `rotation_3d_in_axis` axis-2 (reference `box_np_ops.py:rotation_2d`
    einsum): row vectors, x' = x*cos + y*sin (clockwise-positive yaw)."""
    rot_sin = np.sin(angles)
    rot_cos = np.cos(angles)
    rot_mat_T = np.stack([
        np.stack([rot_cos, -rot_sin], -1),
        np.stack([rot_sin, rot_cos], -1),
    ], axis=1)  # (N, 2, 2)
    return np.einsum("aij,ajk->aik", points, rot_mat_T)


def center_to_corner_box2d(centers, dims, angles=None, origin=0.5):
    """(N, 4, 2) BEV corners from centers/dims/angles."""
    corners = corners_nd(dims, origin=origin)
    if angles is not None:
        corners = rotation_2d(corners, angles)
    return corners + centers.reshape(-1, 1, 2)


def center_to_corner_box3d(centers, dims, angles=None, origin=(0.5, 0.5, 0),
                           axis=2):
    """(N, 8, 3) corners from centers/dims/angles (LiDAR convention)."""
    corners = corners_nd(dims, origin=origin)
    if angles is not None:
        corners = rotation_3d_in_axis(corners, angles, axis=axis)
    return corners + centers.reshape(-1, 1, 3)


def points_in_rbbox(points: np.ndarray, boxes: np.ndarray,
                    origin=(0.5, 0.5, 0)) -> np.ndarray:
    """(P, N) bool mask of points inside rotated LiDAR boxes.

    boxes rows: (x, y, z, dx, dy, dz, yaw, ...) with bottom-center origin.
    Implemented by rotating point offsets into each box frame.
    """
    points = np.asarray(points, dtype=np.float32)[:, :3]
    boxes = np.asarray(boxes, dtype=np.float32)
    if boxes.shape[0] == 0 or points.shape[0] == 0:
        return np.zeros((points.shape[0], boxes.shape[0]), dtype=bool)
    centers = boxes[:, :3].copy()
    dims = boxes[:, 3:6]
    # shift to gravity center according to origin convention
    centers += dims * (0.5 - np.array(origin, dtype=np.float32))
    yaw = boxes[:, 6]
    # offsets in world frame: (P, N, 3)
    off = points[:, None, :] - centers[None, :, :]
    cos, sin = np.cos(yaw), np.sin(yaw)
    # inverse of the corner convention (`structures.rotation_3d_in_axis`
    # axis-2: world = local @ [[c,-s],[s,c]] rows, i.e. wx = lx*c + ly*s)
    # — r3 regression fix: the forward rotation was applied here instead
    # of its inverse, so containment disagreed with `boxes.corners` for
    # every box with |yaw| > 0 (tests/test_core/test_rotation_convention)
    local_x = off[..., 0] * cos[None] - off[..., 1] * sin[None]
    local_y = off[..., 0] * sin[None] + off[..., 1] * cos[None]
    local_z = off[..., 2]
    return ((np.abs(local_x) <= dims[None, :, 0] / 2)
            & (np.abs(local_y) <= dims[None, :, 1] / 2)
            & (np.abs(local_z) <= dims[None, :, 2] / 2))


def box_collision_test(boxes: np.ndarray, qboxes: np.ndarray) -> np.ndarray:
    """(N, K) bool: do rotated BEV boxes overlap? boxes are (x,y,dx,dy,yaw).

    Used by the GT-paste sampler's 3D collision check. Implemented via
    separating-axis test on the 4 edge normals of each box pair.
    """
    n, k = boxes.shape[0], qboxes.shape[0]
    if n == 0 or k == 0:
        return np.zeros((n, k), dtype=bool)
    c1 = center_to_corner_box2d(boxes[:, :2], boxes[:, 2:4], boxes[:, 4])
    c2 = center_to_corner_box2d(qboxes[:, :2], qboxes[:, 2:4], qboxes[:, 4])
    return _sat_overlap(c1, c2)


def _sat_overlap(c1: np.ndarray, c2: np.ndarray) -> np.ndarray:
    """Separating-axis overlap between two sets of convex quads (N,4,2),(K,4,2)."""
    n, k = c1.shape[0], c2.shape[0]

    def edge_normals(c):
        edges = np.roll(c, -1, axis=1) - c  # (M, 4, 2)
        normals = np.stack([-edges[..., 1], edges[..., 0]], -1)
        return normals

    axes1 = edge_normals(c1)  # (N, 4, 2)
    axes2 = edge_normals(c2)  # (K, 4, 2)
    # project both corner sets on each axis of box1
    # p1: (N, 4axes, 4corners) ; p2: (N, K, 4axes, 4corners)
    p1 = np.einsum("nac,nkc->nak", axes1, c1[:, :, :])
    p2 = np.einsum("nac,kjc->nkaj", axes1, c2)
    min1, max1 = p1.min(-1)[:, None], p1.max(-1)[:, None]
    min2, max2 = p2.min(-1), p2.max(-1)
    sep1 = (max1 < min2) | (max2 < min1)  # (N, K, 4)
    p1b = np.einsum("kac,njc->nkaj", axes2, c1)
    p2b = np.einsum("kac,kjc->kaj", axes2, c2)
    min1b, max1b = p1b.min(-1), p1b.max(-1)
    min2b, max2b = p2b.min(-1)[None], p2b.max(-1)[None]
    sep2 = (max1b < min2b) | (max2b < min1b)
    separated = sep1.any(-1) | sep2.any(-1)
    return ~separated


def minmax_to_corner_2d(minmax_box: np.ndarray) -> np.ndarray:
    ndim = minmax_box.shape[-1] // 2
    center = minmax_box[..., :ndim]
    dims = minmax_box[..., ndim:] - center
    return center_to_corner_box2d(center, dims, origin=0.0)


def iou_jit(boxes: np.ndarray, query_boxes: np.ndarray,
            eps: float = 1.0) -> np.ndarray:
    """Axis-aligned 2D IoU between (N,4) and (K,4) boxes (x1,y1,x2,y2)."""
    n, k = boxes.shape[0], query_boxes.shape[0]
    if n == 0 or k == 0:
        return np.zeros((n, k), dtype=np.float32)
    area_q = ((query_boxes[:, 2] - query_boxes[:, 0] + eps)
              * (query_boxes[:, 3] - query_boxes[:, 1] + eps))
    area_b = ((boxes[:, 2] - boxes[:, 0] + eps)
              * (boxes[:, 3] - boxes[:, 1] + eps))
    iw = (np.minimum(boxes[:, None, 2], query_boxes[None, :, 2])
          - np.maximum(boxes[:, None, 0], query_boxes[None, :, 0]) + eps)
    ih = (np.minimum(boxes[:, None, 3], query_boxes[None, :, 3])
          - np.maximum(boxes[:, None, 1], query_boxes[None, :, 1]) + eps)
    inter = np.clip(iw, 0, None) * np.clip(ih, 0, None)
    return inter / (area_b[:, None] + area_q[None] - inter)
