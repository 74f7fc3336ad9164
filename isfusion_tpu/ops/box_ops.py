"""Rotated-box geometry on device (pure XLA, static shapes).

TPU-native replacement for the reference's CUDA rotated-IoU / NMS kernels
(`mmdet3d/ops/iou3d/src/iou3d_kernel.cu`, `mmdet3d/core/post_processing/
box3d_nms.py:9,181`). Intersection of rotated BEV rectangles is computed with
the candidate-point method (vertices-inside + edge intersections, angle-sorted
shoelace), fully vectorized over box pairs — no sequential polygon clipping.

Box rows follow the LiDAR layout (x, y, z, dx, dy, dz, yaw[, vx, vy]).
BEV boxes are (x, y, dx, dy, yaw).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def limit_period(val: jnp.ndarray, offset: float = 0.5,
                 period: float = jnp.pi) -> jnp.ndarray:
    return val - jnp.floor(val / period + offset) * period


def box_local_uvw(boxes: jnp.ndarray, centers: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Normalized in-box coordinates of world points against boxes.

    boxes (..., N, 7) bottom-center LiDAR boxes; centers (..., P, 3).
    Returns (uvw (..., P, N, 3) in [0, 1) when inside, inside
    (..., P, N) bool). Single home for the world->box-local transform
    (inverse of the corner convention) that was previously triplicated
    across parta2 part targets, roiaware pooling, and box_np_ops — a
    convention change must happen in exactly one place.
    """
    rel = centers[..., :, None, :] - boxes[..., None, :, :3]
    rel = rel.at[..., 2].add(-boxes[..., None, :, 5] / 2)  # gravity frame
    yaw = boxes[..., None, :, 6]
    cos, sin = jnp.cos(yaw), jnp.sin(yaw)
    lx = rel[..., 0] * cos - rel[..., 1] * sin
    ly = rel[..., 0] * sin + rel[..., 1] * cos
    dims = jnp.maximum(boxes[..., None, :, 3:6], 1e-3)
    uvw = jnp.stack([lx / dims[..., 0] + 0.5,
                     ly / dims[..., 1] + 0.5,
                     rel[..., 2] / dims[..., 2] + 0.5], -1)
    inside = jnp.all((uvw >= 0) & (uvw < 1), axis=-1)
    return uvw, inside


def rotated_corners_2d(boxes_bev: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 2) corners of (..., 5) BEV boxes (x, y, dx, dy, yaw).

    Vertex order is CCW; the yaw rotation follows the box convention
    (`core.bbox.structures.rotation_3d_in_axis` axis-2, row vectors:
    wx = lx*cos + ly*sin) so BEV corners agree with `boxes.corners`.
    """
    x, y, dx, dy, yaw = jnp.moveaxis(boxes_bev, -1, 0)
    cos, sin = jnp.cos(yaw), jnp.sin(yaw)
    # canonical corners CCW
    cx = jnp.stack([dx, dx, -dx, -dx], -1) * 0.5
    cy = jnp.stack([-dy, dy, dy, -dy], -1) * 0.5
    rx = cx * cos[..., None] + cy * sin[..., None] + x[..., None]
    ry = -cx * sin[..., None] + cy * cos[..., None] + y[..., None]
    return jnp.stack([rx, ry], -1)


def _polygon_area(verts: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Shoelace area of angle-ordered vertices with validity mask.

    Invalid slots are replaced by the first valid vertex (degenerate edges
    contribute zero area).
    """
    num = valid.shape[-1]
    first_idx = jnp.argmax(valid, axis=-1)
    first = jnp.take_along_axis(
        verts, first_idx[..., None, None].repeat(2, -1), axis=-2)
    v = jnp.where(valid[..., None], verts, first)
    nxt = jnp.roll(v, -1, axis=-2)
    cross = v[..., 0] * nxt[..., 1] - nxt[..., 0] * v[..., 1]
    return 0.5 * jnp.abs(jnp.sum(cross, axis=-1))


def _point_in_rect(pts: jnp.ndarray, rect_corners: jnp.ndarray,
                   eps: float = 1e-5) -> jnp.ndarray:
    """pts (..., P, 2) inside convex CCW quad (..., 4, 2)?  -> (..., P) bool."""
    a = rect_corners  # (..., 4, 2)
    b = jnp.roll(rect_corners, -1, axis=-2)
    # cross of edge (a->b) with (a->p) must be >= 0 for all edges (CCW)
    ab = (b - a)[..., None, :, :]           # (..., 1, 4, 2)
    ap = pts[..., :, None, :] - a[..., None, :, :]  # (..., P, 4, 2)
    cross = ab[..., 0] * ap[..., 1] - ab[..., 1] * ap[..., 0]
    return jnp.all(cross >= -eps, axis=-1)


def _segment_intersections(c1: jnp.ndarray, c2: jnp.ndarray):
    """All 16 edge-pair intersection candidates between two quads.

    c1, c2: (..., 4, 2). Returns pts (..., 16, 2), valid (..., 16).
    """
    p = c1                                  # (..., 4, 2)
    q = jnp.roll(c1, -1, axis=-2) - c1      # edge vectors of poly1
    r = c2
    s = jnp.roll(c2, -1, axis=-2) - c2
    # pairwise: broadcast (..., 4, 1, 2) x (..., 1, 4, 2)
    p_ = p[..., :, None, :]
    q_ = q[..., :, None, :]
    r_ = r[..., None, :, :]
    s_ = s[..., None, :, :]
    denom = q_[..., 0] * s_[..., 1] - q_[..., 1] * s_[..., 0]
    pr = r_ - p_
    t = (pr[..., 0] * s_[..., 1] - pr[..., 1] * s_[..., 0]) / \
        jnp.where(jnp.abs(denom) < 1e-8, 1.0, denom)
    u = (pr[..., 0] * q_[..., 1] - pr[..., 1] * q_[..., 0]) / \
        jnp.where(jnp.abs(denom) < 1e-8, 1.0, denom)
    valid = (jnp.abs(denom) >= 1e-8) & (t >= 0) & (t <= 1) & \
        (u >= 0) & (u <= 1)
    pts = p_ + t[..., None] * q_
    batch = pts.shape[:-3]
    return (pts.reshape(batch + (16, 2)), valid.reshape(batch + (16,)))


def rotated_rect_intersection_area(boxes1_bev: jnp.ndarray,
                                   boxes2_bev: jnp.ndarray) -> jnp.ndarray:
    """Pairwise intersection area of rotated BEV rects.

    boxes1_bev (N, 5), boxes2_bev (K, 5) -> (N, K) areas.
    """
    c1 = rotated_corners_2d(boxes1_bev)[:, None]   # (N, 1, 4, 2)
    c2 = rotated_corners_2d(boxes2_bev)[None]      # (1, K, 4, 2)
    n, k = boxes1_bev.shape[0], boxes2_bev.shape[0]
    c1 = jnp.broadcast_to(c1, (n, k, 4, 2))
    c2 = jnp.broadcast_to(c2, (n, k, 4, 2))
    in12 = _point_in_rect(c1, c2)    # (N, K, 4) verts of 1 inside 2
    in21 = _point_in_rect(c2, c1)    # (N, K, 4)
    ipts, ivalid = _segment_intersections(c1, c2)  # (N, K, 16, 2/)
    cand = jnp.concatenate([c1, c2, ipts], axis=-2)       # (N, K, 24, 2)
    valid = jnp.concatenate([in12, in21, ivalid], axis=-1)  # (N, K, 24)
    any_valid = jnp.any(valid, axis=-1)
    # order candidates by angle around the centroid of valid points
    cnt = jnp.maximum(jnp.sum(valid, -1, keepdims=True), 1)
    centroid = jnp.sum(jnp.where(valid[..., None], cand, 0.0), -2,
                       keepdims=True) / cnt[..., None]
    ang = jnp.arctan2(cand[..., 1] - centroid[..., 1],
                      cand[..., 0] - centroid[..., 0])
    ang = jnp.where(valid, ang, 1e4)  # invalid last
    order = jnp.argsort(ang, axis=-1)
    cand_sorted = jnp.take_along_axis(
        cand, order[..., None].repeat(2, -1), axis=-2)
    valid_sorted = jnp.take_along_axis(valid, order, axis=-1)
    area = _polygon_area(cand_sorted, valid_sorted)
    return jnp.where(any_valid, area, 0.0)


def boxes_iou_bev(boxes1_bev: jnp.ndarray, boxes2_bev: jnp.ndarray
                  ) -> jnp.ndarray:
    """Pairwise IoU of rotated BEV boxes (x, y, dx, dy, yaw)."""
    inter = rotated_rect_intersection_area(boxes1_bev, boxes2_bev)
    a1 = boxes1_bev[:, 2] * boxes1_bev[:, 3]
    a2 = boxes2_bev[:, 2] * boxes2_bev[:, 3]
    union = a1[:, None] + a2[None] - inter
    return inter / jnp.maximum(union, 1e-8)


def _height_overlap(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """(N, K) vertical overlap for bottom-origin LiDAR boxes."""
    b1_lo, b1_hi = boxes1[:, 2], boxes1[:, 2] + boxes1[:, 5]
    b2_lo, b2_hi = boxes2[:, 2], boxes2[:, 2] + boxes2[:, 5]
    hi = jnp.minimum(b1_hi[:, None], b2_hi[None])
    lo = jnp.maximum(b1_lo[:, None], b2_lo[None])
    return jnp.maximum(hi - lo, 0.0)


def boxes_overlap_3d(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise 3D intersection volume of LiDAR boxes (N, 7+), (K, 7+)."""
    inter_bev = rotated_rect_intersection_area(
        boxes1[:, [0, 1, 3, 4, 6]], boxes2[:, [0, 1, 3, 4, 6]])
    return inter_bev * _height_overlap(boxes1, boxes2)


def boxes_iou_3d(boxes1: jnp.ndarray, boxes2: jnp.ndarray,
                 mode: str = "iou") -> jnp.ndarray:
    """Pairwise 3D IoU of LiDAR boxes (`BboxOverlaps3D` equivalent,
    `mmdet3d/core/bbox/iou_calculators/iou3d_calculator.py`)."""
    inter = boxes_overlap_3d(boxes1, boxes2)
    vol1 = boxes1[:, 3] * boxes1[:, 4] * boxes1[:, 5]
    vol2 = boxes2[:, 3] * boxes2[:, 4] * boxes2[:, 5]
    if mode == "iou":
        denom = vol1[:, None] + vol2[None] - inter
    elif mode == "iof":
        denom = vol1[:, None] * jnp.ones_like(vol2)[None]
    else:
        raise ValueError(mode)
    return inter / jnp.maximum(denom, 1e-8)


def _greedy_suppress(scores: jnp.ndarray, suppress_pair: jnp.ndarray,
                     valid: jnp.ndarray) -> jnp.ndarray:
    """Generic greedy NMS. suppress_pair[i, j] True if i (higher score)
    suppresses j. Returns keep mask (N,). O(N) lax loop, vectorized inner."""
    n = scores.shape[0]
    order = jnp.argsort(-scores)
    sp = suppress_pair[order][:, order]
    valid_sorted = valid[order]

    def body(i, keep):
        alive = keep[i] & valid_sorted[i]
        kill = alive & sp[i] & (jnp.arange(n) > i)
        return keep & ~kill

    keep_sorted = jax.lax.fori_loop(
        0, n, body, valid_sorted)
    keep = jnp.zeros((n,), jnp.bool_).at[order].set(keep_sorted)
    return keep & valid


def nms_bev_mask(boxes_bev: jnp.ndarray, scores: jnp.ndarray,
                 thresh: float, valid: jnp.ndarray | None = None
                 ) -> jnp.ndarray:
    """Rotated-BEV NMS (`nms_gpu` equivalent). Returns keep mask (N,)."""
    if valid is None:
        valid = jnp.ones(scores.shape, jnp.bool_)
    iou = boxes_iou_bev(boxes_bev, boxes_bev)
    return _greedy_suppress(scores, iou > thresh, valid)


def nms_normal_bev_mask(boxes_xyxy: jnp.ndarray, scores: jnp.ndarray,
                        thresh: float,
                        valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Axis-aligned NMS on (x1, y1, x2, y2) boxes (`nms_normal_gpu`)."""
    if valid is None:
        valid = jnp.ones(scores.shape, jnp.bool_)
    area = jnp.maximum(boxes_xyxy[:, 2] - boxes_xyxy[:, 0], 0) * \
        jnp.maximum(boxes_xyxy[:, 3] - boxes_xyxy[:, 1], 0)
    x1 = jnp.maximum(boxes_xyxy[:, None, 0], boxes_xyxy[None, :, 0])
    y1 = jnp.maximum(boxes_xyxy[:, None, 1], boxes_xyxy[None, :, 1])
    x2 = jnp.minimum(boxes_xyxy[:, None, 2], boxes_xyxy[None, :, 2])
    y2 = jnp.minimum(boxes_xyxy[:, None, 3], boxes_xyxy[None, :, 3])
    inter = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    iou = inter / jnp.maximum(area[:, None] + area[None] - inter, 1e-8)
    return _greedy_suppress(scores, iou > thresh, valid)


def circle_nms_mask(centers_xy: jnp.ndarray, scores: jnp.ndarray,
                    thresh: float, valid: jnp.ndarray | None = None
                    ) -> jnp.ndarray:
    """Center-distance suppression (`circle_nms`, `box3d_nms.py:181`).

    Suppresses a lower-scored box whose squared center distance to a kept
    higher-scored box is <= thresh (the reference compares squared dist).
    """
    if valid is None:
        valid = jnp.ones(scores.shape, jnp.bool_)
    d2 = jnp.sum(
        (centers_xy[:, None, :] - centers_xy[None, :, :]) ** 2, -1)
    return _greedy_suppress(scores, d2 <= thresh, valid)
