"""Result visualization (parity: `mmdet3d/core/visualizer/show_result.py`):
dump point clouds and predicted/GT boxes as .obj meshes viewable in
MeshLab — open3d-free."""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .bbox.box_np_ops import center_to_corner_box3d


def _write_points_obj(path: str, points: np.ndarray) -> None:
    with open(path, "w") as f:
        for p in points:
            f.write(f"v {p[0]:.4f} {p[1]:.4f} {p[2]:.4f}\n")


def _write_boxes_obj(path: str, boxes: np.ndarray) -> None:
    """Each box as 8 vertices + 12 wireframe edges."""
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7),
             (7, 4), (0, 4), (1, 5), (2, 6), (3, 7)]
    corners = center_to_corner_box3d(
        boxes[:, :3], boxes[:, 3:6], boxes[:, 6],
        origin=(0.5, 0.5, 0.0))
    with open(path, "w") as f:
        for box in corners:
            for v in box:
                f.write(f"v {v[0]:.4f} {v[1]:.4f} {v[2]:.4f}\n")
        for bi in range(len(corners)):
            base = bi * 8
            for a, b in edges:
                f.write(f"l {base + a + 1} {base + b + 1}\n")


def show_result(points: Optional[np.ndarray],
                gt_bboxes: Optional[np.ndarray],
                pred_bboxes: Optional[np.ndarray], out_dir: str,
                filename: str, show: bool = False,
                snapshot: bool = False) -> None:
    result_dir = os.path.join(out_dir, filename)
    os.makedirs(result_dir, exist_ok=True)
    if points is not None:
        _write_points_obj(os.path.join(result_dir,
                                       f"{filename}_points.obj"),
                          np.asarray(points))
    if gt_bboxes is not None and len(gt_bboxes):
        _write_boxes_obj(os.path.join(result_dir, f"{filename}_gt.obj"),
                         np.asarray(gt_bboxes))
    if pred_bboxes is not None and len(pred_bboxes):
        _write_boxes_obj(os.path.join(result_dir, f"{filename}_pred.obj"),
                         np.asarray(pred_bboxes))


def draw_bev_png(points: Optional[np.ndarray], gt_boxes: Optional[np.ndarray],
                 pred_boxes: Optional[np.ndarray], out_file: str,
                 pc_range=(-54, -54, 54, 54), size: int = 900) -> str:
    """Rasterize a BEV view: points (grey), GT boxes (green), predictions
    (red) — the projection imagery part of the reference's
    `core/visualizer/show_result.py` without an open3d dependency."""
    from PIL import Image, ImageDraw
    img = Image.new("RGB", (size, size), (16, 16, 20))
    draw = ImageDraw.Draw(img)
    x0, y0, x1, y1 = pc_range

    def to_px(xy):
        px = (xy[..., 0] - x0) / (x1 - x0) * (size - 1)
        py = (1 - (xy[..., 1] - y0) / (y1 - y0)) * (size - 1)
        return np.stack([px, py], -1)

    if points is not None and len(points):
        pts = np.asarray(points)
        keep = ((pts[:, 0] > x0) & (pts[:, 0] < x1) &
                (pts[:, 1] > y0) & (pts[:, 1] < y1))
        for px, py in to_px(pts[keep][:, :2])[::max(
                1, keep.sum() // 60000)]:
            img.putpixel((int(px), int(py)), (120, 120, 130))

    def corners_bev(box):
        cx, cy, dx, dy, yaw = box[0], box[1], box[3], box[4], box[6]
        c, s = np.cos(yaw), np.sin(yaw)
        local = np.array([[dx, dy], [dx, -dy], [-dx, -dy], [-dx, dy]]) / 2
        # box corner convention: world = local @ [[c,-s],[s,c]] rows
        rot = local @ np.array([[c, -s], [s, c]])
        return rot + np.array([cx, cy])

    for boxes, color in ((gt_boxes, (60, 220, 90)),
                         (pred_boxes, (240, 80, 70))):
        if boxes is None:
            continue
        for b in np.asarray(boxes):
            pix = to_px(corners_bev(b))
            draw.polygon([tuple(p) for p in pix], outline=color)
    img.save(out_file)
    return out_file
