"""Flagship-model factory shared by ``bench.py`` and ``__graft_entry__.py``.

The flagship is the most capable model currently wired end-to-end. It starts
as PointPillars-on-nuScenes and is upgraded to the full IS-Fusion stack as
the framework grows; callers (driver bench / compile checks) only rely on
``build_flagship`` returning (model, synthetic_batch_fn).
"""
from __future__ import annotations

import os
from typing import Callable, Tuple

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

POINTPILLARS_CFG = os.path.join(
    REPO_ROOT, "configs", "pointpillars",
    "hv_pointpillars_secfpn_sbn-all_4x8_2x_nus-3d.py")


def synthetic_points_batch(batch_size: int, num_points: int = 120000,
                           num_gt: int = 64, seed: int = 0,
                           pcr=(-50, -50, -5, 50, 50, 3)) -> dict:
    """Fixed-shape synthetic nuScenes-like LiDAR batch (5-dim points,
    padded GT boxes with mask) — matches the framework's batch contract."""
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    pts = np.empty((batch_size, num_points, 5), np.float32)
    pts[..., 0] = rng.uniform(pcr[0], pcr[3], (batch_size, num_points))
    pts[..., 1] = rng.uniform(pcr[1], pcr[4], (batch_size, num_points))
    pts[..., 2] = rng.uniform(pcr[2], pcr[5], (batch_size, num_points))
    pts[..., 3] = rng.uniform(0, 255, (batch_size, num_points))
    pts[..., 4] = 0.0
    mask = rng.uniform(size=(batch_size, num_points)) > 0.05
    boxes = np.zeros((batch_size, num_gt, 9), np.float32)
    boxes[..., :2] = rng.uniform(-45, 45, (batch_size, num_gt, 2))
    boxes[..., 2] = -1.0
    boxes[..., 3:6] = rng.uniform(0.5, 5.0, (batch_size, num_gt, 3))
    boxes[..., 6] = rng.uniform(-np.pi, np.pi, (batch_size, num_gt))
    labels = rng.integers(0, 7, (batch_size, num_gt))
    gt_mask = np.arange(num_gt)[None, :] < rng.integers(
        max(num_gt // 2, 1), num_gt + 1, (batch_size, 1))
    return dict(points=jnp.asarray(pts), points_mask=jnp.asarray(mask),
                gt_bboxes_3d=jnp.asarray(boxes),
                gt_labels_3d=jnp.asarray(labels),
                gt_mask=jnp.asarray(gt_mask))


def build_flagship(tiny: bool = False) -> Tuple[object, Callable[[int], dict]]:
    """Return (flax model, batch_fn(batch_size) -> synthetic batch).

    ``tiny=True`` shrinks point/voxel capacities and the BEV grid for
    CPU-mesh dry runs; shapes stay static either way.
    """
    from .config import Config
    from .models import build_detector

    cfg = Config.fromfile(POINTPILLARS_CFG)
    model_cfg = dict(cfg.model)
    if tiny:
        pcr = [-8, -8, -5, 8, 8, 3]
        vs = [0.5, 0.5, 8]
        model_cfg["pts_voxel_layer"] = dict(
            max_num_points=8, point_cloud_range=pcr, voxel_size=vs,
            max_voxels=(256, 256))
        model_cfg["pts_voxel_encoder"] = dict(
            model_cfg["pts_voxel_encoder"], feat_channels=[16, 16],
            voxel_size=vs, point_cloud_range=pcr)
        model_cfg["pts_middle_encoder"] = dict(
            model_cfg["pts_middle_encoder"], in_channels=16,
            output_shape=[32, 32])
        model_cfg["pts_backbone"] = dict(
            model_cfg["pts_backbone"], in_channels=16,
            out_channels=[16, 32, 64], layer_nums=[1, 1, 1])
        model_cfg["pts_neck"] = dict(
            model_cfg["pts_neck"], in_channels=[16, 32, 64],
            out_channels=[16, 16, 16])
        model_cfg["pts_bbox_head"] = dict(
            model_cfg["pts_bbox_head"], in_channels=48, feat_channels=48)
        model_cfg["pts_bbox_head"]["anchor_generator"] = dict(
            model_cfg["pts_bbox_head"]["anchor_generator"],
            ranges=[[-8, -8, r[2], 8, 8, r[5]]
                    for r in model_cfg["pts_bbox_head"]
                    ["anchor_generator"]["ranges"]])
        batch_fn = lambda b: synthetic_points_batch(  # noqa: E731
            b, num_points=2048, num_gt=8, pcr=pcr)
    else:
        batch_fn = lambda b: synthetic_points_batch(b)  # noqa: E731
    model = build_detector(model_cfg)
    return model, batch_fn
