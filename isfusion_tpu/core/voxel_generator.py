"""Host-side (numpy) hard voxelizer for dataset pipelines.

Parity: `mmdet3d/core/voxel/voxel_generator.py:6` — the CPU/numba
voxelizer used by dataset-side transforms (VoxelBasedPointSampler), NOT
the on-device voxelization (`ops/voxel.py` is the jit path). Behavior
matched: points outside the range are skipped, voxels appear in
first-seen order, per-voxel points are capped at ``max_num_points``
(later arrivals dropped), and the voxel count is capped at
``max_voxels`` (later voxels dropped). Coordinates are (z, y, x).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


class VoxelGenerator:
    def __init__(self, voxel_size: Sequence[float],
                 point_cloud_range: Sequence[float],
                 max_num_points: int, max_voxels: int = 20000):
        self._voxel_size = np.asarray(voxel_size, np.float32)
        self._point_cloud_range = np.asarray(point_cloud_range, np.float32)
        self._max_num_points = int(max_num_points)
        self._max_voxels = int(max_voxels)
        gs = (self._point_cloud_range[3:] - self._point_cloud_range[:3]) \
            / self._voxel_size
        self._grid_size = np.round(gs).astype(np.int64)  # (nx, ny, nz)

    @property
    def voxel_size(self) -> np.ndarray:
        return self._voxel_size

    @property
    def point_cloud_range(self) -> np.ndarray:
        return self._point_cloud_range

    @property
    def grid_size(self) -> np.ndarray:
        return self._grid_size

    def generate(self, points: np.ndarray
                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """points (N, C>=3) -> (voxels (M, max_num_points, C),
        coors (M, 3) zyx, num_points_per_voxel (M,))."""
        points = np.asarray(points)
        pcr = self._point_cloud_range
        c = (points[:, :3] - pcr[:3]) / self._voxel_size
        coors_xyz = np.floor(c).astype(np.int64)
        in_range = np.all((coors_xyz >= 0) & (coors_xyz < self._grid_size),
                          axis=1)
        pts = points[in_range]
        coors_xyz = coors_xyz[in_range]
        if len(pts) == 0:
            return (np.zeros((0, self._max_num_points, points.shape[1]),
                             points.dtype),
                    np.zeros((0, 3), np.int32), np.zeros((0,), np.int32))
        nx, ny, _ = self._grid_size
        flat = (coors_xyz[:, 2] * ny + coors_xyz[:, 1]) * nx + coors_xyz[:, 0]
        # first-seen voxel order (reference dict-insertion semantics)
        uniq, first, inv = np.unique(flat, return_index=True,
                                     return_inverse=True)
        order = np.argsort(first, kind="stable")
        rank = np.empty_like(order)
        rank[order] = np.arange(len(order))
        vox_of_pt = rank[inv]                       # first-seen voxel index
        m = min(len(uniq), self._max_voxels)
        voxels = np.zeros((m, self._max_num_points, points.shape[1]),
                          points.dtype)
        num = np.zeros((m,), np.int32)
        coors = np.zeros((m, 3), np.int32)
        keep_first = first[order[:m]]
        coors[:, 0] = coors_xyz[keep_first, 2]
        coors[:, 1] = coors_xyz[keep_first, 1]
        coors[:, 2] = coors_xyz[keep_first, 0]
        for p in range(len(pts)):                   # original point order
            v = vox_of_pt[p]
            if v >= m:
                continue
            k = num[v]
            if k < self._max_num_points:
                voxels[v, k] = pts[p]
                num[v] = k + 1
        return voxels, coors, num

    def __repr__(self):
        return (f"VoxelGenerator(voxel_size={self._voxel_size.tolist()}, "
                f"point_cloud_range={self._point_cloud_range.tolist()}, "
                f"max_num_points={self._max_num_points}, "
                f"max_voxels={self._max_voxels})")
