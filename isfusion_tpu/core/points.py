"""Point-cloud containers (host-side numpy).

Parity with the reference's `mmdet3d/core/points/` (BasePoints + LiDAR/
Camera/Depth variants): (N, points_dim) tensors with xyz in the leading
columns plus attribute dims (intensity, sweep-time-lag, ...).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Union

import numpy as np

ArrayLike = Union[np.ndarray, Sequence]


class BasePoints:
    ROT_AXIS = 2

    def __init__(self, tensor: ArrayLike, points_dim: int = 3,
                 attribute_dims: Optional[Dict[str, int]] = None):
        tensor = np.asarray(tensor, dtype=np.float32)
        if tensor.size == 0:
            tensor = tensor.reshape(0, points_dim)
        assert tensor.ndim == 2 and tensor.shape[-1] == points_dim, \
            f"expected (N, {points_dim}), got {tensor.shape}"
        self.tensor = tensor.copy()
        self.points_dim = points_dim
        self.attribute_dims = attribute_dims

    @property
    def coord(self) -> np.ndarray:
        return self.tensor[:, :3]

    @coord.setter
    def coord(self, value: np.ndarray) -> None:
        self.tensor[:, :3] = value

    @property
    def height(self) -> Optional[np.ndarray]:
        if self.attribute_dims and "height" in self.attribute_dims:
            return self.tensor[:, self.attribute_dims["height"]]
        return None

    @property
    def color(self) -> Optional[np.ndarray]:
        if self.attribute_dims and "color" in self.attribute_dims:
            return self.tensor[:, self.attribute_dims["color"]]
        return None

    @property
    def shape(self):
        return self.tensor.shape

    def shuffle(self, rng: Optional[np.random.Generator] = None) -> np.ndarray:
        rng = rng or np.random.default_rng()
        idx = rng.permutation(self.tensor.shape[0])
        self.tensor = self.tensor[idx]
        return idx

    def rotate(self, rotation, axis: Optional[int] = None):
        """Rotate points by an angle (counter-clockwise around ``axis``) or a
        3x3 matrix applied as ``xyz @ R``.

        Scalar semantics match the reference's BasePoints.rotate
        (`mmdet3d/core/points/base_points.py:140-180`, which builds the
        base matrix and then TRANSPOSES it): for row vectors,
        ``rotate(+phi)`` moves a point counter-clockwise by ``phi`` around
        the axis. The box classes' paired calls (``boxes.rotate(theta,
        points)``) rely on this sign — a non-transposed axis-2 matrix here
        silently rotated points OPPOSITE to box centers in every
        GlobalRotScaleTrans aug (found via zero train-time positives)."""
        rotation = np.asarray(rotation, dtype=np.float32)
        axis = self.ROT_AXIS if axis is None else axis
        if rotation.size == 1:
            rot_sin, rot_cos = np.sin(rotation), np.cos(rotation)
            if axis == 2:
                rot_mat_T = np.array([[rot_cos, rot_sin, 0],
                                      [-rot_sin, rot_cos, 0],
                                      [0, 0, 1]], dtype=np.float32)
            elif axis == 1:
                rot_mat_T = np.array([[rot_cos, 0, rot_sin],
                                      [0, 1, 0],
                                      [-rot_sin, 0, rot_cos]],
                                     dtype=np.float32)
            elif axis == 0:
                rot_mat_T = np.array([[1, 0, 0],
                                      [0, rot_cos, rot_sin],
                                      [0, -rot_sin, rot_cos]],
                                     dtype=np.float32)
            else:
                raise ValueError(axis)
        else:
            rot_mat_T = rotation
        self.tensor[:, :3] = self.tensor[:, :3] @ rot_mat_T
        return rot_mat_T

    def flip(self, bev_direction: str = "horizontal") -> None:
        raise NotImplementedError

    def translate(self, trans_vector: ArrayLike) -> None:
        self.tensor[:, :3] += np.asarray(trans_vector, dtype=np.float32)

    def scale(self, scale_factor: float) -> None:
        self.tensor[:, :3] *= scale_factor

    def in_range_3d(self, point_range: Sequence[float]) -> np.ndarray:
        t = self.tensor
        return ((t[:, 0] > point_range[0]) & (t[:, 1] > point_range[1])
                & (t[:, 2] > point_range[2]) & (t[:, 0] < point_range[3])
                & (t[:, 1] < point_range[4]) & (t[:, 2] < point_range[5]))

    def in_range_bev(self, point_range: Sequence[float]) -> np.ndarray:
        t = self.tensor
        return ((t[:, 0] > point_range[0]) & (t[:, 1] > point_range[1])
                & (t[:, 0] < point_range[2]) & (t[:, 1] < point_range[3]))

    def __getitem__(self, item) -> "BasePoints":
        if isinstance(item, (int, np.integer)):
            data = self.tensor[item][None]
        else:
            data = self.tensor[item]
        return type(self)(data, points_dim=self.points_dim,
                          attribute_dims=self.attribute_dims)

    def __len__(self) -> int:
        return self.tensor.shape[0]

    def __repr__(self) -> str:
        return f"{type(self).__name__}(\n    {self.tensor})"

    @classmethod
    def cat(cls, points_list: Sequence["BasePoints"]) -> "BasePoints":
        assert len(points_list) > 0
        p0 = points_list[0]
        tensor = np.concatenate([p.tensor for p in points_list], axis=0)
        return cls(tensor, points_dim=p0.points_dim,
                   attribute_dims=p0.attribute_dims)

    def clone(self) -> "BasePoints":
        return type(self)(self.tensor.copy(), points_dim=self.points_dim,
                          attribute_dims=self.attribute_dims)

    def new_point(self, data: ArrayLike) -> "BasePoints":
        data = np.asarray(data, dtype=np.float32)
        return type(self)(data, points_dim=data.shape[-1],
                          attribute_dims=self.attribute_dims)

    def numpy(self) -> np.ndarray:
        return self.tensor

    def convert_to(self, dst, rt_mat=None):
        from .bbox.structures import Box3DMode
        # Coordinate conversion for points follows the same rt matrices as
        # boxes but only transforms xyz.
        defaults = {
            (Box3DMode.LIDAR, Box3DMode.CAM):
                np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float32),
            (Box3DMode.CAM, Box3DMode.LIDAR):
                np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float32),
            (Box3DMode.DEPTH, Box3DMode.CAM):
                np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]], np.float32),
            (Box3DMode.CAM, Box3DMode.DEPTH):
                np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32),
            (Box3DMode.LIDAR, Box3DMode.DEPTH):
                np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32),
            (Box3DMode.DEPTH, Box3DMode.LIDAR):
                np.array([[0, 1, 0], [-1, 0, 0], [0, 0, 1]], np.float32),
        }
        src = self.MODE
        if src == dst:
            return self.clone()
        if rt_mat is None:
            rt_mat = defaults[(src, dst)]
        rt_mat = np.asarray(rt_mat, dtype=np.float32)
        tensor = self.tensor.copy()
        if rt_mat.shape[1] == 4:
            xyz1 = np.concatenate(
                [tensor[:, :3], np.ones_like(tensor[:, :1])], -1)
            tensor[:, :3] = (xyz1 @ rt_mat.T)[:, :3]
        else:
            tensor[:, :3] = tensor[:, :3] @ rt_mat.T
        cls = {Box3DMode.LIDAR: LiDARPoints, Box3DMode.CAM: CameraPoints,
               Box3DMode.DEPTH: DepthPoints}[dst]
        return cls(tensor, points_dim=self.points_dim,
                   attribute_dims=self.attribute_dims)


class LiDARPoints(BasePoints):
    ROT_AXIS = 2

    def flip(self, bev_direction: str = "horizontal") -> None:
        if bev_direction == "horizontal":
            self.tensor[:, 1] = -self.tensor[:, 1]
        elif bev_direction == "vertical":
            self.tensor[:, 0] = -self.tensor[:, 0]


class CameraPoints(BasePoints):
    ROT_AXIS = 1

    def flip(self, bev_direction: str = "horizontal") -> None:
        if bev_direction == "horizontal":
            self.tensor[:, 0] = -self.tensor[:, 0]
        elif bev_direction == "vertical":
            self.tensor[:, 2] = -self.tensor[:, 2]


class DepthPoints(BasePoints):
    ROT_AXIS = 2

    def flip(self, bev_direction: str = "horizontal") -> None:
        if bev_direction == "horizontal":
            self.tensor[:, 0] = -self.tensor[:, 0]
        elif bev_direction == "vertical":
            self.tensor[:, 1] = -self.tensor[:, 1]


from .bbox.structures import Box3DMode as _B3M  # noqa: E402
LiDARPoints.MODE = _B3M.LIDAR
CameraPoints.MODE = _B3M.CAM
DepthPoints.MODE = _B3M.DEPTH


def get_points_type(points_type: str):
    mapping = {"lidar": LiDARPoints, "camera": CameraPoints,
               "depth": DepthPoints}
    key = points_type.lower()
    if key not in mapping:
        raise ValueError(f"unknown points type {points_type}")
    return mapping[key]
