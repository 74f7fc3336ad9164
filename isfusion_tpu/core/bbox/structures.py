"""3D box structures (host-side, numpy-backed).

Behavioral parity with the reference's box structures
(`mmdet3d/core/bbox/structures/{base_box3d,lidar_box3d,cam_box3d,depth_box3d,
box_3d_mode}.py`): same tensor layout ``(x, y, z, dx, dy, dz, yaw, ...)``,
same rotate/flip/convert conventions. These live on the host (data pipeline,
target prep, evaluation); the device compute path uses plain jnp arrays with
the same row layout (see :mod:`isfusion_tpu.ops.box_ops`).
"""
from __future__ import annotations

from enum import IntEnum
from typing import Iterator, Optional, Sequence, Tuple, Union

import numpy as np

ArrayLike = Union[np.ndarray, Sequence]


def limit_period(val, offset: float = 0.5, period: float = np.pi):
    """Limit ``val`` to ``[-offset*period, (1-offset)*period)``."""
    val = np.asarray(val)
    return val - np.floor(val / period + offset) * period


def rotation_3d_in_axis(points: np.ndarray, angles, axis: int = 0) -> np.ndarray:
    """Rotate batched points ``(N, M, 3)`` by per-box ``angles (N,)`` around axis."""
    points = np.asarray(points, dtype=np.float32)
    angles = np.broadcast_to(np.asarray(angles, dtype=np.float32),
                             (points.shape[0],))
    rot_sin = np.sin(angles)
    rot_cos = np.cos(angles)
    ones = np.ones_like(rot_cos)
    zeros = np.zeros_like(rot_cos)
    if axis == 1:
        rot = np.stack([
            np.stack([rot_cos, zeros, -rot_sin], -1),
            np.stack([zeros, ones, zeros], -1),
            np.stack([rot_sin, zeros, rot_cos], -1),
        ], 1)
    elif axis in (2, -1):
        rot = np.stack([
            np.stack([rot_cos, -rot_sin, zeros], -1),
            np.stack([rot_sin, rot_cos, zeros], -1),
            np.stack([zeros, zeros, ones], -1),
        ], 1)
    elif axis == 0:
        rot = np.stack([
            np.stack([zeros, rot_cos, -rot_sin], -1),
            np.stack([zeros, rot_sin, rot_cos], -1),
            np.stack([ones, zeros, zeros], -1),
        ], 1)
    else:
        raise ValueError(f"axis must be in 0..2, got {axis}")
    return np.einsum("aij,ajk->aik", points, rot)


def xywhr2xyxyr(boxes_xywhr: np.ndarray) -> np.ndarray:
    """Convert rotated BEV boxes (x, y, dx, dy, r) to (x1, y1, x2, y2, r)."""
    boxes = np.zeros_like(boxes_xywhr)
    half_w = boxes_xywhr[..., 2] / 2
    half_h = boxes_xywhr[..., 3] / 2
    boxes[..., 0] = boxes_xywhr[..., 0] - half_w
    boxes[..., 1] = boxes_xywhr[..., 1] - half_h
    boxes[..., 2] = boxes_xywhr[..., 0] + half_w
    boxes[..., 3] = boxes_xywhr[..., 1] + half_h
    boxes[..., 4] = boxes_xywhr[..., 4]
    return boxes


# Unit-cube corner template in "unravel" order with the reference's reordering
# so faces come out in a consistent winding (base_box3d corners docstring).
_CORNERS_NORM = np.stack(
    np.unravel_index(np.arange(8), [2] * 3), axis=1
).astype(np.float32)[[0, 1, 3, 2, 4, 5, 7, 6]]


class BaseInstance3DBoxes:
    """Base 3D box container.

    tensor: float32 array of shape (N, box_dim); each row
    ``(x, y, z, dx, dy, dz, yaw, ...)`` with an origin convention given by the
    subclass (the stored z/y is shifted so that the internal origin matches).
    """

    YAW_AXIS = 2  # rotation axis in this coordinate system
    DEFAULT_ORIGIN = (0.5, 0.5, 0)

    def __init__(self, tensor: ArrayLike, box_dim: int = 7,
                 with_yaw: bool = True,
                 origin: Tuple[float, float, float] = None):
        origin = origin if origin is not None else self.DEFAULT_ORIGIN
        tensor = np.asarray(tensor, dtype=np.float32)
        if tensor.size == 0:
            tensor = tensor.reshape(0, box_dim)
        assert tensor.ndim == 2 and tensor.shape[-1] == box_dim, \
            f"expected (N, {box_dim}), got {tensor.shape}"
        tensor = tensor.copy()
        if tensor.shape[-1] == 6:
            # minmax boxes without yaw
            fake_rot = np.zeros((tensor.shape[0], 1), dtype=tensor.dtype)
            tensor = np.concatenate([tensor, fake_rot], axis=-1)
            box_dim += 1
            with_yaw = False
        self.box_dim = box_dim
        self.with_yaw = with_yaw
        if tuple(origin) != self.DEFAULT_ORIGIN:
            dst = np.array(self.DEFAULT_ORIGIN, dtype=np.float32)
            src = np.array(origin, dtype=np.float32)
            tensor[:, :3] += tensor[:, 3:6] * (dst - src)
        self.tensor = tensor

    # ---- basic accessors -------------------------------------------------
    @property
    def volume(self) -> np.ndarray:
        return self.tensor[:, 3] * self.tensor[:, 4] * self.tensor[:, 5]

    @property
    def dims(self) -> np.ndarray:
        return self.tensor[:, 3:6]

    @property
    def yaw(self) -> np.ndarray:
        return self.tensor[:, 6]

    @property
    def height(self) -> np.ndarray:
        return self.tensor[:, 5]

    @property
    def top_height(self) -> np.ndarray:
        return self.bottom_height + self.height

    @property
    def bottom_height(self) -> np.ndarray:
        return self.tensor[:, 2]

    @property
    def center(self) -> np.ndarray:
        """Bottom center (the stored center under the default origin)."""
        return self.bottom_center

    @property
    def bottom_center(self) -> np.ndarray:
        return self.tensor[:, :3]

    @property
    def gravity_center(self) -> np.ndarray:
        bottom = self.bottom_center
        out = bottom.copy()
        out[:, 2] = bottom[:, 2] + self.tensor[:, 5] * 0.5
        return out

    @property
    def corners(self) -> np.ndarray:
        """(N, 8, 3) box corners."""
        if len(self) == 0:
            return np.zeros((0, 8, 3), dtype=np.float32)
        dims = self.dims
        origin = np.array(self.DEFAULT_ORIGIN, dtype=np.float32)
        corners_norm = _CORNERS_NORM - origin
        corners = dims[:, None, :] * corners_norm[None]
        corners = rotation_3d_in_axis(corners, self.tensor[:, 6],
                                      axis=self.YAW_AXIS)
        return corners + self.tensor[:, None, :3]

    # ---- mutation --------------------------------------------------------
    def translate(self, trans_vector: ArrayLike) -> None:
        self.tensor[:, :3] += np.asarray(trans_vector, dtype=np.float32)

    def scale(self, scale_factor: float) -> None:
        self.tensor[:, :6] *= scale_factor
        if self.tensor.shape[1] >= 9:
            self.tensor[:, 7:9] *= scale_factor

    def limit_yaw(self, offset: float = 0.5, period: float = np.pi) -> None:
        self.tensor[:, 6] = limit_period(self.tensor[:, 6], offset, period)

    # ---- predicates -------------------------------------------------------
    def in_range_3d(self, box_range: Sequence[float]) -> np.ndarray:
        t = self.tensor
        return ((t[:, 0] > box_range[0]) & (t[:, 1] > box_range[1])
                & (t[:, 2] > box_range[2]) & (t[:, 0] < box_range[3])
                & (t[:, 1] < box_range[4]) & (t[:, 2] < box_range[5]))

    def in_range_bev(self, box_range: Sequence[float]) -> np.ndarray:
        t = self.tensor
        return ((t[:, 0] > box_range[0]) & (t[:, 1] > box_range[1])
                & (t[:, 0] < box_range[2]) & (t[:, 1] < box_range[3]))

    def nonempty(self, threshold: float = 0.0) -> np.ndarray:
        t = self.tensor
        return (t[:, 3] > threshold) & (t[:, 4] > threshold) & \
               (t[:, 5] > threshold)

    # ---- container protocol -------------------------------------------------
    def __getitem__(self, item) -> "BaseInstance3DBoxes":
        if isinstance(item, (int, np.integer)):
            data = self.tensor[item][None]
        else:
            data = self.tensor[item]
        return self.new_box(data)

    def __len__(self) -> int:
        return self.tensor.shape[0]

    def __iter__(self) -> Iterator[np.ndarray]:
        yield from self.tensor

    def __repr__(self) -> str:
        return f"{type(self).__name__}(\n    {self.tensor})"

    @classmethod
    def cat(cls, boxes_list: Sequence["BaseInstance3DBoxes"]):
        assert len(boxes_list) > 0
        assert all(isinstance(b, cls) for b in boxes_list)
        b0 = boxes_list[0]
        tensor = np.concatenate([b.tensor for b in boxes_list], axis=0)
        return cls(tensor, box_dim=b0.box_dim, with_yaw=b0.with_yaw)

    def clone(self) -> "BaseInstance3DBoxes":
        return self.new_box(self.tensor.copy())

    def new_box(self, data: ArrayLike) -> "BaseInstance3DBoxes":
        data = np.asarray(data, dtype=np.float32)
        return type(self)(data, box_dim=data.shape[-1],
                          with_yaw=self.with_yaw)

    def convert_to(self, dst: "Box3DMode", rt_mat=None):
        return Box3DMode.convert(self, src=self.MODE, dst=dst, rt_mat=rt_mat)

    # numpy interop used by pipeline code
    def numpy(self) -> np.ndarray:
        return self.tensor


class LiDARInstance3DBoxes(BaseInstance3DBoxes):
    """Boxes in LiDAR coordinates (x front, y left, z up; yaw around z,
    0 at -y decreasing towards +x; bottom-center origin (0.5, 0.5, 0))."""

    YAW_AXIS = 2
    DEFAULT_ORIGIN = (0.5, 0.5, 0)

    @property
    def bev(self) -> np.ndarray:
        """(N, 5) BEV boxes in XYWHR."""
        return self.tensor[:, [0, 1, 3, 4, 6]]

    @property
    def nearest_bev(self) -> np.ndarray:
        """Axis-aligned (N, 4) BEV boxes (x1, y1, x2, y2)."""
        bev = self.bev
        rot = np.abs(limit_period(bev[:, -1], 0.5, np.pi))
        cond = (rot > np.pi / 4)[:, None]
        xywh = np.where(cond, bev[:, [0, 1, 3, 2]], bev[:, :4])
        centers, dims = xywh[:, :2], xywh[:, 2:]
        return np.concatenate([centers - dims / 2, centers + dims / 2], -1)

    def rotate(self, angle, points=None):
        """Rotate boxes (and optionally points) around the z axis.

        ``angle`` may be a scalar angle or a 3x3 rotation matrix transposed
        (rot_mat_T) — matching the reference semantics where
        ``xyz' = xyz @ rot_mat_T`` and ``yaw += angle``.
        """
        angle = np.asarray(angle, dtype=np.float32)
        if angle.size == 1:
            rot_sin, rot_cos = np.sin(angle), np.cos(angle)
            rot_mat_T = np.array([[rot_cos, -rot_sin, 0],
                                  [rot_sin, rot_cos, 0],
                                  [0, 0, 1]], dtype=np.float32)
        else:
            rot_mat_T = angle
            angle = np.arctan2(rot_mat_T[1, 0], rot_mat_T[0, 0])
        self.tensor[:, :3] = self.tensor[:, :3] @ rot_mat_T
        self.tensor[:, 6] += float(angle)
        if self.tensor.shape[1] == 9:
            self.tensor[:, 7:9] = self.tensor[:, 7:9] @ rot_mat_T[:2, :2]
        if points is not None:
            if isinstance(points, np.ndarray):
                points[:, :3] = points[:, :3] @ rot_mat_T
            else:  # BasePoints
                points.rotate(-float(angle))
            return points, rot_mat_T
        return rot_mat_T

    def flip(self, bev_direction: str = "horizontal", points=None):
        assert bev_direction in ("horizontal", "vertical")
        if bev_direction == "horizontal":
            self.tensor[:, 1::7] = -self.tensor[:, 1::7]  # y and vy
            if self.with_yaw:
                self.tensor[:, 6] = -self.tensor[:, 6] + np.pi
        else:
            self.tensor[:, 0::7] = -self.tensor[:, 0::7]  # x and vx
            if self.with_yaw:
                self.tensor[:, 6] = -self.tensor[:, 6]
        if points is not None:
            if isinstance(points, np.ndarray):
                points[:, 1 if bev_direction == "horizontal" else 0] *= -1
            else:
                points.flip(bev_direction)
            return points

    def enlarged_box(self, extra_width: float) -> "LiDARInstance3DBoxes":
        enlarged = self.tensor.copy()
        enlarged[:, 3:6] += extra_width * 2
        enlarged[:, 2] -= extra_width
        return self.new_box(enlarged)

    def points_in_boxes(self, points: np.ndarray) -> np.ndarray:
        """Index of the box containing each point (-1 if none)."""
        from .box_np_ops import points_in_rbbox
        mask = points_in_rbbox(points[:, :3], self.tensor)  # (P, N)
        idx = np.where(mask.any(-1), mask.argmax(-1), -1)
        return idx


class CameraInstance3DBoxes(BaseInstance3DBoxes):
    """Boxes in camera coordinates (x right, y down, z front; yaw around y;
    origin (0.5, 1.0, 0.5))."""

    YAW_AXIS = 1
    DEFAULT_ORIGIN = (0.5, 1.0, 0.5)

    @property
    def height(self) -> np.ndarray:
        return self.tensor[:, 4]

    @property
    def top_height(self) -> np.ndarray:
        # y is downwards: top has smaller y
        return self.bottom_height - self.height

    @property
    def bottom_height(self) -> np.ndarray:
        return self.tensor[:, 1]

    @property
    def gravity_center(self) -> np.ndarray:
        bottom = self.bottom_center
        out = bottom.copy()
        out[:, 1] = bottom[:, 1] - self.tensor[:, 4] * 0.5
        return out

    @property
    def corners(self) -> np.ndarray:
        if len(self) == 0:
            return np.zeros((0, 8, 3), dtype=np.float32)
        dims = self.dims
        corners_norm = _CORNERS_NORM - np.array([0.5, 1.0, 0.5],
                                                dtype=np.float32)
        corners = dims[:, None, :] * corners_norm[None]
        corners = rotation_3d_in_axis(corners, self.tensor[:, 6], axis=1)
        return corners + self.tensor[:, None, :3]

    @property
    def bev(self) -> np.ndarray:
        """(N, 5) BEV (x, z, dx, dz, r) in camera ground plane."""
        return self.tensor[:, [0, 2, 3, 5, 6]]

    def rotate(self, angle, points=None):
        angle = np.asarray(angle, dtype=np.float32)
        if angle.size == 1:
            rot_sin, rot_cos = np.sin(angle), np.cos(angle)
            rot_mat_T = np.array([[rot_cos, 0, -rot_sin],
                                  [0, 1, 0],
                                  [rot_sin, 0, rot_cos]], dtype=np.float32)
        else:
            rot_mat_T = angle
            angle = np.arctan2(rot_mat_T[2, 0], rot_mat_T[0, 0])
        self.tensor[:, :3] = self.tensor[:, :3] @ rot_mat_T
        self.tensor[:, 6] += float(angle)
        if points is not None:
            if isinstance(points, np.ndarray):
                points[:, :3] = points[:, :3] @ rot_mat_T
            else:
                # clockwise, like the centers (`cam_box3d.py:213-215`)
                points.rotate(-float(angle))
            return points, rot_mat_T
        return rot_mat_T

    def flip(self, bev_direction: str = "horizontal", points=None):
        assert bev_direction in ("horizontal", "vertical")
        if bev_direction == "horizontal":
            self.tensor[:, 0::7] = -self.tensor[:, 0::7]
            if self.with_yaw:
                self.tensor[:, 6] = -self.tensor[:, 6] + np.pi
        else:
            self.tensor[:, 2::7] = -self.tensor[:, 2::7]
            if self.with_yaw:
                self.tensor[:, 6] = -self.tensor[:, 6]
        if points is not None:
            if isinstance(points, np.ndarray):
                points[:, 0 if bev_direction == "horizontal" else 2] *= -1
            else:
                points.flip(bev_direction)
            return points

    def in_range_bev(self, box_range: Sequence[float]) -> np.ndarray:
        t = self.tensor
        return ((t[:, 0] > box_range[0]) & (t[:, 2] > box_range[1])
                & (t[:, 0] < box_range[2]) & (t[:, 2] < box_range[3]))


class DepthInstance3DBoxes(BaseInstance3DBoxes):
    """Boxes in depth coordinates (x right, y front, z up; yaw around z;
    origin (0.5, 0.5, 0)). Used by indoor models."""

    YAW_AXIS = 2
    DEFAULT_ORIGIN = (0.5, 0.5, 0)

    @property
    def bev(self) -> np.ndarray:
        return self.tensor[:, [0, 1, 3, 4, 6]]

    @property
    def nearest_bev(self) -> np.ndarray:
        bev = self.bev
        rot = np.abs(limit_period(bev[:, -1], 0.5, np.pi))
        cond = (rot > np.pi / 4)[:, None]
        xywh = np.where(cond, bev[:, [0, 1, 3, 2]], bev[:, :4])
        centers, dims = xywh[:, :2], xywh[:, 2:]
        return np.concatenate([centers - dims / 2, centers + dims / 2], -1)

    def rotate(self, angle, points=None):
        # reference depth_box3d.py:139-153: centers use the TRANSPOSED
        # matrix (counter-clockwise for row vectors) and yaw DECREASES
        angle = np.asarray(angle, dtype=np.float32)
        if angle.size == 1:
            rot_sin, rot_cos = np.sin(angle), np.cos(angle)
            rot_mat_T = np.array([[rot_cos, rot_sin, 0],
                                  [-rot_sin, rot_cos, 0],
                                  [0, 0, 1]], dtype=np.float32)
        else:
            rot_mat_T = np.asarray(angle, np.float32).T
            angle = np.arctan2(rot_mat_T[0, 1], rot_mat_T[0, 0])
        self.tensor[:, :3] = self.tensor[:, :3] @ rot_mat_T
        if self.with_yaw:
            self.tensor[:, 6] -= float(angle)
        if points is not None:
            if isinstance(points, np.ndarray):
                points[:, :3] = points[:, :3] @ rot_mat_T
            else:
                # anti-clockwise, like the centers (`depth_box3d.py:169-171`)
                points.rotate(float(angle))
            return points, rot_mat_T
        return rot_mat_T

    def flip(self, bev_direction: str = "horizontal", points=None):
        assert bev_direction in ("horizontal", "vertical")
        if bev_direction == "horizontal":
            self.tensor[:, 0::7] = -self.tensor[:, 0::7]
            if self.with_yaw:
                self.tensor[:, 6] = -self.tensor[:, 6] + np.pi
        else:
            self.tensor[:, 1::7] = -self.tensor[:, 1::7]
            if self.with_yaw:
                self.tensor[:, 6] = -self.tensor[:, 6]
        if points is not None:
            if isinstance(points, np.ndarray):
                points[:, 0 if bev_direction == "horizontal" else 1] *= -1
            else:
                points.flip(bev_direction)
            return points


class Box3DMode(IntEnum):
    """Coordinate modes + conversion (reference `box_3d_mode.py:105-128`)."""

    LIDAR = 0
    CAM = 1
    DEPTH = 2

    @staticmethod
    def convert(box, src: "Box3DMode", dst: "Box3DMode", rt_mat=None):
        if src == dst:
            return box
        is_box_cls = isinstance(box, BaseInstance3DBoxes)
        if is_box_cls:
            arr = box.tensor.copy()
        else:
            arr = np.asarray(box, dtype=np.float32).copy()
            single = arr.ndim == 1
            if single:
                arr = arr[None]
        x_size, y_size, z_size = arr[..., 3:4], arr[..., 4:5], arr[..., 5:6]
        if src == Box3DMode.LIDAR and dst == Box3DMode.CAM:
            if rt_mat is None:
                rt_mat = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]],
                                  dtype=np.float32)
            xyz_size = np.concatenate([y_size, z_size, x_size], -1)
        elif src == Box3DMode.CAM and dst == Box3DMode.LIDAR:
            if rt_mat is None:
                rt_mat = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]],
                                  dtype=np.float32)
            xyz_size = np.concatenate([z_size, x_size, y_size], -1)
        elif src == Box3DMode.DEPTH and dst == Box3DMode.CAM:
            if rt_mat is None:
                rt_mat = np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]],
                                  dtype=np.float32)
            xyz_size = np.concatenate([x_size, z_size, y_size], -1)
        elif src == Box3DMode.CAM and dst == Box3DMode.DEPTH:
            if rt_mat is None:
                rt_mat = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]],
                                  dtype=np.float32)
            xyz_size = np.concatenate([x_size, z_size, y_size], -1)
        elif src == Box3DMode.LIDAR and dst == Box3DMode.DEPTH:
            if rt_mat is None:
                rt_mat = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]],
                                  dtype=np.float32)
            xyz_size = np.concatenate([y_size, x_size, z_size], -1)
        elif src == Box3DMode.DEPTH and dst == Box3DMode.LIDAR:
            if rt_mat is None:
                rt_mat = np.array([[0, 1, 0], [-1, 0, 0], [0, 0, 1]],
                                  dtype=np.float32)
            xyz_size = np.concatenate([y_size, x_size, z_size], -1)
        else:
            raise NotImplementedError(f"{src} -> {dst}")
        rt_mat = np.asarray(rt_mat, dtype=np.float32)
        if rt_mat.shape[1] == 4:
            xyz = np.concatenate(
                [arr[..., :3], np.ones_like(arr[..., :1])], -1) @ rt_mat.T
        else:
            xyz = arr[..., :3] @ rt_mat.T
        remains = arr[..., 6:]
        out = np.concatenate([xyz[..., :3], xyz_size, remains], -1)
        if not is_box_cls:
            return out[0] if single else out
        target_cls = {Box3DMode.LIDAR: LiDARInstance3DBoxes,
                      Box3DMode.CAM: CameraInstance3DBoxes,
                      Box3DMode.DEPTH: DepthInstance3DBoxes}[dst]
        return target_cls(out, box_dim=out.shape[-1], with_yaw=box.with_yaw)


# Mode tags used by convert_to
LiDARInstance3DBoxes.MODE = Box3DMode.LIDAR
CameraInstance3DBoxes.MODE = Box3DMode.CAM
DepthInstance3DBoxes.MODE = Box3DMode.DEPTH


def get_box_type(box_type: str):
    """Map a string ('LiDAR'/'Camera'/'Depth') to (box class, Box3DMode)."""
    box_type_lower = box_type.lower()
    mapping = {
        "lidar": (LiDARInstance3DBoxes, Box3DMode.LIDAR),
        "camera": (CameraInstance3DBoxes, Box3DMode.CAM),
        "depth": (DepthInstance3DBoxes, Box3DMode.DEPTH),
    }
    if box_type_lower not in mapping:
        raise ValueError(f"unknown box type {box_type}")
    return mapping[box_type_lower]
