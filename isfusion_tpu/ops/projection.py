"""LiDAR-point -> camera-pixel projection (shared by PointFusion and the
IS-Fusion Point-to-Grid sampler).

Parity: the projection pipeline of `mmdet3d/models/middle_encoders/
fusion_encoder.py:965-1040` (img_point_sampling) and
`mmdet3d/models/fusion_layers/point_fusion.py:14` (point_sample):
undo the LiDAR-frame augmentation (lidar_aug_matrix), project with
lidar2img, perspective-divide, then apply the per-view image augmentation
matrix (img_aug_matrix). The reference loops over B x 6 cameras in python;
here a single einsum handles all views at once.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def project_points_to_cameras(
        xyz: jnp.ndarray,
        lidar2img: jnp.ndarray,
        lidar_aug_matrix: Optional[jnp.ndarray] = None,
        img_aug_matrix: Optional[jnp.ndarray] = None,
        eps: float = 1e-5) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Project (P, 3) LiDAR points into N camera images.

    lidar2img (N, 4, 4); lidar_aug_matrix (4, 4) maps original->augmented
    LiDAR frame (so it is inverted here); img_aug_matrix (N, 4, 4) maps
    original pixels -> augmented (network input) pixels.

    Returns (uv (N, P, 2) pixel coords in network-input space,
    depth (N, P), in_front (N, P) bool).
    """
    if lidar_aug_matrix is not None:
        inv = jnp.linalg.inv(lidar_aug_matrix)
        xyz = xyz @ inv[:3, :3].T + inv[:3, 3]
    hom = jnp.concatenate([xyz, jnp.ones_like(xyz[:, :1])], axis=-1)  # (P,4)
    cam = jnp.einsum("nij,pj->npi", lidar2img, hom)                  # (N,P,4)
    depth = cam[..., 2]
    in_front = depth > eps
    uv = cam[..., :2] / jnp.maximum(depth[..., None], eps)
    if img_aug_matrix is not None:
        uvh = jnp.concatenate(
            [uv, jnp.ones(uv.shape[:-1] + (2,), uv.dtype)], axis=-1)
        uv = jnp.einsum("nij,npj->npi", img_aug_matrix, uvh)[..., :2]
    return uv, depth, in_front


def uv_valid_mask(uv: jnp.ndarray, img_hw: Tuple[int, int]) -> jnp.ndarray:
    """In-image mask for (.., 2) pixel coords given static (H, W)."""
    h, w = img_hw
    return (uv[..., 0] >= 0) & (uv[..., 0] < w) & \
        (uv[..., 1] >= 0) & (uv[..., 1] < h)
