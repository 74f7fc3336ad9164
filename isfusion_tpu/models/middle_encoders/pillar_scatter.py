"""PointPillarsScatter middle encoder.

Parity: `mmdet3d/models/middle_encoders/pillar_scatter.py:10` — scatter
(B, V, C) pillar features onto dense (B, ny, nx, C) BEV canvases (NHWC).
The batch dim is folded into the scatter indices: one fused XLA scatter.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...registry import MIDDLE_ENCODERS


@MIDDLE_ENCODERS.register_module()
class PointPillarsScatter(nn.Module):
    in_channels: int = 64
    output_shape: Sequence[int] = (496, 432)  # (ny, nx)

    @nn.compact
    def __call__(self, voxel_features: jnp.ndarray, coors: jnp.ndarray,
                 voxel_mask: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """voxel_features (B, V, C); coors (B, V, 3) int32 zyx;
        voxel_mask (B, V) -> (B, ny, nx, C)."""
        ny, nx = int(self.output_shape[0]), int(self.output_shape[1])
        b, v, c = voxel_features.shape
        flat_idx = jnp.where(
            voxel_mask,
            (jnp.arange(b, dtype=jnp.int32)[:, None] * (ny * nx)
             + coors[..., 1] * nx + coors[..., 2]),
            b * ny * nx)  # invalid -> dropped
        canvas = jnp.zeros((b * ny * nx, c), voxel_features.dtype)
        canvas = canvas.at[flat_idx.reshape(-1)].set(
            jnp.where(voxel_mask[..., None], voxel_features,
                      0.0).reshape(-1, c),
            mode="drop")
        return canvas.reshape(b, ny, nx, c)
