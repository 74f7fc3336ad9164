"""Point-wise LiDAR-camera fusion (MVX-Net).

Parity: `mmdet3d/models/fusion_layers/point_fusion.py:123` — per-level
lateral convs over image features, bilinear sampling at projected point
locations, Linear+BN transforms of both modalities, concat (+relu,
+optional fuse MLP).

TPU-native: one batched projection for all B x N_views cameras
(`ops/projection.py`) and vmapped grid sampling; multi-view samples are
averaged over the views that see the point (the reference's KITTI path is
single-view; the mean reduces to it)."""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import FUSION_LAYERS
from ...ops.interpolate import grid_sample
from ...ops.projection import project_points_to_cameras, uv_valid_mask
from ..layers import ConvModule, MaskedBatchNorm


@FUSION_LAYERS.register_module()
class PointFusion(nn.Module):
    img_channels: Any = 256
    pts_channels: int = 64
    mid_channels: int = 128
    out_channels: int = 128
    img_levels: Any = 3
    coord_type: str = "LIDAR"
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    activate_out: bool = True
    fuse_out: bool = False
    dropout_ratio: float = 0.0
    aligned: bool = True
    align_corners: bool = True
    padding_mode: str = "zeros"
    lateral_conv: bool = True

    def _levels(self) -> Sequence[int]:
        lv = self.img_levels
        return [lv] if isinstance(lv, int) else list(lv)

    @nn.compact
    def __call__(self, img_feats, points: jnp.ndarray,
                 pts_feats: jnp.ndarray, points_mask: jnp.ndarray,
                 calib: dict, train: bool = False) -> jnp.ndarray:
        """img_feats: list of (B, Nv, h, w, C); points (B, P, >=3);
        pts_feats (B, P, Cp); calib: lidar2img (B, Nv, 4, 4) [+ optional
        img_aug_matrix (B, Nv, 4, 4), lidar_aug_matrix (B, 4, 4),
        img_input_shape (H, W) static]. Returns (B, P, C_out[*2])."""
        levels = self._levels()
        feats = [img_feats[i] for i in levels]
        if self.lateral_conv:
            feats = [ConvModule(
                self.mid_channels, kernel_size=3, padding=1,
                norm_cfg=self.norm_cfg and dict(self.norm_cfg),
                act_cfg=self.act_cfg and dict(self.act_cfg),
                name=f"lateral_{i}")(
                    f.reshape((-1,) + f.shape[2:]), train=train).reshape(
                        f.shape[:2] + f.shape[2:4] + (self.mid_channels,))
                for i, f in enumerate(feats)]

        img_hw = tuple(calib["img_input_shape"])
        l2i = calib["lidar2img"]
        img_aug = calib.get("img_aug_matrix")
        lidar_aug = calib.get("lidar_aug_matrix")

        def sample_sample(xyz, l2i_s, img_aug_s, lidar_aug_s, *level_feats):
            uv, depth, front = project_points_to_cameras(
                xyz, l2i_s, lidar_aug_s, img_aug_s)
            valid = front & uv_valid_mask(uv, img_hw)     # (Nv, P)
            # normalized grid coords in network-input pixel space
            gx = uv[..., 0] / img_hw[1] * 2 - 1
            gy = uv[..., 1] / img_hw[0] * 2 - 1
            grid = jnp.stack([gx, gy], -1)                # (Nv, P, 2)
            outs = []
            for lf in level_feats:                        # (Nv, h, w, C)
                s = jax.vmap(lambda im, g: grid_sample(
                    im, g, align_corners=self.align_corners))(lf, grid)
                s = jnp.where(valid[..., None], s, 0.0)
                cnt = jnp.maximum(valid.sum(0), 1)[:, None]
                outs.append(s.sum(0) / cnt)               # (P, C) view-mean
            return jnp.concatenate(outs, -1)

        b = points.shape[0]
        img_pts = jax.vmap(sample_sample)(
            points[..., :3], l2i,
            img_aug if img_aug is not None else
            jnp.broadcast_to(jnp.eye(4), l2i.shape),
            lidar_aug if lidar_aug is not None else
            jnp.broadcast_to(jnp.eye(4), (b, 4, 4)),
            *feats)

        img_pre = nn.Dense(self.out_channels, name="img_transform")(img_pts)
        img_pre = MaskedBatchNorm(momentum=0.01, epsilon=1e-3)(
            img_pre, points_mask, train=train)
        if train and self.dropout_ratio > 0:
            img_pre = nn.Dropout(self.dropout_ratio,
                                 deterministic=False)(img_pre)
        pts_pre = nn.Dense(self.out_channels, name="pts_transform")(
            pts_feats)
        pts_pre = MaskedBatchNorm(momentum=0.01, epsilon=1e-3)(
            pts_pre, points_mask, train=train)
        out = jnp.concatenate([img_pre, pts_pre], axis=-1)
        if self.activate_out:
            out = nn.relu(out)
        if self.fuse_out:
            out = nn.Dense(self.out_channels, name="fuse")(out)
            out = MaskedBatchNorm(momentum=0.01, epsilon=1e-3)(
                out, points_mask, train=train)
            out = nn.relu(out)
        return jnp.where(points_mask[..., None], out, 0.0)
