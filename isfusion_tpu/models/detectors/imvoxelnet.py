"""ImVoxelNet: monocular image -> 3D voxel volume -> BEV detection.

Parity: `mmdet3d/models/detectors/imvoxelnet.py`: a 2D backbone+neck
extracts image features, which are lifted into a 3D voxel volume by
projecting every voxel center into the image and bilinearly sampling
(the reference's `point_sample`-style backprojection), then a 3D-to-BEV
neck and an Anchor3DHead detect in the voxel frame.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...registry import DETECTORS, NECKS
from ...ops.interpolate import grid_sample
from ...ops.projection import project_points_to_cameras
from ..builder import build_backbone, build_head, build_neck
from ..layers import ConvModule


@NECKS.register_module()
class OutdoorImVoxelNeck(nn.Module):
    """3D conv neck collapsing the voxel volume to BEV
    (`mmdet3d/models/necks/imvoxel_neck.py`)."""

    in_channels: int = 64
    out_channels: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x (B, nz, ny, nx, C) -> (B, ny, nx, C_out)."""
        c = self.in_channels
        for i, (ch, sz) in enumerate(((c, 1), (c * 2, 2), (c * 4, 2))):
            x = nn.Conv(ch, (3, 3, 3), strides=(sz, 1, 1), padding=1,
                        use_bias=False, name=f"conv{i}a")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             name=f"bn{i}a")(x)
            x = nn.relu(x)
        # collapse remaining z
        b, nz, ny, nx, ch = x.shape
        x = jnp.max(x, axis=1)
        x = ConvModule(self.out_channels, kernel_size=3, padding=1,
                       norm_cfg=dict(type="BN"), act_cfg=dict(type="relu"),
                       name="out_conv")(x, train=train)
        return x


@DETECTORS.register_module()
class ImVoxelNet(nn.Module):
    backbone: Optional[dict] = None
    neck: Optional[dict] = None
    neck_3d: Optional[dict] = None
    bbox_head: Optional[dict] = None
    n_voxels: Sequence[int] = (216, 248, 12)        # (nx, ny, nz)
    voxel_size: Sequence[float] = (0.32, 0.32, 0.33)
    point_cloud_range: Sequence[float] = (-34.56, -39.68, -3.08,
                                          34.56, 39.68, 0.88)
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    pretrained: Optional[str] = None

    def setup(self):
        self.backbone_m = build_backbone(dict(self.backbone))
        self.neck_m = build_neck(dict(self.neck)) if self.neck else None
        self.neck_3d_m = build_neck(dict(
            self.neck_3d or dict(type="OutdoorImVoxelNeck")))
        head_cfg = dict(self.bbox_head)
        head_cfg.setdefault("train_cfg", self.train_cfg)
        head_cfg.setdefault("test_cfg", self.test_cfg)
        self.bbox_head_m = build_head(head_cfg)

    def _voxel_centers(self) -> np.ndarray:
        nx, ny, nz = [int(v) for v in self.n_voxels]
        vs = np.asarray(self.voxel_size, np.float32)
        low = np.asarray(self.point_cloud_range[:3], np.float32)
        zi, yi, xi = np.meshgrid(np.arange(nz), np.arange(ny),
                                 np.arange(nx), indexing="ij")
        return np.stack([
            (xi + 0.5) * vs[0] + low[0],
            (yi + 0.5) * vs[1] + low[1],
            (zi + 0.5) * vs[2] + low[2]], -1).astype(np.float32)

    def __call__(self, batch: dict, train: bool = False,
                 mode: str = "predict"):
        img = batch["img"]
        feats = self.backbone_m(img, train=train)
        if self.neck_m is not None:
            feats = self.neck_m(feats, train=train)
        feat = feats[0] if isinstance(feats, (tuple, list)) else feats
        h, w = img.shape[1:3]
        centers = jnp.asarray(self._voxel_centers())      # (nz,ny,nx,3)
        nz, ny, nx = centers.shape[:3]
        flat = centers.reshape(-1, 3)

        def lift(fm, l2i):
            uv, depth, front = project_points_to_cameras(flat, l2i[None])
            gx = uv[0, :, 0] / w * 2 - 1
            gy = uv[0, :, 1] / h * 2 - 1
            valid = front[0] & (gx > -1) & (gx < 1) & (gy > -1) & (gy < 1)
            s = grid_sample(fm, jnp.stack([gx, gy], -1))
            s = jnp.where(valid[:, None], s, 0.0)
            return s.reshape(nz, ny, nx, -1)

        # full world->image projection: KITTI pipelines emit lidar2img
        # (P2 @ rect @ Tr_velo2cam); mono pipelines may emit cam2img as
        # the full projection. Bare-intrinsics cam2img without extrinsics
        # would sample geometrically wrong pixels for LiDAR-frame voxel
        # centers, so prefer lidar2img when present.
        proj = batch.get("lidar2img", batch.get("cam2img"))
        if proj is None:
            raise KeyError("ImVoxelNet needs 'lidar2img' or 'cam2img'")
        volume = jax.vmap(lift)(feat, proj)
        bev = self.neck_3d_m(volume, train=train)
        preds = self.bbox_head_m([bev], train=train)
        if mode == "feats":
            return preds
        if mode == "loss":
            return self.bbox_head_m.loss(
                preds, batch["gt_bboxes_3d"], batch["gt_labels_3d"],
                batch["gt_mask"])
        return self.bbox_head_m.get_bboxes(preds)
