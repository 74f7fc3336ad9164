"""Voxel/pillar feature encoders.

Parity targets: `mmdet3d/models/voxel_encoders/voxel_encoder.py`
(HardSimpleVFE:14, DynamicSimpleVFE:49, HardVFE:568, DynamicVFE:288) and
`pillar_encoder.py` (PillarFeatureNet:13).

TPU-native design: all inputs are fixed-capacity padded buffers with masks
and carry a leading batch dim. Hard encoders work on (B, V, T, C) voxel
buffers with purely elementwise/reduction ops. Dynamic encoders work on flat
(B, P, C) point buffers plus per-point voxel indices; the batch dim is folded
into the segment ids (one fused scatter across the whole batch) instead of
the reference's per-sample CUDA DynamicScatter.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..registry import VOXEL_ENCODERS
from ..ops.scatter import segment_max, segment_mean
from .layers import LinearNormAct


def _voxel_center_xyz(coors_zyx: jnp.ndarray, voxel_size, point_cloud_range
                      ) -> jnp.ndarray:
    """Metric center of voxels given integer (z, y, x) coords."""
    vs = jnp.asarray(voxel_size, jnp.float32)
    low = jnp.asarray(point_cloud_range[:3], jnp.float32)
    cx = (coors_zyx[..., 2].astype(jnp.float32) + 0.5) * vs[0] + low[0]
    cy = (coors_zyx[..., 1].astype(jnp.float32) + 0.5) * vs[1] + low[1]
    cz = (coors_zyx[..., 0].astype(jnp.float32) + 0.5) * vs[2] + low[2]
    return jnp.stack([cx, cy, cz], -1)


def batched_segment_ids(point_voxel_index: jnp.ndarray, cap: int
                        ) -> jnp.ndarray:
    """Fold (B, P) per-sample voxel slots (trash = cap) into global segment
    ids over B*(cap+1) segments."""
    b = point_voxel_index.shape[0]
    offs = (jnp.arange(b, dtype=jnp.int32) * (cap + 1))[:, None]
    return (point_voxel_index + offs).reshape(-1)


class _PooledVFE(nn.Module):
    """Shared implementation of PillarFeatureNet / HardVFE: augment point
    features, then Linear+BN+ReLU layers with per-voxel max pooling."""

    in_channels: int = 4
    feat_channels: Sequence[int] = (64,)
    with_distance: bool = False
    with_cluster_center: bool = True
    with_voxel_center: bool = True
    center_xy_only: bool = False  # PillarFeatureNet uses x/y offsets only
    voxel_size: Sequence[float] = (0.2, 0.2, 4)
    point_cloud_range: Sequence[float] = (0, -40, -3, 70.4, 40, 1)
    norm_cfg: Optional[dict] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, features: jnp.ndarray, num_points: jnp.ndarray,
                 coors: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """features (..., V, T, C); num_points (..., V); coors (..., V, 3)
        zyx -> (..., V, C')."""
        t = features.shape[-2]
        mask = (jnp.arange(t) < num_points[..., None])
        feats = [features]
        if self.with_cluster_center:
            mean = features[..., :3].sum(-2, keepdims=True) / \
                jnp.maximum(num_points, 1)[..., None, None].astype(
                    features.dtype)
            feats.append(features[..., :3] - mean)
        if self.with_voxel_center:
            center = _voxel_center_xyz(coors, self.voxel_size,
                                       self.point_cloud_range)
            nd = 2 if self.center_xy_only else 3
            feats.append(features[..., :nd] - center[..., None, :nd])
        if self.with_distance:
            feats.append(jnp.linalg.norm(features[..., :3], axis=-1,
                                         keepdims=True))
        x = jnp.concatenate(feats, axis=-1)
        x = jnp.where(mask[..., None], x, 0.0)
        norm_cfg = self.norm_cfg or dict(type="BN1d", eps=1e-3, momentum=0.01)
        pooled = None
        for i, c in enumerate(self.feat_channels):
            x = LinearNormAct(c, norm_cfg=norm_cfg,
                              act_cfg=dict(type="relu"),
                              axis_name=self.axis_name)(x, mask, train=train)
            pooled = jnp.max(jnp.where(mask[..., None], x, -jnp.inf), axis=-2)
            pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)
            if i < len(self.feat_channels) - 1:
                x = jnp.concatenate(
                    [x, jnp.repeat(pooled[..., None, :], t, axis=-2)],
                    axis=-1)
        return pooled


@VOXEL_ENCODERS.register_module()
class HardSimpleVFE(nn.Module):
    """Mean of points per voxel (`voxel_encoder.py:14`)."""

    num_features: int = 4

    @nn.compact
    def __call__(self, features: jnp.ndarray, num_points: jnp.ndarray,
                 coors: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        total = features[..., : self.num_features].sum(axis=-2)
        return total / jnp.maximum(num_points, 1)[..., None].astype(
            total.dtype)


@VOXEL_ENCODERS.register_module()
class PillarFeatureNet(_PooledVFE):
    """PointPillars pillar encoder (`pillar_encoder.py:13`): pillar x/y
    center offsets (2 channels) + cluster offsets (3)."""

    center_xy_only: bool = True
    legacy: bool = True


@VOXEL_ENCODERS.register_module()
class HardVFE(_PooledVFE):
    """VFE with per-layer max-pool + concat (`voxel_encoder.py:568`); xyz
    voxel-center offsets (3 channels)."""

    center_xy_only: bool = False
    feat_channels: Sequence[int] = (64, 64)


@VOXEL_ENCODERS.register_module()
class DynamicSimpleVFE(nn.Module):
    """Mean of points per voxel, dynamic form (`voxel_encoder.py:49`).

    features (B, P, C); point_voxel_index (B, P) -> (B, cap, num_features).
    """

    num_features: int = 4
    num_voxels_cap: int = 0  # 0 = derive from voxel_coors shape

    @nn.compact
    def __call__(self, features: jnp.ndarray, point_voxel_index: jnp.ndarray,
                 voxel_coors: jnp.ndarray = None, train: bool = False
                 ) -> jnp.ndarray:
        b, p, _ = features.shape
        cap = int(self.num_voxels_cap) or voxel_coors.shape[1]
        ids = batched_segment_ids(point_voxel_index, cap)
        flat = features[..., : self.num_features].reshape(b * p, -1)
        out = segment_mean(flat, ids, b * (cap + 1))
        return out.reshape(b, cap + 1, -1)[:, :cap]


@VOXEL_ENCODERS.register_module()
class DynamicVFE(nn.Module):
    """Dynamic voxel feature encoder (`voxel_encoder.py:288`): per-point MLP
    layers with voxel-pooled context concatenation, final scatter-max.

    features (B, P, C); point_voxel_index (B, P) with trash slot = cap;
    voxel_coors (B, cap, 3) zyx. Returns (B, cap, feat_channels[-1]).
    """

    in_channels: int = 4
    feat_channels: Sequence[int] = (64, 64)
    with_distance: bool = False
    with_cluster_center: bool = True
    with_voxel_center: bool = True
    voxel_size: Sequence[float] = (0.2, 0.2, 4)
    point_cloud_range: Sequence[float] = (0, -40, -3, 70.4, 40, 1)
    norm_cfg: Optional[dict] = None
    mode: str = "max"
    return_point_feats: bool = False
    num_voxels_cap: int = 0  # 0 = derive from voxel_coors shape
    fusion_layer: Optional[dict] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, features: jnp.ndarray, point_voxel_index: jnp.ndarray,
                 voxel_coors: jnp.ndarray, train: bool = False,
                 img_feats=None, calib: Optional[dict] = None):
        b, p, _ = features.shape
        cap = int(self.num_voxels_cap) or voxel_coors.shape[1]
        nseg = b * (cap + 1)
        ids = batched_segment_ids(point_voxel_index, cap)
        point_mask = (point_voxel_index < cap).reshape(-1)

        def to_flat(x):
            return x.reshape(b * p, -1)

        def gather_voxel(vox_flat):   # (nseg, C) -> per-point (B*P, C)
            return vox_flat[ids]

        flat = to_flat(features)
        feats = [flat]
        if self.with_cluster_center:
            vmean = segment_mean(flat[:, :3], ids, nseg)
            feats.append(flat[:, :3] - gather_voxel(vmean))
        if self.with_voxel_center:
            centers = _voxel_center_xyz(voxel_coors, self.voxel_size,
                                        self.point_cloud_range)
            centers = jnp.concatenate(
                [centers, jnp.zeros((b, 1, 3), centers.dtype)],
                axis=1).reshape(nseg, 3)
            feats.append(flat[:, :3] - gather_voxel(centers))
        if self.with_distance:
            feats.append(jnp.linalg.norm(flat[:, :3], axis=-1,
                                         keepdims=True))
        x = jnp.concatenate(feats, axis=-1)
        x = jnp.where(point_mask[:, None], x, 0.0)
        norm_cfg = self.norm_cfg or dict(type="BN1d", eps=1e-3, momentum=0.01)
        n_layers = len(self.feat_channels)
        voxel_feats = None
        for i, c in enumerate(self.feat_channels):
            x = LinearNormAct(c, norm_cfg=norm_cfg,
                              act_cfg=dict(type="relu"),
                              axis_name=self.axis_name)(x, point_mask,
                                                        train=train)
            if i == 0 and self.fusion_layer is not None and \
                    img_feats is not None:
                # MVX-Net point-wise fusion after the first VFE layer
                # (`voxel_encoder.py:528-537`)
                from .builder import build_fusion_layer
                fl = build_fusion_layer(dict(self.fusion_layer))
                x = fl(img_feats, features[..., :3],
                       x.reshape(b, p, -1), point_mask.reshape(b, p),
                       calib, train=train).reshape(b * p, -1)
            voxel_feats = segment_max(x, ids, nseg)
            voxel_feats = jnp.where(jnp.isfinite(voxel_feats), voxel_feats,
                                    0.0)
            if i < n_layers - 1:
                x = jnp.concatenate([x, gather_voxel(voxel_feats)], -1)
        if self.return_point_feats:
            return x.reshape(b, p, -1)
        return voxel_feats.reshape(b, cap + 1, -1)[:, :cap]


@VOXEL_ENCODERS.register_module()
class DynamicPillarFeatureNet(DynamicVFE):
    """Dynamic-scatter PillarFeatureNet (`pillar_encoder.py:155`): the
    DynamicVFE machinery with pillar-style defaults (single MLP layer)."""

    feat_channels: Sequence[int] = (64,)


@VOXEL_ENCODERS.register_module()
class DynamicFusionVFE(DynamicVFE):
    """DynamicVFE with the built-in point-wise fusion hook
    (`voxel_fusion_encoder.py:12`); fusion runs when img_feats/calib are
    provided and ``fusion_layer`` (PointFusion) is configured."""
