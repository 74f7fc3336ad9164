"""PointNet++ set-abstraction / feature-propagation backbones.

Parity: `mmdet3d/models/backbones/pointnet2_sa_ssg.py` /
`pointnet2_sa_msg.py` + `mmdet3d/ops/pointnet_modules/` (SA and FP
modules): FPS sampling, ball-query grouping (optionally multi-scale),
shared MLPs with per-point BN, max-pooling; FP = three_nn inverse-distance
interpolation + MLP. All buffers padded with validity masks; batched
natively (B, N, ...) with the geometric ops vmapped per sample.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import BACKBONES
from ...ops.pointnet_ops import (ball_query, furthest_point_sample,
                                 group_points, interpolation_weights,
                                 three_nn)
from ..layers import MaskedBatchNorm


class _SharedMLP(nn.Module):
    """Per-point MLP: Dense + masked BN + ReLU stacks."""

    channels: Sequence[int]

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        for i, c in enumerate(self.channels):
            x = nn.Dense(int(c), use_bias=False, name=f"fc{i}")(x)
            x = MaskedBatchNorm(momentum=0.1, epsilon=1e-5,
                                name=f"bn{i}")(x, mask, train=train)
            x = nn.relu(x)
        return jnp.where(mask[..., None], x, 0.0)


class PointSAModule(nn.Module):
    """Single- or multi-scale set abstraction.

    __call__(xyz (B, N, 3), feats (B, N, C)|None, mask (B, N)) ->
    (new_xyz (B, S, 3), new_feats (B, S, C'), indices (B, S),
    new_mask (B, S))."""

    num_point: int
    radii: Sequence[float]
    sample_nums: Sequence[int]
    mlp_channels: Any          # list (SSG) or list-of-lists (MSG)
    use_xyz: bool = True
    pool_mod: str = "max"
    normalize_xyz: bool = False
    sa_type: str = "mlp"       # 'paconv' swaps the shared MLP for PAConv
    num_kernels: int = 8       # PAConv weight-bank size

    @nn.compact
    def __call__(self, xyz, feats, mask, train: bool = False):
        b, n, _ = xyz.shape
        idx = jax.vmap(lambda p, m: furthest_point_sample(
            p, self.num_point, m))(xyz, mask)               # (B, S)
        new_xyz = jnp.take_along_axis(xyz, idx[..., None], 1)
        new_mask = jnp.take_along_axis(mask, idx, 1)
        mlps = self.mlp_channels
        if not isinstance(mlps[0], (list, tuple)):
            mlps = [mlps]
        outs = []
        for scale, (radius, k, channels) in enumerate(
                zip(self.radii, self.sample_nums, mlps)):
            gi, gv = jax.vmap(lambda p, q, m: ball_query(
                float(radius), int(k), p, q, m))(xyz, new_xyz, mask)
            grouped_xyz = jax.vmap(group_points)(xyz, gi) - \
                new_xyz[:, :, None, :]
            if self.normalize_xyz:
                grouped_xyz = grouped_xyz / float(radius)
            parts = [grouped_xyz] if self.use_xyz else []
            if feats is not None:
                parts.append(jax.vmap(group_points)(feats, gi))
            g = jnp.concatenate(parts, -1)                 # (B, S, K, C)
            valid = gv & new_mask[:, :, None]
            if self.sa_type == "paconv":
                from ...ops.paconv import PAConv
                for li, ch in enumerate(channels):
                    g = PAConv(int(ch), num_kernels=self.num_kernels,
                               name=f"paconv{scale}_{li}")(
                        g, grouped_xyz, valid, train=train)
            else:
                g = _SharedMLP(tuple(channels),
                               name=f"mlp{scale}")(g, valid, train=train)
            if self.pool_mod == "max":
                g = jnp.max(jnp.where(valid[..., None], g, -jnp.inf), 2)
                g = jnp.where(jnp.isfinite(g), g, 0.0)
            else:
                cnt = jnp.maximum(valid.sum(-1), 1)[..., None]
                g = jnp.where(valid[..., None], g, 0.0).sum(2) / cnt
            outs.append(g)
        return new_xyz, jnp.concatenate(outs, -1), idx, new_mask


class PointFPModule(nn.Module):
    """Feature propagation: 3-NN inverse-distance interp + MLP."""

    mlp_channels: Sequence[int]

    @nn.compact
    def __call__(self, target_xyz, target_feats, source_xyz, source_feats,
                 target_mask, source_mask, train: bool = False):
        def interp(txyz, sxyz, sfeat, smask):
            d, idx = three_nn(txyz, sxyz, smask)
            w = interpolation_weights(d)
            return jnp.sum(sfeat[idx] * w[..., None], axis=1)

        up = jax.vmap(interp)(target_xyz, source_xyz, source_feats,
                              source_mask)
        if target_feats is not None:
            up = jnp.concatenate([target_feats, up], -1)
        return _SharedMLP(tuple(self.mlp_channels), name="mlp")(
            up, target_mask, train=train)


@BACKBONES.register_module()
class PointNet2SASSG(nn.Module):
    """Single-scale-grouping PointNet++ (`pointnet2_sa_ssg.py`)."""

    in_channels: int = 4
    num_points: Sequence[int] = (2048, 1024, 512, 256)
    radius: Sequence[float] = (0.2, 0.4, 0.8, 1.2)
    num_samples: Sequence[int] = (64, 32, 16, 16)
    sa_channels: Any = ((64, 64, 128), (128, 128, 256), (128, 128, 256),
                        (128, 128, 256))
    fp_channels: Any = ((256, 256), (256, 256))
    norm_cfg: Optional[dict] = None
    sa_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, points: jnp.ndarray, points_mask: jnp.ndarray,
                 train: bool = False) -> dict:
        """points (B, N, 3+C) -> dict of SA/FP pyramids (fp_xyz[-1],
        fp_features[-1], fp_indices[-1] are the heads' inputs)."""
        xyz = points[..., :3]
        feats = points[..., 3:] if points.shape[-1] > 3 else None
        sa_cfg = dict(self.sa_cfg or {})
        sa_xyz, sa_feats, sa_masks, sa_inds = [xyz], [feats], \
            [points_mask], [None]
        for i in range(len(self.num_points)):
            nx, nf, idx, nm = PointSAModule(
                num_point=int(self.num_points[i]),
                radii=[float(self.radius[i])],
                sample_nums=[int(self.num_samples[i])],
                mlp_channels=list(self.sa_channels[i]),
                use_xyz=bool(sa_cfg.get("use_xyz", True)),
                pool_mod=sa_cfg.get("pool_mod", "max"),
                sa_type="paconv" if "PAConv" in str(
                    sa_cfg.get("type", "")) else "mlp",
                num_kernels=int(sa_cfg.get("num_kernels", 8)),
                normalize_xyz=bool(sa_cfg.get("normalize_xyz", False)),
                name=f"sa{i}")(sa_xyz[-1], sa_feats[-1], sa_masks[-1],
                               train=train)
            sa_xyz.append(nx)
            sa_feats.append(nf)
            sa_masks.append(nm)
            sa_inds.append(idx)

        fp_xyz = [sa_xyz[-1]]
        fp_feats = [sa_feats[-1]]
        fp_masks = [sa_masks[-1]]
        n_sa = len(sa_xyz)
        for i, channels in enumerate(self.fp_channels):
            t = n_sa - i - 2
            nf = PointFPModule(list(channels), name=f"fp{i}")(
                sa_xyz[t], sa_feats[t], fp_xyz[-1], fp_feats[-1],
                sa_masks[t], fp_masks[-1], train=train)
            fp_xyz.append(sa_xyz[t])
            fp_feats.append(nf)
            fp_masks.append(sa_masks[t])

        # indices of the last fp level's points in the original cloud
        tgt = n_sa - len(self.fp_channels) - 1
        fp_indices = sa_inds[1]
        for i in range(2, tgt + 1):
            fp_indices = jnp.take_along_axis(fp_indices, sa_inds[i], 1)
        return dict(sa_xyz=sa_xyz, sa_features=sa_feats, sa_masks=sa_masks,
                    fp_xyz=fp_xyz, fp_features=fp_feats, fp_masks=fp_masks,
                    fp_indices=fp_indices)


@BACKBONES.register_module()
def PAConvSASSG(**kwargs):
    """PointNet2 SSG with PAConv set-abstraction layers (the reference's
    `sa_cfg=dict(type='PAConvSAModule')` composition for scene seg)."""
    kwargs.setdefault("sa_cfg", dict(type="PAConvSAModule"))
    return PointNet2SASSG(**kwargs)
