"""PAConv: position-adaptive convolution ops (pure XLA).

Parity: `mmdet3d/ops/paconv/` — `assign_score_withk` (CUDA op at
`src/assign_score_withk_cuda.cu:76`: out[b,o,n,k] = sum_m s[b,n,k,m] *
(points[b, knn[n,k], m, o] - centers[b, knn[n,0], m, o])),
`utils.assign_kernel_withoutk:46`, `paconv.py:ScoreNet:12 / PAConv:106`.

Layout convention is channels-last throughout (B, ..., C); the weight
bank keeps the reference's (2*Cin, M*Cout) flattened layout so converted
checkpoints drop in.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def assign_score_withk(scores: jnp.ndarray, point_feats: jnp.ndarray,
                       center_feats: jnp.ndarray, knn_idx: jnp.ndarray,
                       aggregate: str = "sum") -> jnp.ndarray:
    """scores (B, S, K, M), point/center_feats (B, N, M, O),
    knn_idx (B, S, K) with knn_idx[..., 0] the center's own index ->
    (B, S, K, O) aggregated features."""
    def single(s, pf, cf, idx):
        p = pf[idx]                    # (S, K, M, O)
        c = cf[idx[:, :1]]             # (S, 1, M, O)
        out = jnp.einsum("skm,skmo->sko", s, p - c)
        return out

    out = jax.vmap(single)(scores, point_feats, center_feats, knn_idx)
    if aggregate == "avg":
        out = out / scores.shape[-1]
    return out


def assign_kernel_withoutk(features: jnp.ndarray, kernels: jnp.ndarray,
                           m: int):
    """features (B, N, Cin); kernels (2*Cin, M*O) -> point/center feats
    (B, N, M, O) (`utils.assign_kernel_withoutk:46`)."""
    b, n, cin = features.shape
    half1 = jnp.matmul(features, kernels[:cin]).reshape(b, n, m, -1)
    half2 = jnp.matmul(features, kernels[cin:]).reshape(b, n, m, -1)
    if cin % 2 != 0:
        half_coord = jnp.matmul(
            features[..., :3], kernels[cin:cin + 3]).reshape(b, n, m, -1)
    else:
        half_coord = jnp.zeros_like(half2)
    return half1 + half2, half1 + half_coord


class ScoreNet(nn.Module):
    """MLP over relative-position features -> per-kernel scores
    (`paconv.py:ScoreNet:12`). Input (..., in_c), output (..., M)."""

    mlp_channels: Sequence[int]
    score_norm: str = "softmax"
    temp_factor: float = 1.0
    last_bn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i, c in enumerate(self.mlp_channels[:-1]):
            x = nn.Dense(int(c), use_bias=False, name=f"fc{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"bn{i}")(x)
            x = nn.relu(x)
        x = nn.Dense(int(self.mlp_channels[-1]), use_bias=not self.last_bn,
                     name="fc_out")(x)
        if self.score_norm == "softmax":
            return jax.nn.softmax(x / self.temp_factor, axis=-1)
        if self.score_norm == "sigmoid":
            return jax.nn.sigmoid(x / self.temp_factor)
        return x


class PAConv(nn.Module):
    """Position-adaptive conv over grouped neighborhoods
    (`paconv.py:PAConv:106`), channels-last.

    __call__(feats (B, S, K, Cin), rel_xyz (B, S, K, 3), valid (B, S, K))
    -> (B, S, K, Cout). kernel_input 'w_neighbor' concatenates
    (feat - center_feat, feat); scorenet_input 'w_neighbor_dist' feeds
    (center_xyz_rel? rel, rel, |rel|).
    """

    out_channels: int
    num_kernels: int = 8
    kernel_input: str = "w_neighbor"
    scorenet_input: str = "w_neighbor_dist"
    scorenet_cfg: Any = None

    @nn.compact
    def __call__(self, feats: jnp.ndarray, rel_xyz: jnp.ndarray,
                 valid: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, s, k, cin = feats.shape
        if self.kernel_input == "w_neighbor":
            center = feats[:, :, :1]
            feats = jnp.concatenate([feats - center, feats], -1)
            cin_eff = 2 * cin
        else:
            cin_eff = cin
        if self.scorenet_input == "identity":
            xyz_feat = rel_xyz
        elif self.scorenet_input == "w_neighbor":
            xyz_feat = jnp.concatenate(
                [rel_xyz, rel_xyz - rel_xyz[:, :, :1]], -1)
        else:   # w_neighbor_dist
            dist = jnp.linalg.norm(rel_xyz + 1e-12, axis=-1, keepdims=True)
            xyz_feat = jnp.concatenate(
                [rel_xyz - rel_xyz[:, :, :1], rel_xyz, dist], -1)
        cfg = dict(self.scorenet_cfg or dict(
            mlp_channels=[16, 16, 16], score_norm="softmax",
            temp_factor=1.0, last_bn=False))
        mlp = list(cfg.pop("mlp_channels")) + [self.num_kernels]
        scores = ScoreNet(mlp, name="scorenet", **cfg)(xyz_feat,
                                                       train=train)
        bank = self.param(
            "weight_bank", nn.initializers.kaiming_normal(),
            (cin_eff, self.num_kernels * self.out_channels), jnp.float32)
        nf = jnp.matmul(feats, bank.astype(feats.dtype)).reshape(
            b, s, k, self.num_kernels, self.out_channels)
        out = jnp.einsum("bskm,bskmo->bsko", scores, nf)
        from ..models.layers import MaskedBatchNorm
        out = MaskedBatchNorm(momentum=0.1, epsilon=1e-5, name="bn")(
            out, valid, train=train)
        out = nn.relu(out)
        return jnp.where(valid[..., None], out, 0.0)
