"""PointNet++ primitive ops (pure XLA, static shapes).

TPU-native replacements for the reference's CUDA kernels (SURVEY.md §2.5):
- ball_query (`mmdet3d/ops/ball_query/src`): masked radius search over
  pairwise distances with a fixed neighbor budget;
- knn (`ops/knn/src`): top-k over pairwise distances;
- furthest_point_sample (`ops/furthest_point_sample/src`): iterative FPS
  via `lax.fori_loop`;
- gather_points (`ops/gather_points/src`): take_along_axis;
- group_points (`ops/group_points/src`): gather with a neighbor index
  matrix;
- three_nn / three_interpolate (`ops/interpolate/src`): top-3 + weighted
  gather.

All take validity masks for padded point buffers; invalid points are pushed
to +inf distance so they are never selected.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_BIG = 1e10


def square_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) x (M, 3) -> (N, M) squared euclidean distances."""
    return jnp.sum((a[:, None, :] - b[None, :, :]) ** 2, axis=-1)


def furthest_point_sample(xyz: jnp.ndarray, num_samples: int,
                          mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """FPS over (N, 3) points -> (num_samples,) int32 indices.

    Starts from index 0 (the CUDA kernel's convention). Padded points
    (mask False) are never picked (their distance contribution is -inf).
    """
    n = xyz.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    first = jnp.argmax(mask)  # first valid point

    def body(i, state):
        dists, idxs = state
        last = idxs[i - 1]
        d = jnp.sum((xyz - xyz[last]) ** 2, axis=-1)
        dists = jnp.minimum(dists, d)
        cand = jnp.where(mask, dists, -_BIG)
        idxs = idxs.at[i].set(jnp.argmax(cand).astype(jnp.int32))
        return dists, idxs

    dists0 = jnp.full((n,), _BIG)
    idxs0 = jnp.zeros((num_samples,), jnp.int32).at[0].set(
        first.astype(jnp.int32))
    _, idxs = jax.lax.fori_loop(1, num_samples, body, (dists0, idxs0))
    return idxs


def gather_points(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(N, C) x (S,) -> (S, C)."""
    return feats[idx]


def knn(k: int, xyz: jnp.ndarray, query_xyz: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None
        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest neighbors of each query: -> (S, k) idx, (S, k) sq-dists."""
    d = square_distance(query_xyz, xyz)
    if mask is not None:
        d = jnp.where(mask[None, :], d, _BIG)
    neg, idx = jax.lax.top_k(-d, k)
    return idx.astype(jnp.int32), -neg


def ball_query(radius: float, num_samples: int, xyz: jnp.ndarray,
               query_xyz: jnp.ndarray,
               mask: Optional[jnp.ndarray] = None
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Indices of up to ``num_samples`` points within ``radius`` of each
    query -> ((S, num_samples) idx, (S, num_samples) valid).

    Like the CUDA kernel, slots beyond the in-radius count repeat the first
    in-radius neighbor; queries with no neighbor fall back to the nearest
    point (valid=False there).
    """
    d = square_distance(query_xyz, xyz)
    if mask is not None:
        d = jnp.where(mask[None, :], d, _BIG)
    within = d <= radius ** 2
    # rank in-radius candidates by original index (CUDA kernel takes the
    # first num_samples by index order): key = index where within else BIG
    n = xyz.shape[0]
    order_key = jnp.where(within, jnp.arange(n)[None, :], n + 1)
    neg, idx = jax.lax.top_k(-order_key, num_samples)  # smallest indices
    valid = (-neg) <= n
    first = idx[:, 0:1]
    has_any = valid[:, 0:1]
    nearest = jnp.argmin(d, axis=1)[:, None].astype(idx.dtype)
    idx = jnp.where(valid, idx, jnp.where(has_any, first, nearest))
    return idx.astype(jnp.int32), valid & has_any


def group_points(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(N, C) x (S, K) -> (S, K, C)."""
    return feats[idx]


def three_nn(query_xyz: jnp.ndarray, xyz: jnp.ndarray,
             mask: Optional[jnp.ndarray] = None
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """3 nearest source points per query -> (S, 3) dists, (S, 3) idx."""
    idx, d2 = knn(3, xyz, query_xyz, mask)
    return jnp.sqrt(jnp.maximum(d2, 1e-10)), idx


def three_interpolate(feats: jnp.ndarray, idx: jnp.ndarray,
                      weight: jnp.ndarray) -> jnp.ndarray:
    """Inverse-distance weighted interp: (M, C) x (S, 3) x (S, 3)
    -> (S, C)."""
    return jnp.sum(feats[idx] * weight[..., None], axis=1)


def interpolation_weights(dists: jnp.ndarray, eps: float = 1e-8
                          ) -> jnp.ndarray:
    recip = 1.0 / jnp.maximum(dists, eps)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)
