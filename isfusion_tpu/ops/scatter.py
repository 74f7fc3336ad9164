"""Segment/scatter primitives with static shapes (pure XLA).

These replace three CUDA kernels of the reference with sort+segment ops:
- `mmdet3d/ops/voxel/src/scatter_points_cuda.cu` (DynamicScatter fwd/bwd):
  JAX segment ops differentiate automatically.
- `mmdet3d/ops/TorchEx/torchex/src/ingroup_inds` (rank-within-group used by
  SST window partition, `mmdet3d/ops/sst/sst_ops.py:197-216`): `group_ranks`.
- unique-voxel bookkeeping in `voxelization_cuda.cu`: `unique_with_ranks`.

All functions take a validity mask instead of dynamic lengths, and a static
``num_segments`` capacity, so they are jit/vmap-friendly.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

_INT_MAX = jnp.iinfo(jnp.int32).max


def segment_sum(data: jnp.ndarray, segment_ids: jnp.ndarray,
                num_segments: int) -> jnp.ndarray:
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_max(data: jnp.ndarray, segment_ids: jnp.ndarray,
                num_segments: int) -> jnp.ndarray:
    return jax.ops.segment_max(data, segment_ids, num_segments=num_segments)


def segment_mean(data: jnp.ndarray, segment_ids: jnp.ndarray,
                 num_segments: int) -> jnp.ndarray:
    total = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    count = jax.ops.segment_sum(jnp.ones(data.shape[:1], data.dtype),
                                segment_ids, num_segments=num_segments)
    return total / jnp.maximum(count, 1.0)[(...,) + (None,) * (data.ndim - 1)]


class UniqueResult(NamedTuple):
    """Result of `unique_with_ranks` over N elements with group ids.

    All arrays have static shapes; slots beyond the true counts are masked.
    """
    group_index: jnp.ndarray      # (N,) int32: dense index of elem's group, or num_groups_cap for invalid
    rank_in_group: jnp.ndarray    # (N,) int32: 0-based arrival rank within group (by sort order)
    group_ids: jnp.ndarray        # (num_groups_cap,) original id per dense group (garbage where invalid)
    group_valid: jnp.ndarray      # (num_groups_cap,) bool
    group_size: jnp.ndarray       # (num_groups_cap,) int32 number of elements
    num_groups: jnp.ndarray       # () int32 true number of groups (may exceed cap!)


def unique_with_ranks(ids: jnp.ndarray, valid: jnp.ndarray,
                      num_groups_cap: int) -> UniqueResult:
    """Dense-relabel arbitrary int ids into [0, num_groups_cap) + in-group ranks.

    Invalid elements map to group ``num_groups_cap`` (a trash slot callers can
    drop by sizing their segment buffers as cap+1 or by masking).
    Groups discovered after the cap is exhausted are marked invalid.
    """
    n = ids.shape[0]
    ids = jnp.where(valid, ids, _INT_MAX)
    order = jnp.argsort(ids)  # stable; invalid go last
    sorted_ids = ids[order]
    is_start = jnp.concatenate([
        jnp.ones((1,), jnp.bool_),
        sorted_ids[1:] != sorted_ids[:-1],
    ])
    sorted_valid = sorted_ids != _INT_MAX
    is_start = is_start & sorted_valid
    # dense group index in sorted order
    group_idx_sorted = jnp.cumsum(is_start.astype(jnp.int32)) - 1  # (N,)
    # rank within group: position - position of group start
    pos = jnp.arange(n, dtype=jnp.int32)
    start_pos = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, pos, -1))
    rank_sorted = pos - start_pos
    # overflow: groups beyond capacity become invalid
    over_cap = group_idx_sorted >= num_groups_cap
    group_idx_sorted = jnp.where(sorted_valid & ~over_cap, group_idx_sorted,
                                 num_groups_cap)
    # scatter back to original order
    inv = jnp.zeros((n,), jnp.int32).at[order].set(pos)
    group_index = group_idx_sorted[inv]
    rank_in_group = rank_sorted[inv]
    # per-group metadata
    cap = num_groups_cap
    seg = jnp.where(group_idx_sorted < cap, group_idx_sorted, cap)
    group_ids = jnp.full((cap,), _INT_MAX, jnp.int32).at[
        jnp.where(is_start & ~over_cap, group_idx_sorted, cap)
    ].set(sorted_ids.astype(jnp.int32), mode="drop")
    group_size = jax.ops.segment_sum(
        (sorted_valid & ~over_cap).astype(jnp.int32), seg,
        num_segments=cap + 1)[:cap]
    group_valid = group_size > 0
    num_groups = jnp.sum(is_start.astype(jnp.int32))
    return UniqueResult(group_index, rank_in_group, group_ids, group_valid,
                        group_size, num_groups)


def group_ranks(ids: jnp.ndarray, valid: Optional[jnp.ndarray] = None
                ) -> jnp.ndarray:
    """0-based rank of each element within its id-group (TorchEx
    ingroup_inds equivalent; see `mmdet3d/ops/sst/sst_ops.py:199`).

    Rank order follows sorted (stable) order, i.e. original order within ties.
    Invalid elements get rank 0 in a trash group.
    """
    if valid is None:
        valid = jnp.ones(ids.shape, jnp.bool_)
    res = unique_with_ranks(ids, valid, num_groups_cap=ids.shape[0])
    return res.rank_in_group
