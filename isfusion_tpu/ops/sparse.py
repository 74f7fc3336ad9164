"""Sparse 3D convolution on TPU: sorted-id rulebook + gather-GEMM (pure XLA).

TPU-native replacement for the reference's spconv engine (external spconv2 +
vendored `mmdet3d/ops/bevfusion-ops/spconv/`; consumed by
`mmdet3d/models/middle_encoders/sparse_encoder.py:19`). Instead of CUDA hash
tables + per-offset index pairs, active voxels are kept as fixed-capacity
buffers sorted by linearized coordinate; neighbor lookup is a vectorized
binary search (`jnp.searchsorted`), and each kernel offset contributes one
masked gather + one dense (V, Cin) x (Cin, Cout) matmul that XLA tiles onto
the MXU. Matching spconv semantics:

- SubMConv3d: output sites == input sites; neighbors outside the active set
  contribute zero.
- SparseConv3d (strided): output sites are the union of every input site's
  on-grid conv positions, deduplicated (capacity-capped like max_voxels).

All shapes are static; validity is carried in masks. Batch handled via vmap.
"""
from __future__ import annotations

import itertools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from .scatter import unique_with_ranks

_INT_MAX = jnp.iinfo(jnp.int32).max


class SparseGrid(NamedTuple):
    """Fixed-capacity sparse tensor over a (nz, ny, nx) grid, per sample.

    Invariant: `ids` ascending with invalid slots = INT_MAX at the tail,
    so `searchsorted` lookups are valid. Batched use adds a leading axis to
    the arrays (grid stays a static tuple); ops below are written per-sample
    and vmapped.
    """
    feats: jnp.ndarray   # (V, C) float
    coords: jnp.ndarray  # (V, 3) int32 (z, y, x); garbage where ~mask
    ids: jnp.ndarray     # (V,) int32 linearized z*ny*nx + y*nx + x; INT_MAX pad
    mask: jnp.ndarray    # (V,) bool
    grid: Tuple[int, int, int]  # (nz, ny, nx) static


def linearize(coords: jnp.ndarray, grid: Sequence[int]) -> jnp.ndarray:
    nz, ny, nx = grid
    return coords[..., 0] * (ny * nx) + coords[..., 1] * nx + coords[..., 2]


def delinearize(ids: jnp.ndarray, grid: Sequence[int]) -> jnp.ndarray:
    nz, ny, nx = grid
    z = ids // (ny * nx)
    r = ids - z * (ny * nx)
    return jnp.stack([z, r // nx, r % nx], axis=-1)


def build_sparse_grid(feats: jnp.ndarray, coords: jnp.ndarray,
                      mask: jnp.ndarray, grid: Sequence[int],
                      assume_sorted: bool = False) -> SparseGrid:
    """Construct a SparseGrid from (V, C) feats + (V, 3) zyx coords + mask.

    The framework's voxelizers emit voxel tables already ordered by
    linearized id (dense relabeling in `unique_with_ranks` follows sort
    order), so `assume_sorted=True` skips the sort.
    """
    ids = jnp.where(mask, linearize(coords, grid), _INT_MAX).astype(jnp.int32)
    if not assume_sorted:
        order = jnp.argsort(ids)
        ids = ids[order]
        feats = feats[order]
        coords = coords[order]
        mask = mask[order]
    feats = jnp.where(mask[:, None], feats, 0.0)
    return SparseGrid(feats, coords, ids, mask, tuple(int(g) for g in grid))


def _kernel_offsets(kernel_size: Sequence[int]):
    return list(itertools.product(*[range(int(k)) for k in kernel_size]))


def _norm3(v) -> Tuple[int, int, int]:
    if isinstance(v, (tuple, list)):
        return tuple(int(x) for x in v)
    return (int(v),) * 3


def gather_neighbors(sp: SparseGrid, nbr_coords: jnp.ndarray,
                     nbr_valid: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lookup features at integer coords via binary search over sorted ids.

    nbr_coords (N, 3), nbr_valid (N,) -> (feats (N, C), found (N,))."""
    grid = jnp.asarray(sp.grid, jnp.int32)
    in_bounds = jnp.all((nbr_coords >= 0) & (nbr_coords < grid), axis=-1)
    valid = nbr_valid & in_bounds
    nbr_ids = jnp.where(valid, linearize(nbr_coords, sp.grid), -1)
    j = jnp.searchsorted(sp.ids, nbr_ids).astype(jnp.int32)
    j = jnp.minimum(j, sp.ids.shape[0] - 1)
    found = valid & (sp.ids[j] == nbr_ids)
    feats = jnp.where(found[:, None], sp.feats[j], 0.0)
    return feats, found


def subm_conv3d(sp: SparseGrid, weight: jnp.ndarray) -> jnp.ndarray:
    """Submanifold sparse conv: output sites = input sites.

    weight: (kz, ky, kx, Cin, Cout). Returns new feats (V, Cout).
    Equivalent to spconv SubMConv3d with padding k//2 (same-site output).
    """
    kz, ky, kx, cin, cout = weight.shape
    center = jnp.asarray([kz // 2, ky // 2, kx // 2], jnp.int32)
    out = None
    for off in _kernel_offsets((kz, ky, kx)):
        offset = jnp.asarray(off, jnp.int32) - center
        feats, _ = gather_neighbors(sp, sp.coords + offset, sp.mask)
        contrib = jnp.dot(feats, weight[off[0], off[1], off[2]],
                          preferred_element_type=jnp.float32)
        out = contrib if out is None else out + contrib
    return jnp.where(sp.mask[:, None], out, 0.0).astype(sp.feats.dtype)


def sparse_conv3d(sp: SparseGrid, weight: jnp.ndarray,
                  stride, padding, out_cap: int) -> SparseGrid:
    """Strided ("regular") sparse conv generating new output sites.

    weight: (kz, ky, kx, Cin, Cout); stride/padding int or 3-tuple.
    Output site o is active iff any input site lies in its receptive field
    (o*s - p + kd for kd in kernel) — spconv SparseConv3d semantics.
    Output capped at `out_cap` sites (sorted-id order kept).
    """
    kz, ky, kx, cin, cout = weight.shape
    ks = (kz, ky, kx)
    s = _norm3(stride)
    p = _norm3(padding)
    grid_out = tuple((sp.grid[d] + 2 * p[d] - ks[d]) // s[d] + 1
                     for d in range(3))

    # candidate output coords per input site: o_d = (c_d + p_d - kd_d) / s_d
    # for every kd with exact divisibility. Enumerate only the <= ceil(k/s)
    # distinct output positions per dim.
    cand_ids = []
    cand_valid = []
    for off in _kernel_offsets(ks):
        o = (sp.coords + jnp.asarray(p, jnp.int32)
             - jnp.asarray(off, jnp.int32))
        sv = jnp.asarray(s, jnp.int32)
        divisible = jnp.all(o % sv == 0, axis=-1)
        o = o // sv
        in_bounds = jnp.all(
            (o >= 0) & (o < jnp.asarray(grid_out, jnp.int32)), axis=-1)
        valid = sp.mask & divisible & in_bounds
        cand_ids.append(jnp.where(valid, linearize(o, grid_out), _INT_MAX))
        cand_valid.append(valid)
    cand_ids = jnp.concatenate(cand_ids)
    cand_valid = jnp.concatenate(cand_valid)
    uniq = unique_with_ranks(cand_ids, cand_valid, num_groups_cap=out_cap)
    out_ids = jnp.where(uniq.group_valid, uniq.group_ids, _INT_MAX)
    out_coords = delinearize(jnp.maximum(out_ids, 0), grid_out)
    out_mask = uniq.group_valid

    # gather-GEMM per kernel offset: input coord = o*s - p + kd
    out = None
    for off in _kernel_offsets(ks):
        in_c = (out_coords * jnp.asarray(s, jnp.int32)
                - jnp.asarray(p, jnp.int32) + jnp.asarray(off, jnp.int32))
        feats, _ = gather_neighbors(sp, in_c, out_mask)
        contrib = jnp.dot(feats, weight[off[0], off[1], off[2]],
                          preferred_element_type=jnp.float32)
        out = contrib if out is None else out + contrib
    out_feats = jnp.where(out_mask[:, None], out, 0.0).astype(sp.feats.dtype)
    return SparseGrid(out_feats, out_coords, out_ids, out_mask, grid_out)


def sparse_to_dense(sp: SparseGrid) -> jnp.ndarray:
    """Scatter to a dense (nz, ny, nx, C) tensor (spconv `.dense()`)."""
    nz, ny, nx = sp.grid
    c = sp.feats.shape[-1]
    flat = jnp.zeros((nz * ny * nx, c), sp.feats.dtype)
    ids = jnp.where(sp.mask, sp.ids, nz * ny * nx)  # pad -> dropped
    flat = flat.at[ids].set(sp.feats, mode="drop")
    return flat.reshape(nz, ny, nx, c)
