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
from typing import NamedTuple, Optional, Sequence, Tuple

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


def lookup_ids(sorted_ids: jnp.ndarray, query_ids: jnp.ndarray,
               query_valid: jnp.ndarray
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Find each query id's slot in the sorted id table.

    Uses searchsorted(method='sort') — on TPU the binary-search lowering
    is gather-bound (~5x slower); the sort-based lowering is one fused
    bitonic sort. Returns (slot (Q,) int32 clipped, found (Q,) bool)."""
    q = jnp.where(query_valid, query_ids, -1)
    j = jnp.searchsorted(sorted_ids, q, method="sort").astype(jnp.int32)
    j = jnp.minimum(j, sorted_ids.shape[0] - 1)
    found = query_valid & (sorted_ids[j] == q)
    return j, found


def gather_neighbors(sp: SparseGrid, nbr_coords: jnp.ndarray,
                     nbr_valid: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lookup features at integer coords via id search.

    nbr_coords (N, 3), nbr_valid (N,) -> (feats (N, C), found (N,))."""
    grid = jnp.asarray(sp.grid, jnp.int32)
    in_bounds = jnp.all((nbr_coords >= 0) & (nbr_coords < grid), axis=-1)
    valid = nbr_valid & in_bounds
    nbr_ids = linearize(nbr_coords, sp.grid)
    j, found = lookup_ids(sp.ids, nbr_ids, valid)
    feats = jnp.where(found[:, None], sp.feats[j], 0.0)
    return feats, found


def build_subm_rulebook(sp: SparseGrid, kernel_size=(3, 3, 3)
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Neighbor table for submanifold convs: (K, V) slot indices +
    (K, V) found mask, one fused id search for ALL kernel offsets.

    Subm convs preserve the active set, so one rulebook serves every subm
    conv of a stage — the reference reuses spconv indice_keys the same way
    (`sparse_encoder.py: indice_key='subm{i}'`)."""
    ks = tuple(int(k) for k in kernel_size)
    center = jnp.asarray([k // 2 for k in ks], jnp.int32)
    grid = jnp.asarray(sp.grid, jnp.int32)
    offsets = jnp.asarray(_kernel_offsets(ks), jnp.int32) - center  # (K,3)
    nbr = sp.coords[None, :, :] + offsets[:, None, :]               # (K,V,3)
    in_bounds = jnp.all((nbr >= 0) & (nbr < grid), axis=-1)
    valid = in_bounds & sp.mask[None, :]
    k, v = valid.shape
    ids = linearize(nbr.reshape(-1, 3), sp.grid)
    j, found = lookup_ids(sp.ids, ids, valid.reshape(-1))
    return j.reshape(k, v), found.reshape(k, v)


def subm_conv3d(sp: SparseGrid, weight: jnp.ndarray,
                rulebook: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None
                ) -> jnp.ndarray:
    """Submanifold sparse conv: output sites = input sites.

    weight: (kz, ky, kx, Cin, Cout). Returns new feats (V, Cout).
    Equivalent to spconv SubMConv3d with padding k//2 (same-site output).
    Pass a precomputed ``rulebook`` (build_subm_rulebook) to skip the
    neighbor search — the dominant cost when called per conv.
    """
    kz, ky, kx, cin, cout = weight.shape
    if rulebook is None:
        rulebook = build_subm_rulebook(sp, (kz, ky, kx))
    slots, found = rulebook
    out = None
    for k, off in enumerate(_kernel_offsets((kz, ky, kx))):
        feats = jnp.where(found[k][:, None], sp.feats[slots[k]], 0.0)
        contrib = jnp.dot(feats, weight[off[0], off[1], off[2]],
                          preferred_element_type=jnp.float32)
        out = contrib if out is None else out + contrib
    return jnp.where(sp.mask[:, None], out, 0.0).astype(sp.feats.dtype)


def unique_sorted_ids(cand_ids: jnp.ndarray, cap: int
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unique ids of a candidate array (invalid = INT_MAX) -> (sorted
    (cap,) ids with INT_MAX padding, (cap,) mask). Values-only sort +
    one scatter — much lighter than unique_with_ranks (no argsort, no
    inverse permutation, no ranks)."""
    srt = jnp.sort(cand_ids)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), srt[1:] != srt[:-1]]) & (srt != _INT_MAX)
    pos = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    slot = jnp.where(is_start & (pos < cap), pos, cap)
    out = jnp.full((cap + 1,), _INT_MAX, jnp.int32).at[slot].set(
        srt, mode="drop")[:cap]
    return out, out != _INT_MAX


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
    sv = jnp.asarray(s, jnp.int32)
    pv = jnp.asarray(p, jnp.int32)
    go = jnp.asarray(grid_out, jnp.int32)

    # candidate output coords per input site: each input c reaches outputs
    # o in [ceil((c+p-k+1)/s), (c+p)/s]; per dim that is at most
    # ceil(k/s) values — enumerate those few quotients directly instead of
    # all k^3 kernel taps (8x fewer candidates for the k3/s2 downsamples).
    n_per_dim = [-(-ks[d] // s[d]) for d in range(3)]
    cand_ids = []
    for dz in range(n_per_dim[0]):
        for dy in range(n_per_dim[1]):
            for dx in range(n_per_dim[2]):
                base = (sp.coords + pv) // sv - jnp.asarray(
                    [dz, dy, dx], jnp.int32)
                kd = sp.coords + pv - base * sv   # implied kernel tap
                ok = jnp.all((kd >= 0) & (kd < jnp.asarray(ks, jnp.int32)),
                             axis=-1)
                ok &= jnp.all((base >= 0) & (base < go), axis=-1)
                ok &= sp.mask
                cand_ids.append(
                    jnp.where(ok, linearize(base, grid_out), _INT_MAX))
    out_ids, out_mask = unique_sorted_ids(
        jnp.concatenate(cand_ids), out_cap)
    out_coords = delinearize(
        jnp.where(out_mask, out_ids, 0), grid_out)

    # gather-GEMM per kernel offset: input coord = o*s - p + kd.
    # All offsets' id searches are fused into ONE sort-based lookup.
    offsets = jnp.asarray(_kernel_offsets(ks), jnp.int32)       # (K, 3)
    in_c = out_coords[None, :, :] * sv - pv + offsets[:, None, :]
    gi = jnp.asarray(sp.grid, jnp.int32)
    in_bounds = jnp.all((in_c >= 0) & (in_c < gi), axis=-1)
    valid = in_bounds & out_mask[None, :]
    k_total, vout = valid.shape
    qids = linearize(in_c.reshape(-1, 3), sp.grid)
    slots, found = lookup_ids(sp.ids, qids, valid.reshape(-1))
    slots = slots.reshape(k_total, vout)
    found = found.reshape(k_total, vout)
    out = None
    for k, off in enumerate(_kernel_offsets(ks)):
        feats = jnp.where(found[k][:, None], sp.feats[slots[k]], 0.0)
        contrib = jnp.dot(feats, weight[off[0], off[1], off[2]],
                          preferred_element_type=jnp.float32)
        out = contrib if out is None else out + contrib
    out_feats = jnp.where(out_mask[:, None], out, 0.0).astype(sp.feats.dtype)
    return SparseGrid(out_feats, out_coords, out_ids, out_mask, grid_out)


def sparse_inverse_conv3d(sp_low: SparseGrid, target: SparseGrid,
                          weight: jnp.ndarray, stride,
                          padding) -> jnp.ndarray:
    """SparseInverseConv3d: upsample low-res features back to a SAVED
    high-res site set (spconv's indice_key-reversal, used by SparseUNet).

    For each target (high-res) site h, contributors are the low-res sites
    l with l*s - p + kd = h — the exact transpose of `sparse_conv3d`.
    Returns (V_target, Cout) features at ``target``'s sites.
    """
    kz, ky, kx, cin, cout = weight.shape
    ks = (kz, ky, kx)
    s = _norm3(stride)
    p = _norm3(padding)
    sv = jnp.asarray(s, jnp.int32)
    pv = jnp.asarray(p, jnp.int32)
    gl = jnp.asarray(sp_low.grid, jnp.int32)
    offsets = jnp.asarray(_kernel_offsets(ks), jnp.int32)
    num = (target.coords[None] + pv - offsets[:, None, :])   # (K, V, 3)
    l_coord = num // sv
    exact = jnp.all(l_coord * sv == num, axis=-1)
    in_b = jnp.all((l_coord >= 0) & (l_coord < gl), axis=-1)
    valid = exact & in_b & target.mask[None, :]
    k_total, vt = valid.shape
    qids = linearize(l_coord.reshape(-1, 3), sp_low.grid)
    slots, found = lookup_ids(sp_low.ids, qids, valid.reshape(-1))
    slots = slots.reshape(k_total, vt)
    found = found.reshape(k_total, vt)
    out = None
    for k, off in enumerate(_kernel_offsets(ks)):
        feats = jnp.where(found[k][:, None], sp_low.feats[slots[k]], 0.0)
        contrib = jnp.dot(feats, weight[off[0], off[1], off[2]],
                          preferred_element_type=jnp.float32)
        out = contrib if out is None else out + contrib
    return jnp.where(target.mask[:, None], out,
                     0.0).astype(sp_low.feats.dtype)


def sparse_to_dense(sp: SparseGrid) -> jnp.ndarray:
    """Scatter to a dense (nz, ny, nx, C) tensor (spconv `.dense()`)."""
    nz, ny, nx = sp.grid
    c = sp.feats.shape[-1]
    flat = jnp.zeros((nz * ny * nx, c), sp.feats.dtype)
    ids = jnp.where(sp.mask, sp.ids, nz * ny * nx)  # pad -> dropped
    flat = flat.at[ids].set(sp.feats, mode="drop")
    return flat.reshape(nz, ny, nx, c)
