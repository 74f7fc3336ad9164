"""Column-sparse 3D convolution: BEV-sparse, z-dense "pillar columns".

Second-generation TPU engine for the spconv-class workload
(`/root/reference/mmdet3d/models/middle_encoders/sparse_encoder.py:19` and
the vendored spconv under `mmdet3d/ops/bevfusion-ops/spconv/`). The
site-level rulebook engine (`ops/sparse.py`) pays the TPU's per-row gather
cost 27x per conv (27 kernel taps x V voxel rows); measured on v5e that is
~12 ns/row regardless of row width, which made the sparse encoder ~80% of
IS-Fusion inference.

This engine exploits LiDAR structure: active voxels cluster in BEV columns
(median 1.3-3.7 active z-cells per active column across encoder stages), and
the z-extent is tiny (41 -> 5). So sparsity is kept ONLY over BEV: the
active set is a sorted fixed-capacity table of BEV column ids, each carrying
a DENSE z-column of features (V_col, Z, C) plus an active-site mask. A 3^3
kernel then needs only 9 BEV neighbor lookups (vs 27), each moving a fat
(Z*C) row (bandwidth-bound, not row-bound), and the z-dimension of the
kernel becomes a dense 1D conv on the MXU. Three of the 9 taps are free:
the center is the column itself, and the x+-1 neighbors of a sorted unique
id table are roll-by-one with an adjacency test (id arithmetic, no search).

Semantics match spconv (oracle-tested against `ops/sparse.py` and dense
conv): submanifold convs preserve the active-site set; strided convs
activate every output site whose receptive field touches an input site.
Capacity is over COLUMNS, so one cap slot holds every active z-cell of that
column — at stage 1 the site-level engine's 120k-voxel cap drops ~2/3 of
the post-downsample sites while a 120k-column cap holds all of them.

All shapes static; batch via vmap.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from .sparse import unique_sorted_ids

_INT_MAX = jnp.iinfo(jnp.int32).max

# BEV kernel taps that need a table lookup ((dy, dx); (0, 0) is the column
# itself and (0, +-1) are rolls of the sorted id table).
SIDE_TAPS = ((-1, -1), (-1, 0), (-1, 1), (1, -1), (1, 0), (1, 1))


@flax.struct.dataclass
class ColumnGrid:
    """Fixed-capacity BEV-sparse, z-dense feature grid (one sample).

    Invariant: `ids` ascending, INT_MAX at invalid slots; `feats` zero at
    every inactive site (both ~cmask columns and ~zmask cells).
    ``bev`` is static pytree metadata, so ColumnGrid passes through
    jit/vmap/remat whole (shape math stays Python-side).
    """
    feats: jnp.ndarray   # (Vc, Z, C)
    zmask: jnp.ndarray   # (Vc, Z) bool — active voxel sites
    ids: jnp.ndarray     # (Vc,) int32 BEV id = y * nx + x, ascending
    cmask: jnp.ndarray   # (Vc,) bool — column slot valid
    bev: Tuple[int, int] = flax.struct.field(pytree_node=False)


def _yx(ids: jnp.ndarray, nx: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return ids // nx, ids % nx


def build_column_grid(feats: jnp.ndarray, coords: jnp.ndarray,
                      mask: jnp.ndarray, grid: Sequence[int],
                      col_cap: int, z_pad_to: int = 1,
                      z_lo: int = 0, z_width: int = 0) -> ColumnGrid:
    """(V, C) voxel rows + (V, 3) zyx coords -> ColumnGrid.

    Columns beyond `col_cap` are dropped (the capacity-overflow behavior the
    reference already has via hard_voxelize max_voxels).

    ``z_pad_to`` rounds the allocated z extent up (pad cells carry
    zmask=False and zero features, so convs are unaffected): the fat-row
    gathers in `subm_conv_col_dil` move (Z*C)-element rows, and the TPU
    gather engine runs ~1.5x faster when the row is a multiple of 256
    elements (lane-aligned; measured 136 vs 88 GB/s at stage-0 scale,
    `tools/analysis_tools/micro_dma_gather.py`). 41 -> 48 keeps every
    encoder stage's row length a 256 multiple (48*16, 24*32, 12*64...).

    ``(z_lo, z_width)`` (z_width > 0) stores only the global z WINDOW
    [z_lo, z_lo + z_width): cell w holds true z = z_lo + w. LiDAR scenes
    occupy a narrow static z band (ground plane .. max return height —
    measured [15, 39] of 41 at 0.2 m cells, micro_zdist.py), so a static
    window carries every site while cutting conv FLOPs and gather
    traffic by z_width/nz. Voxels outside the window are dropped with
    the same documented capacity semantics as `col_cap` (a column whose
    voxels ALL fall outside keeps its table slot with an empty zmask).
    """
    nz, ny, nx = (int(g) for g in grid)
    if z_width:
        nz = int(z_width)
    else:
        z_lo = 0
        nz = -(-nz // int(z_pad_to)) * int(z_pad_to)
    v, c = feats.shape
    bev_ids = jnp.where(mask, coords[:, 1] * nx + coords[:, 2],
                        _INT_MAX).astype(jnp.int32)
    col_ids, cmask = unique_sorted_ids(bev_ids, col_cap)
    slot = jnp.searchsorted(col_ids, bev_ids, method="sort").astype(jnp.int32)
    slot = jnp.minimum(slot, col_cap - 1)
    zw = coords[:, 0] - z_lo
    found = mask & (col_ids[slot] == bev_ids) & (zw >= 0) & (zw < nz)
    flat = jnp.where(found, slot * nz + zw, col_cap * nz)
    fbuf = jnp.zeros((col_cap * nz + 1, c), feats.dtype)
    fbuf = fbuf.at[flat].set(jnp.where(found[:, None], feats, 0.0),
                             mode="drop", unique_indices=True)
    zbuf = jnp.zeros((col_cap * nz + 1,), bool).at[flat].set(
        found, mode="drop", unique_indices=True)
    return ColumnGrid(fbuf[:-1].reshape(col_cap, nz, c),
                      zbuf[:-1].reshape(col_cap, nz),
                      col_ids, cmask, (ny, nx))


def build_column_grid_planned(feats: jnp.ndarray, plan: dict,
                              grid: Sequence[int], col_cap: int,
                              z_pad_to: int = 1,
                              z_width: int = 0) -> ColumnGrid:
    """`build_column_grid` from a host plan (`ops/host_plan.column_plan`)
    keyed by the voxel table: `vox_slot` is each voxel row's flat
    destination slot * nz_padded + z (trash = col_cap * nz), so the
    build is ONE scatter — the device sort/searchsorted is gone.
    With ``z_width`` the plan's slots are already window-relative
    (host_plan bakes the z_lo subtraction into vox_slot)."""
    nz, ny, nx = (int(g) for g in grid)
    nz = int(z_width) if z_width \
        else -(-nz // int(z_pad_to)) * int(z_pad_to)
    v, c = feats.shape
    flat = plan["vox_slot"]
    ok = flat < col_cap * nz
    fbuf = jnp.zeros((col_cap * nz + 1, c), feats.dtype)
    fbuf = fbuf.at[flat].set(jnp.where(ok[:, None], feats, 0.0),
                             mode="drop", unique_indices=True)
    zbuf = jnp.zeros((col_cap * nz + 1,), bool).at[flat].set(
        ok, mode="drop", unique_indices=True)
    return ColumnGrid(fbuf[:-1].reshape(col_cap, nz, c),
                      zbuf[:-1].reshape(col_cap, nz),
                      plan["col_ids"], plan["cmask"], (ny, nx))


def dilate_columns_planned(cg: ColumnGrid, plan: dict
                           ) -> Tuple[ColumnGrid,
                                      Tuple[jnp.ndarray, jnp.ndarray]]:
    """`dilate_columns` from a host plan (`ops/host_plan.dilate_plan`):
    the dilated table ids, the embed slots and the y+-1 rulebook arrive
    precomputed; the device keeps only the feature/mask scatter."""
    vc, z, c = cg.feats.shape
    dil_ids = plan["dil_ids"]
    dil_cap = dil_ids.shape[0]
    slot = plan["embed_slot"]
    feats = jnp.zeros((dil_cap + 1, z * c), cg.feats.dtype).at[slot].set(
        cg.feats.reshape(vc, z * c), mode="drop",
        unique_indices=True)[:-1].reshape(dil_cap, z, c)
    zmask = jnp.zeros((dil_cap + 1, z), bool).at[slot].set(
        cg.zmask, mode="drop", unique_indices=True)[:-1]
    out = ColumnGrid(feats, zmask, dil_ids, plan["dil_cmask"], cg.bev)
    return out, (plan["y_slots"], plan["y_found"])


def dilate_columns_subm(cg: ColumnGrid, dil_cap: int, subm_cap: int
                        ) -> Tuple[ColumnGrid,
                                   Tuple[jnp.ndarray, jnp.ndarray], dict]:
    """REFINED x-dilation for submanifold convs + expand structure.

    `subm_conv_col_dil`'s u-partial at a dilated-only column w (inactive,
    zero feats) is consumed ONLY by the y-combine of an output at
    (y_w +- 1, x_w) — and subm outputs exist only at ACTIVE columns. So
    the subm convs need just the REFINED table

        active  ∪  {x-dilated-only w : active column at (y_w +- 1, x_w)}

    which measures 68% / 80% of the full x-dilation at encoder stages
    0/1 on ray-cast nuScenes-scale clouds (census in
    tools/analysis_tools/micro_dilation_refine.py) — every subm conv's
    z-conv FLOPs and gather rows shrink by that factor, exactly. The
    STRIDED conv still consumes u-partials at every full-dilation column
    (its consumers are the stride-2 output table; the same census finds
    100% of dilated-only columns consumed), so `expand_columns` embeds
    the refined table back into the full one once per stage.

    Returns (refined ColumnGrid, its y+-1 rulebook, expand dict with
    the FULL-dilation ids/cmask and the refined->full row lookup).
    Capacity overflow on either cap drops columns with the documented
    `dilate_columns` semantics.
    """
    ny, nx = cg.bev
    vc, z, c = cg.feats.shape
    y, x = _yx(cg.ids, nx)
    cand_full = [
        jnp.where(cg.cmask & (x > 0), cg.ids - 1, _INT_MAX),
        jnp.where(cg.cmask, cg.ids, _INT_MAX),
        jnp.where(cg.cmask & (x + 1 < nx), cg.ids + 1, _INT_MAX),
    ]
    dil_ids, dil_cmask = unique_sorted_ids(jnp.concatenate(cand_full),
                                           dil_cap)

    def act_at(q: jnp.ndarray, okq: jnp.ndarray) -> jnp.ndarray:
        j = jnp.minimum(jnp.searchsorted(cg.ids, q, method="sort"),
                        vc - 1).astype(jnp.int32)
        return okq & (cg.ids[j] == q)

    def consumed(w: jnp.ndarray, okw: jnp.ndarray) -> jnp.ndarray:
        """Does candidate column id ``w`` have an ACTIVE y+-1 neighbor?"""
        wy = w // nx
        return act_at(w - nx, okw & (wy > 0)) | \
            act_at(w + nx, okw & (wy + 1 < ny))

    ok_m = cg.cmask & (x > 0)
    ok_p = cg.cmask & (x + 1 < nx)
    cand_sub = [
        jnp.where(ok_m & consumed(cg.ids - 1, ok_m), cg.ids - 1, _INT_MAX),
        jnp.where(cg.cmask, cg.ids, _INT_MAX),
        jnp.where(ok_p & consumed(cg.ids + 1, ok_p), cg.ids + 1, _INT_MAX),
    ]
    sub_ids, sub_cmask = unique_sorted_ids(jnp.concatenate(cand_sub),
                                           subm_cap)
    embed = jnp.minimum(jnp.searchsorted(
        sub_ids, jnp.where(cg.cmask, cg.ids, _INT_MAX),
        method="sort").astype(jnp.int32), subm_cap - 1)
    ok = cg.cmask & (sub_ids[embed] == cg.ids)  # dropped on cap overflow
    slot = jnp.where(ok, embed, subm_cap)
    feats = jnp.zeros((subm_cap + 1, z * c), cg.feats.dtype).at[slot].set(
        cg.feats.reshape(vc, z * c), mode="drop",
        unique_indices=True)[:-1].reshape(subm_cap, z, c)
    zmask = jnp.zeros((subm_cap + 1, z), bool).at[slot].set(
        cg.zmask, mode="drop", unique_indices=True)[:-1]
    out = ColumnGrid(feats, zmask, sub_ids, sub_cmask, cg.bev)
    exp_j = jnp.minimum(jnp.searchsorted(
        sub_ids, jnp.where(dil_cmask, dil_ids, _INT_MAX),
        method="sort").astype(jnp.int32), subm_cap - 1)
    exp_found = dil_cmask & (sub_ids[exp_j] == dil_ids)
    exp = dict(ids=dil_ids, cmask=dil_cmask, slot=exp_j, found=exp_found)
    return out, subm_y_rulebook(out), exp


def dilate_columns_subm_planned(cg: ColumnGrid, plan: dict
                                ) -> Tuple[ColumnGrid,
                                           Tuple[jnp.ndarray, jnp.ndarray],
                                           dict]:
    """`dilate_columns_subm` from a host plan (`ops/host_plan.dilate_plan`
    with subm_cap): refined table ids, embed slots, y+-1 rulebook and the
    refined->full expand lookup arrive precomputed; the device keeps only
    the feature/mask scatter."""
    vc, z, c = cg.feats.shape
    sub_ids = plan["sub_ids"]
    subm_cap = sub_ids.shape[0]
    slot = plan["sub_embed"]
    feats = jnp.zeros((subm_cap + 1, z * c), cg.feats.dtype).at[slot].set(
        cg.feats.reshape(vc, z * c), mode="drop",
        unique_indices=True)[:-1].reshape(subm_cap, z, c)
    zmask = jnp.zeros((subm_cap + 1, z), bool).at[slot].set(
        cg.zmask, mode="drop", unique_indices=True)[:-1]
    out = ColumnGrid(feats, zmask, sub_ids, plan["sub_cmask"], cg.bev)
    exp = dict(ids=plan["dil_ids"], cmask=plan["dil_cmask"],
               slot=plan["exp_slot"], found=plan["exp_found"])
    return out, (plan["sub_y_slots"], plan["sub_y_found"]), exp


def expand_columns(cg: ColumnGrid, exp: dict) -> ColumnGrid:
    """Embed a refined subm table into its full x-dilation (the strided
    conv's input contract — see `dilate_columns_subm`). One fused row
    gather: the zmask rides as an extra feature plane so the expand pays
    a single gather instead of a second row-count-taxed one (gathers are
    ~12 ns/row regardless of width)."""
    vc, z, c = cg.feats.shape
    dt = cg.feats.dtype
    fused = jnp.concatenate([cg.feats, cg.zmask[..., None].astype(dt)],
                            -1).reshape(vc, z * (c + 1))
    rows = fused.at[exp["slot"]].get(unique_indices=False,
                                     mode="promise_in_bounds")
    rows = jnp.where(exp["found"][:, None], rows,
                     0.0).reshape(-1, z, c + 1)
    return ColumnGrid(rows[..., :c], rows[..., c] > 0.5,
                      exp["ids"], exp["cmask"], cg.bev)


def _roll_match(ids: jnp.ndarray, cmask: jnp.ndarray, nx: int,
                direction: int) -> jnp.ndarray:
    """Valid-mask for the x+-1 neighbor being the adjacent table slot."""
    vc = ids.shape[0]
    pos = jnp.arange(vc)
    x = ids % nx
    if direction > 0:   # neighbor id = ids + 1 at slot v+1
        match = (jnp.roll(ids, -1) == ids + 1) & (pos < vc - 1)
        return match & cmask & (x + 1 < nx)
    match = (jnp.roll(ids, 1) == ids - 1) & (pos > 0)
    return match & cmask & (x > 0)


def column_rulebook(cg: ColumnGrid) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slots/found for the 6 SIDE_TAPS, one fused sorted search.

    Reused by every submanifold conv on the same active set (spconv
    indice_key semantics, `sparse_encoder.py: indice_key='subm{i}'`).
    Returns (slots (6, Vc) int32, found (6, Vc) bool).
    """
    ny, nx = cg.bev
    y, x = _yx(cg.ids, nx)
    qs, valids = [], []
    for dy, dx in SIDE_TAPS:
        ok = cg.cmask & (y + dy >= 0) & (y + dy < ny) & \
            (x + dx >= 0) & (x + dx < nx)
        qs.append(jnp.where(ok, cg.ids + dy * nx + dx, -1))
        valids.append(ok)
    q = jnp.stack(qs)                                   # (6, Vc)
    valid = jnp.stack(valids)
    j = jnp.searchsorted(cg.ids, q.reshape(-1),
                         method="sort").astype(jnp.int32)
    j = jnp.minimum(j, cg.ids.shape[0] - 1).reshape(q.shape)
    found = valid & (cg.ids[j] == q)
    return j, found


def _zconv(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1,
           padding: int = 1) -> jnp.ndarray:
    """Dense 1D conv along z: (Vc, Z, Cin) x (kz, Cin, Cout).

    Output keeps x.dtype (f32 accumulation happens inside the MXU;
    emitting bf16 halves the store traffic of the fat u tensors)."""
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=x.dtype)


def _zconv_shift(x: jnp.ndarray, w: jnp.ndarray, stride: int, t: int,
                 out_len: int) -> jnp.ndarray:
    """Shifted strided z-conv between two z WINDOWS:
    out[:, o] = sum_dz w[dz] * x[:, stride*o + dz + t] (zero outside x).

    This is the window-coordinate form of a strided conv whose input
    window starts at true z = z_lo_in and whose output window starts at
    z_lo_out: t = stride*z_lo_out - z_lo_in - padding. t = -padding and
    the dense out_len recovers the plain padded conv. All static."""
    kz = w.shape[0]
    need = stride * (out_len - 1) + kz     # input cells from index t on
    lpad = max(0, -t)
    start = max(0, t)
    take = max(0, min(x.shape[1] - start, need - lpad))
    xw = x[:, start:start + take]
    rpad = need - lpad - take
    if lpad or rpad:
        xw = jnp.pad(xw, ((0, 0), (lpad, rpad), (0, 0)))
    return jax.lax.conv_general_dilated(
        xw, w.astype(x.dtype), window_strides=(stride,),
        padding=[(0, 0)], dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=x.dtype)


def subm_conv_col(cg: ColumnGrid, weight: jnp.ndarray,
                  rulebook: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None
                  ) -> jnp.ndarray:
    """Submanifold conv; weight (kz, 3, 3, Cin, Cout) (kz odd, z-padded
    same). Returns (Vc, Z, Cout) feats at the same sites."""
    kz, ky, kx, cin, cout = weight.shape
    assert (ky, kx) == (3, 3), "column engine is specialized to 3x3 BEV"
    if rulebook is None:
        rulebook = column_rulebook(cg)
    slots, found = rulebook
    ny, nx = cg.bev
    pz = kz // 2

    acc = _zconv(cg.feats, weight[:, 1, 1], padding=pz)
    m_p = _roll_match(cg.ids, cg.cmask, nx, +1)
    nbr = jnp.where(m_p[:, None, None], jnp.roll(cg.feats, -1, axis=0), 0.0)
    acc += _zconv(nbr, weight[:, 1, 2], padding=pz)
    m_m = _roll_match(cg.ids, cg.cmask, nx, -1)
    nbr = jnp.where(m_m[:, None, None], jnp.roll(cg.feats, 1, axis=0), 0.0)
    acc += _zconv(nbr, weight[:, 1, 0], padding=pz)
    for t, (dy, dx) in enumerate(SIDE_TAPS):
        nbr = jnp.where(found[t][:, None, None],
                        _gather_rows(cg.feats, slots[t]), 0.0)
        acc += _zconv(nbr, weight[:, 1 + dy, 1 + dx], padding=pz)
    acc = jnp.where(cg.zmask[..., None], acc, 0.0)
    return acc.astype(cg.feats.dtype)


def _gather_rows(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row gather of (V, Z, C) via a flattened-2D view.

    XLA's TPU gather on a 3D operand lowers ~25x slower than on a 2D one
    (measured 613 vs ~50 ns/row at (106k, 41, 32)). Do NOT bitcast-pack
    bf16 pairs into f32: the relayout costs ~3x the gather itself.
    (indices_are_sorted would be wrong here: not-found queries clip to
    slot 0 interspersed among the otherwise monotone indices.)"""
    v, z, c = arr.shape
    flat = arr.reshape(v, z * c)
    return flat.at[idx].get(unique_indices=False,
                            mode="promise_in_bounds").reshape(-1, z, c)


def dilate_columns(cg: ColumnGrid, dil_cap: int
                   ) -> Tuple[ColumnGrid, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Embed the active columns into their x-dilation, and precompute the
    y-neighbor lookup used by `subm_conv_col_dil`.

    The dilated table contains every active column plus its x+-1 neighbors
    (same BEV row). On it, a submanifold 3^3 conv factorizes into
    x-direction rolls (exact on a sorted unique id table) + dense z-convs +
    exactly TWO row gathers (y+-1), instead of 6 neighbor gathers per conv.

    CAPACITY CAVEAT (r3): the true x-dilation factor on ray-cast
    nuScenes-scale clouds is ~2.0x the active columns at stage 0; a
    `dil_cap` below that drops ACTIVE columns from the conv (measured
    38%% at full bench scale with dilation_ratio=1.35). Size `dil_cap`
    ~2.2x the column cap (the flagship uses dilation_ratio=2.0, which is
    drop-free at bench density).
    Returns (dilated ColumnGrid, (slots (2, D), found (2, D))) where slots
    row 0 is the y-1 lookup and row 1 the y+1 lookup.
    """
    ny, nx = cg.bev
    vc, z, c = cg.feats.shape
    y, x = _yx(cg.ids, nx)
    cand = [
        jnp.where(cg.cmask & (x > 0), cg.ids - 1, _INT_MAX),
        jnp.where(cg.cmask, cg.ids, _INT_MAX),
        jnp.where(cg.cmask & (x + 1 < nx), cg.ids + 1, _INT_MAX),
    ]
    dil_ids, dil_cmask = unique_sorted_ids(jnp.concatenate(cand), dil_cap)
    # embed active rows (order-preserving -> sorted unique scatter)
    embed = jnp.minimum(jnp.searchsorted(
        dil_ids, jnp.where(cg.cmask, cg.ids, _INT_MAX),
        method="sort").astype(jnp.int32), dil_cap - 1)
    ok = cg.cmask & (dil_ids[embed] == cg.ids)  # dropped on cap overflow
    slot = jnp.where(ok, embed, dil_cap)
    feats = jnp.zeros((dil_cap + 1, z * c), cg.feats.dtype).at[slot].set(
        cg.feats.reshape(vc, z * c), mode="drop",
        unique_indices=True)[:-1].reshape(dil_cap, z, c)
    zmask = jnp.zeros((dil_cap + 1, z), bool).at[slot].set(
        cg.zmask, mode="drop", unique_indices=True)[:-1]
    out = ColumnGrid(feats, zmask, dil_ids, dil_cmask, cg.bev)
    return out, subm_y_rulebook(out)


def subm_y_rulebook(cg: ColumnGrid) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(slots (2, V), found (2, V)) for the y-1 / y+1 same-x neighbors."""
    ny, nx = cg.bev
    y, _ = _yx(cg.ids, nx)
    qs = jnp.stack([
        jnp.where(cg.cmask & (y > 0), cg.ids - nx, -1),
        jnp.where(cg.cmask & (y + 1 < ny), cg.ids + nx, -1),
    ])
    j = jnp.searchsorted(cg.ids, qs.reshape(-1),
                         method="sort").astype(jnp.int32)
    j = jnp.minimum(j, cg.ids.shape[0] - 1).reshape(qs.shape)
    found = (qs >= 0) & (cg.ids[j] == qs)
    return j, found


def _x_im2col(cg: ColumnGrid) -> jnp.ndarray:
    """(D, Z, 3 Cin) with kx-blocks [x-1, x, x+1] built from rolls (exact
    on a sorted unique id table; missing/inactive neighbors are zero)."""
    ny, nx = cg.bev
    m_p = _roll_match(cg.ids, cg.cmask, nx, +1)
    m_m = _roll_match(cg.ids, cg.cmask, nx, -1)
    hp = jnp.where(m_p[:, None, None], jnp.roll(cg.feats, -1, axis=0), 0.0)
    hm = jnp.where(m_m[:, None, None], jnp.roll(cg.feats, 1, axis=0), 0.0)
    return jnp.concatenate([hm, cg.feats, hp], axis=-1)


def _w_cat(weight: jnp.ndarray) -> jnp.ndarray:
    """(kz, ky, kx, Cin, Cout) -> (kz, kx*Cin, ky*Cout): the z-conv kernel
    matching `_x_im2col` inputs, emitting the ky partials u_{dy} stacked
    along Cout (dy = ky - 1)."""
    kz, ky, kx, cin, cout = weight.shape
    return weight.transpose(0, 2, 3, 1, 4).reshape(kz, kx * cin, ky * cout)


def subm_conv_col_dil(cg: ColumnGrid, weight: jnp.ndarray,
                      rulebook: Tuple[jnp.ndarray, jnp.ndarray]
                      ) -> jnp.ndarray:
    """Submanifold conv on an x-dilated ColumnGrid (see `dilate_columns`).

    Factorized data movement: the three x-taps are rolls feeding ONE dense
    z-conv with kx*Cin input and ky*Cout output channels (MXU-sized
    contraction); of the resulting partials u_{dy}[w] = sum_dx,dz
    W[dz, dy, dx] feats[(y_w, x_w+dx), z+dz], the combine
    out[v] = u_{-1}[y-1 slot] + u_0[v] + u_{+1}[y+1 slot]
    costs the only two row gathers. weight (kz, 3, 3, Cin, Cout).
    """
    kz, ky, kx, cin, cout = weight.shape
    assert (ky, kx) == (3, 3)
    slots, found = rulebook
    pz = kz // 2
    dt = cg.feats.dtype

    u = _zconv(_x_im2col(cg), _w_cat(weight), padding=pz).astype(dt)
    u_m, u_0, u_p = u[..., :cout], u[..., cout:2 * cout], u[..., 2 * cout:]
    up = jnp.where(found[1][:, None, None], _gather_rows(u_p, slots[1]), 0.0)
    dn = jnp.where(found[0][:, None, None], _gather_rows(u_m, slots[0]), 0.0)
    acc = u_0 + up + dn
    return jnp.where(cg.zmask[..., None], acc, 0.0).astype(dt)


def sparse_conv_col_dil(cg: ColumnGrid, weight: jnp.ndarray, stride,
                        padding, out_col_cap: int,
                        plan: Optional[dict] = None,
                        z_shift: Optional[int] = None,
                        out_zlen: int = 0) -> ColumnGrid:
    """Strided sparse conv from an x-dilated input grid.

    Same u-factorization as `subm_conv_col_dil`: one fat z-conv (with z
    stride) over x-rolled inputs computes the ky partials at every input
    column; each output column then gathers 3 rows (one per ky) at its
    center input x — 3 gathers instead of 9. Requires sx such that the
    kx taps are the {-1, 0, +1} x-neighbors of the center (kx = 3).

    ``plan`` (host-precomputed, `ops/host_plan.strided_plan`) supplies
    out_ids/out_cmask/tap_j/tap_found and skips the on-device
    unique-sort + searchsorted (~35 ms/conv at stage-1 bench scale).

    ``(z_shift, out_zlen)`` run the z conv between two z WINDOWS (see
    `_zconv_shift`): z_shift = sz*z_lo_out - z_lo_in - pz, out_zlen the
    output window width. Defaults reproduce the plain padded conv.
    """
    kz, ky, kx, cin, cout = weight.shape
    assert kx == 3 and ky == 3
    s = (stride, stride, stride) if isinstance(stride, int) else tuple(stride)
    p = (padding,) * 3 if isinstance(padding, int) else tuple(padding)
    sz, sy, sx = (int(v) for v in s)
    pz, py, px = (int(v) for v in p)
    if z_shift is None:
        z_shift = -pz
    if not out_zlen:
        out_zlen = (cg.feats.shape[1] + 2 * pz - kz) // sz + 1
    # the center-column trick (xc = xo*sx - px + 1) requires the 3 kx
    # taps to be the {-1,0,+1} x-neighbors of an in-range center; px >= 2
    # would silently drop border receptive-field contributions
    assert px <= 1, "u-factorized strided conv requires x padding <= 1"
    ny, nx = cg.bev
    ny_o = (ny + 2 * py - ky) // sy + 1
    nx_o = (nx + 2 * px - kx) // sx + 1
    dt = cg.feats.dtype

    if plan is None:
        y, x = _yx(cg.ids, nx)
        active_col = cg.cmask & jnp.any(cg.zmask, axis=-1)
        cand = []
        for qy in range(-(-ky // sy)):
            for qx in range(-(-kx // sx)):
                by = (y + py) // sy - qy
                bx = (x + px) // sx - qx
                k_y = y + py - by * sy
                k_x = x + px - bx * sx
                ok = active_col & (k_y >= 0) & (k_y < ky) & (k_x >= 0) & \
                    (k_x < kx) & (by >= 0) & (by < ny_o) & (bx >= 0) & \
                    (bx < nx_o)
                cand.append(jnp.where(ok, by * nx_o + bx, _INT_MAX))
        out_ids, out_cmask = unique_sorted_ids(jnp.concatenate(cand),
                                               out_col_cap)
    else:
        out_ids, out_cmask = plan["out_ids"], plan["out_cmask"]
    yo, xo = _yx(out_ids, nx_o)

    # partials at every input column (kx folded into the contraction,
    # ky stacked on Cout), with the z stride applied inside the conv
    um = _zconv_shift(_x_im2col(cg), _w_cat(weight), sz, z_shift,
                      out_zlen).astype(dt)
    zmask_f = (cg.zmask & cg.cmask[:, None]).astype(dt)
    mrolls = jnp.concatenate([
        jnp.where(_roll_match(cg.ids, cg.cmask, nx, -1)[:, None],
                  jnp.roll(zmask_f, 1, axis=0), 0.0)[..., None],
        zmask_f[..., None],
        jnp.where(_roll_match(cg.ids, cg.cmask, nx, +1)[:, None],
                  jnp.roll(zmask_f, -1, axis=0), 0.0)[..., None]], -1)
    # one output channel: every output tap sums ALL 3 x-roll mask
    # channels, so a (kz, 3, 3) ones kernel computed 3 identical outputs
    mm = _zconv_shift(mrolls, jnp.ones((kz, 3, 1), dt), sz, z_shift,
                      out_zlen)

    # per-ky gather at the output's center input column (fused search)
    if plan is None:
        xc = xo * sx - px + 1
        qs, oks = [], []
        for ky_ in range(ky):
            yi = yo * sy - py + ky_
            ok = out_cmask & (yi >= 0) & (yi < ny) & (xc >= 0) & (xc < nx)
            qs.append(jnp.where(ok, yi * nx + xc, -1))
            oks.append(ok)
        q = jnp.stack(qs)
        j = jnp.minimum(
            jnp.searchsorted(cg.ids, q.reshape(-1), method="sort"),
            cg.ids.shape[0] - 1).astype(jnp.int32).reshape(q.shape)
        found = jnp.stack(oks) & (cg.ids[j] == q)
    else:
        j, found = plan["tap_j"], plan["tap_found"]
    acc = None
    zm = None
    for ky_ in range(ky):
        part = jnp.where(found[ky_][:, None, None],
                         _gather_rows(um[..., ky_ * cout:(ky_ + 1) * cout],
                                      j[ky_]), 0.0)
        acc = part if acc is None else acc + part
        mpart = jnp.where(found[ky_][:, None], mm[..., 0][j[ky_]], 0.0)
        zm = mpart if zm is None else zm + mpart
    out_zmask = (zm > 0.5) & out_cmask[:, None]
    feats = jnp.where(out_zmask[..., None], acc, 0.0).astype(dt)
    return ColumnGrid(feats, out_zmask, out_ids, out_cmask, (ny_o, nx_o))


def sparse_conv_col(cg: ColumnGrid, weight: jnp.ndarray, stride, padding,
                    out_col_cap: int, z_in: Optional[int] = None,
                    z_shift: Optional[int] = None,
                    out_zlen: int = 0) -> ColumnGrid:
    """Strided sparse conv generating new output columns/sites.

    weight (kz, ky, kx, Cin, Cout), ky=kx=3 (or 1 for z-only convs);
    stride/padding int or 3-tuple (z, y, x). Output site active iff any
    input site lies in its receptive field (spconv SparseConv3d).
    ``(z_shift, out_zlen)`` as in `sparse_conv_col_dil`.
    """
    kz, ky, kx, cin, cout = weight.shape
    s = (stride, stride, stride) if isinstance(stride, int) else tuple(stride)
    p = (padding,) * 3 if isinstance(padding, int) else tuple(padding)
    sz, sy, sx = (int(v) for v in s)
    pz, py, px = (int(v) for v in p)
    ny, nx = cg.bev
    z = cg.feats.shape[1]
    if z_shift is None:
        z_shift = -pz
    z_out = int(out_zlen) if out_zlen else (z + 2 * pz - kz) // sz + 1
    ny_o = (ny + 2 * py - ky) // sy + 1
    nx_o = (nx + 2 * px - kx) // sx + 1

    y, x = _yx(cg.ids, nx)
    # candidate output columns: o = (c + p - k) / s for k in [0, ky).
    # Columns with no active site (x-dilation slots) spawn no outputs.
    active_col = cg.cmask & jnp.any(cg.zmask, axis=-1)
    cand = []
    for qy in range(-(-ky // sy)):
        for qx in range(-(-kx // sx)):
            by = (y + py) // sy - qy
            bx = (x + px) // sx - qx
            k_y = y + py - by * sy
            k_x = x + px - bx * sx
            ok = active_col & (k_y >= 0) & (k_y < ky) & (k_x >= 0) & \
                (k_x < kx) & (by >= 0) & (by < ny_o) & (bx >= 0) & \
                (bx < nx_o)
            cand.append(jnp.where(ok, by * nx_o + bx, _INT_MAX))
    out_ids, out_cmask = unique_sorted_ids(jnp.concatenate(cand),
                                           out_col_cap)
    yo, xo = _yx(out_ids, nx_o)

    # input taps: in column (yo*sy - py + ky_, xo*sx - px + kx_)
    qs, valids = [], []
    for ky_ in range(ky):
        for kx_ in range(kx):
            yi = yo * sy - py + ky_
            xi = xo * sx - px + kx_
            ok = out_cmask & (yi >= 0) & (yi < ny) & (xi >= 0) & (xi < nx)
            qs.append(jnp.where(ok, yi * nx + xi, -1))
            valids.append(ok)
    q = jnp.stack(qs)
    valid = jnp.stack(valids)
    j = jnp.searchsorted(cg.ids, q.reshape(-1),
                         method="sort").astype(jnp.int32)
    j = jnp.minimum(j, cg.ids.shape[0] - 1).reshape(q.shape)
    found = valid & (cg.ids[j] == q)

    acc = None
    zm = None
    zmask_f = cg.zmask.astype(cg.feats.dtype)[..., None]
    ones_w = jnp.ones((kz, 1, 1), cg.feats.dtype)
    for t in range(ky * kx):
        ky_, kx_ = t // kx, t % kx
        nbr = jnp.where(found[t][:, None, None],
                        _gather_rows(cg.feats, j[t]), 0.0)
        contrib = _zconv_shift(nbr, weight[:, ky_, kx_], sz, z_shift,
                               z_out)
        acc = contrib if acc is None else acc + contrib
        mrow = jnp.where(found[t][:, None], zmask_f[..., 0][j[t]],
                         0.0)[..., None]
        mc = _zconv_shift(mrow, ones_w, sz, z_shift, z_out)
        zm = mc if zm is None else zm + mc
    out_zmask = (zm[..., 0] > 0.5) & out_cmask[:, None]
    feats = jnp.where(out_zmask[..., None], acc, 0.0).astype(cg.feats.dtype)
    return ColumnGrid(feats, out_zmask, out_ids, out_cmask, (ny_o, nx_o))


def zconv_col(cg: ColumnGrid, weight: jnp.ndarray, stride: int,
              padding: int) -> ColumnGrid:
    """Sparse conv with 1x1 BEV kernel (the encoder's conv_out (3,1,1)):
    the column set is unchanged, only z is convolved/strided."""
    kz = weight.shape[0]
    acc = _zconv(cg.feats, weight[:, 0, 0], stride=stride, padding=padding)
    zm = _zconv(cg.zmask.astype(cg.feats.dtype)[..., None],
                jnp.ones((kz, 1, 1), cg.feats.dtype), stride=stride,
                padding=padding)
    out_zmask = (zm[..., 0] > 0.5) & cg.cmask[:, None]
    feats = jnp.where(out_zmask[..., None], acc, 0.0).astype(cg.feats.dtype)
    return ColumnGrid(feats, out_zmask, cg.ids, cg.cmask, cg.bev)


def column_to_dense(cg: ColumnGrid) -> jnp.ndarray:
    """Scatter to dense (ny, nx, Z * C) — spconv `.dense()` followed by the
    encoder's depth-to-channel reshape (reference `sparse_encoder.py:
    135-137`), channel-last: out[..., z*C:(z+1)*C] = feats[:, z]."""
    ny, nx = cg.bev
    vc, z, c = cg.feats.shape
    rows = cg.feats.reshape(vc, z * c)
    ids = jnp.where(cg.cmask, cg.ids, ny * nx)
    flat = jnp.zeros((ny * nx + 1, z * c), cg.feats.dtype)
    flat = flat.at[ids].set(rows, mode="drop", unique_indices=True,
                            indices_are_sorted=True)
    return flat[:-1].reshape(ny, nx, z * c)


def column_sites(cg: ColumnGrid) -> Tuple[jnp.ndarray, jnp.ndarray,
                                          jnp.ndarray]:
    """Flatten to per-site rows for tests/interop: (coords (Vc*Z, 3) zyx,
    feats (Vc*Z, C), mask (Vc*Z,))."""
    ny, nx = cg.bev
    vc, z, c = cg.feats.shape
    yy, xx = _yx(jnp.where(cg.cmask, cg.ids, 0), nx)
    zz = jnp.broadcast_to(jnp.arange(z)[None], (vc, z))
    coords = jnp.stack([zz, jnp.broadcast_to(yy[:, None], (vc, z)),
                        jnp.broadcast_to(xx[:, None], (vc, z))], -1)
    return (coords.reshape(-1, 3), cg.feats.reshape(-1, c),
            (cg.zmask & cg.cmask[:, None]).reshape(-1))
