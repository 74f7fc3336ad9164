"""Windowed-column sparse 3D convolution: BEV-sparse, z-WINDOWED columns.

Third-generation TPU engine for the spconv-class workload
(`/root/reference/mmdet3d/models/middle_encoders/sparse_encoder.py:19`).
The round-2 column engine (`ops/sparse_cols.py`) keeps a DENSE z extent
per active BEV column; measured on ray-cast nuScenes-scale clouds the
median active z-span per column is 1 cell and the 99.95th percentile 24,
while the stored extent is 48 — so >2/3 of every byte moved and every MXU
flop is spent on provably-empty z cells. It also runs convs on an
x-DILATED table (2.0x the active columns at stage 0) whose configured
capacity silently dropped ~38% of active columns at full bench scale.

This engine stores, per active column, a fixed-width z WINDOW:

- ``feats (Vc, W, C)`` with per-column ``zoff``: global z = zoff + w.
- zoff is a multiple of ``align`` (chosen so align * C >= 256 elements:
  every window-relative gather start stays 512-byte aligned, the TPU
  gather engine's fast path — measured 136 vs 88 GB/s round 2).
- GUARD INVARIANT: active cells only at w in [1, W-2]. Construction and
  `rewindow` set zoff = max(0, align_down(zmin - 1)) and drop cells past
  w = W-2 (capacity-overflow semantics, like the reference's
  hard_voxelize max_voxels). The guard makes window clipping EXACT for
  3^3 kernels: a neighbor cell outside my window is >= 2 z-cells from
  every active site of mine, so it cannot reach me through a +-1 z-tap.

A submanifold 3^3 conv runs on the ACTIVE table only (no dilation):

- x+-1 taps are roll-by-one on the sorted unique id table (exact: if
  id+-1 is active it occupies the adjacent slot), re-based between
  neighboring windows by a shift-select over the few possible zoff
  deltas (multiples of align; |delta| >= W means zero overlap, exact
  under the guard).
- each of the 6 (dy, dx) side taps is ONE fat 2D row gather of the
  neighbor's (W*C) window row, then the same shift-select re-basing
  fused into the im2col assembly. Measured on v5e
  (tools/analysis_tools/micro_win_gather.py): 2D row gathers run at
  96-200 GB/s (faster for wider rows), while a vmapped 1D dynamic-slice
  gather — which could have folded the re-base into the gather start —
  lowers ~80x slower (~1750 ns/row). Hence: gather rows, re-base with
  selects.
- all 9 taps concatenate into a (Vc, W, 9*Cin) im2col feeding a single
  dense z-conv with K = 9*Cin on the MXU (vs the dilated engine's
  K = 3*Cin on a 2x table: half the FLOPs, 3x the contraction depth).

Semantics match spconv (oracle-tested against dense conv in
`tests/test_ops/test_sparse_win.py`): subm convs preserve the active
set; strided convs activate every output site whose receptive field
touches an input site (windows halve through z-stride and are
re-guarded by `rewindow`). All shapes static; batch via vmap.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from .sparse import unique_sorted_ids

_INT_MAX = jnp.iinfo(jnp.int32).max

# (dy, dx) taps needing a table lookup; (0, 0) is the column itself and
# (0, +-1) are rolls. Order matches _w_flat / _im2col.
SIDE_TAPS = ((-1, -1), (-1, 0), (-1, 1), (1, -1), (1, 0), (1, 1))


@flax.struct.dataclass
class WinGrid:
    """Fixed-capacity BEV-sparse z-windowed feature grid (one sample).

    Invariants: `ids` ascending with INT_MAX at invalid slots; `feats`
    zero at every inactive cell; active cells confined to w in [1, W-2]
    unless zoff == 0 pins the window to the floor (then physics — no
    cells below z=0 — provides the bottom guard); `zoff` >= 0 and a
    multiple of `align`. ``bev`` and ``align`` are static metadata.
    """
    feats: jnp.ndarray   # (Vc, W, C)
    zmask: jnp.ndarray   # (Vc, W) bool — active voxel sites
    ids: jnp.ndarray     # (Vc,) int32 BEV id = y * nx + x, ascending
    cmask: jnp.ndarray   # (Vc,) bool — column slot valid
    zoff: jnp.ndarray    # (Vc,) int32 — global z of window cell 0
    bev: Tuple[int, int] = flax.struct.field(pytree_node=False)
    align: int = flax.struct.field(pytree_node=False, default=8)


def _yx(ids: jnp.ndarray, nx: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return ids // nx, ids % nx


def _align_down(v: jnp.ndarray, a: int) -> jnp.ndarray:
    return (v // a) * a


def _gather_rows(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row gather of (V, W, C) via a flattened-2D view (3D-operand TPU
    gathers lower ~25x slower; rows here are W*C = 512-2048 elements,
    the gather engine's 96-200 GB/s regime)."""
    v, w, c = arr.shape
    flat = arr.reshape(v, w * c)
    return flat.at[idx].get(unique_indices=False,
                            mode="promise_in_bounds").reshape(-1, w, c)


def build_win_grid(feats: jnp.ndarray, coords: jnp.ndarray,
                   mask: jnp.ndarray, grid: Sequence[int], col_cap: int,
                   window: int, align: int = 8) -> WinGrid:
    """(V, C) voxel rows + (V, 3) zyx coords -> WinGrid.

    Columns beyond `col_cap` and cells beyond the guarded window are
    dropped (the capacity-overflow behavior the reference already has via
    hard_voxelize max_voxels)."""
    nz, ny, nx = (int(g) for g in grid)
    del nz
    v, c = feats.shape
    bev_ids = jnp.where(mask, coords[:, 1] * nx + coords[:, 2],
                        _INT_MAX).astype(jnp.int32)
    col_ids, cmask = unique_sorted_ids(bev_ids, col_cap)
    slot = jnp.searchsorted(col_ids, bev_ids, method="sort").astype(jnp.int32)
    slot = jnp.minimum(slot, col_cap - 1)
    found = mask & (col_ids[slot] == bev_ids)
    z = coords[:, 0].astype(jnp.int32)
    zmin = jnp.full((col_cap + 1,), _INT_MAX - 1, jnp.int32).at[
        jnp.where(found, slot, col_cap)].min(
            z, mode="drop")[:col_cap]
    zoff = jnp.maximum(0, _align_down(zmin - 1, align))
    w = z - zoff[slot]
    keep = found & (w >= 0) & (w <= window - 2)
    flat = jnp.where(keep, slot * window + w, col_cap * window)
    fbuf = jnp.zeros((col_cap * window + 1, c), feats.dtype)
    fbuf = fbuf.at[flat].set(jnp.where(keep[:, None], feats, 0.0),
                             mode="drop", unique_indices=True)
    zbuf = jnp.zeros((col_cap * window + 1,), bool).at[flat].set(
        keep, mode="drop", unique_indices=True)
    return WinGrid(fbuf[:-1].reshape(col_cap, window, c),
                   zbuf[:-1].reshape(col_cap, window),
                   col_ids, cmask, jnp.where(cmask, zoff, 0), (ny, nx),
                   align)


def _roll_match(ids: jnp.ndarray, cmask: jnp.ndarray, nx: int,
                direction: int) -> jnp.ndarray:
    """Valid-mask for the x+-1 neighbor being the adjacent table slot."""
    vc = ids.shape[0]
    pos = jnp.arange(vc)
    x = ids % nx
    if direction > 0:
        match = (jnp.roll(ids, -1) == ids + 1) & (pos < vc - 1)
        return match & cmask & (x + 1 < nx)
    match = (jnp.roll(ids, 1) == ids - 1) & (pos > 0)
    return match & cmask & (x > 0)


def _zshift(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """out[:, w] = x[:, w - s] with zero fill."""
    if s == 0:
        return x
    w = x.shape[1]
    rolled = jnp.roll(x, s, axis=1)
    wi = jnp.arange(w)
    ok = (wi >= s) if s > 0 else (wi < w + s)
    return jnp.where(ok.reshape((1, w) + (1,) * (x.ndim - 2)), rolled, 0.0)


def _rebase_cases(nbr: jnp.ndarray, delta: jnp.ndarray, window: int,
                  align: int) -> jnp.ndarray:
    """Express neighbor rows (V, W, C) in the receiver's frame via a
    shift-select over the possible deltas: out[w] = nbr[w - delta].
    |delta| >= W has no overlap (exact under the guard). XLA fuses the
    few-way select chain of static shifts into one pass."""
    out = jnp.where((delta == 0)[:, None, None], nbr, 0.0)
    for k in range(1, -(-window // align)):
        for s in (k * align, -k * align):
            if abs(s) >= window:
                continue
            out = out + jnp.where((delta == s)[:, None, None],
                                  _zshift(nbr, s), 0.0)
    return out


def _row_shift_cases(x: jnp.ndarray, shift: jnp.ndarray, out_w: int,
                     candidates) -> jnp.ndarray:
    """Per-row static-case shift into a possibly different width:
    out[v, wi] = x[v, wi + shift[v]] when shift[v] is in ``candidates``
    (zero rows otherwise). x is (V, W[, C]); out is (V, out_w[, C])."""
    w = x.shape[1]
    pad_to = max(w, out_w + int(max(candidates)))
    if x.ndim == 3:
        xp = jnp.pad(x, ((0, 0), (0, pad_to - w), (0, 0)))
    else:
        xp = jnp.pad(x, ((0, 0), (0, pad_to - w)))
    wi = jnp.arange(pad_to)
    out = None
    for s in candidates:
        s = int(s)
        rolled = jnp.roll(xp, -s, axis=1) if s != 0 else xp
        ok = (wi + s >= 0) & (wi + s < w)
        okr = ok.reshape((1, pad_to) + (1,) * (x.ndim - 2))
        term = jnp.where((shift == s).reshape(
            (-1,) + (1,) * (x.ndim - 1)) & okr, rolled, 0.0)
        out = term if out is None else out + term
    return out[:, :out_w]


def win_rulebook(cg: WinGrid) -> Tuple[jnp.ndarray, jnp.ndarray,
                                       jnp.ndarray]:
    """(slots (6, Vc), found (6, Vc), delta (6, Vc)) for the 6 SIDE_TAPS
    in one fused sorted search; delta = zoff[slot] - zoff. Reused by
    every subm conv on the same active set (spconv indice_key)."""
    ny, nx = cg.bev
    y, x = _yx(cg.ids, nx)
    qs, valids = [], []
    for dy, dx in SIDE_TAPS:
        ok = cg.cmask & (y + dy >= 0) & (y + dy < ny) & \
            (x + dx >= 0) & (x + dx < nx)
        qs.append(jnp.where(ok, cg.ids + dy * nx + dx, -1))
        valids.append(ok)
    q = jnp.stack(qs)
    valid = jnp.stack(valids)
    j = jnp.searchsorted(cg.ids, q.reshape(-1),
                         method="sort").astype(jnp.int32)
    j = jnp.minimum(j, cg.ids.shape[0] - 1).reshape(q.shape)
    found = valid & (cg.ids[j] == q)
    delta = jnp.where(found, cg.zoff[j] - cg.zoff[None, :], 0)
    return j, found, delta


# opposite-tap index inside SIDE_TAPS: (dy, dx) <-> (-dy, -dx)
_OPP = (5, 4, 3, 2, 1, 0)


def _side_tap_impl(t: int, align: int, feats: jnp.ndarray,
                   slots6: jnp.ndarray, found6: jnp.ndarray,
                   delta6: jnp.ndarray) -> jnp.ndarray:
    w = feats.shape[1]
    rows = _gather_rows(feats, jnp.where(found6[t], slots6[t], 0))
    rows = jnp.where(found6[t][:, None, None], rows, 0.0)
    return _rebase_cases(rows, jnp.clip(delta6[t], -w, w), w, align)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _side_tap_sym(t: int, align: int, feats, slots6, found6, delta6):
    """One side tap with a SCATTER-FREE backward.

    The tap adjacency is an involution on the sorted unique id table:
    u is v's (dy, dx) neighbor iff v is u's (-dy, -dx) neighbor, with
    delta and the window-validity mask exactly mirrored. The VJP of
    `out[v] = rebase(feats[slot_t[v]], delta_t[v])` w.r.t. feats is
    therefore the SAME gather+rebase applied to the cotangent with the
    opposite tap's rulebook — a gather (~21-35 ns/row) instead of the
    scatter-add (~64-72 ns/row) autodiff would emit."""
    return _side_tap_impl(t, align, feats, slots6, found6, delta6)


def _side_tap_sym_fwd(t, align, feats, slots6, found6, delta6):
    out = _side_tap_impl(t, align, feats, slots6, found6, delta6)
    return out, (slots6, found6, delta6)


def _side_tap_sym_bwd(t, align, res, ct):
    slots6, found6, delta6 = res
    d_feats = _side_tap_impl(_OPP[t], align, ct, slots6, found6, delta6)

    def f0(x):
        return np.zeros(x.shape, jax.dtypes.float0)

    return (d_feats, f0(slots6), f0(found6), f0(delta6))


_side_tap_sym.defvjp(_side_tap_sym_fwd, _side_tap_sym_bwd)


def _side_taps(cg: WinGrid, slots: jnp.ndarray, found: jnp.ndarray,
               delta: jnp.ndarray) -> list:
    """All 6 side taps re-based into each receiver's window frame: one
    fat row gather each, then shift-select re-basing (fused into the
    downstream im2col concat). Backward is gather-based too (see
    `_side_tap_sym`)."""
    return [_side_tap_sym(t, cg.align, cg.feats, slots, found, delta)
            for t in range(len(SIDE_TAPS))]


def _x_taps(cg: WinGrid) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(hm, hp): x-1 / x+1 neighbor windows re-based to each receiver,
    built from rolls (exact on a sorted unique id table)."""
    ny, nx = cg.bev
    del ny
    w = cg.feats.shape[1]
    m_p = _roll_match(cg.ids, cg.cmask, nx, +1)
    m_m = _roll_match(cg.ids, cg.cmask, nx, -1)
    d_p = jnp.where(m_p, jnp.roll(cg.zoff, -1) - cg.zoff, w)
    d_m = jnp.where(m_m, jnp.roll(cg.zoff, 1) - cg.zoff, w)
    hp = jnp.where(m_p[:, None, None], jnp.roll(cg.feats, -1, axis=0), 0.0)
    hm = jnp.where(m_m[:, None, None], jnp.roll(cg.feats, 1, axis=0), 0.0)
    return (_rebase_cases(hm, d_m, w, cg.align),
            _rebase_cases(hp, d_p, w, cg.align))


def _w_flat(weight: jnp.ndarray) -> jnp.ndarray:
    """(kz, 3, 3, Cin, Cout) -> (kz, 9*Cin, Cout), row-major (dy, dx)
    matching _im2col's tap order."""
    kz, ky, kx, cin, cout = weight.shape
    return weight.reshape(kz, ky * kx * cin, cout)


def _im2col(cg: WinGrid, rulebook) -> jnp.ndarray:
    """(Vc, W, 9*Cin) im2col in row-major (dy, dx) tap order."""
    slots, found, delta = rulebook
    side = _side_taps(cg, slots, found, delta)
    hm, hp = _x_taps(cg)
    taps = [side[0], side[1], side[2],      # dy = -1
            hm, cg.feats, hp,               # dy = 0
            side[3], side[4], side[5]]      # dy = +1
    return jnp.concatenate(taps, axis=-1)


def _zconv(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1,
           padding: int = 1) -> jnp.ndarray:
    """Dense 1D conv along the window: (Vc, W, K) x (kz, K, Cout)."""
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=x.dtype)


def subm_conv_win(cg: WinGrid, weight: jnp.ndarray,
                  rulebook=None) -> jnp.ndarray:
    """Submanifold conv; weight (kz, 3, 3, Cin, Cout) (kz odd, z-padded
    same). Returns (Vc, W, Cout) feats at the same sites."""
    kz, ky, kx, cin, cout = weight.shape
    assert (ky, kx) == (3, 3), "window engine is specialized to 3x3 BEV"
    if rulebook is None:
        rulebook = win_rulebook(cg)
    acc = _zconv(_im2col(cg, rulebook), _w_flat(weight), padding=kz // 2)
    acc = jnp.where(cg.zmask[..., None], acc, 0.0)
    return acc.astype(cg.feats.dtype)


def rewindow(cg: WinGrid, align: int, target_w: int = 0) -> WinGrid:
    """Re-establish the guard invariant (and optionally change the window
    width): shift each column so zoff' = max(0, align_down(zmin-1,
    align)), dropping cells past the new w = W-2 edge. Pure per-row
    shift-selects — no gather."""
    vc, w, c = cg.feats.shape
    wt = target_w or w
    wi_in = jnp.arange(w)[None, :]
    wmin = jnp.min(jnp.where(cg.zmask, wi_in, w + 1), axis=1)
    has = wmin <= w
    new_zoff = jnp.maximum(
        0, _align_down(cg.zoff + jnp.minimum(wmin, w) - 1, align))
    delta = jnp.where(cg.cmask & has, new_zoff - cg.zoff, 0)
    new_zoff = cg.zoff + delta
    cands = list(range(-align, w, align))
    rows = _row_shift_cases(cg.feats, delta, wt, cands)
    mrows = _row_shift_cases(cg.zmask.astype(cg.feats.dtype), delta, wt,
                             cands)
    wi = jnp.arange(wt)[None, :]
    ok = (wi <= wt - 2) & ((wi >= 1) | (new_zoff == 0)[:, None])
    zmask = (mrows > 0.5) & ok & cg.cmask[:, None]
    feats = jnp.where(zmask[..., None], rows, 0.0)
    return WinGrid(feats.astype(cg.feats.dtype), zmask, cg.ids, cg.cmask,
                   jnp.where(cg.cmask, new_zoff, 0), cg.bev, align)


def sparse_conv_win(cg: WinGrid, weight: jnp.ndarray, stride, padding,
                    out_col_cap: int, z_total: int,
                    out_align: int = 0, out_window: int = 0,
                    spread: int = 8) -> WinGrid:
    """Strided sparse conv generating new output columns/sites
    (spconv SparseConv3d receptive-field semantics).

    weight (kz, ky, kx, Cin, Cout) with ky = kx = 3. Per output column
    the window base derives from the minimum found-tap window; taps are
    gathered re-based into that frame (aligned starts: the z base is
    zoff_out * sz, a multiple of the input alignment) and the output is
    re-guarded with `rewindow`. Tap cells falling outside the gathered
    frame produce no output sites (capacity-overflow semantics, exact:
    both features and the site mask are derived from the same gathered
    windows). ``z_total`` is the INPUT grid's global z extent — output
    sites are clamped to z_out < (z_total + 2*pz - kz)//sz + 1, the
    dense/spconv output-size formula. ``spread`` widens the gathered
    input slice beyond one window so taps whose windows sit up to
    ``spread`` cells above the lowest tap are fully covered (measured:
    97.7%% of neighbor-window deltas are <= 8 at stage 0; taps beyond
    slice coverage drop cells, same overflow semantics)."""
    kz, ky, kx, cin, cout = weight.shape
    assert ky == 3 and kx == 3
    s = (stride,) * 3 if isinstance(stride, int) else tuple(stride)
    p = (padding,) * 3 if isinstance(padding, int) else tuple(padding)
    sz, sy, sx = (int(v) for v in s)
    pz, py, px = (int(v) for v in p)
    ny, nx = cg.bev
    vc, w, c = cg.feats.shape
    ny_o = (ny + 2 * py - ky) // sy + 1
    nx_o = (nx + 2 * px - kx) // sx + 1
    dt = cg.feats.dtype
    # alignment halves with the stride (finer offsets at deeper stages):
    # the re-basing shift-select case count grows as W/align, but the
    # deep-stage tensors are small, and coarser alignment measurably
    # drops window capacity that real merged columns need
    out_align = out_align or max(1, cg.align // sz)
    # compute at the natural frame width; `out_window` only narrows the
    # FINAL re-guarded window (overflow-drop applies there, after the
    # per-column shift to the actual output zmin)
    w_out = (w + int(spread) + 2 * pz - kz) // sz + 1

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
    yo, xo = _yx(out_ids, nx_o)

    qs, oks = [], []
    for ky_ in range(ky):
        for kx_ in range(kx):
            yi = yo * sy - py + ky_
            xi = xo * sx - px + kx_
            ok = out_cmask & (yi >= 0) & (yi < ny) & (xi >= 0) & (xi < nx)
            qs.append(jnp.where(ok, yi * nx + xi, -1))
            oks.append(ok)
    q = jnp.stack(qs)
    j = jnp.minimum(jnp.searchsorted(cg.ids, q.reshape(-1), method="sort"),
                    vc - 1).astype(jnp.int32).reshape(q.shape)
    found = jnp.stack(oks) & (cg.ids[j] == q)

    # output window base: the lowest found-tap window, in output z units
    tap_zoff = jnp.where(found, cg.zoff[j], _INT_MAX)
    zoff_in_min = jnp.where(jnp.any(found, axis=0),
                            jnp.min(tap_zoff, axis=0), 0)
    # input z covered by the frame starts at base = zoff_out * sz
    # (aligned: zoff_in_min is a multiple of cg.align and sz | cg.align
    # in the encoder's stride-2 path); conv padding pz restores the
    # z_out = (z_in + pz - dz) / sz arithmetic on the frame.
    zoff_out = jnp.maximum(0, zoff_in_min // sz)
    base = zoff_out * sz

    ws = w + int(spread)         # re-based input frame length
    # pack the site mask as one extra feature channel so each tap costs
    # ONE fat row gather (separate thin mask gathers are row-bound)
    packed = jnp.concatenate(
        [cg.feats, (cg.zmask & cg.cmask[:, None]).astype(dt)[..., None]],
        axis=-1)
    # tap windows sit at zoff_j >= base, so the re-base shift
    # dstart = base - zoff_j is <= 0; taps deeper than the frame drop
    # (consistently in features AND mask)
    cands = list(range(0, -ws, -max(1, cg.align)))
    acc = None
    zm = None
    for t in range(ky * kx):
        ky_, kx_ = t // kx, t % kx
        dstart = jnp.clip(base - cg.zoff[j[t]], -ws, 0)
        rows = _gather_rows(packed, jnp.where(found[t], j[t], 0))
        rows = jnp.where(found[t][:, None, None], rows, 0.0)
        frame = _row_shift_cases(rows, dstart, ws, cands)
        fr, mrows = frame[..., :c], frame[..., c]
        contrib = _zconv(fr, weight[:, ky_, kx_], stride=sz, padding=pz)
        mc = _zconv(mrows[..., None], jnp.ones((kz, 1, 1), dt),
                    stride=sz, padding=pz)
        lw = contrib.shape[1]
        if lw < w_out:
            contrib = jnp.pad(contrib, ((0, 0), (0, w_out - lw), (0, 0)))
            mc = jnp.pad(mc, ((0, 0), (0, w_out - lw), (0, 0)))
        acc = contrib[:, :w_out] if acc is None else acc + \
            contrib[:, :w_out]
        zm = mc[:, :w_out] if zm is None else zm + mc[:, :w_out]
    z_out_total = (int(z_total) + 2 * pz - kz) // sz + 1
    wi_o = jnp.arange(w_out)[None, :]
    out_zmask = (zm[..., 0] > 0.5) & out_cmask[:, None] & \
        (zoff_out[:, None] + wi_o < z_out_total)
    feats = jnp.where(out_zmask[..., None], acc, 0.0).astype(dt)
    out = WinGrid(feats, out_zmask, out_ids, out_cmask,
                  jnp.where(out_cmask, zoff_out, 0), (ny_o, nx_o),
                  out_align)
    return rewindow(out, out_align, target_w=int(out_window))


def zconv_win(cg: WinGrid, weight: jnp.ndarray, stride: int,
              padding: int) -> WinGrid:
    """Sparse conv with 1x1 BEV kernel (the encoder's conv_out (3,1,1)):
    the column set is unchanged, z convolved/strided within the common
    frame. Requires zoff == 0 (call `to_common_frame` first)."""
    kz = weight.shape[0]
    acc = _zconv(cg.feats, weight[:, 0, 0], stride=stride, padding=padding)
    zm = _zconv(cg.zmask.astype(cg.feats.dtype)[..., None],
                jnp.ones((kz, 1, 1), cg.feats.dtype), stride=stride,
                padding=padding)
    out_zmask = (zm[..., 0] > 0.5) & cg.cmask[:, None]
    feats = jnp.where(out_zmask[..., None], acc, 0.0).astype(cg.feats.dtype)
    return WinGrid(feats, out_zmask, cg.ids, cg.cmask,
                   jnp.zeros_like(cg.zoff), cg.bev, cg.align)


def to_common_frame(cg: WinGrid, z_total: int) -> WinGrid:
    """Expand per-column windows into one common frame [0, z_total)
    (zoff = 0 for every column): out[w'] = feats[w' - zoff]. Pure
    shift-selects over the possible zoff values (small by this point in
    the encoder)."""
    vc, w, c = cg.feats.shape
    a = max(1, cg.align)
    d = -jnp.clip(cg.zoff, 0, z_total)
    cands = list(range(0, -(z_total + 1), -a))
    rows = _row_shift_cases(cg.feats, d, z_total, cands)
    mrows = _row_shift_cases(cg.zmask.astype(cg.feats.dtype), d, z_total,
                             cands)
    zmask = (mrows > 0.5) & cg.cmask[:, None]
    feats = jnp.where(zmask[..., None], rows, 0.0)
    return WinGrid(feats.astype(cg.feats.dtype), zmask, cg.ids, cg.cmask,
                   jnp.zeros_like(cg.zoff), cg.bev, cg.align)


def win_to_dense(cg: WinGrid) -> jnp.ndarray:
    """Scatter to dense (ny, nx, Z*C), channels-last depth concat
    (`sparse_encoder.py:135-137` equivalent). Requires zoff == 0."""
    ny, nx = cg.bev
    vc, z, c = cg.feats.shape
    rows = cg.feats.reshape(vc, z * c)
    ids = jnp.where(cg.cmask, cg.ids, ny * nx)
    flat = jnp.zeros((ny * nx + 1, z * c), cg.feats.dtype)
    flat = flat.at[ids].set(rows, mode="drop", unique_indices=True,
                            indices_are_sorted=True)
    return flat[:-1].reshape(ny, nx, z * c)


def win_sites(cg: WinGrid) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Flatten to per-site rows for tests/interop: (coords (Vc*W, 3) zyx
    GLOBAL z, feats (Vc*W, C), mask (Vc*W,))."""
    ny, nx = cg.bev
    vc, w, c = cg.feats.shape
    yy, xx = _yx(jnp.where(cg.cmask, cg.ids, 0), nx)
    zz = jnp.arange(w)[None, :] + cg.zoff[:, None]
    coords = jnp.stack([jnp.broadcast_to(zz, (vc, w)),
                        jnp.broadcast_to(yy[:, None], (vc, w)),
                        jnp.broadcast_to(xx[:, None], (vc, w))], -1)
    return (coords.reshape(-1, 3), cg.feats.reshape(-1, c),
            (cg.zmask & cg.cmask[:, None]).reshape(-1))
