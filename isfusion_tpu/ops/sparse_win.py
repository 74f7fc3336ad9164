"""Windowed-column sparse 3D convolution: BEV-sparse, z-WINDOWED columns.

Third-generation TPU engine for the spconv-class workload
(`/root/reference/mmdet3d/models/middle_encoders/sparse_encoder.py:19`).
The round-2 column engine (`ops/sparse_cols.py`) keeps a DENSE z extent
per active BEV column; measured on ray-cast nuScenes-scale clouds the
median active z-span per column is 1 cell and the 99.95th percentile 24,
while the stored extent is 48 — so >2/3 of every byte moved and every MXU
flop is spent on provably-empty z cells. It also runs convs on an
x-DILATED table (2.0x the active columns at stage 0) whose construction
costs a measured 16-54 ms of sorts PER STAGE (stage_profile.py) and whose
configured capacity silently dropped ~38% of active columns at 1.35x.

This engine stores, per active column, a fixed-width z WINDOW:

- ``feats (Vc, W, C)`` with per-column ``zoff``: global z = zoff + w.
- zoff is a multiple of ``align``.
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
  neighbor's (W*C) window row, then the same shift-select re-basing.
- all 9 taps stack into a (Vc, 9, W, Cin) im2col feeding ONE conv with
  a (9, kz) spatial kernel (VALID over the tap axis) — a K = 9*kz*Cin
  MXU contraction.

ROUND-4 LAYOUT FIX (the round-3 engine measured 1580 ms vs 681 ms for
the column engine at full scale): every shift/re-base/mask op previously
ran on (Vc, W, C) tensors whose minor dim C = 32/64 filled only a
quarter/half of the TPU's 128-wide lane dimension, so each of the many
elementwise passes was 2-4x lane-padded. All shift machinery now
operates on FLATTENED (Vc, W*C) rows — W*C >= 512 fills the lanes, and a
z-shift by s becomes an in-row roll by s*C with a flat-index validity
mask. 3D shapes appear only at conv boundaries, where the conv picks its
own layout.

ROUND-4 BARREL FIX (the flattened engine still measured 1544 ms; per-op
profiling, micro_win_ops.py): the per-row variable shifts (re-basing,
rewindow, strided frames) ran as one-hot case chains of span/align full
passes — the strided conv's chain alone was 62-134 ms, and align halves
per stage so the deep-stage chains were longer still. `_row_shift_barrel`
now picks per call site between the one-hot chain (few cases: the subm
re-base's 3-5) and a barrel shifter (log passes; wins at the strided
convs' long chains) by a passes-x-frame-width cost model.

Semantics match spconv (oracle-tested against dense conv in
`tests/test_ops/test_sparse_win.py`): subm convs preserve the active
set; strided convs activate every output site whose receptive field
touches an input site (windows halve through z-stride and are re-guarded
by `rewindow`). All shapes static; batch via vmap.
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
# (0, +-1) are rolls. Order matches _im2col's row-major (dy, dx) layout.
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


def _gather_rows_flat(flat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row gather of an already-flat (V, W*C) table (2D-operand gathers
    run at the engine's 96-200 GB/s; wider rows are faster)."""
    return flat.at[idx].get(unique_indices=False,
                            mode="promise_in_bounds")


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


def _zshift_flat(xf: jnp.ndarray, s: int, w: int, c: int) -> jnp.ndarray:
    """Window shift on flat rows: out[:, w'] = x[:, w' - s] with zero
    fill, i.e. an in-row roll by s*c plus a flat-index validity mask
    (lane-dense: rows are w*c >= 512 elements)."""
    if s == 0:
        return xf
    rolled = jnp.roll(xf, s * c, axis=1)
    fi = jnp.arange(w * c)
    ok = (fi >= s * c) if s > 0 else (fi < (w + s) * c)
    return jnp.where(ok[None], rolled, 0.0)


def _sh_pad(yf: jnp.ndarray, s: int, pad_to: int, c: int) -> jnp.ndarray:
    """Static zero-fill shift in a padded flat frame: out[wi] = y[wi-s]."""
    if s == 0:
        return yf
    rolled = jnp.roll(yf, s * c, axis=1)
    fi = jnp.arange(pad_to * c)
    ok = (fi >= s * c) if s > 0 else (fi < (pad_to + s) * c)
    return jnp.where(ok[None], rolled, 0.0)


def _row_shift_barrel(xf: jnp.ndarray, shift: jnp.ndarray, w: int, c: int,
                      out_w: int, lo: int, hi: int,
                      step: int) -> jnp.ndarray:
    """Per-row variable shift on flat rows, BARREL-decomposed:
    out[v, wi] = x[v, wi + shift[v]] for 0 <= wi + shift < w, else 0;
    shift[v] in [lo, hi], a multiple of ``step``.

    Zero-fill shifts compose (shift(a) o shift(b) = shift(a+b)), so the
    per-row shift runs as ONE static shift by -hi plus bit_length((hi-lo)
    / step) conditional passes — log cost in the span instead of the
    one-hot case chain (span/step passes) this replaces: the strided
    conv's span/align cascade measured 62-134 ms/conv at stage-1 scale,
    and align halves per stage so the deep-stage chains were longer
    still."""
    assert hi >= lo and step >= 1
    # cases with no [0, w) overlap contribute nothing (s >= w reads past
    # the content, s <= -out_w writes past the view) — skip them
    cases = [s for s in range(lo, hi + 1, step)
             if s < w and s > -out_w]
    n_cases = max(len(cases), 1)
    nbits = (max(int(hi - lo) // step, 0)).bit_length()
    r_off = max(hi, 0)
    # pass-cost model (passes x frame width): one-hot shifts stay in a
    # max(w, out_w) frame (the logical wi+s mask kills every wrapped
    # position, so rolls need no extra headroom); the barrel needs an
    # offset frame (right-moves only + read offset) of r_off + out_w.
    # XLA fuses the independent one-hot roll+select chain into few real
    # passes while the barrel's passes are data-dependent-sequential
    # (measured: 8-case one-hot 134 ms vs 3-bit barrel 150 ms at the
    # stage-1 strided conv) — weight the barrel 3x for that.
    f1 = max(w, out_w)
    f2 = max(w, r_off + out_w)
    if n_cases * f1 <= 3 * (nbits + (1 if hi < 0 else 0) + 1) * f2:
        # few-case one-hot select chain (e.g. the subm re-base's 3-5
        # cases) — no frame growth
        pad_to = f1
        xp = jnp.pad(xf, ((0, 0), (0, (pad_to - w) * c)))
        fi = jnp.arange(pad_to * c)
        wi = fi // c
        out = None
        for s in cases:
            rolled = jnp.roll(xp, -s * c, axis=1) if s != 0 else xp
            ok = (wi + s >= 0) & (wi + s < w)
            term = jnp.where((shift == s)[:, None] & ok[None], rolled, 0.0)
            out = term if out is None else out + term
        if out is None:
            out = jnp.zeros_like(xp)
        return out[:, :out_w * c]
    # Barrel: only RIGHT moves (left intermediate positions would drop
    # content): content x[j] moves to physical j + s0 + S with
    # S = hi - shift, then the read slice starts at offset R:
    # out[wi] = phys[wi + R] = x[j] with j = wi + R - s0 - S = wi + shift.
    # Content pushed past the read window only ever moves further right,
    # so the frame truncates at R + out_w (wrap positions are masked).
    s0 = r_off - hi                               # static right move >= 0
    pad_to = f2
    xp = jnp.pad(xf, ((0, 0), (0, (pad_to - w) * c)))
    cur = _sh_pad(xp, s0, pad_to, c)
    r = (hi - shift) // step                      # per-row, >= 0
    for b in range(nbits):
        s = (1 << b) * step
        cur = jnp.where(((r >> b) & 1 == 1)[:, None],
                        _sh_pad(cur, s, pad_to, c), cur)
    return cur[:, r_off * c:(r_off + out_w) * c]


def _rebase_cases_flat(nbrf: jnp.ndarray, delta: jnp.ndarray, w: int,
                       c: int, align: int) -> jnp.ndarray:
    """Express flat neighbor rows (V, W*C) in the receiver's frame:
    out[w'] = nbr[w' - delta]. |delta| >= W has no overlap (exact under
    the guard). delta is a multiple of ``align`` clipped to [-w, w]."""
    return _row_shift_barrel(nbrf, -delta, w, c, w, lo=-w, hi=w,
                             step=align)


def _row_shift_cases_flat(xf: jnp.ndarray, shift: jnp.ndarray, w: int,
                          c: int, out_w: int, candidates) -> jnp.ndarray:
    """Per-row shift into a possibly different width, on flat rows:
    out[v, wi] = x[v, wi + shift[v]]. ``candidates`` bounds the shift
    range (all actual shifts are multiples of their gcd-step within
    [min, max]); barrel decomposition, see `_row_shift_barrel`."""
    import math
    cands = [int(s) for s in candidates]
    lo, hi = min(cands), max(cands)
    step = 0
    for s in cands:
        step = math.gcd(step, abs(s))
    return _row_shift_barrel(xf, shift, w, c, out_w, lo, hi,
                             max(step, 1))


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


def _side_tap_impl(t: int, align: int, w: int, c: int, featsf: jnp.ndarray,
                   slots6: jnp.ndarray, found6: jnp.ndarray,
                   delta6: jnp.ndarray) -> jnp.ndarray:
    rows = _gather_rows_flat(featsf, jnp.where(found6[t], slots6[t], 0))
    rows = jnp.where(found6[t][:, None], rows, 0.0)
    return _rebase_cases_flat(rows, jnp.clip(delta6[t], -w, w), w, c, align)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _side_tap_sym(t: int, align: int, w: int, c: int, featsf, slots6,
                  found6, delta6):
    """One side tap with a SCATTER-FREE backward.

    The tap adjacency is an involution on the sorted unique id table:
    u is v's (dy, dx) neighbor iff v is u's (-dy, -dx) neighbor, with
    delta and the window-validity mask exactly mirrored. The VJP of
    `out[v] = rebase(feats[slot_t[v]], delta_t[v])` w.r.t. feats is
    therefore the SAME gather+rebase applied to the cotangent with the
    opposite tap's rulebook — a gather (~21-35 ns/row) instead of the
    scatter-add (~64-72 ns/row) autodiff would emit."""
    return _side_tap_impl(t, align, w, c, featsf, slots6, found6, delta6)


def _side_tap_sym_fwd(t, align, w, c, featsf, slots6, found6, delta6):
    out = _side_tap_impl(t, align, w, c, featsf, slots6, found6, delta6)
    return out, (slots6, found6, delta6)


def _side_tap_sym_bwd(t, align, w, c, res, ct):
    slots6, found6, delta6 = res
    d_feats = _side_tap_impl(_OPP[t], align, w, c, ct, slots6, found6,
                             delta6)

    def f0(x):
        return np.zeros(x.shape, jax.dtypes.float0)

    return (d_feats, f0(slots6), f0(found6), f0(delta6))


_side_tap_sym.defvjp(_side_tap_sym_fwd, _side_tap_sym_bwd)


def _x_taps_flat(cg: WinGrid, featsf: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(hm, hp) flat: x-1 / x+1 neighbor windows re-based to each
    receiver, built from rolls (exact on a sorted unique id table)."""
    ny, nx = cg.bev
    del ny
    vc, w, c = cg.feats.shape
    m_p = _roll_match(cg.ids, cg.cmask, nx, +1)
    m_m = _roll_match(cg.ids, cg.cmask, nx, -1)
    d_p = jnp.where(m_p, jnp.roll(cg.zoff, -1) - cg.zoff, w)
    d_m = jnp.where(m_m, jnp.roll(cg.zoff, 1) - cg.zoff, w)
    hp = jnp.where(m_p[:, None], jnp.roll(featsf, -1, axis=0), 0.0)
    hm = jnp.where(m_m[:, None], jnp.roll(featsf, 1, axis=0), 0.0)
    return (_rebase_cases_flat(hm, d_m, w, c, cg.align),
            _rebase_cases_flat(hp, d_p, w, c, cg.align))


def _im2col9(cg: WinGrid, rulebook) -> jnp.ndarray:
    """(Vc, 9, W, Cin) im2col: tap-major stack in row-major (dy, dx)
    order. Built entirely from flat (V, W*C) rows; the single reshape at
    the end feeds the conv, which picks its own layout."""
    vc, w, c = cg.feats.shape
    featsf = cg.feats.reshape(vc, w * c)
    slots, found, delta = rulebook
    side = [_side_tap_sym(t, cg.align, w, c, featsf, slots, found, delta)
            for t in range(len(SIDE_TAPS))]
    hm, hp = _x_taps_flat(cg, featsf)
    taps = [side[0], side[1], side[2],      # dy = -1
            hm, featsf, hp,                 # dy = 0
            side[3], side[4], side[5]]      # dy = +1
    return jnp.concatenate(taps, axis=-1).reshape(vc, 9, w, c)


def _conv9(g9: jnp.ndarray, weight: jnp.ndarray, stride: int = 1,
           padding: int = 1) -> jnp.ndarray:
    """One conv over the (9, W) spatial pair: g9 (V, 9, W, Cin) x weight
    (kz, 3, 3, Cin, Cout) -> (V, W', Cout). The tap axis is a size-9
    spatial dim consumed VALID by a size-9 kernel, so the whole 3^3
    kernel is a single K = 9*kz*Cin MXU contraction.

    (A round-4 attempt at a fat matmul emitting kz*Cout z-partials —
    N = 96 vs N = Cout = 32 on the MXU lanes — measured 14.3 ms vs this
    conv's 7.5 ms at stage-1 scale: the z-partial combine's strided
    slices force thin-minor (…, kz, Cout) relayouts that cost more than
    the wider N saves. Cout-starvation caps every formulation here at
    ~15-20 TF/s; the conv is already there.)"""
    kz, ky, kx, cin, cout = weight.shape
    w9 = weight.transpose(1, 2, 0, 3, 4).reshape(ky * kx, kz, cin, cout)
    out = jax.lax.conv_general_dilated(
        g9, w9.astype(g9.dtype), window_strides=(1, stride),
        padding=((0, 0), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=g9.dtype)
    return out[:, 0]


def subm_conv_win(cg: WinGrid, weight: jnp.ndarray,
                  rulebook=None) -> jnp.ndarray:
    """Submanifold conv; weight (kz, 3, 3, Cin, Cout) (kz odd, z-padded
    same). Returns (Vc, W, Cout) feats at the same sites."""
    kz, ky, kx, cin, cout = weight.shape
    assert (ky, kx) == (3, 3), "window engine is specialized to 3x3 BEV"
    if rulebook is None:
        rulebook = win_rulebook(cg)
    acc = _conv9(_im2col9(cg, rulebook), weight, padding=kz // 2)
    acc = jnp.where(cg.zmask[..., None], acc, 0.0)
    return acc.astype(cg.feats.dtype)


def rewindow(cg: WinGrid, align: int, target_w: int = 0) -> WinGrid:
    """Re-establish the guard invariant (and optionally change the window
    width): shift each column so zoff' = max(0, align_down(zmin-1,
    align)), dropping cells past the new w = W-2 edge. Pure per-row
    flat shift-selects — no gather."""
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
    rows = _row_shift_cases_flat(cg.feats.reshape(vc, w * c), delta, w, c,
                                 wt, cands).reshape(vc, wt, c)
    mrows = _row_shift_cases_flat(cg.zmask.astype(cg.feats.dtype), delta,
                                  w, 1, wt, cands)
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
    gathered re-based into that frame (the z base is zoff_out * sz, a
    multiple of the input alignment) and the output is re-guarded with
    `rewindow`. Tap cells falling outside the gathered frame produce no
    output sites (capacity-overflow semantics, exact: both features and
    the site mask are derived from the same gathered windows).
    ``z_total`` is the INPUT grid's global z extent — output sites are
    clamped to z_out < (z_total + 2*pz - kz)//sz + 1, the dense/spconv
    output-size formula. ``spread`` widens the gathered input slice
    beyond one window so taps whose windows sit up to ``spread`` cells
    above the lowest tap are fully covered (measured: 97.7%% of
    neighbor-window deltas are <= 8 at stage 0; taps beyond slice
    coverage drop cells, same overflow semantics)."""
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
    cp = c + 1
    packedf = jnp.concatenate(
        [cg.feats, (cg.zmask & cg.cmask[:, None]).astype(dt)[..., None]],
        axis=-1).reshape(vc, w * cp)
    # tap windows sit at zoff_j >= base, so the re-base shift
    # dstart = base - zoff_j is <= 0; taps deeper than the frame drop
    # (consistently in features AND mask). All 9 tap frames stack into
    # one (Vo, 9, ws, C+1) block so the conv is a single K = 9*kz*Cin
    # contraction (tap order row-major (dy, dx) matching the weight
    # reshape in _conv9).
    cands = list(range(0, -ws, -max(1, cg.align)))
    frames = []
    for t in range(ky * kx):
        # dstart <= 0 for found taps (base = min found-tap zoff); a tap
        # whose window lies entirely above the frame (dstart <= -ws) has
        # zero overlap and must contribute nothing — zero the row rather
        # than clipping the shift (a clipped non-step-multiple shift
        # would leak a partial overlap through the barrel shifter).
        dstart_t = base - cg.zoff[j[t]]
        ok_t = found[t] & (dstart_t > -ws)
        dstart = jnp.where(ok_t, dstart_t, 0)
        rows = _gather_rows_flat(packedf, jnp.where(ok_t, j[t], 0))
        rows = jnp.where(ok_t[:, None], rows, 0.0)
        frames.append(_row_shift_cases_flat(rows, dstart, w, cp, ws,
                                            cands))
    g9 = jnp.concatenate(frames, axis=-1).reshape(-1, 9, ws, cp)
    acc = _conv9(g9[..., :c], weight, stride=sz, padding=pz)
    # one mask channel summed across all 9 taps: conv9 with a ones
    # kernel over (tap, kz)
    ones_w = jnp.ones((kz, ky, kx, 1, 1), dt)
    zm = _conv9(g9[..., c:], ones_w, stride=sz, padding=pz)
    lw = acc.shape[1]
    if lw < w_out:
        acc = jnp.pad(acc, ((0, 0), (0, w_out - lw), (0, 0)))
        zm = jnp.pad(zm, ((0, 0), (0, w_out - lw), (0, 0)))
    acc = acc[:, :w_out]
    zm = zm[:, :w_out]
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

    def conv1(x, ww):
        return jax.lax.conv_general_dilated(
            x, ww.astype(x.dtype), window_strides=(stride,),
            padding=[(padding, padding)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=x.dtype)

    acc = conv1(cg.feats, weight[:, 0, 0])
    zm = conv1(cg.zmask.astype(cg.feats.dtype)[..., None],
               jnp.ones((kz, 1, 1), cg.feats.dtype))
    out_zmask = (zm[..., 0] > 0.5) & cg.cmask[:, None]
    feats = jnp.where(out_zmask[..., None], acc, 0.0).astype(cg.feats.dtype)
    return WinGrid(feats, out_zmask, cg.ids, cg.cmask,
                   jnp.zeros_like(cg.zoff), cg.bev, cg.align)


def to_common_frame(cg: WinGrid, z_total: int) -> WinGrid:
    """Expand per-column windows into one common frame [0, z_total)
    (zoff = 0 for every column): out[w'] = feats[w' - zoff]. Pure flat
    shift-selects over the possible zoff values (small by this point in
    the encoder)."""
    vc, w, c = cg.feats.shape
    a = max(1, cg.align)
    d = -jnp.clip(cg.zoff, 0, z_total)
    cands = list(range(0, -(z_total + 1), -a))
    rows = _row_shift_cases_flat(cg.feats.reshape(vc, w * c), d, w, c,
                                 z_total, cands).reshape(vc, z_total, c)
    mrows = _row_shift_cases_flat(cg.zmask.astype(cg.feats.dtype), d, w,
                                  1, z_total, cands)
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
