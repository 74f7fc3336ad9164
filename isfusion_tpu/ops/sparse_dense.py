"""Dense-grid stage engine for the sparse 3D conv encoder.

At the deep encoder stages the channel widths reach the MXU's sweet
spot (C >= 128: native 3D convs measured 112-162 TF/s on the v5e,
micro_conv_forms.py), so a plain dense XLA 3D convolution beats the
gather-based column engine (`ops/sparse_cols.py`), whose cost is
bandwidth-bound per fat-row gather regardless of occupancy. This module
provides the dense counterpart with EXACT spconv semantics (parity:
`/root/reference/mmdet3d/models/middle_encoders/sparse_encoder.py:108`,
spconv SubMConv3d/SparseConv3d):

- inactive sites hold zero features, so a dense convolution already
  computes the same sums as the sparse gather-GEMM;
- submanifold convs keep the input active set: mask the dense output
  with the input site mask;
- strided sparse convs activate every output site whose receptive field
  touches an input site: the output mask is a max-pool (reduce_window)
  of the input mask with the conv's window/stride/padding.

Unlike the column engine there is NO capacity anywhere — no column cap,
no dilation cap, no drops. The encoder converts from the column engine
to this one at a configured stage boundary (`SparseEncoder.
dense_from_stage`); the measured crossover lives in PERF.md.

Layout: (B, D, H, W, C) — "NDHWC", depth-major spatial. The round-4
first cut used (B, H, W, D, C) so the conversion scatter needed no
transpose, but XLA tiles that conv at only ~34-38 TF/s (D=5-21 in the
second-minor dim starves the tiling) vs 112-162 TF/s for NDHWC at the
same shapes — one extra transpose pass per conversion buys a ~3x conv
rate. (stage_profile_dense.py / micro_conv_forms.py measurements.)
"""
from __future__ import annotations

from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp

from .sparse_cols import ColumnGrid

_DIMNUM = ("NDHWC", "DHWIO", "NDHWC")


@flax.struct.dataclass
class DenseGrid:
    """Batched dense voxel grid with an active-site mask.

    Invariant: ``feats`` is zero at every inactive site.
    """
    feats: jnp.ndarray   # (B, D, H, W, C)
    zmask: jnp.ndarray   # (B, D, H, W) bool


def columns_to_dense(cg: ColumnGrid, z_logical: int, z_lo: int = 0,
                     keep_window: bool = False) -> DenseGrid:
    """Batched ColumnGrid (leading vmap axis) -> DenseGrid.

    Slices the column engine's lane-alignment z padding back to the
    logical extent (pad cells are masked-off zeros, so this is lossless).
    One scatter of (Vc, z*C) rows per sample + one transpose to the
    depth-major conv layout. ``z_lo`` re-bases a z-WINDOWED grid
    (sparse_cols.build_column_grid z window): stored cell w scatters to
    true z = z_lo + w; cells outside the window are zero by the window
    contract. With ``keep_window`` the dense grid KEEPS the window as its
    stored z extent (stored cell w = true z ``z_lo + w``) instead of
    padding back to the logical extent — the dense-stage z window
    (`SparseEncoder.z_windows` on dense tables)."""
    ny, nx = cg.bev
    z_logical = int(z_logical)
    z_lo = int(z_lo)
    zl = min(cg.feats.shape[2], z_logical - z_lo)

    def one(feats, zmask, ids, cmask):
        vc, _, c = feats.shape
        rows = feats[:, :zl].reshape(vc, zl * c)
        out_ids = jnp.where(cmask, ids, ny * nx)
        flat = jnp.zeros((ny * nx + 1, zl * c), feats.dtype)
        flat = flat.at[out_ids].set(rows, mode="drop", unique_indices=True,
                                    indices_are_sorted=True)
        mrows = zmask[:, :zl]
        mflat = jnp.zeros((ny * nx + 1, zl), bool)
        mflat = mflat.at[out_ids].set(mrows, mode="drop",
                                      unique_indices=True,
                                      indices_are_sorted=True)
        return (flat[:-1].reshape(ny, nx, zl, c).transpose(2, 0, 1, 3),
                mflat[:-1].reshape(ny, nx, zl).transpose(2, 0, 1))

    feats, zmask = jax.vmap(one)(cg.feats, cg.zmask, cg.ids, cg.cmask)
    if not keep_window and (z_lo or zl < z_logical):
        pad = ((0, 0), (z_lo, z_logical - z_lo - zl), (0, 0), (0, 0))
        feats = jnp.pad(feats, pad + ((0, 0),))
        zmask = jnp.pad(zmask, pad)
    return DenseGrid(feats, zmask)


def _zwin3d(x: jnp.ndarray, t: int, need: int) -> jnp.ndarray:
    """Slice/pad the depth axis of (B, D, H, W, ...) to the ``need`` cells
    starting at stored index ``t`` (zero outside) — the 3D counterpart of
    `sparse_cols._zconv_shift`'s input windowing."""
    lpad = max(0, -t)
    start = max(0, t)
    take = max(0, min(x.shape[1] - start, need - lpad))
    xw = x[:, start:start + take]
    rpad = need - lpad - take
    if lpad or rpad:
        pad = [(0, 0), (lpad, rpad)] + [(0, 0)] * (x.ndim - 2)
        xw = jnp.pad(xw, pad)
    return xw


def _conv(x: jnp.ndarray, w: jnp.ndarray, stride: Tuple[int, int, int],
          pad: Tuple[int, int, int]) -> jnp.ndarray:
    """3D conv on (B, D, H, W, C); w is (kz, ky, kx, Cin, Cout) like the
    column engine (z-major) — already DHWIO."""
    sz, sy, sx = stride
    pz, py, px = pad
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(sz, sy, sx),
        padding=[(pz, pz), (py, py), (px, px)],
        dimension_numbers=_DIMNUM,
        preferred_element_type=x.dtype)


def subm_conv_dense(dg: DenseGrid, weight: jnp.ndarray) -> DenseGrid:
    """Submanifold conv: active set unchanged; weight (kz,ky,kx,Cin,Cout)
    applied 'same' with z padding kz//2 (matching `subm_conv_col`)."""
    kz, ky, kx, _, _ = weight.shape
    out = _conv(dg.feats, weight, (1, 1, 1), (kz // 2, ky // 2, kx // 2))
    out = jnp.where(dg.zmask[..., None], out, 0.0).astype(dg.feats.dtype)
    return DenseGrid(out, dg.zmask)


def sparse_conv_dense(dg: DenseGrid, weight: jnp.ndarray, stride,
                      padding, z_shift=None, out_zlen: int = 0
                      ) -> DenseGrid:
    """Strided sparse conv: output site active iff any input site lies in
    its receptive field (spconv SparseConv3d).

    ``(z_shift, out_zlen)`` run the depth dimension between two z WINDOWS
    (same contract as `sparse_cols.sparse_conv_col_dil`):
    out[:, o] sums w[dz] * in[:, sz*o + dz + z_shift] with zeros outside
    the stored extent; z_shift = sz*z_lo_out - z_lo_in - pz. Defaults
    reproduce the plain padded conv."""
    kz, ky, kx, _, _ = weight.shape
    s = (stride,) * 3 if isinstance(stride, int) else tuple(stride)
    p = (padding,) * 3 if isinstance(padding, int) else tuple(padding)
    sz, sy, sx = (int(v) for v in s)
    pz, py, px = (int(v) for v in p)
    if z_shift is None:
        z_shift = -pz
    if not out_zlen:
        out_zlen = (dg.feats.shape[1] + 2 * pz - kz) // sz + 1
    need = sz * (int(out_zlen) - 1) + kz
    feats = _zwin3d(dg.feats, int(z_shift), need)
    zin = _zwin3d(dg.zmask, int(z_shift), need)
    out = _conv(feats, weight, (sz, sy, sx), (0, py, px))
    zmask = jax.lax.reduce_window(
        zin, False, jax.lax.bitwise_or,
        window_dimensions=(1, kz, ky, kx),
        window_strides=(1, sz, sy, sx),
        padding=((0, 0), (0, 0), (py, py), (px, px)))
    out = jnp.where(zmask[..., None], out, 0.0).astype(dg.feats.dtype)
    return DenseGrid(out, zmask)


def dense_to_bev(dg: DenseGrid, z_lo: int = 0,
                 z_logical: int = 0) -> jnp.ndarray:
    """(B, D, H, W, C) -> (B, H, W, D*C) with out[..., z*C:(z+1)*C] =
    feats[:, z] — identical channel order to `column_to_dense` (one
    transpose pass). A z-WINDOWED grid (stored cell w = true z
    ``z_lo + w``) is padded back to the ``z_logical`` extent first so the
    BEV channel layout matches the un-windowed reference arithmetic."""
    b, d, h, w, c = dg.feats.shape
    feats = dg.feats
    if z_lo or (z_logical and z_logical != d):
        assert z_logical >= z_lo + d
        feats = jnp.pad(feats, ((0, 0), (z_lo, z_logical - z_lo - d),
                                (0, 0), (0, 0), (0, 0)))
        d = z_logical
    return feats.transpose(0, 2, 3, 1, 4).reshape(b, h, w, d * c)
