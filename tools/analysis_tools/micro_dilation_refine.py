"""Census: how much of the x-dilated column table do the SUBM convs need?

The u-factorized subm conv (`sparse_cols.subm_conv_col_dil`) computes
u-partials at every table column, but a DILATED-ONLY column w (inactive,
zero feats) is consumed only through the y-combine of an output at
(y_w +- 1, x_w) — and subm outputs exist only at ACTIVE columns. So the
subm convs need just the REFINED table

    active  ∪  {dilated-only w : active column at (y_w +- 1, x_w)}

while the STRIDED conv's u-partials are consumed by the stride-2 output
table (different rule). This sizes both on the bench cloud per stage:
refined fraction (the subm conv's FLOP/gather scale factor) and the
fraction of dilated-only columns with a strided consumer (whether the
strided conv could shrink too — measured 100%, it cannot).

Result at 250k points (ray-cast nuScenes-scale, 0.075 m voxels):
  table 0: active 123,118  full dil 246,032 (2.00x)  refined 168,333
           (68% of full); strided needs 100% of full
  table 1: active 108,534  full dil 164,145 (1.51x)  refined 131,440
           (80% of full); strided needs 100% of full
-> shipped `subm_dilation_ratios=(1.40, 1.25)` (6-9% margin over the
   refined counts at the flagship's column caps 128,000 / 114,400).

Usage: python tools/analysis_tools/micro_dilation_refine.py [num_points]
"""
from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])

import numpy as np

from isfusion_tpu.flagship import _lidar_cloud

PCR = [-54, -54, -5, 54, 54, 3]
VS = [0.075, 0.075, 0.2]
GRID = (41, 1440, 1440)     # z, y, x


def census(uids: np.ndarray, ny: int, nx: int, tag: str):
    """uids: sorted unique active BEV ids (y-major: id = y*nx + x)."""
    x = uids % nx
    cand = [uids]
    cand.append(uids[x > 0] - 1)
    cand.append(uids[x + 1 < nx] + 1)
    dil = np.unique(np.concatenate(cand))
    isact = np.isin(dil, uids, assume_unique=True)
    donly = dil[~isact]
    # subm consumers: active at y+-1 (id +- nx)
    need_subm = np.isin(donly - nx, uids) | np.isin(donly + nx, uids)
    # strided consumers: does any stride-2 output column (spawned by the
    # 3x3 neighborhoods of ACTIVE columns; k=3 s=2 p=1) read w's u^s?
    ya, xa = uids // nx, uids % nx
    ny_o = (ny + 2 - 3) // 2 + 1
    nx_o = (nx + 2 - 3) // 2 + 1
    outs = []
    for dy in range(3):
        yo = ya + 1 - dy
        oky = (yo % 2 == 0)
        yo = yo // 2
        for dx in range(3):
            xo = xa + 1 - dx
            ok = oky & (xo % 2 == 0)
            xo2 = xo // 2
            m = ok & (yo >= 0) & (yo < ny_o) & (xo2 >= 0) & (xo2 < nx_o)
            outs.append(yo[m] * nx_o + xo2[m])
    out_ids = np.unique(np.concatenate(outs))
    # w consumed by output (y_o, x_o) iff y_w = 2 y_o + dy - 1 and
    # x_w = 2 x_o + dx - 1 for some in-kernel (dy, dx)
    yw, xw = donly // nx, donly % nx
    need_str = np.zeros(donly.shape[0], bool)
    for dy in range(3):
        yo = yw + 1 - dy
        oky = (yo % 2 == 0)
        yo2 = yo // 2
        for dx in range(3):
            xo = xw + 1 - dx
            ok = oky & (xo % 2 == 0)
            xo2 = xo // 2
            m = ok & (yo2 >= 0) & (yo2 < ny_o) & (xo2 >= 0) & (xo2 < nx_o)
            q = yo2[m] * nx_o + xo2[m]
            tmp = np.zeros(donly.shape[0], bool)
            tmp[m] = np.isin(q, out_ids)
            need_str |= tmp
    A, D = uids.shape[0], dil.shape[0]
    n_ref = A + int(need_subm.sum())
    str_pct = need_str.sum() / max(donly.shape[0], 1) * 100
    print(f"{tag}: active {A}  full dil {D} ({D / A:.2f}x)  "
          f"refined {n_ref} ({n_ref / D * 100:.1f}% of full)  "
          f"strided needs {str_pct:.1f}% of dilated-only")
    return out_ids, ny_o, nx_o


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 250000
    pts = _lidar_cloud(np.random.default_rng(0), n, PCR)
    xyz = pts[:, :3]
    inv = np.array([1.0 / v for v in VS], np.float32)
    c = np.floor((xyz - np.array(PCR[:3], np.float32)) * inv).astype(
        np.int64)
    nz, ny, nx = GRID
    ok = (c[:, 0] >= 0) & (c[:, 0] < nx) & (c[:, 1] >= 0) & \
        (c[:, 1] < ny) & (c[:, 2] >= 0) & (c[:, 2] < nz)
    bev = np.unique(c[ok, 1] * nx + c[ok, 0])
    o1, ny1, nx1 = census(bev.astype(np.int64), ny, nx, "table 0")
    census(o1, ny1, nx1, "table 1")


if __name__ == "__main__":
    main()
