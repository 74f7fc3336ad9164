"""Two-band z-split census: sizes the candidate split of each sparse
stage table into a LOW band (ground plane, shared window base) convolved
for every column plus a HIGH band convolved only on the x-dilated table
of columns with activity above the split.

For each stage table (window coords) and candidate split s, reports:
  - fraction of active columns with any activity at w >= s (high cols)
  - the x-dilated high table size D2 (the part-2 conv's row count)
  - FLOP ratio of the two-band conv vs the shipped single-window conv:
      (D*(s+2) + D2*(W-s+2)) / (D*W)
    (the +2 is the kz=3 halo each part pays).

Usage: python tools/analysis_tools/micro_zbands.py [num_points]
"""
from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])

import numpy as np

from isfusion_tpu.flagship import _lidar_cloud

PCR = [-54, -54, -5, 54, 54, 3]
VS = [0.075, 0.075, 0.2]
GRID = (41, 1440, 1440)     # z, y, x
WINDOWS = ((15, 25), (7, 14))   # flagship z_windows (table 0, 1)


def xdil_count(uids: np.ndarray, nx: int) -> int:
    """|x-dilation| of a sorted unique BEV id set (ids +- 1, same row)."""
    x = uids % nx
    cand = [uids]
    cand.append(uids[x > 0] - 1)
    cand.append(uids[x + 1 < nx] + 1)
    return np.unique(np.concatenate(cand)).shape[0]


def band_census(zyx: np.ndarray, ny: int, nx: int, nz: int, z_lo: int,
                width: int, tag: str, splits):
    bev = zyx[:, 1].astype(np.int64) * nx + zyx[:, 2]
    w = zyx[:, 0] - z_lo
    keep = (w >= 0) & (w < width)
    bev, w = bev[keep], w[keep]
    order = np.argsort(bev, kind="stable")
    bev_s, w_s = bev[order], w[order]
    uids, start = np.unique(bev_s, return_index=True)
    wmax = np.maximum.reduceat(w_s, start)
    D_act = uids.shape[0]
    D = xdil_count(uids, nx)
    print(f"\n== {tag}: cols={D_act} dilated={D} window width={width}")
    for s in splits:
        high = uids[wmax >= s - 1]   # input halo: outputs at w>=s need
        # inputs at w>=s-1; u partials live on the x-dilation of these
        D2 = xdil_count(high, nx) if high.size else 0
        n_high_out = int((wmax >= s).sum())
        flops = (D * (s + 2) + D2 * (width - s + 2)) / (D * width)
        print(f"  split s={s:2d}: high cols {n_high_out:7d} "
              f"({n_high_out / D_act * 100:5.1f}%)  part2 table D2={D2:7d} "
              f"({D2 / D * 100:5.1f}% of D)  conv FLOP ratio {flops:.3f}")


def strided_out(zyx, nz, ny, nx, pad=(1, 1, 1), k=3, s=2):
    nz_o = (nz + 2 * pad[0] - k) // s + 1
    ny_o = (ny + 2 * pad[1] - k) // s + 1
    nx_o = (nx + 2 * pad[2] - k) // s + 1
    outs = []
    for dz in range(k):
        zo = zyx[:, 0] + pad[0] - dz
        okz = (zo % s == 0)
        zo = zo // s
        for dy in range(k):
            yo = zyx[:, 1] + pad[1] - dy
            oky = okz & (yo % s == 0)
            yo = yo // s
            for dx in range(k):
                xo = zyx[:, 2] + pad[2] - dx
                okx = oky & (xo % s == 0)
                xo = xo // s
                ok = okx & (zo >= 0) & (zo < nz_o) & \
                    (yo >= 0) & (yo < ny_o) & (xo >= 0) & (xo < nx_o)
                outs.append(np.stack([zo[ok], yo[ok], xo[ok]], -1))
    out = np.unique(np.concatenate(outs), axis=0)
    return out, nz_o, ny_o, nx_o


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 250000
    pts = _lidar_cloud(np.random.default_rng(0), n, PCR)
    xyz = pts[:, :3]
    inv = np.array([1.0 / v for v in VS], np.float32)
    c = np.floor((xyz - np.array(PCR[:3], np.float32)) * inv).astype(np.int64)
    nz, ny, nx = GRID
    ok = (c[:, 0] >= 0) & (c[:, 0] < nx) & (c[:, 1] >= 0) & \
        (c[:, 1] < ny) & (c[:, 2] >= 0) & (c[:, 2] < nz)
    zyx = np.unique(np.stack([c[ok, 2], c[ok, 1], c[ok, 0]], -1), axis=0)

    z_lo, wd = WINDOWS[0]
    band_census(zyx, ny, nx, nz, z_lo, wd,
                "table 0 (conv_input + stage-1)", splits=(4, 6, 8, 10, 12))
    s1, nz1, ny1, nx1 = strided_out(zyx, nz, ny, nx)
    z_lo, wd = WINDOWS[1]
    band_census(s1, ny1, nx1, nz1, z_lo, wd, "table 1 (stage-2)",
                splits=(3, 4, 6, 8))


if __name__ == "__main__":
    main()
