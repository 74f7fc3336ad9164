"""Host-side z-occupancy census of the bench cloud per encoder stage.

Drives the round-5 z-window design: for each sparse stage's active site
set (exact spconv semantics walked in numpy), reports per-column z-span,
the 3x3-BEV-neighborhood-extended window each column's subm conv needs
(incl. the +-1 z halo), and — for candidate window widths W with
align-8-quantized bases — what fraction of columns/cells overflow.

Usage: python tools/analysis_tools/micro_zdist.py [num_points]
"""
from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])

import numpy as np

from isfusion_tpu.flagship import _lidar_cloud

PCR = [-54, -54, -5, 54, 54, 3]
VS = [0.075, 0.075, 0.2]
GRID = (41, 1440, 1440)     # z, y, x


def site_census(zyx: np.ndarray, ny: int, nx: int, nz: int, tag: str,
                widths=(8, 12, 16, 24, 32), align: int = 8):
    """zyx (N, 3) unique active sites."""
    bev = zyx[:, 1].astype(np.int64) * nx + zyx[:, 2]
    order = np.argsort(bev, kind="stable")
    bev_s, z_s = bev[order], zyx[order, 0]
    uids, start = np.unique(bev_s, return_index=True)
    zmin = np.minimum.reduceat(z_s, start)
    zmax = np.maximum.reduceat(z_s, start)
    ncols = uids.shape[0]
    span = zmax - zmin + 1
    cells = np.diff(np.append(start, bev_s.shape[0]))

    # 3x3-neighborhood window (what a subm conv receiver must cover,
    # +-1 z halo): min/max over the 9 BEV neighbors' [zmin-1, zmax+1]
    lo = np.full((ny * nx,), np.iinfo(np.int32).max, np.int32)
    hi = np.full((ny * nx,), -1, np.int32)
    lo[uids] = zmin
    hi[uids] = zmax
    lo2 = lo.reshape(ny, nx)
    hi2 = hi.reshape(ny, nx)
    nlo = lo2.copy()
    nhi = hi2.copy()
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            sl = np.roll(np.roll(lo2, dy, 0), dx, 1)
            sh = np.roll(np.roll(hi2, dy, 0), dx, 1)
            nlo = np.minimum(nlo, sl)
            nhi = np.maximum(nhi, sh)
    w_lo = np.maximum(0, nlo.reshape(-1)[uids] - 1)
    w_hi = np.minimum(nz - 1, nhi.reshape(-1)[uids] + 1)
    need = w_hi - w_lo + 1

    print(f"\n== {tag}: sites={zyx.shape[0]} cols={ncols} z={nz} "
          f"(mean cells/col {zyx.shape[0]/ncols:.2f})")
    for name, arr in (("own span", span), ("nbhd window", need)):
        q = np.percentile(arr, [50, 90, 99, 99.9, 100])
        print(f"  {name:12s} p50={q[0]:.0f} p90={q[1]:.0f} p99={q[2]:.0f} "
              f"p99.9={q[3]:.0f} max={q[4]:.0f}")
    g_lo, g_hi = int(zmin.min()), int(zmax.max())
    print(f"  global active z range [{g_lo}, {g_hi}] "
          f"({g_hi - g_lo + 1} of {nz})")
    for w in widths:
        base = (w_lo // align) * align
        fits = (w_hi - base + 1) <= w
        # cells lost if overflowing cells were dropped (informational)
        frac_cols = 1 - fits.mean()
        print(f"  W={w:3d} align={align}: cols overflowing "
              f"{frac_cols*100:6.3f}%  ({int((~fits).sum())} cols)")
    return uids, zmin, zmax


def strided_out(zyx: np.ndarray, nz: int, ny: int, nx: int,
                pad=(1, 1, 1), k=3, s=2):
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
    inv = 1.0 / np.array(VS, np.float32)
    c = np.floor((xyz - np.array(PCR[:3], np.float32)) * inv).astype(np.int64)
    nz, ny, nx = GRID
    ok = (c[:, 0] >= 0) & (c[:, 0] < nx) & (c[:, 1] >= 0) & \
        (c[:, 1] < ny) & (c[:, 2] >= 0) & (c[:, 2] < nz)
    zyx = np.unique(np.stack([c[ok, 2], c[ok, 1], c[ok, 0]], -1), axis=0)

    site_census(zyx, ny, nx, nz, "stage0 (conv_input + stage-1 blocks)")
    # downsample z arithmetic follows the flagship paddings (1,1,1) then
    # (1,1,1); stage entry grids: 41->21->11
    s1, nz1, ny1, nx1 = strided_out(zyx, nz, ny, nx)
    site_census(s1, ny1, nx1, nz1, "stage1 (stage-2 blocks)",
                widths=(8, 12, 16, 24), align=4)
    s2, nz2, ny2, nx2 = strided_out(s1, nz1, ny1, nx1)
    site_census(s2, ny2, nx2, nz2, "stage2 (stage-3 blocks, dense in "
                "flagship)", widths=(4, 8, 12), align=4)


if __name__ == "__main__":
    main()
