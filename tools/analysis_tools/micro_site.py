"""Microbenchmark for the site-level subm conv candidate (round 5).

Question: at encoder stages 0-1 the column engine computes dense-z
convs (Z=48/24) while mean active z-cells/column is ~2.1 — ~95% of the
MXU work is on empty cells (VERDICT r4 top item). A site-level engine
does only active-site work: z-im2col via rolls (z-adjacent sites are
adjacent in a (bev_id, z)-sorted table), then 8 BEV-tap gathers of
(V, 3C) rows (host-planned rulebooks, monotone per tap) + one GEMM.

This measures that exact op at flagship stage shapes vs the column
engine's measured 51-63 ms/conv, plus the site<->column conversion
costs the hybrid needs around strided convs.

Usage: python tools/analysis_tools/micro_site.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from _bench_util import bench_loop  # noqa: E402


def realistic_sites(v_cap: int, rng, nx=1440, ny=1440, nz=48,
                    mean_span=2.1):
    """Synthetic sorted site table with nuScenes-like column occupancy."""
    n_cols = int(v_cap / mean_span * 1.35)
    cols = np.sort(rng.choice(nx * ny, size=n_cols, replace=False))
    spans = np.maximum(1, rng.geometric(1.0 / mean_span, size=n_cols))
    base = rng.integers(8, 28, size=n_cols)
    keys = []
    for c, s, b in zip(cols, spans, base):
        zs = np.arange(b, min(b + s, nz))
        keys.append(c.astype(np.int64) * nz + zs)
    keys = np.concatenate(keys)[:v_cap]
    keys = np.sort(keys)
    pad = np.full(v_cap - keys.shape[0], np.iinfo(np.int64).max)
    return np.concatenate([keys, pad]), keys.shape[0]


def tap_rulebook(keys: np.ndarray, n_real: int, nz=48, nx=1440):
    """8 BEV-tap (j, found) rulebooks; misses clamped monotone."""
    taps = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1),
            (1, -1), (1, 0), (1, 1)]
    v = keys.shape[0]
    js, fs = [], []
    for dy, dx in taps:
        q = keys + (dy * nx + dx) * nz
        j = np.searchsorted(keys[:n_real], q).astype(np.int32)
        j = np.minimum(j, n_real - 1)
        found = (keys[j] == q) & (np.arange(v) < n_real)
        # monotone miss clamp: already monotone since q is sorted
        js.append(j)
        fs.append(found)
    return np.stack(js), np.stack(fs)


def site_subm(f, j8, found8, zadj, w_all, smask, fuse: str):
    """f (V, C) -> (V, Cout). w_all (9, 3C, Cout). zadj (2, V) bool."""
    v, c = f.shape
    cout = w_all.shape[-1]
    fm = jnp.where(zadj[0][:, None], jnp.roll(f, 1, 0), 0.0)
    fp = jnp.where(zadj[1][:, None], jnp.roll(f, -1, 0), 0.0)
    f3 = jnp.concatenate([fm, f, fp], -1)
    if fuse == "concat":
        gs = [f3]
        for t in range(8):
            g = jnp.where(found8[t][:, None],
                          f3.at[j8[t]].get(mode="promise_in_bounds",
                                           indices_are_sorted=True), 0.0)
            gs.append(g)
        big = jnp.concatenate(gs, -1)                      # (V, 27C)
        out = big @ w_all.reshape(9 * 3 * c, cout)
    else:
        out = f3 @ w_all[0]
        for t in range(8):
            g = jnp.where(found8[t][:, None],
                          f3.at[j8[t]].get(mode="promise_in_bounds",
                                           indices_are_sorted=True), 0.0)
            out = out + g @ w_all[t + 1]
    return jnp.where(smask[:, None], out, 0.0).astype(f.dtype)


def main():
    rng = np.random.default_rng(0)
    print("== site-engine subm conv candidates (v5e) ==")
    for v_cap, cin, cout, span, tag in [
            (120000, 64, 32, 2.1, "stage0 conv_input"),
            (120000, 32, 32, 2.1, "stage0 subm"),
            (368640, 64, 64, 3.0, "stage1 subm"),
            (368640, 128, 128, 3.5, "stage2 subm (if sparse)")]:
        keys, n_real = realistic_sites(v_cap, rng, mean_span=span)
        j8, f8 = tap_rulebook(keys, n_real)
        zadj = np.stack([
            np.concatenate([[False], keys[1:] == keys[:-1] + 1]),
            np.concatenate([keys[:-1] == keys[1:] - 1, [False]])])
        smask = np.arange(v_cap) < n_real
        f = jnp.asarray(rng.normal(0, 1, (v_cap, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(0, 0.05, (9, 3 * cin, cout)),
                        jnp.bfloat16)
        j8j = jnp.asarray(j8)
        f8j = jnp.asarray(f8)
        zadjj = jnp.asarray(zadj)
        smaskj = jnp.asarray(smask)
        flops = 2.0 * v_cap * 27 * cin * cout
        print(f"-- {tag}: V={v_cap} real={n_real} Cin={cin} Cout={cout} "
              f"({flops / 1e9:.1f} GFLOP)")
        for fuse in ("acc", "concat"):
            if cin == cout:
                bench_loop(lambda x, fz=fuse: site_subm(
                    x, j8j, f8j, zadjj, w, smaskj, fz), f,
                    name=f"site_subm[{fuse}]", flops=flops)
            else:
                # non-square: ping-pong through a projector
                wp = jnp.asarray(rng.normal(0, 0.05, (cout, cin)),
                                 jnp.bfloat16)
                bench_loop(lambda x, fz=fuse: site_subm(
                    x, j8j, f8j, zadjj, w, smaskj, fz) @ wp, f,
                    name=f"site_subm[{fuse}]+proj", flops=flops)
        # gather-only floor: 8 masked f3-row gathers
        def gonly(x):
            f3 = jnp.concatenate([x, x, x], -1)
            acc = f3
            for t in range(8):
                acc = acc + jnp.where(
                    f8j[t][:, None],
                    f3.at[j8j[t]].get(mode="promise_in_bounds",
                                      indices_are_sorted=True), 0.0)
            return acc[:, :x.shape[1]]
        bench_loop(gonly, f, name="8-tap gather floor")

    # conversion costs for the hybrid (sites <-> columns, stage-0 scale)
    print("-- conversions (V=120000, Z=48, C=32, D=108000)")
    v_cap, z, c, d = 120000, 48, 32, 108000
    f = jnp.asarray(rng.normal(0, 1, (v_cap, c)), jnp.bfloat16)
    slot = jnp.asarray(np.sort(rng.choice(d * z, v_cap, replace=False))
                       .astype(np.int32))

    def scat(x):
        buf = jnp.zeros((d * z, c), x.dtype)
        return buf.at[slot].set(x, mode="drop", unique_indices=True,
                                indices_are_sorted=True)[:v_cap]
    bench_loop(scat, f, name="sites->columns scatter")

    big = jnp.asarray(rng.normal(0, 1, (d * z, c)), jnp.bfloat16)

    def gath(x):
        return x.at[slot].get(mode="promise_in_bounds",
                              indices_are_sorted=True) * 1.0001

    out = jax.jit(gath)(big)
    bench_loop(lambda x: jnp.pad(gath(x), ((0, d * z - v_cap), (0, 0))),
               big, name="columns->sites gather(+pad)")


if __name__ == "__main__":
    main()
