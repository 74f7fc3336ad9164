"""Per-primitive profile of the window engine at stage-1 bench scale.

The flattened-lane rework (round 4) still measures ~1544 ms whole-encoder
vs 681 ms for the column engine; this decomposes one stage-1 subm conv
and one strided conv into their primitives with tunnel-safe in-graph
timing to locate the regression.

Usage: python tools/analysis_tools/micro_win_ops.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from isfusion_tpu.config import Config
from isfusion_tpu.flagship import ISFUSION_CFG, build_isfusion_flagship
from isfusion_tpu.models.detectors.voxelnet import _capacity
from isfusion_tpu.ops.voxel import voxelize_dynamic
from isfusion_tpu.ops import sparse_win as sw
from tools.analysis_tools._bench_util import bench_loop

COL_CAP = 108000   # cap_for(0) at the flagship's 120k * 0.9
W0 = 16


def main():
    _, batch_fn = build_isfusion_flagship()
    batch = batch_fn(1)
    cfg = Config.fromfile(ISFUSION_CFG)
    vl = dict(cfg.model["pts_voxel_layer"])
    cap = _capacity(vl.get("max_voxels", 120000), False)
    dv = jax.jit(lambda p, m: voxelize_dynamic(
        p, m, vl["point_cloud_range"], vl["voxel_size"], cap))(
            batch["points"][0], batch["points_mask"][0])
    rng = np.random.default_rng(0)
    feats64 = jnp.asarray(rng.normal(0, 1, (cap, 64)), jnp.bfloat16)
    feats64 = jnp.where(dv.voxel_mask[:, None], feats64, 0)

    build = jax.jit(lambda f, c, m: sw.build_win_grid(
        f, c, m, (41, 1440, 1440), COL_CAP, W0, align=8))
    cg64 = build(feats64, dv.voxel_coors, dv.voxel_mask)
    n_act = int(jax.device_get(cg64.cmask.sum()))
    print(f"active columns: {n_act} / cap {COL_CAP}", flush=True)

    bench_loop(lambda f: build(f, dv.voxel_coors, dv.voxel_mask).feats,
               feats64, name="build_win_grid", n1=2, n2=8)

    rb = jax.jit(sw.win_rulebook)(cg64)
    bench_loop(lambda f: sw.win_rulebook(
        cg64.replace(feats=f))[0].astype(jnp.bfloat16)[0] * 0 + f,
        cg64.feats, name="win_rulebook (indep of feats)", n1=2, n2=6)

    # C=32 grid (post conv_input) for the bulk subm convs
    cg32 = cg64.replace(feats=cg64.feats[..., :32])
    w32 = jnp.asarray(rng.normal(0, 0.05, (3, 3, 3, 32, 32)), jnp.bfloat16)

    bench_loop(lambda f: sw.subm_conv_win(cg32.replace(feats=f), w32, rb),
               cg32.feats, name="subm_conv_win C=32")

    # parts: im2col9 alone; conv9 alone on a prebuilt g9
    bench_loop(lambda f: sw._im2col9(
        cg32.replace(feats=f), rb)[:, 4].reshape(f.shape),
        cg32.feats, name="  _im2col9 (+slice back)")
    g9 = jax.jit(lambda g: sw._im2col9(g, rb))(cg32)
    bench_loop(lambda g: g + sw._conv9(g, w32, padding=1)[:, None],
               g9, name="  _conv9 (+bcast add)", n1=2, n2=8)

    # single side tap: gather + rebase
    featsf = cg32.feats.reshape(cg32.feats.shape[0], -1)
    slots, found, delta = rb
    bench_loop(lambda ff: sw._side_tap_impl(1, 8, W0, 32, ff, slots, found,
                                            delta),
               featsf, name="  one side tap (gather+rebase)")
    # gather only
    bench_loop(lambda ff: ff.at[jnp.where(found[1], slots[1], 0)].get(
        unique_indices=False, mode="promise_in_bounds"),
        featsf, name="  one row gather alone")

    # strided conv (stage-1 -> 2 downsample, spread=z_total like encoder)
    w64 = jnp.asarray(rng.normal(0, 0.05, (3, 3, 3, 32, 64)), jnp.bfloat16)

    def strided(f):
        out = sw.sparse_conv_win(cg32.replace(feats=f), w64, (2, 2, 2),
                                 (1, 1, 1), 120000, z_total=41,
                                 out_window=16, spread=41)
        return f + jnp.sum(out.feats).astype(f.dtype)

    bench_loop(strided, cg32.feats, name="strided conv (spread=41)",
               n1=1, n2=4)

    def strided8(f):
        out = sw.sparse_conv_win(cg32.replace(feats=f), w64, (2, 2, 2),
                                 (1, 1, 1), 120000, z_total=41,
                                 out_window=16, spread=8)
        return f + jnp.sum(out.feats).astype(f.dtype)

    bench_loop(strided8, cg32.feats, name="strided conv (spread=8)",
               n1=1, n2=4)


if __name__ == "__main__":
    main()
