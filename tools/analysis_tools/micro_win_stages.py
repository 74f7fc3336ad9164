"""Full 4-stage walk of the window engine with per-component timing.

ab_sparse_engine measures the whole window encoder ~2.6x slower than the
column engine while a stage-1 subm conv is only 19.5 ms — so most of the
time hides in components micro_win_ops does not cover: per-stage
rulebooks, the strided downsamples at deeper widths/aligns, rewindow,
the conv norm/act tails, to_common_frame and the dense scatter. This
walks the exact flagship stage sequence on the bench cloud and times
each piece (tunnel-safe two-point loops).

Usage: python tools/analysis_tools/micro_win_stages.py
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

V_CAP = 120000
RATIOS = (0.9, 1.0, 0.5, 0.25)
STAGE_C = (32, 64, 128, 256)
WIDTHS = (16, 16, 12, 8)


def w(kz, ky, kx, cin, cout, key=0):
    return jnp.asarray(np.random.default_rng(key).normal(
        0, 0.05, (kz, ky, kx, cin, cout)), jnp.bfloat16)


def cap_for(i):
    return max(int(V_CAP * RATIOS[i]) // 8 * 8, 8)


def main():
    _, batch_fn = build_isfusion_flagship()
    batch = batch_fn(1)
    cfg = Config.fromfile(ISFUSION_CFG)
    vl = dict(cfg.model["pts_voxel_layer"])
    cap = _capacity(vl.get("max_voxels", V_CAP), False)
    dv = jax.jit(lambda p, m: voxelize_dynamic(
        p, m, vl["point_cloud_range"], vl["voxel_size"], cap))(
            batch["points"][0], batch["points_mask"][0])
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(0, 1, (cap, 64)), jnp.bfloat16)
    feats = jnp.where(dv.voxel_mask[:, None], feats, 0)

    build = jax.jit(lambda f: sw.build_win_grid(
        f, dv.voxel_coors, dv.voxel_mask, (41, 1440, 1440), cap_for(0),
        WIDTHS[0], align=8))
    cg = build(feats)
    bench_loop(lambda f: f + jnp.sum(build(f).feats).astype(f.dtype),
               feats, name="build_win_grid", n1=2, n2=8)

    z_log = 41
    align = 8
    total = 0.0
    for i in range(4):
        cin = 64 if i == 0 else STAGE_C[i]
        c = STAGE_C[i]
        wd = WIDTHS[i]
        n_act = int(jax.device_get(cg.cmask.sum()))
        print(f"-- stage {i+1}: W={wd} C={c} align={cg.align} "
              f"cols={n_act}/{cg.feats.shape[0]}", flush=True)
        rb = jax.jit(sw.win_rulebook)(cg)
        t = bench_loop(
            lambda f: f + jnp.sum(sw.win_rulebook(
                cg.replace(feats=f))[2].astype(jnp.float32)).astype(f.dtype),
            cg.feats, name="win_rulebook", n1=2, n2=8) or 0.0
        total += t
        if cin != c:
            w_in = w(3, 3, 3, cin, c)
            f1 = jax.jit(lambda g, r, ww: sw.subm_conv_win(g, ww, r))(
                cg, rb, w_in)
            t = bench_loop(lambda f: jnp.concatenate(
                [sw.subm_conv_win(cg.replace(feats=f), w_in, rb),
                 jnp.zeros_like(f[..., :cin - c])], -1), cg.feats,
                name=f"subm {cin}->{c} (conv_input)") or 0.0
            total += t
            cg = cg.replace(feats=f1)
        ws_ = w(3, 3, 3, c, c, key=i + 1)
        t = bench_loop(lambda f: sw.subm_conv_win(
            cg.replace(feats=f), ws_, rb), cg.feats,
            name=f"subm {c}->{c} x4") or 0.0
        total += 4 * t
        # conv tail: BN(eval) + relu + mask, per conv (x5/x4)
        t = bench_loop(lambda f: jnp.where(
            cg.zmask[..., None],
            jax.nn.relu((f.astype(jnp.float32) - 0.1) * 1.1 + 0.2), 0.0
        ).astype(f.dtype), cg.feats, name="conv tail (BN+relu+mask)",
            n1=2, n2=10) or 0.0
        total += 5 * t
        if i < 3:
            c2 = STAGE_C[i + 1]
            pad = (0, 1, 1) if i == 2 else (1, 1, 1)
            w_d = w(3, 3, 3, c, c2, key=40 + i)
            stride_fn = jax.jit(
                lambda g, ww, pad=pad, oc=cap_for(i + 1), zl=z_log,
                ow=WIDTHS[i + 1]: sw.sparse_conv_win(
                    g, ww, (2, 2, 2), pad, oc, z_total=zl,
                    out_window=ow, spread=zl))
            cg2 = stride_fn(cg, w_d)
            t = bench_loop(
                lambda f, ww=w_d: f + jnp.sum(stride_fn(
                    cg.replace(feats=f), ww).feats).astype(f.dtype),
                cg.feats, name=f"strided {c}->{c2} (spread={z_log})",
                n1=1, n2=5) or 0.0
            total += t
            cg = cg2
            z_log = (z_log + 2 * pad[0] - 3) // 2 + 1
    # tail: common frame + conv_out + dense
    t = bench_loop(lambda f: sw.to_common_frame(
        cg.replace(feats=f), z_log).feats[:, :cg.feats.shape[1]].astype(
        f.dtype) * 0 + f, cg.feats, name="to_common_frame", n1=2,
        n2=8) or 0.0
    total += t
    cgc = jax.jit(lambda g: sw.to_common_frame(g, z_log))(cg)
    w_o = w(3, 1, 1, STAGE_C[3], 256, key=99)
    t = bench_loop(lambda f: f + jnp.sum(sw.zconv_win(
        cgc.replace(feats=f), w_o, 2, 0).feats).astype(f.dtype),
        cgc.feats, name="conv_out zconv", n1=2, n2=8) or 0.0
    total += t
    t = bench_loop(lambda f: f + jnp.sum(sw.win_to_dense(
        cgc.replace(feats=f))).astype(f.dtype), cgc.feats,
        name="win_to_dense", n1=2, n2=8) or 0.0
    total += t
    print(f"accounted total ~{total:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
