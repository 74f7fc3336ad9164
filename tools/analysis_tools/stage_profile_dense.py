"""Per-op profile of the DENSE stage engine at bench-scale occupancy.

Builds the encoder walk up to each dense-capable stage with the column
engine, converts, then times each dense primitive with tunnel-safe
in-graph iteration (_bench_util.bench_loop): the conv itself, the
subm/strided mask application, the occupancy reduce_window, the
columns->dense conversion, and a MaskedBatchNorm-equivalent pass.
Decomposes where dense3/dense4's measured whole-encoder delta goes.

Usage: python tools/analysis_tools/stage_profile_dense.py
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
from isfusion_tpu.ops import sparse_cols as sc
from isfusion_tpu.ops import sparse_dense as sd
from tools.analysis_tools._bench_util import bench_loop

V_CAP = 120000
RATIOS = (0.9, 1.0, 0.5, 0.25)
STAGE_C = (32, 64, 128, 256)


def w(kz, ky, kx, cin, cout, key=0):
    return jnp.asarray(np.random.default_rng(key).normal(
        0, 0.05, (kz, ky, kx, cin, cout)), jnp.bfloat16)


def main():
    dil = 2.0
    _, batch_fn = build_isfusion_flagship()
    batch = batch_fn(1)
    cfg = Config.fromfile(ISFUSION_CFG)
    vl = dict(cfg.model["pts_voxel_layer"])
    cap = _capacity(vl.get("max_voxels", V_CAP), False)
    dv = jax.jit(lambda p, m: voxelize_dynamic(
        p, m, vl["point_cloud_range"], vl["voxel_size"], cap))(
            batch["points"][0], batch["points_mask"][0])
    feats = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (cap, 64)), jnp.bfloat16)
    feats = jnp.where(dv.voxel_mask[:, None], feats, 0)

    def cap_for(i):
        return max(int(V_CAP * RATIOS[i]) // 8 * 8, 8)

    def dcap_for(i):
        return max(int(cap_for(i) * dil) // 8 * 8, 8)

    # walk the column engine to each stage entry (cheap: jit once each)
    cg = jax.jit(lambda f, c, m: sc.build_column_grid(
        f, c, m, (41, 1440, 1440), cap_for(0), z_pad_to=8))(
            feats, dv.voxel_coors, dv.voxel_mask)
    z_log = 41
    grids = {}
    for i in range(4):
        cin = 64 if i == 0 else STAGE_C[i]
        c = STAGE_C[i]
        grids[i + 1] = (cg, z_log)   # entry of stage i+1 (pre-dilation)
        if i == 3:
            break
        dcg, rb = jax.jit(lambda g, dc=dcap_for(i): sc.dilate_columns(
            g, dc))(cg)
        if cin != c:
            f1 = jax.jit(lambda g, r, ww: sc.subm_conv_col_dil(g, ww, r))(
                dcg, rb, w(3, 3, 3, cin, c))
            dcg = dcg.replace(feats=f1)
        else:
            dcg = dcg.replace(feats=dcg.feats[..., :c])
        pad = (0, 1, 1) if i == 2 else (1, 1, 1)
        cg = jax.jit(lambda g, ww, pad=pad, oc=cap_for(i + 1):
                     sc.sparse_conv_col_dil(g, ww, (2, 2, 2), pad, oc))(
            dcg, w(3, 3, 3, c, STAGE_C[i + 1], key=40 + i))
        z_log = (z_log + 2 * pad[0] - 3) // 2 + 1

    for stage in (2, 3, 4):
        cg_s, zl = grids[stage]
        c = STAGE_C[stage - 1]
        cgb = jax.tree_util.tree_map(lambda a: a[None], cg_s)
        dg = jax.jit(lambda g, zl=zl: sd.columns_to_dense(g, zl))(cgb)
        occ = float(jax.device_get(jnp.mean(dg.zmask.astype(jnp.float32))))
        ny = dg.feats.shape[2]
        print(f"-- stage {stage}: z={zl} HW={ny} C={c}  site-occ {occ:.3f}",
              flush=True)
        bench_loop(lambda g, zl=zl: sd.columns_to_dense(g, zl).feats,
                   cgb, name="columns_to_dense", n1=2, n2=8)
        dgf = dg.replace(feats=dg.feats[..., :c])
        ws = w(3, 3, 3, c, c, key=stage)
        bench_loop(lambda f, d=dgf, ww=ws: sd.subm_conv_dense(
            d.replace(feats=f), ww).feats, dgf.feats,
            name=f"subm_conv_dense {c}->{c}",
            flops=2 * 27 * c * c * float(np.prod(dg.zmask.shape)))
        # conv alone (no mask application)
        bench_loop(lambda f, ww=ws: sd._conv(f, ww, (1, 1, 1), (1, 1, 1)),
                   dgf.feats, name="  conv3d alone")
        # mask application alone
        bench_loop(lambda f, d=dgf: jnp.where(
            d.zmask[..., None], f, 0.0).astype(f.dtype), dgf.feats,
            name="  mask where alone")
        if stage < 4:
            c2 = STAGE_C[stage]
            wd = w(3, 3, 3, c, c2, key=50 + stage)
            # strided conv shrinks shapes; make it shape-preserving by
            # folding its output into a scalar added to the input (the
            # add's cost is one elementwise pass, visible separately
            # above as "mask where alone")
            bench_loop(
                lambda f, d=dgf, ww=wd: f + jnp.sum(
                    sd.sparse_conv_dense(d.replace(feats=f), ww,
                                         (2, 2, 2), (1, 1, 1)).feats
                ).astype(f.dtype),
                dgf.feats, name=f"strided dense {c}->{c2} (+scalar add)",
                n1=2, n2=8)
            # occupancy reduce_window alone (same fold)
            bench_loop(
                lambda m: m ^ jnp.any(jax.lax.reduce_window(
                    m, False, jax.lax.bitwise_or,
                    window_dimensions=(1, 3, 3, 3),
                    window_strides=(1, 2, 2, 2),
                    padding=((0, 0), (1, 1), (1, 1), (1, 1)))),
                dg.zmask, name="  occupancy reduce_window (NDHW)",
                n1=2, n2=8)

        # BN-equivalent: masked mean/var + normalize
        def bn(f, m=dg.zmask):
            mf = m[..., None].astype(f.dtype)
            cnt = jnp.sum(mf) * f.shape[-1] / f.shape[-1]
            mean = jnp.sum(f * mf, axis=(0, 1, 2, 3)) / jnp.maximum(cnt, 1)
            var = jnp.sum((f - mean) ** 2 * mf, axis=(0, 1, 2, 3)) / \
                jnp.maximum(cnt, 1)
            return ((f - mean) * jax.lax.rsqrt(var + 1e-3) * mf).astype(
                f.dtype)
        bench_loop(bn, dgf.feats, name="  masked-BN pass")


if __name__ == "__main__":
    main()
