"""Per-stage, per-op profile of the sparse encoder at bench scale.

Times each primitive of the column engine (build, dilate, subm conv,
strided conv, z-conv, dense scatter) and its dense-engine counterpart
SEPARATELY on the real chip at the flagship's stage dimensions and the
bench cloud's occupancy — the decomposition behind the PERF.md round-4
table. Usage:
  python tools/analysis_tools/stage_profile.py [dilation_ratio]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from isfusion_tpu.flagship import build_isfusion_flagship
from isfusion_tpu.config import Config
from isfusion_tpu.flagship import ISFUSION_CFG
from isfusion_tpu.models.detectors.voxelnet import _capacity
from isfusion_tpu.ops.voxel import voxelize_dynamic
from isfusion_tpu.ops import sparse_cols as sc
from isfusion_tpu.ops import sparse_dense as sd

GRID = (48, 1440, 1440)     # z padded to 8 like build_column_grid
Z_LOG = 41
V_CAP = 120000
RATIOS = (0.9, 1.0, 0.5, 0.25)
# flagship encoder: base 32; (32,32,64),(64,64,128),(128,128,256),(256,256)
STAGE_C = (32, 64, 128, 256)


def timeit(fn, *args, n=4, name=""):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"  {name:42s} {dt:8.2f} ms", flush=True)
    return out, dt


def w(kz, ky, kx, cin, cout, key=0):
    return jnp.asarray(np.random.default_rng(key).normal(
        0, 0.05, (kz, ky, kx, cin, cout)), jnp.bfloat16)


def main():
    dil = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
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
    coors, vmask = dv.voxel_coors, dv.voxel_mask
    print(f"dilation_ratio={dil}  active voxels="
          f"{int(jax.device_get(vmask.sum()))}")

    def cap_for(i):
        return max(int(V_CAP * RATIOS[i]) // 8 * 8, 8)

    def dcap_for(i):
        return max(int(cap_for(i) * dil) // 8 * 8, 8)

    # ---- build + stage walk (columns) ----
    build = jax.jit(lambda f, c, m: sc.build_column_grid(
        f, c, m, (41, 1440, 1440), cap_for(0), z_pad_to=8))
    cg, t_build = timeit(build, feats, coors, vmask, name="build_column_grid")

    total_cols = {"build": t_build}
    zs = GRID[0]
    z_logical = Z_LOG
    stage_results = []
    for i in range(4):
        # flagship basicblock: stage 1 = conv_input (64->32) + 2 blocks;
        # stages 2-4 enter at STAGE_C[i] channels (strided output)
        cin = 64 if i == 0 else STAGE_C[i]
        c = STAGE_C[i]
        dc = dcap_for(i)
        print(f"-- stage {i+1}: z={zs} C={c} cols={cap_for(i)} dil={dc}")
        dil_fn = jax.jit(lambda g, dc=dc: sc.dilate_columns(g, dc))
        (dcg, rb), t_dil = timeit(dil_fn, cg, name=f"dilate_columns({dc})")
        conv_in = jax.jit(lambda g, rbk, ww: sc.subm_conv_col_dil(g, ww, rbk))
        t_cin = 0.0
        if cin != c:   # conv_input channel change (stage 1 only)
            w_in = w(3, 3, 3, cin, c)
            f1, t_cin = timeit(conv_in, dcg, rb, w_in,
                               name=f"subm {cin}->{c} (conv_input)")
            dcg = dcg.replace(feats=f1)
        else:
            dcg = dcg.replace(feats=dcg.feats[..., :c])
        w_s = w(3, 3, 3, c, c, key=i + 1)
        f2, t_subm = timeit(conv_in, dcg, rb, w_s, name=f"subm {c}->{c}")
        n_subm = 4                        # 2 basic blocks = 4 subm convs
        # strided conv into next stage (none after stage 4)
        t_str = 0.0
        if i < 3:
            c_out = STAGE_C[i + 1] if i < 3 else c
            pad = (0, 1, 1) if i == 2 else (1, 1, 1)
            w_d = w(3, 3, 3, c, c_out, key=40 + i)
            stride_fn = jax.jit(
                lambda g, ww, pad=pad, oc=cap_for(i + 1):
                sc.sparse_conv_col_dil(g, ww, (2, 2, 2), pad, oc))
            cg, t_str = timeit(stride_fn, dcg, w_d,
                               name=f"strided {c}->{c_out}")
            zs = (zs + 2 * pad[0] - 3) // 2 + 1
            z_logical = (z_logical + 2 * pad[0] - 3) // 2 + 1
        stage_results.append(dict(stage=i + 1, dilate=t_dil,
                                  subm1=t_cin, subm=t_subm,
                                  n_subm=n_subm, strided=t_str))

    # conv_out (3,1,1) stride (2,1,1)
    w_o = w(3, 1, 1, STAGE_C[3], 256, key=99)
    zfn = jax.jit(lambda g, ww: sc.zconv_col(g, ww, 2, 0))
    _, t_zout = timeit(zfn, cg, w_o, name="conv_out zconv")
    dfn = jax.jit(lambda g: jax.vmap(sc.column_to_dense)(
        jax.tree_util.tree_map(lambda a: a[None], g)))
    timeit(dfn, cg, name="column_to_dense")

    print("\n==== column-engine stage totals (subm x n + strided + dilate)")
    tot = t_build
    for r in stage_results:
        stage_t = r["dilate"] + r["subm1"] + \
            r["subm"] * r["n_subm"] + r["strided"]
        tot += stage_t
        print(f"  stage {r['stage']}: {stage_t:7.1f} ms  "
              f"(dilate {r['dilate']:.1f}, conv_input {r['subm1']:.1f}, "
              f"subm x{r['n_subm']} {r['subm']:.1f}, "
              f"strided {r['strided']:.1f})")
    tot += t_zout
    print(f"  TOTAL est: {tot:.1f} ms")


if __name__ == "__main__":
    main()
