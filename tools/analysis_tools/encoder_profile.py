"""Prefix profile of the SparseEncoder at bench scale, shipped config.

Uses the module's `return_after` knob: each prefix is jitted separately
(XLA dead-code-eliminates everything past the returned intermediate) and
step costs are the differences between consecutive prefixes. Inputs are
device-resident; sync via jax.device_get (the axon-tunnel rule).
PLAN=1 profiles the host-planned path (the bench configuration).
Usage: [PLAN=1] python tools/analysis_tools/encoder_profile.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax

from isfusion_tpu.config import Config
from isfusion_tpu.flagship import ISFUSION_CFG, build_isfusion_flagship
from isfusion_tpu.models.detectors.voxelnet import _capacity
from isfusion_tpu.ops.voxel import voxelize_dynamic, voxelize_dynamic_planned

# prefix tags in walk order (basicblock flagship: stage i's last block is
# the strided conv into table i+1, incl. the post-strided dilate)
PREFIXES = ["build", "dil0", "conv_input",
            "L1_0", "L1_1", "L1_2",
            "L2_0", "L2_1", "L2_2",
            "L3_0", "L3_1", "L3_2",
            "L4_0", "L4_1", None]
NAMES = {"build": "build_column_grid", "dil0": "dilate table 0",
         "conv_input": "conv_input (subm C32)",
         "L1_0": "stage1 block0 (2 subm C32)",
         "L1_1": "stage1 block1 (2 subm C32)",
         "L1_2": "strided 0->1 + dilate t1",
         "L2_0": "stage2 block0 (2 subm C64)",
         "L2_1": "stage2 block1 (2 subm C64)",
         "L2_2": "strided 1->2 + to-dense",
         "L3_0": "stage3 block0 (2 subm dense C128)",
         "L3_1": "stage3 block1 (2 subm dense C128)",
         "L3_2": "strided 2->3 (dense)",
         "L4_0": "stage4 block0 (2 subm dense C256)",
         "L4_1": "stage4 block1 (2 subm dense C256)",
         None: "conv_out + to_bev"}


def timeit(fn, *args, n=8):
    f = jax.jit(fn)
    r = f(*args)
    jax.device_get(jax.tree_util.tree_leaves(r)[0].ravel()[0])
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = f(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / n


def main():
    model, batch_fn = build_isfusion_flagship()
    batch = batch_fn(int(os.environ.get("B", "1")))
    plan = None
    if os.environ.get("PLAN", "0") == "1":
        import numpy as np
        from isfusion_tpu.ops.host_plan import make_plan_fn
        cfg = Config.fromfile(ISFUSION_CFG)
        plan_fn = make_plan_fn(dict(cfg.model), train=False)
        batch = plan_fn({k: np.asarray(v) for k, v in batch.items()})
    batch = jax.device_put(batch)
    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b, train=False,
                             mode="feats"))(batch)
    cfg = Config.fromfile(ISFUSION_CFG)
    m = dict(cfg.model)
    vl = dict(m["pts_voxel_layer"])
    cap = _capacity(vl.get("max_voxels", 120000), False)

    def stage_voxelize(b):
        if plan is None and "sparse_plan" in b:
            pl = {k: b["sparse_plan"][k] for k in
                  ("vidx", "pmask", "vox_coors", "vmask", "num_voxels")}
            return jax.vmap(lambda p, mm, q: voxelize_dynamic_planned(
                p, mm, vl["point_cloud_range"], vl["voxel_size"], q))(
                    b["points"], b["points_mask"], pl)
        return jax.vmap(lambda p, mm: voxelize_dynamic(
            p, mm, vl["point_cloud_range"], vl["voxel_size"], cap))(
                b["points"], b["points_mask"])

    dv = jax.device_put(jax.jit(stage_voxelize)(batch))
    feats = jax.device_put(jax.jit(lambda b, d: model.apply(
        variables, b["points"], d.point_voxel_index, d.voxel_coors,
        method=lambda mdl, p, i, c: mdl.pts_voxel_encoder_m(p, i, c)))(
        batch, dv))

    sp = batch.get("sparse_plan") if os.environ.get("PLAN") == "1" else None

    prev = 0.0
    for tag in PREFIXES:
        def fwd(f, d, b, _tag=tag):
            pl = b["sparse_plan"] if sp is not None else None
            return model.apply(
                variables, f, d.voxel_coors, d.voxel_mask,
                method=lambda mdl, ff, c, mm: mdl.pts_middle_encoder_m(
                    ff, c, mm, plan=pl, return_after=_tag))
        t = timeit(fwd, feats, dv, batch) * 1e3
        print(f"{NAMES[tag]:38s} cum {t:7.1f} ms   step {t - prev:7.1f} ms",
              flush=True)
        prev = t


if __name__ == "__main__":
    main()
