"""Per-stage device-synced timing of the IS-Fusion flagship forward.

Mirrors ISFusionDetector.__call__ stage by stage, each stage jitted
separately with its inputs device-resident and a scalar fetched through
jax.device_get (the only sync that works through the axon tunnel).
Run: python tools/analysis_tools/stage_timing.py
PLAN=1 profiles the shipped host-planned path (ops/host_plan.make_plan_fn,
the same enricher the DataLoader installs) — the bench configuration.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp

from isfusion_tpu.flagship import build_isfusion_flagship
from isfusion_tpu.ops.voxel import (voxelize_dynamic,
                                    voxelize_dynamic_planned,
                                    voxelize_hard, voxelize_hard_planned)
from isfusion_tpu.models.detectors.voxelnet import _capacity


def timeit(fn, *args, n=4):
    f = jax.jit(fn)
    r = f(*args)
    jax.device_get(jax.tree_util.tree_map(
        lambda x: x.ravel()[0] if hasattr(x, "ravel") else x, r))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.device_get(jax.tree_util.tree_map(
        lambda x: x.ravel()[0] if hasattr(x, "ravel") else x, r))
    return (time.perf_counter() - t0) / n, r


def main():
    model, batch_fn = build_isfusion_flagship()
    batch = batch_fn(int(os.environ.get("B", "1")))
    plan = None
    if os.environ.get("PLAN", "0") == "1":
        import numpy as np
        from isfusion_tpu.config import Config
        from isfusion_tpu.flagship import ISFUSION_CFG
        from isfusion_tpu.ops.host_plan import make_plan_fn
        cfg = Config.fromfile(ISFUSION_CFG)
        plan_fn = make_plan_fn(dict(cfg.model), train=False)
        batch = plan_fn({k: np.asarray(v) for k, v in batch.items()})
        plan = batch["sparse_plan"]
    batch = jax.device_put(batch)
    if plan is not None:
        plan = batch["sparse_plan"]
    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b, train=False,
                             mode="feats"))(batch)
    m = model.bind(variables)

    t, img_feats = timeit(
        lambda b: model.apply(variables, b["img"], b.get("img_view_mask"),
                              method="extract_img_feat"), batch)
    print(f"img branch (Swin+FPN):        {t*1e3:8.1f} ms")
    img_feats = jax.device_put(img_feats)

    vl = dict(m.pts_voxel_layer)
    cap = _capacity(vl.get("max_voxels", 120000), False)

    def stage_voxelize(b):
        if plan is not None:
            pl = {k: b["sparse_plan"][k] for k in
                  ("vidx", "pmask", "vox_coors", "vmask", "num_voxels")}
            return jax.vmap(lambda p, mm, q: voxelize_dynamic_planned(
                p, mm, vl["point_cloud_range"], vl["voxel_size"], q))(
                    b["points"], b["points_mask"], pl)
        return jax.vmap(lambda p, mm: voxelize_dynamic(
            p, mm, vl["point_cloud_range"], vl["voxel_size"], cap))(
                b["points"], b["points_mask"])
    t, dv = timeit(stage_voxelize, batch)
    print(f"dynamic voxelize:             {t*1e3:8.1f} ms")
    dv = jax.device_put(dv)

    t, feats = timeit(lambda b, d: model.apply(
        variables, b["points"], d.point_voxel_index, d.voxel_coors,
        method=lambda mdl, p, i, c: mdl.pts_voxel_encoder_m(p, i, c)),
        batch, dv)
    print(f"DynamicVFE:                   {t*1e3:8.1f} ms")
    feats = jax.device_put(feats)

    if plan is not None:
        t, lidar_bev = timeit(lambda f, d, b: model.apply(
            variables, f, d.voxel_coors, d.voxel_mask,
            method=lambda mdl, ff, c, mm: mdl.pts_middle_encoder_m(
                ff, c, mm, plan=b["sparse_plan"])),
            feats, dv, batch)
    else:
        t, lidar_bev = timeit(lambda f, d: model.apply(
            variables, f, d.voxel_coors, d.voxel_mask,
            method=lambda mdl, ff, c, mm: mdl.pts_middle_encoder_m(
                ff, c, mm)),
            feats, dv)
    print(f"SparseEncoder:                {t*1e3:8.1f} ms")
    lidar_bev = jax.device_put(lidar_bev)

    fe = dict(m.fusion_encoder)
    n_pp = int(fe.get("num_points_in_pillar", 12))
    pillar_cap = _capacity(m.pillar_max_voxels, False)

    def stage_pillar(b):
        if plan is not None and "pil_vidx" in b["sparse_plan"]:
            sp = b["sparse_plan"]
            pl = {k[4:]: sp[k] for k in sp if k.startswith("pil_")}
            return jax.vmap(lambda p, q: voxelize_hard_planned(
                p, q, n_pp, pillar_cap))(b["points"], pl)
        return jax.vmap(lambda p, mm: voxelize_hard(
            p, mm, m.pc_range, (m.voxel_size[0] * m.out_size_factor,
                                m.voxel_size[1] * m.out_size_factor,
                                m.pc_range[5] - m.pc_range[2]),
            n_pp, pillar_cap))(b["points"], b["points_mask"])
    t, pil = timeit(stage_pillar, batch)
    print(f"pillarize:                    {t*1e3:8.1f} ms")
    pil = jax.device_put(pil)

    def stage_fusion(imf, lb, p, b):
        calib = model.apply(variables, b,
                            method=lambda mdl, bb:
                            mdl.calib_from_batch(bb))
        p2g = None
        if plan is not None and "p2g_src" in b["sparse_plan"]:
            sp = b["sparse_plan"]
            p2g = {k: sp[k] for k in sp if k.startswith("p2g_")}
        return model.apply(
            variables, imf, lb, p.voxels, p.coors, p.voxel_mask,
            p.num_points, calib,
            method=lambda mdl, a1, a2, a3, a4, a5, a6, a7:
            mdl.fusion_encoder_m(a1, a2, a3, a4, a5, a6, a7,
                                 mdl.pts_backbone_m, p2g=p2g))
    t, (feats_list, ins_hm) = timeit(stage_fusion, img_feats, lidar_bev,
                                     pil, batch)
    print(f"ISFusionEncoder(+SECONDV2):   {t*1e3:8.1f} ms")
    feats_list = jax.device_put(feats_list)

    def stage_head(fl, imf):
        x = model.apply(variables, fl,
                        method=lambda mdl, f: mdl.pts_neck_m(f))
        preds = model.apply(variables, x, imf,
                            method=lambda mdl, xx, ii:
                            mdl.pts_bbox_head_m(xx, ii))
        return preds
    t, preds = timeit(stage_head, feats_list, img_feats)
    print(f"SECONDFPN + head:             {t*1e3:8.1f} ms")

    t, _ = timeit(lambda p: model.apply(
        variables, p, method=lambda mdl, pp:
        mdl.pts_bbox_head_m.get_bboxes(pp)), jax.device_put(preds))
    print(f"get_bboxes decode:            {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
