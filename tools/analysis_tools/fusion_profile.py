"""Per-block profile of the ISFusionEncoder at bench scale.

Uses the module's `return_after` knob: each prefix is jitted separately
(XLA dead-code-eliminates everything past the returned intermediate) and
block costs are the differences between consecutive prefixes. Inputs are
device-resident; sync via jax.device_get (the axon-tunnel rule).
Usage: python tools/analysis_tools/fusion_profile.py
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
from isfusion_tpu.models import build_detector
from isfusion_tpu.models.detectors.voxelnet import _capacity
from isfusion_tpu.ops.voxel import voxelize_dynamic, voxelize_hard

PREFIXES = ["p2g", "fusion", "sst0", "igf", "stage1", "sst1", None]
NAMES = {"p2g": "P2G image->BEV", "fusion": "conv_fusion",
         "sst0": "SST level 0", "igf": "IGF (heatmap+att)",
         "stage1": "SECONDV2 stage1", "sst1": "SST level 1",
         None: "SECONDV2 stage2 + tail"}


def timeit(fn, *args, n=4):
    f = jax.jit(fn)
    r = f(*args)
    jax.device_get(jax.tree_util.tree_leaves(r)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.device_get(jax.tree_util.tree_leaves(r)[0].ravel()[0])
    return (time.perf_counter() - t0) / n


def main():
    model, batch_fn = build_isfusion_flagship()
    batch = jax.device_put(batch_fn(int(os.environ.get("B", "1"))))
    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b, train=False,
                             mode="feats"))(batch)
    cfg = Config.fromfile(ISFUSION_CFG)
    m = dict(cfg.model)

    vl = dict(m["pts_voxel_layer"])
    cap = _capacity(vl.get("max_voxels", 120000), False)
    dv = jax.device_put(jax.jit(lambda b: jax.vmap(
        lambda p, mm: voxelize_dynamic(
            p, mm, vl["point_cloud_range"], vl["voxel_size"], cap))(
        b["points"], b["points_mask"]))(batch))
    feats = jax.device_put(jax.jit(lambda b, d: model.apply(
        model.init(jax.random.PRNGKey(0), b, train=False, mode="feats")
        if False else variables,
        b["points"], d.point_voxel_index, d.voxel_coors,
        method=lambda mdl, p, i, c: mdl.pts_voxel_encoder_m(p, i, c)))(
        batch, dv))
    lidar_bev = jax.device_put(jax.jit(lambda f, d: model.apply(
        variables, f, d.voxel_coors, d.voxel_mask,
        method=lambda mdl, ff, c, mm: mdl.pts_middle_encoder_m(
            ff, c, mm)))(feats, dv))
    fe = dict(m["fusion_encoder"])
    n_pp = int(fe.get("num_points_in_pillar", 12))
    pillar_cap = _capacity(m["pillar_max_voxels"], False)
    pcr = m["pc_range"]
    vs = m["voxel_size"]
    osf = m["out_size_factor"]
    pil = jax.device_put(jax.jit(lambda b: jax.vmap(
        lambda p, mm: voxelize_hard(
            p, mm, pcr, (vs[0] * osf, vs[1] * osf, pcr[5] - pcr[2]),
            n_pp, pillar_cap))(b["points"], b["points_mask"]))(batch))
    calib = jax.device_put(jax.jit(lambda b: model.apply(
        variables, b, method=lambda mdl, bb: mdl.calib_from_batch(bb)))(
        batch))
    img_feats = jax.device_put(jax.jit(lambda b: model.apply(
        variables, b["img"], b.get("img_view_mask"),
        method=lambda mdl, i, vm: mdl.extract_img_feat(i, vm)))(batch))

    prev = 0.0
    for pref in PREFIXES:
        mc = dict(m)
        mc["fusion_encoder"] = dict(fe, return_after=pref)
        mdl = build_detector(mc, train_cfg=cfg.get("train_cfg"),
                             test_cfg=cfg.get("test_cfg"))

        def run(imf, lb, p, cal, _mdl=mdl):
            return _mdl.apply(
                variables, imf, lb, p.voxels, p.coors, p.voxel_mask,
                p.num_points, cal,
                method=lambda md, a1, a2, a3, a4, a5, a6, a7:
                md.fusion_encoder_m(a1, a2, a3, a4, a5, a6, a7,
                                    md.pts_backbone_m))
        t = timeit(run, img_feats, lidar_bev, pil, calib)
        print(f"{NAMES[pref]:24s} cum {t*1e3:7.1f} ms   "
              f"block {max(t - prev, 0)*1e3:7.1f} ms", flush=True)
        prev = t


if __name__ == "__main__":
    main()
