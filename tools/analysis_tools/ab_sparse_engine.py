"""A/B the SparseEncoder engine configs on the real chip.

Builds the flagship, voxelizes the bench cloud once, then times ONLY the
middle encoder under each engine config on identical device-resident
inputs. Usage:
  python tools/analysis_tools/ab_sparse_engine.py [variant ...]
variants: columns | columns20 (dilation 2.0) | dense1..4 ... default all.
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
from isfusion_tpu.ops.voxel import voxelize_dynamic

VARIANTS = {
    "columns": dict(engine="columns"),
    "columns20": dict(engine="columns", dilation_ratio=2.0),
    # dense-stage hybrids (ops/sparse_dense.py): stages >= k as masked
    # dense XLA 3D convs, no capacity caps. columns20 base so the sparse
    # stages are drop-free too — the A/B is exact-vs-exact.
    "dense1": dict(engine="columns", dilation_ratio=2.0,
                   dense_from_stage=1),
    "dense2": dict(engine="columns", dilation_ratio=2.0,
                   dense_from_stage=2),
    "dense3": dict(engine="columns", dilation_ratio=2.0,
                   dense_from_stage=3),
    "dense4": dict(engine="columns", dilation_ratio=2.0,
                   dense_from_stage=4),
    # static z windows on the sparse tables (tables 0/1 under dense3):
    # bench-cloud active ranges are [15, 39] and [7, 20]
    # (micro_zdist.py) — all three variants are drop-free at bench
    # density; they differ in margin below ground vs stored width.
    "zwin_tight": dict(engine="columns", dilation_ratio=2.0,
                       dense_from_stage=3,
                       z_windows=((15, 25), (7, 14))),
    "zwin_mid": dict(engine="columns", dilation_ratio=2.0,
                     dense_from_stage=3,
                     z_windows=((12, 28), (6, 15))),
    "zwin_align": dict(engine="columns", dilation_ratio=2.0,
                       dense_from_stage=3,
                       z_windows=((8, 32), (4, 20))),
    # r5: the two DENSE tables windowed too — (3, 8)/(1, 4) are the
    # exact strided images of the sparse windows (drop-free by the
    # trace-time coverage check); isolates the dense-window gain over
    # zwin_tight.
    "zwin_dense": dict(engine="columns", dilation_ratio=2.0,
                       dense_from_stage=3,
                       z_windows=((15, 25), (7, 14), (3, 8), (1, 4))),
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    model, batch_fn = build_isfusion_flagship()
    batch = jax.device_put(batch_fn(int(os.environ.get("B", "1"))))

    cfg = Config.fromfile(ISFUSION_CFG)
    vl = dict(cfg.model["pts_voxel_layer"])
    cap = _capacity(vl.get("max_voxels", 120000), False)
    dv = jax.jit(lambda b: jax.vmap(lambda p, m: voxelize_dynamic(
        p, m, vl["point_cloud_range"], vl["voxel_size"], cap))(
            b["points"], b["points_mask"]))(batch)

    base_vars = jax.jit(lambda b: model.init(
        jax.random.PRNGKey(0), b, train=False, mode="feats"))(batch)
    vfe = jax.jit(lambda b, d: model.apply(
        base_vars, b["points"], d.point_voxel_index, d.voxel_coors,
        method=lambda mdl, p, i, c: mdl.pts_voxel_encoder_m(p, i, c)))
    feats = jax.device_put(vfe(batch, dv))
    dv = jax.device_put(dv)

    for name in names:
        try:
            _run_variant(name, batch, feats, dv)
        except Exception as e:  # per-variant OOM must not kill the sweep
            print(f"{name:12s}   FAILED  {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


def _fabricated_vars(mdl, batch):
    """eval_shape + host-fabricated params: avoids compiling the whole
    init program per variant."""
    import numpy as np
    shapes = jax.eval_shape(lambda b: mdl.init(
        jax.random.PRNGKey(0), b, train=False, mode="feats"), batch)
    rng = np.random.default_rng(0)

    def fab(path, s):
        name = str(path[-1].key) if hasattr(path[-1], "key") else ""
        if name in ("scale", "gamma") or "var" in name:
            return jax.numpy.ones(s.shape, s.dtype)
        if name in ("bias", "beta") or "mean" in name:
            return jax.numpy.zeros(s.shape, s.dtype)
        return jax.numpy.asarray(0.02 * rng.standard_normal(s.shape),
                                 s.dtype)

    return jax.tree_util.tree_map_with_path(fab, shapes)


def _run_variant(name, batch, feats, dv):
    over = VARIANTS[name]
    c = Config.fromfile(ISFUSION_CFG)
    mc = dict(c.model)
    mc["pts_middle_encoder"] = dict(mc["pts_middle_encoder"], **over)
    mdl = build_detector(
        mc, train_cfg=c.get("train_cfg"), test_cfg=c.get("test_cfg"))
    variables = _fabricated_vars(mdl, batch)
    f = jax.jit(lambda ff, d: mdl.apply(
        variables, ff, d.voxel_coors, d.voxel_mask,
        method=lambda m2, x, cc, mm: m2.pts_middle_encoder_m(
            x, cc, mm)))
    out = f(feats, dv)
    jax.device_get(out.ravel()[0])
    t0 = time.perf_counter()
    n = 4
    for _ in range(n):
        out = f(feats, dv)
    jax.device_get(out.ravel()[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name:12s} {dt*1e3:8.1f} ms  {dict(over)}", flush=True)


if __name__ == "__main__":
    main()
