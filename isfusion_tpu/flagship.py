"""Flagship-model factory shared by ``bench.py`` and ``__graft_entry__.py``.

The flagship is the most capable model currently wired end-to-end. It starts
as PointPillars-on-nuScenes and is upgraded to the full IS-Fusion stack as
the framework grows; callers (driver bench / compile checks) only rely on
``build_flagship`` returning (model, synthetic_batch_fn).
"""
from __future__ import annotations

import os
from typing import Callable, Tuple

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

POINTPILLARS_CFG = os.path.join(
    REPO_ROOT, "configs", "pointpillars",
    "hv_pointpillars_secfpn_sbn-all_4x8_2x_nus-3d.py")
ISFUSION_CFG = os.path.join(
    REPO_ROOT, "configs", "isfusion", "isfusion_0075voxel.py")


def synthetic_multimodal_batch(batch_size: int, num_points: int = 200000,
                               num_views: int = 6, img_hw=(384, 1056),
                               num_gt: int = 64, seed: int = 0,
                               pcr=(-54, -54, -5, 54, 54, 3)) -> dict:
    """nuScenes-scale synthetic LiDAR + 6-camera batch with plausible
    pinhole projection matrices (cameras on a 360-degree ring)."""
    import jax.numpy as jnp
    base = synthetic_points_batch(batch_size, num_points, num_gt, seed, pcr)
    rng = np.random.default_rng(seed + 1)
    h, w = img_hw
    img = rng.uniform(size=(batch_size, num_views, h, w, 3)).astype(
        np.float32)
    f = 0.6 * w
    K = np.array([[f, 0, w / 2, 0], [0, f, h / 2, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    l2i = np.zeros((num_views, 4, 4), np.float32)
    for v in range(num_views):
        th = 2 * np.pi * v / num_views
        fwd = np.array([np.cos(th), np.sin(th), 0.0])
        left = np.array([-np.sin(th), np.cos(th), 0.0])
        up = np.array([0.0, 0.0, 1.0])
        R = np.eye(4, dtype=np.float32)
        R[0, :3] = -left   # cam x = right
        R[1, :3] = -up     # cam y = down
        R[2, :3] = fwd     # cam z = forward
        l2i[v] = K @ R
    base["img"] = jnp.asarray(img)
    base["lidar2img"] = jnp.asarray(
        np.broadcast_to(l2i, (batch_size, num_views, 4, 4)).copy())
    return base


def build_isfusion_flagship(tiny: bool = False,
                            tiny_compute_dtype=None):
    """(model, batch_fn) for the full IS-Fusion stack. ``tiny`` shrinks
    point/voxel/pillar capacities and image size (same topology).
    ``tiny_compute_dtype`` overrides the tiny variant's per-module
    compute_dtype (default f32 — CPU dryruns; tests pass 'bfloat16' to
    golden-check the mixed-precision policy on small shapes).

    Env ``ISFUSION_CFG_JSON`` merges dotted-key overrides into the model
    config (e.g. '{"pts_middle_encoder.z_windows": null}') — the bench/
    bisect hook for A/Bing config knobs without editing the config."""
    import json

    from .config import Config
    from .models import build_detector

    cfg = Config.fromfile(ISFUSION_CFG)
    over = os.environ.get("ISFUSION_CFG_JSON")
    if over:
        cfg.merge_from_dict({f"model.{k}" if not k.startswith("model.")
                             else k: v
                             for k, v in json.loads(over).items()})
    model_cfg = dict(cfg.model)
    if tiny:
        tcd = tiny_compute_dtype
        # Every component TYPE stays in the graph (Swin+FPN, DynamicVFE,
        # column SparseEncoder, HSF+IGF fusion, SST, SECONDV2, TransFusion
        # head + Hungarian), but the geometry AND widths are genuinely
        # small: BEV 24x24 instead of 180x180, 1 camera view, z=25 cells,
        # ~1/8 channel widths, 16 proposals. The driver's mesh dryrun
        # compiles AND executes this on a 1-core CPU backend from a COLD
        # cache inside a 600 s window, so both graph size and per-device
        # FLOPs are the budget (full widths were measured at >240 s for
        # ONE 8-virtual-device step).
        pcr = [-28.8, -28.8, -5.0, 28.8, 28.8, 3.0]
        vs = [0.3, 0.3, 8.0 / 24.0]
        vshape = 192            # (28.8*2)/0.3
        bev = vshape // 8       # 24
        nzc = 24                # z cells; sparse_shape z = nzc + 1
        model_cfg["pc_range"] = pcr
        model_cfg["voxel_size"] = vs
        model_cfg["pts_voxel_layer"] = dict(
            point_cloud_range=pcr, max_num_points=-1, voxel_size=vs,
            max_voxels=(1536, 1536))
        model_cfg["pillar_max_voxels"] = (512, 512)
        # tiny = CPU-dryrun shapes; bf16 on XLA:CPU is emulated with
        # scalar convert fusions that dominate the step, so the tiny
        # variant pins every compute_dtype back to f32
        model_cfg["img_backbone"] = dict(
            model_cfg["img_backbone"], embed_dims=24,
            num_heads=[1, 2, 4, 8], depths=[1, 1, 1, 1],
            with_cp=False, compute_dtype=tcd)
        model_cfg["img_neck"] = dict(
            model_cfg["img_neck"], in_channels=[48, 96, 192],
            out_channels=32, compute_dtype=tcd)
        model_cfg["pts_voxel_encoder"] = dict(
            model_cfg["pts_voxel_encoder"], feat_channels=[16, 16],
            voxel_size=vs, point_cloud_range=pcr)
        model_cfg["pts_middle_encoder"] = dict(
            model_cfg["pts_middle_encoder"], in_channels=16,
            sparse_shape=[nzc + 1, vshape, vshape],
            base_channels=8, output_channels=32,
            encoder_channels=((8, 8, 16), (16, 16, 16), (16, 16, 32),
                              (32, 32)),
            # f32 on the CPU-mesh dryrun: XLA:CPU emulates bf16 with
            # scalar convert/transpose fusions that dominated the step
            # (~70% of a 590 s profile); bf16 is a TPU policy, not part
            # of what the sharding dryrun certifies
            compute_dtype=tcd or "float32",
            # the full config's z windows are tuned to the 41-cell bench
            # z grid; the tiny fixture has its own z distribution — run
            # the full extent (windows are a perf knob, not semantics).
            # Likewise the refined subm tables: exact-equal by
            # construction (test_host_plan/test_sparse_cols), but the
            # extra table/expand graphs cost ~170 s of the dryrun's
            # 600 s XLA:CPU compile window — off at tiny scale.
            z_windows=None, subm_dilation_ratios=None)
        model_cfg["fusion_encoder"] = dict(
            model_cfg["fusion_encoder"], embed_dims=32, bev_size=bev,
            grid_size=[[bev, bev, 1], [bev // 2, bev // 2, 1]],
            instance_num=16, compute_dtype=tcd)
        model_cfg["pts_backbone"] = dict(
            model_cfg["pts_backbone"], in_channels=16,
            out_channels=[16, 32], layer_nums=[1, 1],
            compute_dtype=tcd)
        model_cfg["pts_neck"] = dict(
            model_cfg["pts_neck"], in_channels=[16, 32],
            out_channels=[16, 16], compute_dtype=tcd)
        head = dict(model_cfg["pts_bbox_head"], num_proposals=16,
                    in_channels=32, hidden_channel=16, num_heads=2,
                    ffn_channel=32, compute_dtype=tcd)
        head["bbox_coder"] = dict(
            head["bbox_coder"], pc_range=pcr[:2], voxel_size=vs[:2],
            post_center_range=[-32.0, -32.0, -10.0, 32.0, 32.0, 10.0])
        model_cfg["pts_bbox_head"] = head
        for key in ("train_cfg", "test_cfg"):
            sub = dict(dict(model_cfg[key])["pts"])
            sub.update(grid_size=[vshape, vshape, nzc], voxel_size=vs[:2]
                       if key == "test_cfg" else vs,
                       out_size_factor=8)
            if "point_cloud_range" in sub:
                sub["point_cloud_range"] = pcr
            if "pc_range" in sub:
                sub["pc_range"] = pcr[:2]
            model_cfg[key] = dict(model_cfg[key], pts=sub)
        batch_fn = lambda b: synthetic_multimodal_batch(  # noqa: E731
            b, num_points=3072, num_views=1, img_hw=(64, 224), num_gt=8,
            pcr=tuple(pcr))
    else:
        batch_fn = lambda b: synthetic_multimodal_batch(b)  # noqa: E731
    return build_detector(model_cfg), batch_fn


def _lidar_cloud(rng: np.random.Generator, num_points: int,
                 pcr, sweeps: int = 10) -> np.ndarray:
    """Ray-cast a nuScenes-like multi-sweep cloud: 32-beam spinning LiDAR
    over a ground plane with random walls plus dense object clusters.

    Uniform-random points (the round-1 generator) have no BEV/z clustering,
    which misrepresents every sparsity-dependent cost in the detector; real
    LiDAR concentrates returns on the ground ring and object surfaces.
    Returns (num_points, 3) xyz inside ``pcr``.
    """
    beams = 32
    elev = np.deg2rad(np.linspace(-30.0, 10.0, beams))
    clouds = []
    for s in range(sweeps):
        n_az = 1084
        az = np.linspace(-np.pi, np.pi, n_az, endpoint=False) + \
            rng.uniform(0, 0.01)
        A, E = np.meshgrid(az, elev)
        with np.errstate(divide="ignore"):
            r_ground = np.where(E < -0.005, 1.84 / np.tan(-E), 1e9)
        wall_d = rng.uniform(4.0, 60.0, n_az)
        has_wall = rng.uniform(size=n_az) < 0.55
        r_wall = np.where(has_wall[None, :], wall_d[None, :], 1e9)
        r = np.minimum(r_ground, r_wall)
        keep = r < 80.0
        r = r[keep] * rng.normal(1.0, 0.003, keep.sum())
        a, e = A[keep], E[keep]
        ego = np.array([0.9 * s, 0.05 * s, 0.0])
        clouds.append(np.stack([
            r * np.cos(e) * np.cos(a) + ego[0],
            r * np.cos(e) * np.sin(a) + ego[1],
            r * np.sin(e)], -1))
    for _ in range(40):
        c = rng.uniform(-50, 50, 2)
        n = int(rng.integers(50, 1500))
        xy = c + rng.normal(0, [1.6, 0.7], (n, 2))
        z = rng.uniform(-1.8, 0.4, n)
        clouds.append(np.stack([xy[:, 0], xy[:, 1], z], -1))
    pts = np.concatenate(clouds)
    m = ((pts[:, 0] > pcr[0]) & (pts[:, 0] < pcr[3]) &
         (pts[:, 1] > pcr[1]) & (pts[:, 1] < pcr[4]) &
         (pts[:, 2] > pcr[2]) & (pts[:, 2] < pcr[5]))
    pts = pts[m]
    idx = rng.permutation(len(pts))
    if len(pts) >= num_points:
        return pts[idx[:num_points]]
    extra = rng.integers(0, len(pts), num_points - len(pts))
    return np.concatenate([pts, pts[extra] + rng.normal(
        0, 0.02, (len(extra), 3))])


def synthetic_points_batch(batch_size: int, num_points: int = 120000,
                           num_gt: int = 64, seed: int = 0,
                           pcr=(-50, -50, -5, 50, 50, 3)) -> dict:
    """Fixed-shape synthetic nuScenes-like LiDAR batch (5-dim points,
    padded GT boxes with mask) — matches the framework's batch contract.
    Points follow a ray-cast LiDAR distribution (see ``_lidar_cloud``)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    pts = np.empty((batch_size, num_points, 5), np.float32)
    for b in range(batch_size):
        pts[b, :, :3] = _lidar_cloud(np.random.default_rng(seed + b),
                                     num_points, pcr)
    pts[..., 3] = rng.uniform(0, 255, (batch_size, num_points))
    pts[..., 4] = rng.integers(0, 10, (batch_size, num_points)) * 0.05
    mask = rng.uniform(size=(batch_size, num_points)) > 0.05
    boxes = np.zeros((batch_size, num_gt, 9), np.float32)
    boxes[..., :2] = rng.uniform(0.9 * pcr[0], 0.9 * pcr[3],
                                 (batch_size, num_gt, 2))
    boxes[..., 2] = -1.0
    boxes[..., 3:6] = rng.uniform(0.5, 5.0, (batch_size, num_gt, 3))
    boxes[..., 6] = rng.uniform(-np.pi, np.pi, (batch_size, num_gt))
    labels = rng.integers(0, 7, (batch_size, num_gt))
    gt_mask = np.arange(num_gt)[None, :] < rng.integers(
        max(num_gt // 2, 1), num_gt + 1, (batch_size, 1))
    return dict(points=jnp.asarray(pts), points_mask=jnp.asarray(mask),
                gt_bboxes_3d=jnp.asarray(boxes),
                gt_labels_3d=jnp.asarray(labels),
                gt_mask=jnp.asarray(gt_mask))


def build_flagship(tiny: bool = False) -> Tuple[object, Callable[[int], dict]]:
    """Return (flax model, batch_fn(batch_size) -> synthetic batch).

    ``tiny=True`` shrinks point/voxel capacities and the BEV grid for
    CPU-mesh dry runs; shapes stay static either way.
    The flagship IS the full IS-Fusion stack (the driver's entry() compile
    check, multichip dryrun and bench all exercise it); set
    FLAGSHIP_MODEL=pointpillars for the light LiDAR-only baseline.
    """
    if os.environ.get("FLAGSHIP_MODEL",
                      "isfusion").lower() != "pointpillars":
        return build_isfusion_flagship(tiny=tiny)
    from .config import Config
    from .models import build_detector

    cfg = Config.fromfile(POINTPILLARS_CFG)
    model_cfg = dict(cfg.model)
    if tiny:
        pcr = [-8, -8, -5, 8, 8, 3]
        vs = [0.5, 0.5, 8]
        model_cfg["pts_voxel_layer"] = dict(
            max_num_points=8, point_cloud_range=pcr, voxel_size=vs,
            max_voxels=(256, 256))
        model_cfg["pts_voxel_encoder"] = dict(
            model_cfg["pts_voxel_encoder"], feat_channels=[16, 16],
            voxel_size=vs, point_cloud_range=pcr)
        model_cfg["pts_middle_encoder"] = dict(
            model_cfg["pts_middle_encoder"], in_channels=16,
            output_shape=[32, 32])
        model_cfg["pts_backbone"] = dict(
            model_cfg["pts_backbone"], in_channels=16,
            out_channels=[16, 32, 64], layer_nums=[1, 1, 1])
        model_cfg["pts_neck"] = dict(
            model_cfg["pts_neck"], in_channels=[16, 32, 64],
            out_channels=[16, 16, 16])
        model_cfg["pts_bbox_head"] = dict(
            model_cfg["pts_bbox_head"], in_channels=48, feat_channels=48)
        model_cfg["pts_bbox_head"]["anchor_generator"] = dict(
            model_cfg["pts_bbox_head"]["anchor_generator"],
            ranges=[[-8, -8, r[2], 8, 8, r[5]]
                    for r in model_cfg["pts_bbox_head"]
                    ["anchor_generator"]["ranges"]])
        batch_fn = lambda b: synthetic_points_batch(  # noqa: E731
            b, num_points=2048, num_gt=8, pcr=pcr)
    else:
        batch_fn = lambda b: synthetic_points_batch(b)  # noqa: E731
    model = build_detector(model_cfg)
    return model, batch_fn
