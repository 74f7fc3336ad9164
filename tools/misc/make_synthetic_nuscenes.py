"""Generate a synthetic nuScenes-mini-style dataset on disk.

Produces the exact on-disk surface `tools/train.py` / `tools/test.py`
consume with `configs/isfusion/isfusion_0075voxel.py` (see the reference
layout written by `tools/create_data.py` -> `nuscenes_converter.py:70`):

  <out>/samples/LIDAR_TOP/*.bin        5-dim float32 ray-cast clouds
  <out>/sweeps/LIDAR_TOP/*.bin         preceding sweeps w/ ego motion
  <out>/samples/CAM_*/*.jpg            6 camera views (ring layout)
  <out>/nuscenes_infos_train.pkl       info dicts (calib, sweeps, boxes)
  <out>/nuscenes_infos_val.pkl
  <out>/nuscenes_dbinfos_train.pkl     GT database (via create_gt_database)

Usage: python tools/misc/make_synthetic_nuscenes.py --out data/nuscenes_syn
           [--train 6 --val 2 --points 250000 --img-hw 900 1600]
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

from isfusion_tpu.flagship import _lidar_cloud  # noqa: E402

CAM_NAMES = ["CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_BACK_RIGHT", "CAM_BACK",
             "CAM_BACK_LEFT", "CAM_FRONT_LEFT"]
CLASSES = ["car", "truck", "construction_vehicle", "bus", "trailer",
           "barrier", "motorcycle", "bicycle", "pedestrian", "traffic_cone"]
SIZES = {  # rough (l, w, h) per class
    "car": (4.6, 1.9, 1.7), "truck": (7.0, 2.5, 2.8), "bus": (11.0, 2.9, 3.4),
    "trailer": (10.0, 2.9, 3.8), "construction_vehicle": (6.0, 2.8, 3.2),
    "barrier": (2.5, 0.6, 1.0), "motorcycle": (2.0, 0.8, 1.4),
    "bicycle": (1.7, 0.6, 1.3), "pedestrian": (0.7, 0.6, 1.7),
    "traffic_cone": (0.4, 0.4, 0.8)}


def cam_calib(rng, v, w, h):
    th = 2 * np.pi * v / 6
    fwd = np.array([np.cos(th), np.sin(th), 0.0])
    left = np.array([-np.sin(th), np.cos(th), 0.0])
    up = np.array([0.0, 0.0, 1.0])
    # cam axes: x=right, y=down, z=forward; sensor2lidar = R (cam->lidar)
    r = np.stack([-left, -up, fwd], axis=1)  # columns are cam axes in lidar
    t = 1.5 * fwd + np.array([0.0, 0.0, 0.2])
    f = 0.6 * w
    intr = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float64)
    return r, t, intr


def make_sample(rng, out, split_dir, idx, num_points, img_hw, n_sweeps=3,
                classes=None, gt_range=(8, 24)):
    h, w = img_hw
    pcr = (-54, -54, -5, 54, 54, 3)
    token = f"syn{split_dir}{idx:04d}"

    pts = _lidar_cloud(rng, num_points, pcr, sweeps=1).astype(np.float32)
    feats = np.concatenate(
        [pts, rng.uniform(0, 255, (len(pts), 1)).astype(np.float32),
         np.zeros((len(pts), 1), np.float32)], axis=1)
    # absolute paths: the loading transforms consume paths as-is (the
    # reference writes repo-relative paths into its infos the same way)
    lidar_rel = os.path.join(out, f"samples/LIDAR_TOP/{token}.bin")
    os.makedirs(os.path.join(out, "samples/LIDAR_TOP"), exist_ok=True)
    feats.tofile(lidar_rel)

    sweeps = []
    os.makedirs(os.path.join(out, "sweeps/LIDAR_TOP"), exist_ok=True)
    for s in range(n_sweeps):
        sp = _lidar_cloud(rng, num_points // 4, pcr, sweeps=1).astype(
            np.float32)
        sfeat = np.concatenate(
            [sp, rng.uniform(0, 255, (len(sp), 1)).astype(np.float32),
             np.zeros((len(sp), 1), np.float32)], axis=1)
        rel = os.path.join(out, f"sweeps/LIDAR_TOP/{token}_s{s}.bin")
        sfeat.tofile(rel)
        yaw = 0.02 * (s + 1)
        rot = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                        [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]])
        sweeps.append(dict(
            data_path=rel,
            sensor2lidar_rotation=rot,
            sensor2lidar_translation=np.array([0.9 * (s + 1), 0.0, 0.0]),
            timestamp=(idx * 10 - (s + 1) * 0.05) * 1e6))

    cams = {}
    img = (rng.uniform(0, 60, (h, w, 3)) +
           np.linspace(0, 195, h)[:, None, None]).astype(np.uint8)
    from PIL import Image
    for v, cam in enumerate(CAM_NAMES):
        r, t, intr = cam_calib(rng, v, w, h)
        rel = os.path.join(out, f"samples/{cam}/{token}.jpg")
        os.makedirs(os.path.join(out, f"samples/{cam}"), exist_ok=True)
        Image.fromarray(img).save(rel, quality=70)
        cams[cam] = dict(
            data_path=rel,
            type=cam,
            sensor2lidar_rotation=r,
            sensor2lidar_translation=t,
            cam_intrinsic=intr,
            timestamp=idx * 10 * 1e6)

    n_gt = int(rng.integers(*gt_range))
    names = rng.choice(classes if classes is not None else CLASSES, n_gt)
    attr_of = {"car": "vehicle.parked", "truck": "vehicle.parked",
               "bus": "vehicle.stopped", "trailer": "vehicle.parked",
               "construction_vehicle": "vehicle.parked",
               "motorcycle": "cycle.without_rider",
               "bicycle": "cycle.without_rider",
               "pedestrian": "pedestrian.standing",
               "barrier": "", "traffic_cone": ""}
    attrs = np.asarray([attr_of[str(n)] for n in names])
    boxes = np.zeros((n_gt, 7), np.float32)
    for gi, n in enumerate(names):
        l, wd, ht = SIZES[str(n)]
        boxes[gi, :2] = rng.uniform(-48, 48, 2)
        boxes[gi, 2] = -1.8 + ht / 2 + rng.normal(0, 0.05)
        boxes[gi, 3:6] = np.array([l, wd, ht]) * rng.uniform(0.9, 1.1, 3)
        boxes[gi, 6] = rng.uniform(-np.pi, np.pi)
        # drop object points inside so GT boxes are supported by geometry.
        # The blob is anisotropic (l != w) and ROTATED BY THE BOX YAW with
        # the box-corner convention (structures.rotation_3d_in_axis:
        # wx = lx*c + ly*s) — without this the cloud is axis-aligned and
        # yaw is UNLEARNABLE from the data (r3: uniform pred-GT yaw
        # residuals, mAOE pinned at pi/2)
        npts = int(rng.integers(20, 400))
        local = rng.normal(0, 1, (npts, 3)) * (boxes[gi, 3:6] / 4)
        c_, s_ = np.cos(boxes[gi, 6]), np.sin(boxes[gi, 6])
        obj = np.stack([local[:, 0] * c_ + local[:, 1] * s_,
                        -local[:, 0] * s_ + local[:, 1] * c_,
                        local[:, 2]], -1) + boxes[gi, :3]
        objf = np.concatenate(
            [obj.astype(np.float32),
             rng.uniform(0, 255, (npts, 1)).astype(np.float32),
             np.zeros((npts, 1), np.float32)], axis=1)
        feats = np.concatenate([feats, objf], axis=0)
    feats.tofile(lidar_rel)  # rewrite with objects

    # gravity-center boxes (info pkl convention, origin (0.5, 0.5, 0.5))
    return dict(
        token=token,
        lidar_path=lidar_rel,
        sweeps=sweeps,
        cams=cams,
        timestamp=idx * 10 * 1e6,
        gt_boxes=boxes,
        gt_names=names.astype(str),
        # parked/standing attributes (above) imply ~zero velocity; random
        # velocities were unlearnable noise (single-frame clusters carry
        # no motion cue) that pinned mAVE at its clip value
        gt_velocity=rng.normal(0, 0.05, (n_gt, 2)).astype(np.float32),
        num_lidar_pts=np.full(n_gt, 25),
        gt_attrs=attrs,
        num_radar_pts=np.zeros(n_gt, int),
        valid_flag=np.ones(n_gt, bool),
        lidar2ego_rotation=[1.0, 0, 0, 0],
        lidar2ego_translation=[0.94, 0.0, 1.84],
        ego2global_rotation=[np.cos(idx * 0.1), 0, 0, np.sin(idx * 0.1)],
        ego2global_translation=[100.0 + 5 * idx, 40.0, 0.0],
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--train", type=int, default=6)
    ap.add_argument("--val", type=int, default=2)
    ap.add_argument("--points", type=int, default=120000)
    ap.add_argument("--img-hw", type=int, nargs=2, default=[900, 1600])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--classes", nargs="+", default=None,
                    help="restrict GT classes (learnability fixtures: a "
                         "reduced class set converges in a few thousand "
                         "steps where the 10-class taxonomy cannot)")
    ap.add_argument("--gt-range", type=int, nargs=2, default=[8, 24])
    args = ap.parse_args()
    out = args.out
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    for split, n in [("train", args.train), ("val", args.val)]:
        infos = [make_sample(rng, out, split, i, args.points,
                             tuple(args.img_hw), classes=args.classes,
                             gt_range=tuple(args.gt_range))
                 for i in range(n)]
        with open(os.path.join(out, f"nuscenes_infos_{split}.pkl"),
                  "wb") as f:
            pickle.dump(dict(infos=infos,
                             metadata=dict(version="v1.0-synthetic")), f)
        print(f"{split}: {n} samples")

    # GT database for the copy-paste sampler
    from isfusion_tpu.datasets import NuScenesDataset
    from tools.data_converter.create_gt_database import \
        create_groundtruth_database
    ds = NuScenesDataset(
        ann_file=os.path.join(out, "nuscenes_infos_train.pkl"),
        data_root=out, classes=CLASSES, test_mode=False,
        modality=dict(use_camera=True, use_lidar=True), pipeline=None)
    path = create_groundtruth_database(ds)
    print("dbinfos:", path)


if __name__ == "__main__":
    main()
