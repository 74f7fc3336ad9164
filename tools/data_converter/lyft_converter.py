"""Lyft Level-5 info-pkl converter.

Parity: `tools/data_converter/lyft_converter.py` in the reference. Lyft's
release uses nuScenes-format JSON tables, so this converter walks the
tables directly (no lyft_dataset_sdk needed — it is absent offline, like
the nuscenes devkit): per sample it records the lidar path, camera calib
(sensor2lidar R|t + intrinsics), boxes in the lidar frame and class names.
"""
from __future__ import annotations

import json
import os
import pickle
from typing import Dict, List

import numpy as np


def _quat_rot(q) -> np.ndarray:
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def _load_tables(table_dir: str) -> Dict[str, list]:
    tables = {}
    for name in ("sample", "sample_data", "sample_annotation",
                 "calibrated_sensor", "sensor", "ego_pose", "scene",
                 "category", "instance"):
        with open(os.path.join(table_dir, f"{name}.json")) as f:
            tables[name] = json.load(f)
    return tables


def create_lyft_infos(root_path: str, info_prefix: str = "lyft",
                      version: str = "v1.01-train",
                      max_sweeps: int = 10) -> List[str]:
    """root_path contains `<version>/` (JSON tables) + `train_lidar/` etc.
    Writes `<info_prefix>_infos_train.pkl` with the same schema the
    LyftDataset consumes (nuScenes-compatible keys, no velocity)."""
    table_dir = os.path.join(root_path, version)
    t = _load_tables(table_dir)
    by_tok = {n: {r["token"]: r for r in t[n]} for n in t}
    sd_by_sample: Dict[str, list] = {}
    for sd in t["sample_data"]:
        sd_by_sample.setdefault(sd["sample_token"], []).append(sd)

    infos = []
    for sample in t["sample"]:
        sds = sd_by_sample.get(sample["token"], [])
        lidar_sd = next((s for s in sds if "lidar" in
                         by_tok["sensor"][by_tok["calibrated_sensor"][
                             s["calibrated_sensor_token"]][
                             "sensor_token"]]["channel"].lower()), None)
        if lidar_sd is None:
            continue
        cs_l = by_tok["calibrated_sensor"][
            lidar_sd["calibrated_sensor_token"]]
        ep_l = by_tok["ego_pose"][lidar_sd["ego_pose_token"]]
        l2e_r = _quat_rot(cs_l["rotation"])
        l2e_t = np.asarray(cs_l["translation"])
        e2g_r = _quat_rot(ep_l["rotation"])
        e2g_t = np.asarray(ep_l["translation"])

        cams = {}
        for sd in sds:
            cs = by_tok["calibrated_sensor"][sd["calibrated_sensor_token"]]
            channel = by_tok["sensor"][cs["sensor_token"]]["channel"]
            if not channel.lower().startswith("cam"):
                continue
            c2e_r = _quat_rot(cs["rotation"])
            c2e_t = np.asarray(cs["translation"])
            # camera -> lidar = inv(lidar2ego) @ cam2ego
            c2l_r = l2e_r.T @ c2e_r
            c2l_t = l2e_r.T @ (c2e_t - l2e_t)
            cams[channel] = dict(
                data_path=os.path.join(root_path, sd["filename"]),
                type=channel,
                sensor2lidar_rotation=c2l_r,
                sensor2lidar_translation=c2l_t,
                cam_intrinsic=np.asarray(cs["camera_intrinsic"]),
                timestamp=sd["timestamp"])

        locs, dims, rots, names = [], [], [], []
        for ann_tok in sample["anns"] if "anns" in sample else []:
            ann = by_tok["sample_annotation"][ann_tok]
            inst = by_tok["instance"][ann["instance_token"]]
            cat = by_tok["category"][inst["category_token"]]["name"]
            c_g = np.asarray(ann["translation"])
            r_g = _quat_rot(ann["rotation"])
            c_e = e2g_r.T @ (c_g - e2g_t)
            c_l = l2e_r.T @ (c_e - l2e_t)
            r_l = l2e_r.T @ (e2g_r.T @ r_g)
            # reference parameterization: stored yaw = -phi - pi/2 with
            # (w, l, h) dims (same convention fix as nuscenes_converter;
            # the box stack's corner convention needs it to place the
            # extents on the right axes relative to the point cloud)
            yaw = -np.arctan2(r_l[1, 0], r_l[0, 0]) - np.pi / 2
            w, l, h = ann["size"]
            # GRAVITY-center z: the reference info format stores
            # box.center as-is (`nuscenes_converter.py:276`) and the
            # loader converts with origin=(0.5, 0.5, 0.5) — storing
            # bottom z here double-shifted GT by h/2 on load (r3 fix)
            locs.append([c_l[0], c_l[1], c_l[2]])
            dims.append([w, l, h])
            rots.append(yaw)
            names.append(cat)
        infos.append(dict(
            token=sample["token"],
            lidar_path=os.path.join(root_path, lidar_sd["filename"]),
            sweeps=[],
            cams=cams,
            timestamp=sample["timestamp"],
            gt_boxes=np.concatenate(
                [np.asarray(locs), np.asarray(dims),
                 np.asarray(rots)[:, None]], -1).astype(np.float32)
            if locs else np.zeros((0, 7), np.float32),
            gt_names=np.asarray(names),
            num_lidar_pts=np.full(len(names), 1),
            valid_flag=np.ones(len(names), bool)))

    out = os.path.join(root_path, f"{info_prefix}_infos_train.pkl")
    with open(out, "wb") as f:
        pickle.dump(dict(infos=infos, metadata=dict(version=version)), f)
    return [out]
