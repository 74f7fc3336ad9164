"""nuScenes raw data -> info pkls.

Parity: `tools/data_converter/nuscenes_converter.py:70`
(create_nuscenes_infos, _fill_trainval_infos:188): per-sample LiDAR path,
6 camera infos with sensor2lidar R|t + intrinsics, the 10-sweep list,
boxes+velocity in the LiDAR frame, and valid flags. Requires the
nuscenes-devkit (guarded import — absent in this environment; the dataset
consumes pre-built pkls or synthetic fixtures instead).
"""
from __future__ import annotations

import os
import pickle
from typing import List, Tuple

import numpy as np

NameMapping = {
    'movable_object.barrier': 'barrier',
    'vehicle.bicycle': 'bicycle',
    'vehicle.bus.bendy': 'bus',
    'vehicle.bus.rigid': 'bus',
    'vehicle.car': 'car',
    'vehicle.construction': 'construction_vehicle',
    'vehicle.motorcycle': 'motorcycle',
    'human.pedestrian.adult': 'pedestrian',
    'human.pedestrian.child': 'pedestrian',
    'human.pedestrian.construction_worker': 'pedestrian',
    'human.pedestrian.police_officer': 'pedestrian',
    'movable_object.trafficcone': 'traffic_cone',
    'vehicle.trailer': 'trailer',
    'vehicle.truck': 'truck'}

CAMS = ('CAM_FRONT', 'CAM_FRONT_RIGHT', 'CAM_FRONT_LEFT', 'CAM_BACK',
        'CAM_BACK_LEFT', 'CAM_BACK_RIGHT')


def _quat_rot(q):
    w, x, y, z = q
    n = w * w + x * x + y * y + z * z
    s = 2.0 / max(n, 1e-12)
    return np.array([
        [1 - s * (y * y + z * z), s * (x * y - w * z), s * (x * z + w * y)],
        [s * (x * y + w * z), 1 - s * (x * x + z * z), s * (y * z - w * x)],
        [s * (x * z - w * y), s * (y * z + w * x),
         1 - s * (x * x + y * y)]])


def create_nuscenes_infos(root_path: str, info_prefix: str,
                          version: str = "v1.0-trainval",
                          max_sweeps: int = 10) -> Tuple[str, str]:
    """Walk the nuScenes DB and write {prefix}_infos_{train,val}.pkl."""
    from nuscenes import NuScenes
    from nuscenes.utils import splits
    nusc = NuScenes(version=version, dataroot=root_path, verbose=False)
    if "mini" in version:
        train_scenes = set(splits.mini_train)
        val_scenes = set(splits.mini_val)
    elif "test" in version:
        train_scenes = set(splits.test)
        val_scenes = set()
    else:
        train_scenes = set(splits.train)
        val_scenes = set(splits.val)

    train_infos: List[dict] = []
    val_infos: List[dict] = []
    for sample in nusc.sample:
        scene = nusc.get("scene", sample["scene_token"])["name"]
        lidar_token = sample["data"]["LIDAR_TOP"]
        sd = nusc.get("sample_data", lidar_token)
        cs = nusc.get("calibrated_sensor", sd["calibrated_sensor_token"])
        pose = nusc.get("ego_pose", sd["ego_pose_token"])
        info = dict(
            token=sample["token"],
            lidar_path=os.path.join(root_path, sd["filename"]),
            sweeps=[],
            cams={},
            timestamp=sample["timestamp"],
            lidar2ego_translation=cs["translation"],
            lidar2ego_rotation=cs["rotation"],
            ego2global_translation=pose["translation"],
            ego2global_rotation=pose["rotation"],
        )
        l2e_r = _quat_rot(cs["rotation"])
        l2e_t = np.asarray(cs["translation"])
        e2g_r = _quat_rot(pose["rotation"])
        e2g_t = np.asarray(pose["translation"])

        def sensor_to_lidar(sd_tok):
            sdc = nusc.get("sample_data", sd_tok)
            csc = nusc.get("calibrated_sensor",
                           sdc["calibrated_sensor_token"])
            pc = nusc.get("ego_pose", sdc["ego_pose_token"])
            s2e_r = _quat_rot(csc["rotation"])
            s2e_t = np.asarray(csc["translation"])
            se2g_r = _quat_rot(pc["rotation"])
            se2g_t = np.asarray(pc["translation"])
            # sensor -> global -> key-frame ego -> key-frame lidar
            r = l2e_r.T @ e2g_r.T @ se2g_r @ s2e_r
            t = l2e_r.T @ (e2g_r.T @ (se2g_r @ s2e_t + se2g_t - e2g_t)
                           - l2e_t)
            return sdc, csc, r, t

        for cam in CAMS:
            if cam not in sample["data"]:
                continue
            sdc, csc, r, t = sensor_to_lidar(sample["data"][cam])
            info["cams"][cam] = dict(
                data_path=os.path.join(root_path, sdc["filename"]),
                type=cam,
                sensor2lidar_rotation=r,
                sensor2lidar_translation=t,
                cam_intrinsic=np.asarray(csc["camera_intrinsic"]),
                timestamp=sdc["timestamp"])

        # past sweeps
        sweep_tok = sd["prev"]
        while len(info["sweeps"]) < max_sweeps and sweep_tok:
            sdc, csc, r, t = sensor_to_lidar(sweep_tok)
            info["sweeps"].append(dict(
                data_path=os.path.join(root_path, sdc["filename"]),
                sensor2lidar_rotation=r,
                sensor2lidar_translation=t,
                timestamp=sdc["timestamp"]))
            sweep_tok = sdc["prev"]

        # annotations in the LiDAR frame
        boxes = nusc.get_boxes(lidar_token)
        locs, dims, rots, names, vels = [], [], [], [], []
        num_pts, valid, attrs = [], [], []
        for box, ann_tok in zip(boxes, sample["anns"]):
            ann = nusc.get("sample_annotation", ann_tok)
            # attribute name (for the devkit-exact AAE metric)
            if len(ann.get("attribute_tokens", [])):
                attrs.append(nusc.get(
                    "attribute", ann["attribute_tokens"][0])["name"])
            else:
                attrs.append("")
            # global -> ego -> lidar
            c = e2g_r.T @ (np.asarray(box.center) - e2g_t)
            c = l2e_r.T @ (c - l2e_t)
            rg = e2g_r.T @ _quat_rot(
                [box.orientation.w, box.orientation.x, box.orientation.y,
                 box.orientation.z])
            rl = l2e_r.T @ rg
            # heading angle (CCW standard) in the lidar frame, then the
            # reference's box parameterization: stored yaw = -phi - pi/2
            # with dims in (w, l, h) order (`nuscenes_converter.py:299`,
            # `gt_boxes = [locs, wlh, -rots - pi/2]`) — under the box
            # stack's clockwise-for-row-vectors corner convention this
            # puts the w extent across the heading, the l extent along
            # it. (r3 fix: storing the raw CCW heading made every corner/
            # containment/IoU computation on real data geometrically
            # wrong; the synthetic-fixture path parameterizes as
            # (l, w, h) + CW heading, which is the same geometry.)
            yaw = -np.arctan2(rl[1, 0], rl[0, 0]) - np.pi / 2
            v = nusc.box_velocity(box.token)[:2]
            vg = np.array([v[0], v[1], 0.0])
            vl = l2e_r.T @ (e2g_r.T @ vg)
            w, l, h = box.wlh
            # GRAVITY-center z: the reference stores box.center as-is
            # (`nuscenes_converter.py:276`) and NuScenesDataset loads
            # infos with origin=(0.5, 0.5, 0.5) — the old bottom-z here
            # double-shifted every real-data GT down by h/2 on load
            locs.append([c[0], c[1], c[2]])
            dims.append([w, l, h])
            rots.append(yaw)
            names.append(NameMapping.get(box.name, box.name))
            vels.append(vl[:2])
            num_pts.append(ann["num_lidar_pts"] + ann["num_radar_pts"])
            valid.append(ann["num_lidar_pts"] + ann["num_radar_pts"] > 0)
        info.update(dict(
            gt_boxes=np.concatenate(
                [np.asarray(locs), np.asarray(dims),
                 np.asarray(rots)[:, None]], -1).astype(np.float32)
            if locs else np.zeros((0, 7), np.float32),
            gt_names=np.asarray(names),
            gt_velocity=np.asarray(vels, np.float32).reshape(-1, 2),
            num_lidar_pts=np.asarray(num_pts),
            gt_attrs=np.asarray(attrs),
            valid_flag=np.asarray(valid, bool)))
        (train_infos if scene in train_scenes else val_infos).append(info)

    meta = dict(version=version)
    train_path = os.path.join(root_path, f"{info_prefix}_infos_train.pkl")
    val_path = os.path.join(root_path, f"{info_prefix}_infos_val.pkl")
    with open(train_path, "wb") as f:
        pickle.dump(dict(infos=train_infos, metadata=meta), f)
    with open(val_path, "wb") as f:
        pickle.dump(dict(infos=val_infos, metadata=meta), f)
    return train_path, val_path
