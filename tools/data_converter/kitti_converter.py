"""KITTI raw data -> info pkls.

Parity: `tools/data_converter/kitti_converter.py` — walk the KITTI object
layout (velodyne/, label_2/, calib/, ImageSets splits) and write the
standard info dicts consumed by KittiDataset (annos with name/truncated/
occluded/bbox/dimensions(lhw->l,h,w as stored)/location/rotation_y,
calib P2/R0_rect/Tr_velo_to_cam).
"""
from __future__ import annotations

import os
import pickle
from typing import List, Optional

import numpy as np


def _read_calib(path: str) -> dict:
    out = {}
    with open(path) as f:
        for line in f:
            if ":" not in line:
                continue
            key, vals = line.split(":", 1)
            arr = np.fromstring(vals, sep=" ", dtype=np.float64)
            out[key.strip()] = arr
    calib = {}
    for k in ("P0", "P1", "P2", "P3"):
        if k in out:
            m = np.eye(4)
            m[:3, :4] = out[k].reshape(3, 4)
            calib[k] = m.astype(np.float32)
    if "R0_rect" in out:
        m = np.eye(4)
        m[:3, :3] = out["R0_rect"].reshape(3, 3)
        calib["R0_rect"] = m.astype(np.float32)
    if "Tr_velo_to_cam" in out:
        m = np.eye(4)
        m[:3, :4] = out["Tr_velo_to_cam"].reshape(3, 4)
        calib["Tr_velo_to_cam"] = m.astype(np.float32)
    return calib


def _read_label(path: str) -> dict:
    names, trunc, occ, alpha, bbox, dims, loc, roty = \
        [], [], [], [], [], [], [], []
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                p = line.strip().split(" ")
                if len(p) < 15:
                    continue
                names.append(p[0])
                trunc.append(float(p[1]))
                occ.append(float(p[2]))
                alpha.append(float(p[3]))
                bbox.append([float(v) for v in p[4:8]])
                # KITTI stores h, w, l; mmdet3d annos use (l, h, w)->
                # dimensions is camera-frame (l, h, w) per convention below
                h, w, l = float(p[8]), float(p[9]), float(p[10])
                dims.append([l, h, w])
                loc.append([float(v) for v in p[11:14]])
                roty.append(float(p[14]))
    n = len(names)
    return dict(
        name=np.asarray(names),
        truncated=np.asarray(trunc, np.float32),
        occluded=np.asarray(occ, np.float32),
        alpha=np.asarray(alpha, np.float32),
        bbox=np.asarray(bbox, np.float32).reshape(n, 4),
        dimensions=np.asarray(dims, np.float32).reshape(n, 3),
        location=np.asarray(loc, np.float32).reshape(n, 3),
        rotation_y=np.asarray(roty, np.float32))


def create_kitti_info_file(root_path: str, info_prefix: str = "kitti",
                           splits=("train", "val"),
                           relative_path: bool = False) -> List[str]:
    written = []
    for split in splits:
        subdir = "testing" if split == "test" else "training"
        ids_file = os.path.join(root_path, "ImageSets", f"{split}.txt")
        if os.path.exists(ids_file):
            ids = [l.strip() for l in open(ids_file) if l.strip()]
        else:
            vdir = os.path.join(root_path, subdir, "velodyne")
            ids = sorted(os.path.splitext(f)[0]
                         for f in os.listdir(vdir)) if \
                os.path.isdir(vdir) else []
        infos = []
        for idx in ids:
            base = os.path.join(root_path, subdir)
            info = dict(
                point_cloud=dict(
                    idx=int(idx),
                    velodyne_path=os.path.join(base, "velodyne",
                                               f"{idx}.bin")),
                calib=_read_calib(os.path.join(base, "calib",
                                               f"{idx}.txt")),
            )
            if split != "test":
                info["annos"] = _read_label(
                    os.path.join(base, "label_2", f"{idx}.txt"))
            infos.append(info)
        path = os.path.join(root_path, f"{info_prefix}_infos_{split}.pkl")
        with open(path, "wb") as f:
            pickle.dump(infos, f)
        written.append(path)
    return written
