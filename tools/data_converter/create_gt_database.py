"""Offline GT database creation for copy-paste augmentation.

Parity: `tools/data_converter/create_gt_database.py:133` — crop each GT's
LiDAR points (stored center-relative) and its 2D image patch, write
per-object files + a dbinfos pkl consumed by MMDataBaseSamplerV2.
"""
from __future__ import annotations

import os
import pickle
from typing import Optional

import numpy as np


def create_groundtruth_database(dataset, info_path: Optional[str] = None,
                                out_dir: Optional[str] = None,
                                db_info_save_path: Optional[str] = None,
                                with_image_patches: bool = True) -> str:
    """dataset: a built NuScenesDataset (test_mode=False, minimal pipeline
    producing raw 'points' + ann_info). Returns the dbinfos pkl path."""
    from isfusion_tpu.core.bbox.box_np_ops import points_in_rbbox
    from isfusion_tpu.ops.projection import project_points_to_cameras
    import jax.numpy as jnp

    root = out_dir or dataset.data_root
    db_dir = os.path.join(root, "gt_database")
    os.makedirs(db_dir, exist_ok=True)
    db_infos: dict = {}
    for idx in range(len(dataset)):
        input_dict = dataset.get_data_info(idx)
        ann = input_dict["ann_info"]
        pts = np.fromfile(input_dict["pts_filename"], np.float32).reshape(
            -1, 5) if input_dict["pts_filename"].endswith(".bin") else \
            np.load(input_dict["pts_filename"])
        boxes = ann["gt_bboxes_3d"].numpy()
        names = ann["gt_names"]
        if len(boxes) == 0:
            continue
        inside = points_in_rbbox(pts, boxes)
        uv = depth = None
        if with_image_patches and "lidar2img" in input_dict:
            l2i = jnp.asarray(input_dict["lidar2img"])
            centers = jnp.asarray(boxes[:, :3])
            uv, depth, front = project_points_to_cameras(centers, l2i)
            uv, depth, front = (np.asarray(uv), np.asarray(depth),
                                np.asarray(front))
        cam_imgs = {}
        for gi in range(len(boxes)):
            obj_pts = pts[inside[:, gi]].copy()
            obj_pts[:, :3] -= boxes[gi, :3]
            name = str(names[gi])
            fname = f"{idx}_{name}_{gi}.npy"
            np.save(os.path.join(db_dir, fname), obj_pts)
            info = dict(
                name=name,
                path=os.path.join("gt_database", fname),
                gt_idx=gi,
                box3d_lidar=boxes[gi].astype(np.float32),
                num_points_in_gt=int(inside[:, gi].sum()),
                difficulty=0)
            if uv is not None:
                vis = front[:, gi] & (depth[:, gi] > 0)
                if vis.any():
                    cam = int(np.argmax(vis))
                    info["cam_idx"] = cam
                    u, v = uv[cam, gi]
                    half = 40.0 / max(depth[cam, gi], 1.0) * 20
                    info["bbox"] = [float(u - half), float(v - half),
                                    float(u + half), float(v + half)]
                    # crop + store the image patch for copy-paste
                    # (`create_gt_database.py:133` stores per-object
                    # patches the sampler pastes back)
                    if with_image_patches and \
                            "img_filename" in input_dict:
                        try:
                            from PIL import Image
                            path = input_dict["img_filename"][cam]
                            if cam not in cam_imgs and \
                                    os.path.exists(path):
                                cam_imgs[cam] = Image.open(path)
                            if cam in cam_imgs:
                                im = cam_imgs[cam]
                                x1 = int(max(info["bbox"][0], 0))
                                y1 = int(max(info["bbox"][1], 0))
                                x2 = int(min(info["bbox"][2], im.size[0]))
                                y2 = int(min(info["bbox"][3], im.size[1]))
                                if x2 > x1 and y2 > y1:
                                    pf = fname.replace(".npy", ".png")
                                    im.crop((x1, y1, x2, y2)).save(
                                        os.path.join(db_dir, pf))
                                    info["image_path"] = os.path.join(
                                        "gt_database", pf)
                        except Exception:
                            pass
            db_infos.setdefault(name, []).append(info)
    save = db_info_save_path or os.path.join(
        root, "nuscenes_dbinfos_train.pkl")
    with open(save, "wb") as f:
        pickle.dump(db_infos, f)
    return save
