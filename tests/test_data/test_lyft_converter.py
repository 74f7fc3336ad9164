"""Lyft converter over synthetic nuScenes-format JSON tables."""
import json
import os

import numpy as np
import pytest


def write_tables(root, version="v1.01-train"):
    td = os.path.join(root, version)
    os.makedirs(td, exist_ok=True)
    q = [1.0, 0, 0, 0]
    tables = dict(
        sensor=[dict(token="s_lid", channel="LIDAR_TOP", modality="lidar"),
                dict(token="s_cam", channel="CAM_FRONT",
                     modality="camera")],
        calibrated_sensor=[
            dict(token="cs_lid", sensor_token="s_lid", rotation=q,
                 translation=[0, 0, 1.8], camera_intrinsic=[]),
            dict(token="cs_cam", sensor_token="s_cam", rotation=q,
                 translation=[1.5, 0, 1.6],
                 camera_intrinsic=[[500, 0, 400], [0, 500, 225],
                                   [0, 0, 1]])],
        ego_pose=[dict(token="ep0", rotation=q, translation=[10, 5, 0])],
        scene=[dict(token="sc0")],
        category=[dict(token="cat_car", name="car")],
        instance=[dict(token="inst0", category_token="cat_car")],
        sample=[dict(token="samp0", timestamp=1000,
                     anns=["ann0"])],
        sample_data=[
            dict(token="sd_lid", sample_token="samp0",
                 calibrated_sensor_token="cs_lid", ego_pose_token="ep0",
                 filename="lidar/0.bin", timestamp=1000),
            dict(token="sd_cam", sample_token="samp0",
                 calibrated_sensor_token="cs_cam", ego_pose_token="ep0",
                 filename="images/0.jpg", timestamp=1000)],
        sample_annotation=[dict(
            token="ann0", sample_token="samp0", instance_token="inst0",
            translation=[15, 7, 1.0], size=[2, 5, 1.5],
            rotation=[np.cos(0.25), 0, 0, np.sin(0.25)])],
    )
    for name, rows in tables.items():
        with open(os.path.join(td, f"{name}.json"), "w") as f:
            json.dump(rows, f)


def test_create_lyft_infos(tmp_path):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from data_converter.lyft_converter import create_lyft_infos
    write_tables(str(tmp_path))
    paths = create_lyft_infos(str(tmp_path))
    import pickle
    with open(paths[0], "rb") as f:
        data = pickle.load(f)
    infos = data["infos"]
    assert len(infos) == 1
    info = infos[0]
    assert "CAM_FRONT" in info["cams"]
    # box moved into the lidar frame: global (15,7,1) - ego (10,5,0)
    # - lidar (0,0,1.8); infos carry GRAVITY-center z (the reference info
    # format; the loader converts with origin=(0.5,0.5,0.5) — r3 fix)
    np.testing.assert_allclose(info["gt_boxes"][0, :3],
                               [5.0, 2.0, 1.0 - 1.8], atol=1e-6)
    # stored yaw = -phi - pi/2 (reference box parameterization; the
    # global heading here is 0.5 with identity ego/lidar rotations)
    np.testing.assert_allclose(info["gt_boxes"][0, 6], -0.5 - np.pi / 2,
                               atol=1e-6)
    assert info["gt_names"][0] == "car"
