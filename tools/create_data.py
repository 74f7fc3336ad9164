#!/usr/bin/env python
"""Offline data preparation CLI (parity: reference `tools/create_data.py`:
`nuscenes_data_prep:48` = info pkls + GT database)."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def nuscenes_data_prep(root_path: str, info_prefix: str, version: str,
                       max_sweeps: int = 10,
                       with_gt_database: bool = True) -> None:
    from data_converter.nuscenes_converter import create_nuscenes_infos
    train_path, _ = create_nuscenes_infos(
        root_path, info_prefix, version=version, max_sweeps=max_sweeps)
    if with_gt_database:
        from data_converter.create_gt_database import \
            create_groundtruth_database
        from isfusion_tpu.datasets import NuScenesDataset
        dataset = NuScenesDataset(
            ann_file=train_path, data_root=root_path, pipeline=None,
            modality=dict(use_camera=True, use_lidar=True))
        create_groundtruth_database(dataset)


def main():
    p = argparse.ArgumentParser(description="Data converter")
    p.add_argument("dataset", choices=["nuscenes", "kitti", "waymo", "lyft"])
    p.add_argument("--root-path", default="data/nuscenes")
    p.add_argument("--version", default="v1.0-trainval")
    p.add_argument("--extra-tag", default="nuscenes")
    p.add_argument("--max-sweeps", type=int, default=10)
    p.add_argument("--no-gt-database", action="store_true")
    args = p.parse_args()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    if args.dataset == "nuscenes":
        nuscenes_data_prep(args.root_path, args.extra_tag, args.version,
                           args.max_sweeps,
                           with_gt_database=not args.no_gt_database)
    elif args.dataset == "kitti":
        from data_converter.kitti_converter import create_kitti_info_file
        create_kitti_info_file(args.root_path, args.extra_tag)
    elif args.dataset == "waymo":
        from data_converter.waymo_converter import create_waymo_infos
        create_waymo_infos(args.root_path, args.extra_tag)
    elif args.dataset == "lyft":
        from data_converter.lyft_converter import create_lyft_infos
        create_lyft_infos(args.root_path, args.extra_tag, args.version)


if __name__ == "__main__":
    main()
