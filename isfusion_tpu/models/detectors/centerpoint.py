"""CenterPoint detectors (parity: `mmdet3d/models/detectors/centerpoint.py:10`
and the Dynamic variant registered in `detectors/__init__.py`).

The two-branch plumbing is inherited from MVXTwoStageDetector; CenterPoint
is its LiDAR-only specialization (hard or dynamic voxelization -> VFE ->
SparseEncoder -> SECOND(+FPN) -> CenterHead).
"""
from __future__ import annotations

from ...registry import DETECTORS
from .mvx_two_stage import MVXTwoStageDetector


@DETECTORS.register_module()
class CenterPoint(MVXTwoStageDetector):
    """Hard-voxelization CenterPoint."""


@DETECTORS.register_module()
class DynamicCenterPoint(MVXTwoStageDetector):
    """Dynamic-voxelization CenterPoint (the 0.075-voxel config family).

    Dynamic path is selected by ``pts_voxel_layer.max_num_points <= 0``
    (the reference selects it by class; the config key drives it here)."""
