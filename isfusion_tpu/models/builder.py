"""Model builders mirroring `mmdet3d/models/builder.py:18-102`."""
from ..registry import (
    BACKBONES, DETECTORS, FUSION_LAYERS, HEADS, MIDDLE_ENCODERS, MODELS,
    NECKS, VOXEL_ENCODERS, build_from_cfg)


def build_backbone(cfg, **kwargs):
    return build_from_cfg(cfg, BACKBONES, kwargs or None)


def build_neck(cfg, **kwargs):
    return build_from_cfg(cfg, NECKS, kwargs or None)


def build_head(cfg, **kwargs):
    return build_from_cfg(cfg, HEADS, kwargs or None)


def build_voxel_encoder(cfg, **kwargs):
    return build_from_cfg(cfg, VOXEL_ENCODERS, kwargs or None)


def build_middle_encoder(cfg, **kwargs):
    return build_from_cfg(cfg, MIDDLE_ENCODERS, kwargs or None)


def build_fusion_layer(cfg, **kwargs):
    return build_from_cfg(cfg, FUSION_LAYERS, kwargs or None)


def build_model(cfg, **kwargs):
    return build_from_cfg(cfg, MODELS, kwargs or None)


def build_detector(cfg, train_cfg=None, test_cfg=None):
    """Build a detector; train_cfg/test_cfg may come as separate args
    (the reference's API) or inside cfg."""
    cfg = dict(cfg)
    if train_cfg is not None:
        cfg.setdefault("train_cfg", train_cfg)
    if test_cfg is not None:
        cfg.setdefault("test_cfg", test_cfg)
    return build_from_cfg(cfg, DETECTORS, None)
