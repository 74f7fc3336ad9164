"""RegNet / NoStemRegNet backbones (NHWC flax).

Parity: `mmdet3d/models/backbones/nostem_regnet.py:1-84` (NoStemRegNet =
mmdet RegNet with the stem removed — the voxel encoder acts as the stem)
and mmdet's RegNet (arch parameterisation from "Designing Network Design
Spaces": widths w(i) = w0 + wa*i quantised on a log grid of ratio wm,
grouped bottleneck residual blocks).

TPU-native: NHWC layout, grouped conv via ``feature_group_count``,
BatchNorm folded through `ConvModule`. Output = tuple of stage feature
maps at ``out_indices``.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ...registry import BACKBONES
from ..layers import ConvModule


def generate_regnet(w0: float, wa: float, wm: float, depth: int,
                    quant: int = 8) -> Tuple[list, list]:
    """Per-stage (widths, depths) from the RegNet parameterisation."""
    widths_cont = np.arange(depth) * wa + w0
    ks = np.round(np.log(widths_cont / w0) / np.log(wm))
    widths = w0 * np.power(wm, ks)
    widths = np.round(widths / quant) * quant
    num_stages = len(np.unique(widths))
    widths = widths.astype(int).tolist()
    stage_widths, stage_depths = [], []
    for w in sorted(set(widths)):
        stage_widths.append(w)
        stage_depths.append(widths.count(w))
    assert len(stage_widths) == num_stages
    return stage_widths, stage_depths


def adjust_width_group(widths: Sequence[int], bottleneck_ratio: float,
                       groups: int) -> Tuple[list, list]:
    """Clamp group counts to bottleneck widths and round widths to
    multiples of the group width (mmdet RegNet.adjust_width_group)."""
    bottleneck_width = [int(w * bottleneck_ratio) for w in widths]
    gs = [min(groups, bw) for bw in bottleneck_width]
    bottleneck_width = [int(round(bw / g) * g)
                        for bw, g in zip(bottleneck_width, gs)]
    widths = [int(bw / bottleneck_ratio) for bw in bottleneck_width]
    return widths, gs


class _RegBottleneck(nn.Module):
    """1x1 -> grouped 3x3 (stride) -> 1x1 residual block."""

    out_channels: int
    stride: int = 1
    groups: int = 1
    bottleneck_ratio: float = 1.0
    norm_cfg: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = dict(self.norm_cfg or dict(type="BN2d"))
        width = int(round(self.out_channels * self.bottleneck_ratio /
                          self.groups) * self.groups)
        identity = x
        y = ConvModule(width, kernel_size=1, norm_cfg=norm,
                       act_cfg=dict(type="relu"), name="conv1")(
            x, train=train)
        y = ConvModule(width, kernel_size=3, stride=self.stride, padding=1,
                       groups=self.groups, norm_cfg=norm,
                       act_cfg=dict(type="relu"), name="conv2")(
            y, train=train)
        y = ConvModule(self.out_channels, kernel_size=1, norm_cfg=norm,
                       act_cfg=None, name="conv3")(y, train=train)
        if self.stride != 1 or x.shape[-1] != self.out_channels:
            identity = ConvModule(self.out_channels, kernel_size=1,
                                  stride=self.stride, norm_cfg=norm,
                                  act_cfg=None, name="downsample")(
                x, train=train)
        return nn.relu(y + identity)


@BACKBONES.register_module()
class RegNet(nn.Module):
    """RegNet trunk over NHWC input (stem included)."""

    arch: Any = None
    in_channels: int = 3
    stem_channels: int = 32
    base_channels: int = 32
    strides: Sequence[int] = (2, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    norm_cfg: Any = None
    with_stem: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        arch = dict(self.arch)
        stage_widths, stage_depths = generate_regnet(
            arch["w0"], arch["wa"], arch["wm"], arch["depth"])
        bot_mul = float(arch.get("bot_mul", 1.0))
        stage_widths, groups = adjust_width_group(
            stage_widths, bot_mul, int(arch.get("group_w", 1)))
        norm = dict(self.norm_cfg or dict(type="BN2d"))
        if self.with_stem:
            x = ConvModule(self.stem_channels, kernel_size=3, stride=2,
                           padding=1, norm_cfg=norm,
                           act_cfg=dict(type="relu"), name="stem")(
                x, train=train)
        outs = []
        for i, (w, d) in enumerate(zip(stage_widths, stage_depths)):
            for j in range(d):
                x = _RegBottleneck(
                    w, stride=self.strides[i] if j == 0 else 1,
                    groups=groups[i], bottleneck_ratio=bot_mul,
                    norm_cfg=norm, name=f"stage{i}_block{j}")(
                        x, train=train)
            if i in tuple(self.out_indices):
                outs.append(x)
        return tuple(outs)


@BACKBONES.register_module()
class NoStemRegNet(RegNet):
    """RegNet without the stem (`nostem_regnet.py:6`): the voxel encoder
    plays the stem's role, input is already (N, H, W, base_channels)."""

    with_stem: bool = False
