"""YOLOX Path-Aggregation FPN (NHWC flax).

Parity: `mmdet3d/models/necks/yolox_pafpn.py:14` (registered capability
surface; mmdet CSPLayer/DarknetBottleneck blocks): top-down pass (1x1
reduce -> nearest 2x upsample -> concat -> CSP layer), bottom-up pass
(3x3 stride-2 downsample -> concat -> CSP layer), per-scale 1x1 output
convs, Swish activations.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import NECKS
from ..layers import ConvModule


class _DarknetBottleneck(nn.Module):
    out_channels: int
    expansion: float = 0.5
    add_identity: bool = True
    norm_cfg: Any = None
    act_cfg: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        hidden = int(self.out_channels * self.expansion)
        y = ConvModule(hidden, kernel_size=1, norm_cfg=dict(self.norm_cfg),
                       act_cfg=dict(self.act_cfg), name="conv1")(
            x, train=train)
        y = ConvModule(self.out_channels, kernel_size=3, padding=1,
                       norm_cfg=dict(self.norm_cfg),
                       act_cfg=dict(self.act_cfg), name="conv2")(
            y, train=train)
        if self.add_identity and x.shape[-1] == self.out_channels:
            y = y + x
        return y


class _CSPLayer(nn.Module):
    """Cross-stage-partial layer (mmdet CSPLayer): split into main (through
    N bottlenecks) and shortcut 1x1 branches, concat, final 1x1."""

    out_channels: int
    num_blocks: int = 1
    expand_ratio: float = 0.5
    norm_cfg: Any = None
    act_cfg: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        mid = int(self.out_channels * self.expand_ratio)
        main = ConvModule(mid, kernel_size=1, norm_cfg=dict(self.norm_cfg),
                          act_cfg=dict(self.act_cfg), name="main_conv")(
            x, train=train)
        short = ConvModule(mid, kernel_size=1, norm_cfg=dict(self.norm_cfg),
                           act_cfg=dict(self.act_cfg), name="short_conv")(
            x, train=train)
        for i in range(self.num_blocks):
            main = _DarknetBottleneck(
                mid, expansion=1.0, norm_cfg=self.norm_cfg,
                act_cfg=self.act_cfg, name=f"block{i}")(main, train=train)
        return ConvModule(self.out_channels, kernel_size=1,
                          norm_cfg=dict(self.norm_cfg),
                          act_cfg=dict(self.act_cfg), name="final_conv")(
            jnp.concatenate([main, short], -1), train=train)


@NECKS.register_module()
class YOLOXPAFPN(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024)
    out_channels: int = 256
    num_csp_blocks: int = 3
    norm_cfg: Any = None
    act_cfg: Any = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        """inputs: list of NHWC maps, fine -> coarse. Returns equal-length
        list at ``out_channels`` each."""
        norm = dict(self.norm_cfg or dict(type="BN2d", momentum=0.03,
                                          eps=0.001))
        act = dict(self.act_cfg or dict(type="swish"))
        n = len(self.in_channels)
        assert len(inputs) == n

        # top-down
        inner = list(inputs)
        for idx in range(n - 1, 0, -1):
            high = ConvModule(int(self.in_channels[idx - 1]), kernel_size=1,
                              norm_cfg=norm, act_cfg=act,
                              name=f"reduce_{n - 1 - idx}")(
                inner[idx], train=train)
            inner[idx] = high
            b, h, w, c = high.shape
            up = jax.image.resize(high, (b, 2 * h, 2 * w, c), "nearest")
            th, tw = inner[idx - 1].shape[1:3]
            up = up[:, :th, :tw]
            inner[idx - 1] = _CSPLayer(
                int(self.in_channels[idx - 1]),
                num_blocks=self.num_csp_blocks, norm_cfg=norm, act_cfg=act,
                name=f"top_down_{n - 1 - idx}")(
                jnp.concatenate([up, inner[idx - 1]], -1), train=train)

        # bottom-up
        outs = [inner[0]]
        for idx in range(n - 1):
            down = ConvModule(int(self.in_channels[idx]), kernel_size=3,
                              stride=2, padding=1, norm_cfg=norm,
                              act_cfg=act, name=f"downsample_{idx}")(
                outs[-1], train=train)
            th, tw = inner[idx + 1].shape[1:3]
            down = down[:, :th, :tw]
            outs.append(_CSPLayer(
                int(self.in_channels[idx + 1]),
                num_blocks=self.num_csp_blocks, norm_cfg=norm, act_cfg=act,
                name=f"bottom_up_{idx}")(
                jnp.concatenate([down, inner[idx + 1]], -1), train=train))

        return [ConvModule(self.out_channels, kernel_size=1, norm_cfg=norm,
                           act_cfg=act, name=f"out_{i}")(o, train=train)
                for i, o in enumerate(outs)]
