"""SECOND BEV backbone (+ the staged SECONDV2 used by IS-Fusion).

Parity: `mmdet3d/models/backbones/second.py` (SECOND:11, SECONDV2:99).
NHWC layout. SECONDV2's staged forward re-emits flattened BEV tokens and
coords between stages so the fusion encoder can interleave SST attention
levels with conv stages (`second.py:200-226`).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...registry import BACKBONES
from ..layers import ConvModule, resolve_dtype


class _SECONDBlock(nn.Module):
    out_channels: int
    num_layers: int
    stride: int
    norm_cfg: Optional[dict]
    axis_name: Optional[str] = None
    include_entry: bool = True  # stride-2 SECONDV2 blocks have no entry conv
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = self.norm_cfg or dict(type="BN", eps=1e-3, momentum=0.01)
        dt = resolve_dtype(self.compute_dtype)
        if self.include_entry:
            x = ConvModule(self.out_channels, 3, stride=self.stride,
                           padding=1, bias=False, norm_cfg=norm,
                           act_cfg=dict(type="relu"), dtype=dt,
                           axis_name=self.axis_name)(x, train=train)
        for _ in range(self.num_layers):
            x = ConvModule(self.out_channels, 3, padding=1, bias=False,
                           norm_cfg=norm, act_cfg=dict(type="relu"),
                           dtype=dt,
                           axis_name=self.axis_name)(x, train=train)
        return x


@BACKBONES.register_module()
class SECOND(nn.Module):
    """Multi-scale BEV conv backbone. Input (..., H, W, C) -> tuple of
    feature maps, one per block."""

    in_channels: int = 128
    out_channels: Sequence[int] = (128, 128, 256)
    layer_nums: Sequence[int] = (3, 5, 5)
    layer_strides: Sequence[int] = (2, 2, 2)
    norm_cfg: Optional[dict] = None
    conv_cfg: Optional[dict] = None
    axis_name: Optional[str] = None
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, ...]:
        outs = []
        x = x.astype(resolve_dtype(self.compute_dtype) or x.dtype)
        for i in range(len(self.layer_nums)):
            x = _SECONDBlock(self.out_channels[i], self.layer_nums[i],
                             self.layer_strides[i], self.norm_cfg,
                             self.axis_name,
                             compute_dtype=self.compute_dtype)(x,
                                                               train=train)
            outs.append(x)
        return tuple(outs)


@BACKBONES.register_module()
class SECONDV2(nn.Module):
    """SECOND with per-stage entry points (`second.py:99,200-226`).

    stage='stage1': block0 + a stride-2 downsample layer whose output is
    re-flattened for the next SST level. stage='stage2': block1.
    Call via ``__call__(x, stage, train)``; returns (block_out, ds_out) for
    stage1 and block_out for stage2.
    """

    in_channels: int = 128
    out_channels: Sequence[int] = (128, 256)
    layer_nums: Sequence[int] = (5, 5)
    layer_strides: Sequence[int] = (1, 2)
    norm_cfg: Optional[dict] = None
    conv_cfg: Optional[dict] = None
    axis_name: Optional[str] = None
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, stage: Optional[str] = "stage1",
                 train: bool = False):
        norm = self.norm_cfg or dict(type="BN", eps=1e-3, momentum=0.01)
        x = x.astype(resolve_dtype(self.compute_dtype) or x.dtype)

        def block0(h):
            return _SECONDBlock(self.out_channels[0], self.layer_nums[0],
                                self.layer_strides[0], norm, self.axis_name,
                                compute_dtype=self.compute_dtype,
                                name="block0")(h, train=train)

        def ds(h):
            return ConvModule(self.out_channels[1], 3, stride=2, padding=1,
                              bias=False, norm_cfg=norm,
                              act_cfg=dict(type="relu"),
                              dtype=resolve_dtype(self.compute_dtype),
                              axis_name=self.axis_name,
                              name="ds_layer")(h, train=train)

        def block1(h):
            # stride-2 blocks carry no entry conv in the reference
            # (`second.py:127-139`): just layer_nums[1] convs at 256ch.
            return _SECONDBlock(self.out_channels[1], self.layer_nums[1],
                                1, norm, self.axis_name, include_entry=False,
                                compute_dtype=self.compute_dtype,
                                name="block1")(h, train=train)

        if stage == "stage1":
            out = block0(x)
            return out, ds(out)
        if stage == "stage2":
            return block1(x)
        out0 = block0(x)
        out1 = block1(ds(out0))
        return out0, out1
