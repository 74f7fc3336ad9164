"""ResNet image backbone (flax, NHWC).

Parity: mmdet ResNet as consumed by the reference's FCOS3D / ImVoxelNet
configs (`configs/fcos3d/*`: ResNet-101 w/ out_indices (0,1,2,3), BN,
optionally frozen stages). Standard bottleneck/basic blocks; dilation and
DCN variants are out of scope (the flagship path never uses them).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...registry import BACKBONES
from ..layers import Norm


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    norm_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = dict(self.norm_cfg or dict(type="BN"))
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, name="conv1")(x)
        out = Norm(norm, name="bn1")(out, train=train)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      name="conv2")(out)
        out = Norm(norm, name="bn2")(out, train=train)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = nn.Conv(self.planes, (1, 1), strides=self.stride,
                               use_bias=False, name="downsample")(x)
            identity = Norm(norm, name="downsample_bn")(identity,
                                                        train=train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    norm_cfg: Optional[dict] = None
    expansion: int = 4
    # mmcv ResNet style: 'pytorch' strides on conv2, 'caffe' on conv1
    # (the reference FCOS3D checkpoint is ResNet-101-caffe,
    # `configs/fcos3d/fcos3d_r101_caffe_fpn_gn-head_2x8_1x_nus-mono3d.py`)
    style: str = "pytorch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = dict(self.norm_cfg or dict(type="BN"))
        identity = x
        out_ch = self.planes * self.expansion
        s1, s2 = (self.stride, 1) if self.style == "caffe" \
            else (1, self.stride)
        out = nn.Conv(self.planes, (1, 1), strides=s1, use_bias=False,
                      name="conv1")(x)
        out = Norm(norm, name="bn1")(out, train=train)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=s2, padding=1,
                      use_bias=False, name="conv2")(out)
        out = Norm(norm, name="bn2")(out, train=train)
        out = nn.relu(out)
        out = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(out)
        out = Norm(norm, name="bn3")(out, train=train)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = nn.Conv(out_ch, (1, 1), strides=self.stride,
                               use_bias=False, name="downsample")(x)
            identity = Norm(norm, name="downsample_bn")(identity,
                                                        train=train)
        return nn.relu(out + identity)


ARCH = {18: (BasicBlock, (2, 2, 2, 2)),
        34: (BasicBlock, (3, 4, 6, 3)),
        50: (Bottleneck, (3, 4, 6, 3)),
        101: (Bottleneck, (3, 4, 23, 3)),
        152: (Bottleneck, (3, 8, 36, 3))}


@BACKBONES.register_module()
class ResNet(nn.Module):
    depth: int = 50
    in_channels: int = 3
    base_channels: int = 64
    num_stages: int = 4
    strides: Sequence[int] = (1, 2, 2, 2)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = -1
    norm_cfg: Optional[dict] = None
    norm_eval: bool = True
    style: str = "pytorch"
    init_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, ...]:
        block_cls, layers = ARCH[int(self.depth)]
        norm = dict(self.norm_cfg or dict(type="BN"))
        # frozen_stages / norm_eval: BN uses running stats when not train
        x = nn.Conv(self.base_channels, (7, 7), strides=2, padding=3,
                    use_bias=False, name="conv1")(x)
        x = Norm(norm, name="bn1")(x, train=train and not self.norm_eval)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        outs = []
        bn_train = train and not self.norm_eval
        for i in range(self.num_stages):
            planes = self.base_channels * (2 ** i)
            for j in range(layers[i]):
                kw = dict(style=self.style) if block_cls is Bottleneck \
                    else {}
                x = block_cls(planes,
                              stride=self.strides[i] if j == 0 else 1,
                              norm_cfg=norm,
                              name=f"layer{i + 1}_{j}", **kw)(x,
                                                              train=bn_train)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)
