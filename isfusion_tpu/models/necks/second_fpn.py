"""SECONDFPN neck (parity: `mmdet3d/models/necks/second_fpn.py:12`).

Upsamples each input scale with a deconv (or a stride-1 conv when
``use_conv_for_no_stride``), then concatenates along channels. NHWC.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...registry import NECKS
from ..layers import ConvModule, ConvTransposeModule, resolve_dtype


@NECKS.register_module()
class SECONDFPN(nn.Module):
    in_channels: Sequence[int] = (128, 128, 256)
    out_channels: Sequence[int] = (256, 256, 256)
    upsample_strides: Sequence[int] = (1, 2, 4)
    norm_cfg: Optional[dict] = None
    upsample_cfg: Optional[dict] = None
    conv_cfg: Optional[dict] = None
    use_conv_for_no_stride: bool = False
    axis_name: Optional[str] = None
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x: Sequence[jnp.ndarray], train: bool = False
                 ) -> jnp.ndarray:
        norm = self.norm_cfg or dict(type="BN", eps=1e-3, momentum=0.01)
        dt = resolve_dtype(self.compute_dtype)
        ups = []
        for i, feat in enumerate(x):
            feat = feat.astype(dt or feat.dtype)
            stride = self.upsample_strides[i]
            if stride > 1 or (stride == 1 and not self.use_conv_for_no_stride):
                out = ConvTransposeModule(
                    self.out_channels[i], kernel_size=stride, stride=stride,
                    bias=False, norm_cfg=norm, act_cfg=dict(type="relu"),
                    dtype=dt,
                    axis_name=self.axis_name)(feat, train=train)
            else:
                # stride==1 with use_conv_for_no_stride: plain conv
                out = ConvModule(self.out_channels[i], 1, bias=False,
                                 norm_cfg=norm, act_cfg=dict(type="relu"),
                                 dtype=dt,
                                 axis_name=self.axis_name)(feat, train=train)
            ups.append(out)
        if len(ups) > 1:
            return jnp.concatenate(ups, axis=-1)
        return ups[0]
