"""MultiBackbone: parallel point backbones + feature aggregation.

Parity: `mmdet3d/models/backbones/multi_backbone.py:13-126` — N streams of
PointNet2-style backbones over the same point cloud; per-stream result
dicts are re-keyed with ``suffixes``; the last FP features of every stream
are concatenated channel-wise and passed through a Conv1d-MLP aggregation
producing ``hd_feature`` (H3DNet's input).

TPU-native: channels-last (B, N, C) features; Conv1d == Dense per point.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...registry import BACKBONES, build_from_cfg
from ..layers import Norm, build_activation


@BACKBONES.register_module()
class MultiBackbone(nn.Module):
    num_streams: int = 2
    backbones: Any = None          # dict (replicated) or list of cfgs
    aggregation_mlp_channels: Optional[Sequence[int]] = None
    norm_cfg: Any = None
    act_cfg: Any = None
    suffixes: Sequence[str] = ("net0", "net1")

    @nn.compact
    def __call__(self, points: jnp.ndarray, points_mask: jnp.ndarray,
                 train: bool = False) -> dict:
        cfgs = self.backbones
        if isinstance(cfgs, dict) or hasattr(cfgs, "keys"):
            cfgs = [dict(cfgs) for _ in range(self.num_streams)]
        assert len(cfgs) == self.num_streams
        assert len(self.suffixes) == self.num_streams

        ret = {}
        fp_features = []
        for i, cfg in enumerate(cfgs):
            net = build_from_cfg(dict(cfg), BACKBONES)
            cur = net(points, points_mask, train=train)
            fp_features.append(cur["fp_features"][-1])
            suffix = self.suffixes[i]
            for k, v in cur.items():
                ret[f"{k}_{suffix}" if suffix else k] = v

        out_channels = sum(f.shape[-1] for f in fp_features)
        mlp = list(self.aggregation_mlp_channels) \
            if self.aggregation_mlp_channels is not None else \
            [out_channels // 2, out_channels // self.num_streams]
        x = jnp.concatenate(fp_features, axis=-1)
        norm_cfg = dict(self.norm_cfg or
                        dict(type="BN1d", eps=1e-5, momentum=0.01))
        act = build_activation(dict(self.act_cfg or dict(type="relu")))
        for li, c in enumerate(mlp):
            x = nn.Dense(int(c), name=f"agg_{li}")(x)
            x = Norm(norm_cfg)(x, train=train)
            x = act(x)
        ret["hd_feature"] = x
        return ret
