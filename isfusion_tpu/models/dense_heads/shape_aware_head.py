"""SSN's shape-aware anchor head.

Parity: `mmdet3d/models/dense_heads/shape_aware_head.py` —
`BaseShapeHead:17` (per-shape-group branch: strided shared convs +
1x1 cls/reg/dir convs) and `ShapeAwareHead:166` (Anchor3DHead whose
anchors/predictions are grouped by object shape: each task covers a
slice of the anchor generator's size list and runs its own branch at
its own stride).

TPU adaptation: each task is emitted as one "level" of the base
Anchor3DHead prediction format ((B, H_t, W_t, A_t * C) maps), so the
inherited loss/decode machinery applies unchanged; `anchors_for`
generates each task's anchors from its size slice at its strided
feature-map size.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ...registry import ANCHOR_GENERATORS, HEADS
from ...registry import build_from_cfg
from ..layers import ConvModule
from .anchor3d_head import Anchor3DHead


@HEADS.register_module()
class ShapeAwareHead(Anchor3DHead):
    """tasks: list of dicts with num_class, shared_conv_channels,
    shared_conv_strides (`shape_aware_head.py:177`)."""

    tasks: Any = None

    def _task_specs(self):
        gen_cfg = dict(self.anchor_generator or {})
        sizes = list(gen_cfg.get("sizes", [[1.6, 3.9, 1.56]]))
        ranges = list(gen_cfg.get("ranges", [[0, -40, -1.78, 70, 40,
                                              -1.78]]))
        if len(ranges) == 1:
            ranges = ranges * len(sizes)
        rotations = list(gen_cfg.get("rotations", [0.0, 1.5707963]))
        specs = []
        ptr = 0
        for task in (self.tasks or []):
            n = int(task["num_class"])
            specs.append(dict(
                sizes=sizes[ptr:ptr + n],
                ranges=ranges[ptr:ptr + n],
                rotations=rotations,
                channels=list(task.get("shared_conv_channels", (64, 64))),
                strides=list(task.get("shared_conv_strides", (1, 1))),
                num_class=n,
            ))
            ptr += n
        return specs, gen_cfg

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        """feats: single-level list [(B, H, W, C)]. Returns one pseudo
        -level per task in the Anchor3DHead prediction format."""
        x_in = feats[0] if isinstance(feats, (list, tuple)) else feats
        specs, _ = self._task_specs()
        outs = []
        for ti, spec in enumerate(specs):
            x = x_in
            for ci, (ch, st) in enumerate(zip(spec["channels"],
                                              spec["strides"])):
                x = ConvModule(int(ch), kernel_size=3, stride=int(st),
                               padding=1, norm_cfg=dict(type="BN2d"),
                               name=f"task{ti}_conv{ci}")(x, train=train)
            nba = len(spec["sizes"]) * len(spec["rotations"])
            cls = nn.Conv(nba * self.num_classes, (1, 1),
                          bias_init=nn.initializers.constant(-4.595),
                          name=f"task{ti}_conv_cls")(x)
            reg = nn.Conv(nba * self.box_code_size, (1, 1),
                          name=f"task{ti}_conv_reg")(x)
            dirp = nn.Conv(nba * 2, (1, 1),
                           name=f"task{ti}_conv_dir_cls")(x) \
                if self.use_direction_classifier else None
            outs.append((cls, reg, dirp))
        return outs

    def anchors_for(self, featmap_sizes) -> np.ndarray:
        """Per-task anchors at each task's strided feature-map size
        (`_init_layers:193` slices the generator's size list per task)."""
        specs, gen_cfg = self._task_specs()
        assert len(featmap_sizes) == len(specs)
        all_anchors = []
        for fs, spec in zip(featmap_sizes, specs):
            cfg = dict(gen_cfg)
            cfg.update(type=gen_cfg.get("type", "Anchor3DRangeGenerator"),
                       sizes=spec["sizes"], ranges=spec["ranges"],
                       rotations=spec["rotations"])
            gen = build_from_cfg(cfg, ANCHOR_GENERATORS)
            lv = gen.grid_anchors([tuple(fs)])[0]
            all_anchors.append(np.asarray(lv).reshape(-1, lv.shape[-1]))
        return np.concatenate(all_anchors)
