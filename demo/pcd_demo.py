#!/usr/bin/env python
"""Point-cloud demo (parity: reference `demo/pcd_demo.py`).

Runs single-sample inference on a .bin/.npy point cloud through a
config's test pipeline and writes BEV imagery + .obj dumps of the
predicted boxes (headless replacement for show_result_meshlab).

Usage:
  python demo/pcd_demo.py POINTS CONFIG [CHECKPOINT_DIR] \
      [--out-dir demo_out] [--score-thr 0.3]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("points")
    ap.add_argument("config")
    ap.add_argument("checkpoint", nargs="?", default=None)
    ap.add_argument("--out-dir", default="demo_out")
    ap.add_argument("--score-thr", type=float, default=0.3)
    args = ap.parse_args()

    from isfusion_tpu.apis.inference import init_model, inference_detector
    from isfusion_tpu.config import Config
    from isfusion_tpu.core.visualizer import draw_bev_png, show_result

    cfg = Config.fromfile(args.config)
    if args.points.endswith(".npy"):
        pts = np.load(args.points)
    else:
        pts = np.fromfile(args.points, np.float32).reshape(-1, 5)

    cap = int(cfg.get("max_points", 250000))
    n = min(len(pts), cap)
    buf = np.zeros((cap, pts.shape[1]), np.float32)
    buf[:n] = pts[:n]
    mask = np.arange(cap) < n
    batch = dict(points=buf[None], points_mask=mask[None])
    # camera-less demo: multimodal models receive blank views
    if "img_scale" in cfg:
        h, w = cfg.img_scale
        nv = int(dict(cfg.model.get("fusion_encoder", {}) or {}).get(
            "num_views", 6))
        batch["img"] = np.zeros((1, nv, h, w, 3), np.float32)
        batch["lidar2img"] = np.broadcast_to(
            np.eye(4, dtype=np.float32), (1, nv, 4, 4)).copy()
        batch["img_view_mask"] = np.zeros((1, nv), bool)

    model, variables, _ = init_model(cfg, args.checkpoint,
                                     batch_example=batch)
    out = inference_detector(model, variables, batch)
    keep = (out["scores"][0] > args.score_thr) & out["mask"][0]
    boxes = out["bboxes"][0][keep]
    os.makedirs(args.out_dir, exist_ok=True)
    png = draw_bev_png(buf[mask], None, boxes,
                       os.path.join(args.out_dir, "pred_bev.png"))
    show_result(buf[mask], None, boxes, args.out_dir, "pred")
    print(f"{keep.sum()} boxes over {args.score_thr}; wrote {png}")


if __name__ == "__main__":
    main()
