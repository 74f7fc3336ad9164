#!/usr/bin/env python
"""Convert a reference (PyTorch mmdet3d) IS-Fusion checkpoint to an orbax
checkpoint loadable by tools/test.py.

Usage:
  python tools/model_converters/convert_reference_ckpt.py \
      <reference.pth> <config.py> <out_work_dir>

The converter covers the full detector tree (see
isfusion_tpu/runner/full_ckpt_convert.py); any unconverted parameter paths
are listed and left at their initialized values.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("config")
    ap.add_argument("out_dir")
    args = ap.parse_args()

    import jax
    from isfusion_tpu.config import Config
    from isfusion_tpu.flagship import synthetic_multimodal_batch
    from isfusion_tpu.models import build_detector
    from isfusion_tpu.runner.ckpt_convert import load_torch_checkpoint
    from isfusion_tpu.runner.full_ckpt_convert import \
        convert_detector_torch_to_flax
    from isfusion_tpu.runner.checkpoint import save_checkpoint

    cfg = Config.fromfile(args.config)
    model = build_detector(dict(cfg.model))
    batch = synthetic_multimodal_batch(1, num_points=20000)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), batch, train=False,
                           mode="feats"))
    import numpy as np
    variables = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), variables)

    sd = load_torch_checkpoint(args.checkpoint)
    converted, missing = convert_detector_torch_to_flax(sd, variables)
    n = len(jax.tree_util.tree_leaves(variables))
    print(f"converted {n - len(missing)}/{n} parameters")
    if missing:
        print("unconverted (kept at init):")
        for m in missing[:40]:
            print("  ", m)

    save_checkpoint(args.out_dir, dict(
        params=converted["params"],
        batch_stats=converted["batch_stats"]), step=0,
        meta=dict(source=os.path.basename(args.checkpoint)))
    print(f"wrote orbax checkpoint to {args.out_dir}")


if __name__ == "__main__":
    main()
