#!/usr/bin/env python
"""Inference throughput benchmark (parity: reference
`tools/analysis_tools/benchmark.py` — samples/s with warmup skip).

Runs the config's model on synthetic fixed-shape batches on the current
device. Note: through the axon TPU tunnel, only ``jax.device_get`` reliably
synchronizes, so each timed step fetches a scalar reduction.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--samples", type=int, default=50)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=1)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from isfusion_tpu.config import Config
    from isfusion_tpu.models import build_detector
    from isfusion_tpu.flagship import (synthetic_points_batch,
                                       synthetic_multimodal_batch)

    cfg = Config.fromfile(args.config)
    model = build_detector(dict(cfg.model))
    if cfg.model.get("img_backbone") or cfg.model.get("backbone"):
        batch = synthetic_multimodal_batch(args.batch_size)
    else:
        batch = synthetic_points_batch(args.batch_size)
    variables = jax.jit(
        lambda r, b: model.init(r, b, train=False, mode="feats"))(
            jax.random.PRNGKey(0), batch)
    fwd = jax.jit(
        lambda v, b: model.apply(v, b, train=False, mode="predict"))

    def sync(out):
        return float(jax.device_get(jnp.sum(out["bboxes"])))

    for _ in range(args.warmup):
        sync(fwd(variables, batch))
    t0 = time.perf_counter()
    for i in range(args.samples):
        b2 = dict(batch)
        b2["points"] = batch["points"] + 1e-4 * i
        sync(fwd(variables, b2))
    dt = time.perf_counter() - t0
    sps = args.samples * args.batch_size / dt
    print(f"throughput: {sps:.2f} samples/s "
          f"({dt / args.samples * 1000:.1f} ms/batch)")


if __name__ == "__main__":
    main()
