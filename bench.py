"""Benchmark harness: prints ONE JSON line with the headline metric.

Measures flagship-model training throughput (samples/sec) on one chip with
synthetic fixed-shape nuScenes-scale inputs. Baseline: the reference's
published PointPillars training throughput, 107 samples/s on 8 GPUs
(= 13.4 samples/s/GPU, `docs/benchmarks.md:22`); vs_baseline is the
per-chip ratio against that. The flagship config is upgraded to IS-Fusion
as the framework grows (see isfusion_tpu/flagship.py).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_SAMPLES_PER_SEC_PER_DEVICE = 107.0 / 8.0  # PointPillars, docs/benchmarks.md:22


def main() -> None:
    import jax
    from isfusion_tpu.flagship import build_flagship
    from isfusion_tpu.parallel.train_step import TrainState, make_train_step
    from isfusion_tpu.runner.optim import build_optimizer

    batch_size = int(os.environ.get("BENCH_BATCH", "4"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    warmup = int(os.environ.get("BENCH_WARMUP", "3"))

    model, batch_fn = build_flagship()
    batch = batch_fn(batch_size)
    variables = jax.jit(
        lambda r: model.init(r, batch, train=True, mode="loss"))(
            jax.random.PRNGKey(0))
    tx = build_optimizer(
        variables["params"],
        optimizer_cfg=dict(type="AdamW", lr=1e-4, weight_decay=0.01),
        optimizer_config=dict(grad_clip=dict(max_norm=0.01)),
        lr_config=None, total_steps=steps + warmup)
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx, mesh=None, donate=False)

    rng = jax.random.PRNGKey(1)
    for i in range(warmup):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
    # block_until_ready does not synchronize through the axon tunnel;
    # fetching the value does. Steps are sequential via the state thread,
    # so fetching the last loss forces the whole timed span.
    float(jax.device_get(metrics["loss"]))

    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step(state, batch, jax.random.fold_in(rng, 100 + i))
    float(jax.device_get(metrics["loss"]))
    dt = time.perf_counter() - t0

    sps = batch_size * steps / dt
    print(json.dumps({
        "metric": "flagship_train_samples_per_sec_per_chip",
        "value": round(sps, 3),
        "unit": "samples/s",
        "vs_baseline": round(sps / REFERENCE_SAMPLES_PER_SEC_PER_DEVICE, 3),
    }))


if __name__ == "__main__":
    main()
