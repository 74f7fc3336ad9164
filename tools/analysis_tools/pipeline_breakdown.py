"""End-to-end input-pipeline breakdown for the flagship eval path.

Separates the costs the [eval] steady-state number mixes together:
  1. dataset __getitem__ + collate (python/numpy, GIL-bound parts)
  2. host plan build (numpy sorts, GIL-released parts)
  3. host->device upload of the batch (through the axon tunnel this is
     the dominant artifact: ~30 MB/s for numpy args)
  4. the jitted predict step itself (device-resident inputs)
plus the thread-pool scaling of (1)+(2) (how much a 6-worker loader
actually parallelizes under the GIL).

Usage: python tools/analysis_tools/pipeline_breakdown.py [n_batches]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np

DATA = "data/nuscenes_learn/"


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    import jax
    from isfusion_tpu.config import Config
    from isfusion_tpu.flagship import ISFUSION_CFG
    from isfusion_tpu.models import build_detector
    from isfusion_tpu.datasets import build_dataset
    from isfusion_tpu.datasets.builder import collate_batch
    from isfusion_tpu.ops.host_plan import make_plan_fn
    from isfusion_tpu.parallel.train_step import TrainState, make_eval_step

    cfg = Config.fromfile(ISFUSION_CFG)
    cfg.merge_from_dict({
        "data_root": DATA,
        "data.val.data_root": DATA,
        "data.val.ann_file": DATA + "nuscenes_infos_val.pkl",
        "data.test.data_root": DATA,
        "data.test.ann_file": DATA + "nuscenes_infos_val.pkl"})
    dataset = build_dataset(cfg.data["test"])
    plan_fn = make_plan_fn(dict(cfg.model), train=False)

    # 1. getitem + collate
    t0 = time.perf_counter()
    samples = [dataset[i % len(dataset)] for i in range(n)]
    t_get = (time.perf_counter() - t0) / n
    t0 = time.perf_counter()
    batches = [collate_batch([s]) for s in samples]
    t_col = (time.perf_counter() - t0) / n

    # 2. plan build (serial)
    t0 = time.perf_counter()
    planned = [plan_fn(dict(b)) for b in batches]
    t_plan = (time.perf_counter() - t0) / n

    # thread-pool scaling of the full host job (getitem+collate+plan)
    from concurrent.futures import ThreadPoolExecutor

    def job(i):
        b = collate_batch([dataset[i % len(dataset)]])
        return plan_fn(b)

    for workers in (1, 6):
        ex = ThreadPoolExecutor(workers)
        t0 = time.perf_counter()
        list(ex.map(job, range(n)))
        dt = (time.perf_counter() - t0) / n
        print(f"host job x{n} with {workers} workers: {dt*1e3:8.0f} "
              "ms/batch effective", flush=True)
        ex.shutdown()

    # 3. upload
    sizes = {k: np.asarray(v).nbytes
             for k, v in planned[0].items() if k != "img_metas"
             and not isinstance(v, dict)}
    plan_b = sum(np.asarray(v).nbytes
                 for v in planned[0].get("sparse_plan", {}).values())
    tot = sum(sizes.values()) + plan_b
    top = sorted(sizes.items(), key=lambda kv: -kv[1])[:5]
    print(f"batch bytes: {tot/1e6:.1f} MB (plan {plan_b/1e6:.1f} MB; "
          f"top: {[(k, f'{v/1e6:.1f}MB') for k, v in top]})", flush=True)
    t0 = time.perf_counter()
    dev = []
    for b in planned:
        arrays = {k: v for k, v in b.items() if k != "img_metas"}
        d = jax.device_put(arrays)
        dev.append(d)
    jax.block_until_ready(dev[-1]["points"])
    # tunnel: block_until_ready lies; fetch a scalar
    jax.device_get(dev[-1]["points"].ravel()[0])
    t_up = (time.perf_counter() - t0) / n

    # 4. device step on resident inputs
    model = build_detector(dict(cfg.model), train_cfg=cfg.get("train_cfg"),
                           test_cfg=cfg.get("test_cfg"))
    variables = jax.jit(lambda b: model.init(
        jax.random.PRNGKey(0), b, train=False, mode="feats"))(dev[0])
    import optax
    state = TrainState.create(variables, optax.identity())
    predict = make_eval_step(model)
    out = predict(state, dev[0])
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for d in dev:
        out = predict(state, d)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t_step = (time.perf_counter() - t0) / n

    # 5. unoverlapped serial chain (what a naive loop would pay)
    print(f"getitem {t_get*1e3:7.0f} ms | collate {t_col*1e3:6.0f} ms | "
          f"plan {t_plan*1e3:6.0f} ms | upload {t_up*1e3:6.0f} ms | "
          f"step {t_step*1e3:6.0f} ms", flush=True)
    print(f"serial chain {1e3*(t_get+t_col+t_plan+t_up+t_step):7.0f} "
          f"ms/sample; device-only bound {t_step*1e3:6.0f} ms", flush=True)


if __name__ == "__main__":
    main()
