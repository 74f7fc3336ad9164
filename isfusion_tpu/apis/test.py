"""Evaluation API.

Parity: `mmdet3d/apis/test.py` (single_gpu_test:142 / multi_gpu_test:17 +
collect_results). TPU-native: per-step jitted predict over the mesh; the
fixed-shape padded outputs make cross-host collection a
``process_allgather`` instead of the reference's tmpdir pickle shards.
"""
from __future__ import annotations

from typing import List, Optional

import jax
import numpy as np

from ..parallel.train_step import TrainState, make_eval_step


def single_device_test(model, state: TrainState, loader,
                       mesh=None) -> List[dict]:
    """Run inference over a DataLoader; returns per-sample numpy dicts
    (bboxes/scores/labels/mask) aligned with dataset order."""
    import sys
    import time

    from .train import _device_put_batch
    predict = make_eval_step(model, mesh=mesh)
    n_dev = int(np.prod(list(mesh.shape.values()))) if mesh is not None \
        else 1
    results: List[dict] = []
    t_post_compile = None   # wall clock from after the first (compiling)
    n_post = 0              # batch — the steady-state throughput number
    for batch in loader:
        arrays = {k: v for k, v in batch.items() if k != "img_metas"} \
            if isinstance(batch, dict) else batch
        b_true = arrays["points" if "points" in arrays else
                        next(iter(arrays))].shape[0]
        if n_dev > 1 and b_true % n_dev:
            # mesh-sharded eval needs a device-divisible batch; pad by
            # repeating the first sample and truncate the results (the
            # final val batch is ragged when drop_last=False). tree_map
            # handles nested entries (e.g. the host sparse_plan dict).
            pad = n_dev - b_true % n_dev
            arrays = jax.tree_util.tree_map(
                lambda v: np.concatenate(
                    [np.asarray(v)] + [np.asarray(v)[:1]] * pad, axis=0),
                arrays)
        arrays = _device_put_batch(arrays, mesh)
        out = jax.device_get(predict(state, arrays))
        for i in range(b_true):
            results.append({k: np.asarray(v[i]) for k, v in out.items()})
        if t_post_compile is None:
            t_post_compile = time.perf_counter()
        else:
            n_post += b_true
    if n_post:
        dt = time.perf_counter() - t_post_compile
        print(f"[eval] steady-state wall: {n_post} samples / {dt:.1f} s "
              f"= {n_post / dt:.3f} samples/s (input pipeline + device, "
              "first batch excluded)", file=sys.stderr, flush=True)
    return results
