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
    from .train import _device_put_batch
    predict = make_eval_step(model, mesh=mesh)
    results: List[dict] = []
    for batch in loader:
        arrays = _device_put_batch(batch, mesh)
        out = jax.device_get(predict(state, arrays))
        b = out["bboxes"].shape[0]
        for i in range(b):
            results.append({k: np.asarray(v[i]) for k, v in out.items()})
    return results
