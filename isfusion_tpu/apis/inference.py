"""Inference API (parity: `mmdet3d/apis/inference.py` init_model:36,
inference_detector:73)."""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np

from ..config import Config
from ..models import build_detector
from ..parallel.train_step import TrainState


def init_model(config, checkpoint: Optional[str] = None,
               batch_example: Optional[dict] = None):
    """Build a detector from a config file/Config (+ optional orbax
    checkpoint). Returns (model, variables)."""
    if isinstance(config, str):
        config = Config.fromfile(config)
    model = build_detector(
        dict(config.model),
        train_cfg=dict(config.model.get("train_cfg", {}) or {}) or None,
        test_cfg=dict(config.model.get("test_cfg", {}) or {}) or None)
    variables = None
    if batch_example is not None:
        variables = jax.jit(
            lambda r, b: model.init(r, b, train=False, mode="feats"))(
                jax.random.PRNGKey(0), batch_example)
        if checkpoint:
            from ..runner.checkpoint import load_checkpoint
            import optax
            state = TrainState.create(variables, optax.identity())
            abstract = jax.eval_shape(lambda: state)
            state, _ = load_checkpoint(checkpoint, abstract)
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
    model_cfg = config
    return model, variables, model_cfg


def inference_detector(model, variables, batch: dict) -> dict:
    """Single-batch inference; batch follows the framework's padded
    contract. Returns dict(bboxes, scores, labels, mask) numpy."""
    out = jax.jit(
        lambda v, b: model.apply(v, b, train=False, mode="predict"))(
            variables, batch)
    return {k: np.asarray(v) for k, v in jax.device_get(out).items()}
