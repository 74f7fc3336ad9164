"""Learning sanity: a few optimizer steps on one fixed batch must reduce
the loss. Catches target/sign/assignment bugs that forward-shape tests
cannot (no reference weights exist to compare against)."""
import sys
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from isfusion_tpu.models import build_detector  # noqa: E402
from isfusion_tpu.parallel.train_step import (TrainState,  # noqa: E402
                                              make_train_step, total_loss)
from isfusion_tpu.runner.optim import build_optimizer  # noqa: E402


def overfit(model, batch, steps=30, lr=3e-3, clip=10.0):
    variables = jax.jit(
        lambda r, b: model.init(r, b, train=True, mode="loss"))(
            jax.random.PRNGKey(0), batch)
    tx = build_optimizer(
        variables["params"], dict(type="AdamW", lr=lr, weight_decay=0.0),
        optimizer_config=dict(grad_clip=dict(max_norm=clip)),
        total_steps=steps)
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx, mesh=None, donate=False)
    losses = []
    for i in range(steps):
        state, metrics = step(state, batch,
                              jax.random.fold_in(jax.random.PRNGKey(1), i))
        losses.append(float(metrics["loss"]))
    return losses


@pytest.mark.slow
def test_pointpillars_overfits():
    from test_models.test_pointpillars import (tiny_pointpillars_cfg,
                                               tiny_batch)
    model = build_detector(tiny_pointpillars_cfg())
    losses = overfit(model, tiny_batch(), steps=30)
    assert losses[-1] < losses[0] * 0.7, losses[::6]


@pytest.mark.slow
def test_isfusion_overfits():
    """Regression guard for the masked-view gradient explosion: dropped
    camera views once leaked 1e27-scale gradients through zero-variance
    LayerNorms, zeroing every update via global-norm clipping."""
    from test_models.test_isfusion import tiny_isfusion_cfg, tiny_batch
    model = build_detector(tiny_isfusion_cfg())
    losses = overfit(model, tiny_batch(), steps=30, lr=3e-3, clip=35.0)
    assert losses[-1] < losses[0] * 0.5, losses[::6]


@pytest.mark.slow
def test_centerpoint_overfits():
    from test_models.test_centerpoint import (tiny_centerpoint_cfg,
                                              tiny_batch)
    model = build_detector(tiny_centerpoint_cfg())
    losses = overfit(model, tiny_batch(), steps=30, lr=3e-3)
    assert losses[-1] < losses[0] * 0.7, losses[::6]
