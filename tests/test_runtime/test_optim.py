"""Optimizer construction: schedules, paramwise lr_mult, hybrid branches."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from isfusion_tpu.runner.optim import (build_hybrid_optimizer,
                                       build_lr_schedule, build_optimizer)


def test_cyclic_schedule_shape():
    sched = build_lr_schedule(
        dict(policy="cyclic", target_ratio=(10, 1e-4), cyclic_times=1,
             step_ratio_up=0.4), base_lr=1e-4, total_steps=100)
    lrs = np.asarray([float(sched(i)) for i in range(100)])
    np.testing.assert_allclose(lrs[0], 1e-4, rtol=1e-5)  # starts at base
    assert abs(lrs[40] - 1e-3) / 1e-3 < 0.05   # peak at 40% up
    assert lrs[-1] < 1e-6                       # annealed way down


def test_paramwise_lr_mult_scales_updates():
    params = {"img_backbone_m": {"w": jnp.ones((4,))},
              "pts_backbone_m": {"w": jnp.ones((4,))}}
    tx = build_optimizer(
        params, dict(type="AdamW", lr=1e-2, weight_decay=0.0,
                     paramwise_cfg=dict(custom_keys={
                         "img_backbone": dict(lr_mult=0.1)})),
        total_steps=10)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    img = float(jnp.abs(updates["img_backbone_m"]["w"]).mean())
    pts = float(jnp.abs(updates["pts_backbone_m"]["w"]).mean())
    assert img / pts < 0.15  # ~0.1 lr_mult


def test_hybrid_optimizer_branches():
    params = {"img_backbone_m": {"w": jnp.ones((4,))},
              "pts_backbone_m": {"w": jnp.ones((4,))}}
    tx = build_hybrid_optimizer(
        params,
        dict(default=dict(type="AdamW", lr=1e-3, weight_decay=0.0),
             branches={"img_backbone": dict(type="SGD", lr=1e-4,
                                            momentum=0.9,
                                            step_interval=2)}),
        total_steps=10)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, state = tx.update(grads, state, params)
    # first call: img branch accumulates (MultiSteps), no update yet
    assert float(jnp.abs(updates["img_backbone_m"]["w"]).sum()) == 0.0
    assert float(jnp.abs(updates["pts_backbone_m"]["w"]).sum()) > 0.0
    updates, state = tx.update(grads, state, params)
    assert float(jnp.abs(updates["img_backbone_m"]["w"]).sum()) > 0.0
