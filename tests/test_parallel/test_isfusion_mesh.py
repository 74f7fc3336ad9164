"""Flagship (tiny IS-Fusion) data-parallel train-step test on the 8-virtual
-device CPU mesh — SURVEY.md §2.6's TPU-equivalent spec exercised on the
REAL flagship graph (multimodal: Swin+FPN, DynamicVFE, column
SparseEncoder, HSF+IGF fusion, SST, SECONDV2, TransFusion head), so
flagship DP correctness does not hinge on the driver dryrun alone.

Match: DP training of the flagship — `/root/reference/tools/run-nus.sh` +
`mmdet3d/apis/train.py:82-86` (DDP allreduce == psum in-step here).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isfusion_tpu.flagship import build_flagship
from isfusion_tpu.parallel import (
    TrainState, create_mesh, make_train_step, shard_batch)
from isfusion_tpu.runner import build_optimizer


@pytest.fixture(scope="module")
def setup():
    assert jax.device_count() == 8
    model, batch_fn = build_flagship(tiny=True)
    batch = batch_fn(8)
    variables = jax.jit(lambda r, b: model.init(
        r, b, train=True, mode="loss"))(jax.random.PRNGKey(0), batch)
    tx = build_optimizer(
        variables["params"],
        optimizer_cfg=dict(type="AdamW", lr=1e-4, weight_decay=0.01),
        optimizer_config=dict(grad_clip=dict(max_norm=0.01)),
        lr_config=dict(policy="cyclic", target_ratio=(10, 1e-4),
                       cyclic_times=1, step_ratio_up=0.4),
        total_steps=10)
    return model, tx, TrainState.create(variables, tx), batch


@pytest.mark.slow
def test_flagship_mesh_step(setup):
    """8-device shard_map step: finite loss, replicated params, and
    approximate agreement with the single-device step on the same global
    batch (plain-BN shard statistics differ legitimately; sync-BN layers
    psum and agree exactly — see test_train_step.test_sync_bn_*)."""
    model, tx, state, batch = setup
    mesh = create_mesh(data=8)
    step_m = make_train_step(model, tx, mesh=mesh, donate=False)
    rng = jax.random.PRNGKey(1)
    s_m, m_m = step_m(state, shard_batch(batch, mesh), rng)
    loss_m = float(m_m["loss"])
    assert np.isfinite(loss_m)
    assert int(s_m.step) == 1
    # replicated-consistent params across devices
    p = jax.tree_util.tree_leaves(s_m.params)[0]
    shards = [np.asarray(s.data) for s in p.addressable_shards]
    np.testing.assert_allclose(shards[0], shards[-1], atol=1e-6)

    step_s = make_train_step(model, tx, mesh=None, donate=False)
    s_s, m_s = step_s(state, batch, rng)
    loss_s = float(m_s["loss"])
    assert np.isfinite(loss_s)
    np.testing.assert_allclose(loss_m, loss_s, rtol=0.1)
    # one AdamW step with grad-clip 0.01 stays within a tight envelope
    p_m = np.asarray(jax.tree_util.tree_leaves(s_m.params)[0])
    p_s = np.asarray(jax.tree_util.tree_leaves(s_s.params)[0])
    np.testing.assert_allclose(p_m, p_s, atol=5e-3)
