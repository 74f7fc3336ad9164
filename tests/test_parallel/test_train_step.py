"""Multi-device (8 virtual CPU) data-parallel training-step tests — what the
reference never had (SURVEY.md §4: 'Distributed testing: none')."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isfusion_tpu.models import build_detector
from isfusion_tpu.parallel import (
    TrainState, create_mesh, make_train_step, make_eval_step, shard_batch)
from isfusion_tpu.runner import build_optimizer

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
from test_models.test_pointpillars import tiny_pointpillars_cfg, tiny_batch


@pytest.fixture(scope="module")
def setup():
    assert jax.device_count() == 8
    model = build_detector(tiny_pointpillars_cfg())
    batch = tiny_batch(b=8)
    variables = jax.jit(
        lambda r, b: model.init(r, b, train=False, mode="feats"))(
            jax.random.PRNGKey(0), batch)
    tx = build_optimizer(
        variables["params"],
        optimizer_cfg=dict(type="AdamW", lr=1e-3, weight_decay=0.01),
        optimizer_config=dict(grad_clip=dict(max_norm=35, norm_type=2)),
        lr_config=dict(policy="cyclic", target_ratio=(10, 1e-4),
                       cyclic_times=1, step_ratio_up=0.4),
        total_steps=100)
    state = TrainState.create(variables, tx)
    return model, tx, state, batch


def test_single_device_step(setup):
    model, tx, state, batch = setup
    step = make_train_step(model, tx, mesh=None, donate=False)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss"]))


def test_mesh_step_runs_and_syncs(setup):
    model, tx, state, batch = setup
    mesh = create_mesh(data=8)
    step = make_train_step(model, tx, mesh=mesh, donate=False)
    sbatch = shard_batch(batch, mesh)
    new_state, metrics = step(state, sbatch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # params must remain replicated-consistent: fetch from two devices
    p = jax.tree_util.tree_leaves(new_state.params)[0]
    shards = [np.asarray(s.data) for s in p.addressable_shards]
    np.testing.assert_allclose(shards[0], shards[-1], atol=1e-6)


def test_mesh_matches_single_device(setup):
    """DP over 8 devices vs single-device on the same global batch.

    With plain (non-sync) BatchNorm, per-shard batch statistics legitimately
    differ from global-batch statistics (same as reference DDP + plain BN),
    so only approximate agreement is expected.
    """
    model, tx, state, batch = setup
    mesh = create_mesh(data=8)
    step_m = make_train_step(model, tx, mesh=mesh, donate=False)
    step_s = make_train_step(model, tx, mesh=None, donate=False)
    rng = jax.random.PRNGKey(2)
    s_m, m_m = step_m(state, shard_batch(batch, mesh), rng)
    s_s, m_s = step_s(state, batch, rng)
    np.testing.assert_allclose(float(m_m["loss"]), float(m_s["loss"]),
                               rtol=5e-2)
    # after one Adam step params can differ by up to ~2*lr where grads
    # disagree (BN stats); assert the update stayed in that envelope
    p_m = jax.tree_util.tree_leaves(s_m.params)[0]
    p_s = jax.tree_util.tree_leaves(s_s.params)[0]
    np.testing.assert_allclose(np.asarray(p_m), np.asarray(p_s), atol=5e-3)


def test_sync_bn_matches_global(setup):
    """MaskedBatchNorm with axis_name='data' under shard_map must produce
    exactly the global-batch statistics (NaiveSyncBN parity)."""
    from isfusion_tpu.models.layers import MaskedBatchNorm
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = create_mesh(data=8)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 8, 12)).astype(np.float32) * 3 + 1
    mask = rng.uniform(size=(16, 8)) > 0.3

    sync = MaskedBatchNorm(axis_name="data")
    plain = MaskedBatchNorm()
    variables = plain.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           jnp.asarray(mask), train=False)

    def sharded_apply(xs, ms):
        out, mut = sync.apply(variables, xs, ms, train=True,
                              mutable=["batch_stats"])
        return out, mut

    f = shard_map(sharded_apply, mesh=mesh,
                  in_specs=(P("data"), P("data")),
                  out_specs=(P("data"), P()), check_vma=False)
    out_sync, mut_sync = jax.jit(f)(jnp.asarray(x), jnp.asarray(mask))
    out_glob, mut_glob = plain.apply(variables, jnp.asarray(x),
                                     jnp.asarray(mask), train=True,
                                     mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_sync), np.asarray(out_glob),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(mut_sync["batch_stats"]["mean"]),
        np.asarray(mut_glob["batch_stats"]["mean"]), rtol=1e-5, atol=1e-6)


def test_eval_step_mesh(setup):
    model, tx, state, batch = setup
    mesh = create_mesh(data=8)
    ev = make_eval_step(model, mesh=mesh)
    out = ev(state, shard_batch(batch, mesh))
    assert out["bboxes"].shape[0] == 8
    assert np.isfinite(np.asarray(out["bboxes"])).all()


def test_checkpoint_roundtrip(tmp_path, setup):
    from isfusion_tpu.runner import save_checkpoint, load_checkpoint
    model, tx, state, batch = setup
    work = str(tmp_path / "ckpt")
    save_checkpoint(work, state, step=0, meta=dict(epoch=3))
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        state)
    restored, meta = load_checkpoint(work, abstract)
    assert meta.get("epoch") == 3
    l0 = jax.tree_util.tree_leaves(state.params)[0]
    r0 = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(l0), np.asarray(r0))


def test_mesh_eval_pads_ragged_batches(setup):
    """single_device_test on an 8-device mesh must survive batches whose
    size is not device-divisible (the EvalHook's final val batch with
    drop_last=False) by padding and truncating (r3 review fix)."""
    from isfusion_tpu.apis.test import single_device_test
    model, tx, state, batch = setup
    mesh = create_mesh(data=8)
    ragged = {k: np.asarray(v)[:5] for k, v in batch.items()}
    results = single_device_test(model, state, [ragged], mesh=mesh)
    assert len(results) == 5
    for r in results:
        assert np.isfinite(np.asarray(r["bboxes"], np.float32)).all()
