"""On-device Hungarian vs scipy.optimize.linear_sum_assignment oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from isfusion_tpu.ops.hungarian import assign_proposals, hungarian


@pytest.mark.parametrize("n,m,seed", [
    (1, 1, 0), (3, 5, 1), (8, 8, 2), (16, 40, 3), (64, 200, 4), (5, 7, 5),
])
def test_matches_scipy_cost(n, m, seed):
    rng = np.random.default_rng(seed)
    cost = rng.normal(size=(n, m)).astype(np.float32) * 10
    ours = np.asarray(jax.jit(hungarian)(jnp.asarray(cost)))
    rows, cols = linear_sum_assignment(cost)
    # optimal assignments may differ; total cost must match exactly
    assert len(set(ours.tolist())) == n  # valid matching
    np.testing.assert_allclose(cost[np.arange(n), ours].sum(),
                               cost[rows, cols].sum(), rtol=1e-5)


def test_with_ties_and_duplicates():
    cost = np.array([[1.0, 1.0, 5.0], [1.0, 1.0, 5.0]], np.float32)
    ours = np.asarray(hungarian(jnp.asarray(cost)))
    assert set(ours.tolist()) == {0, 1}


def test_assign_proposals_inverse():
    rng = np.random.default_rng(7)
    cost = rng.normal(size=(20, 6)).astype(np.float32)
    out = np.asarray(assign_proposals(jnp.asarray(cost)))
    matched = out[out >= 0]
    assert len(matched) == 6 and len(set(matched.tolist())) == 6
    rows, cols = linear_sum_assignment(cost.T)
    total_ref = cost.T[rows, cols].sum()
    total_ours = sum(cost[q, g] for q, g in enumerate(out) if g >= 0)
    np.testing.assert_allclose(total_ours, total_ref, rtol=1e-5)


def test_vmap_batched():
    rng = np.random.default_rng(8)
    costs = rng.normal(size=(4, 10, 30)).astype(np.float32)
    outs = np.asarray(jax.jit(jax.vmap(hungarian))(jnp.asarray(costs)))
    for b in range(4):
        rows, cols = linear_sum_assignment(costs[b])
        np.testing.assert_allclose(
            costs[b][np.arange(10), outs[b]].sum(),
            costs[b][rows, cols].sum(), rtol=1e-5)
