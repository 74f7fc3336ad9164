"""PointNet++ ops vs numpy oracles (pattern of reference
tests/test_common_modules/test_pointnet_ops.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from isfusion_tpu.ops.pointnet_ops import (
    ball_query, furthest_point_sample, gather_points, group_points,
    interpolation_weights, knn, square_distance, three_interpolate,
    three_nn)


def test_fps_spread_property():
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(128, 3)).astype(np.float32)
    idx = np.asarray(furthest_point_sample(jnp.asarray(xyz), 16))
    assert len(set(idx.tolist())) == 16
    assert idx[0] == 0
    # greedy invariant: each new pick maximizes min-distance to prior picks
    for i in range(1, 16):
        picked = xyz[idx[:i]]
        d_all = ((xyz[:, None] - picked[None]) ** 2).sum(-1).min(1)
        assert d_all[idx[i]] == d_all.max()


def test_fps_respects_mask():
    xyz = np.zeros((10, 3), np.float32)
    xyz[:, 0] = np.arange(10)
    mask = np.ones(10, bool)
    mask[5:] = False
    idx = np.asarray(furthest_point_sample(jnp.asarray(xyz), 4,
                                           jnp.asarray(mask)))
    assert (idx < 5).all()


def test_knn_matches_numpy():
    rng = np.random.default_rng(1)
    xyz = rng.normal(size=(64, 3)).astype(np.float32)
    q = rng.normal(size=(8, 3)).astype(np.float32)
    idx, d2 = knn(4, jnp.asarray(xyz), jnp.asarray(q))
    ref = np.argsort(((q[:, None] - xyz[None]) ** 2).sum(-1), axis=1)[:, :4]
    got = np.sort(np.asarray(idx), axis=1)
    np.testing.assert_array_equal(got, np.sort(ref, axis=1))


def test_ball_query_radius_and_fill():
    xyz = np.array([[0, 0, 0], [0.1, 0, 0], [5, 0, 0], [0.2, 0, 0]],
                   np.float32)
    q = np.array([[0, 0, 0]], np.float32)
    idx, valid = ball_query(0.5, 3, jnp.asarray(xyz), jnp.asarray(q))
    idx, valid = np.asarray(idx), np.asarray(valid)
    assert set(idx[0][valid[0]].tolist()) == {0, 1, 3}
    # only point 2 is outside; all three slots valid here
    assert valid[0].all()
    # fewer neighbors than slots -> repeat first
    idx2, valid2 = ball_query(0.05, 3, jnp.asarray(xyz), jnp.asarray(q))
    idx2, valid2 = np.asarray(idx2), np.asarray(valid2)
    assert valid2[0, 0] and not valid2[0, 1:].any()
    assert (idx2[0] == idx2[0, 0]).all()


def test_group_and_gather():
    feats = jnp.asarray(np.arange(12, dtype=np.float32).reshape(6, 2))
    idx = jnp.asarray([[0, 2], [5, 5]], jnp.int32)
    g = np.asarray(group_points(feats, idx))
    assert g.shape == (2, 2, 2)
    np.testing.assert_array_equal(g[0, 1], [4, 5])
    s = np.asarray(gather_points(feats, jnp.asarray([3], jnp.int32)))
    np.testing.assert_array_equal(s[0], [6, 7])


def test_three_interpolate_exact_on_source():
    rng = np.random.default_rng(2)
    xyz = rng.normal(size=(32, 3)).astype(np.float32)
    feats = rng.normal(size=(32, 4)).astype(np.float32)
    # querying the source points themselves reproduces their features
    d, idx = three_nn(jnp.asarray(xyz), jnp.asarray(xyz))
    w = interpolation_weights(d)
    out = np.asarray(three_interpolate(jnp.asarray(feats), idx, w))
    np.testing.assert_allclose(out, feats, rtol=1e-4, atol=1e-4)
