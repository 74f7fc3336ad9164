"""Sparse conv vs dense-conv oracle (pattern of reference ops/test.py:
CUDA kernel cross-checked against a reference implementation)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isfusion_tpu.ops.sparse import (
    SparseGrid, build_sparse_grid, linearize, sparse_conv3d, sparse_to_dense,
    subm_conv3d)

GRID = (6, 10, 12)  # (nz, ny, nx)


def random_sparse(v_cap=64, n_active=40, c=5, seed=0):
    rng = np.random.default_rng(seed)
    nz, ny, nx = GRID
    lin = rng.choice(nz * ny * nx, size=n_active, replace=False)
    coords = np.stack([lin // (ny * nx), (lin // nx) % ny, lin % nx], -1)
    coords = np.concatenate(
        [coords, np.zeros((v_cap - n_active, 3), coords.dtype)], 0)
    mask = np.arange(v_cap) < n_active
    feats = rng.normal(size=(v_cap, c)).astype(np.float32)
    feats[~mask] = 0
    return build_sparse_grid(jnp.asarray(feats), jnp.asarray(coords),
                             jnp.asarray(mask), GRID)


def dense_conv(dense, weight, stride=(1, 1, 1), padding=(1, 1, 1)):
    """Oracle: dense 3D conv, NDHWC x DHWIO."""
    return jax.lax.conv_general_dilated(
        dense[None], weight, window_strides=stride,
        padding=[(p, p) for p in padding],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0]


def test_subm_conv_matches_dense_at_active_sites():
    sp = random_sparse()
    w = jnp.asarray(np.random.default_rng(1).normal(
        size=(3, 3, 3, 5, 7)).astype(np.float32))
    out = jax.jit(subm_conv3d)(sp, w)
    oracle = dense_conv(sparse_to_dense(sp), w)
    got = np.asarray(out)[np.asarray(sp.mask)]
    exp = np.asarray(oracle)[tuple(np.asarray(sp.coords)[
        np.asarray(sp.mask)].T)]
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_subm_output_zero_at_invalid_slots():
    sp = random_sparse()
    w = jnp.ones((3, 3, 3, 5, 4), jnp.float32)
    out = np.asarray(subm_conv3d(sp, w))
    assert (out[~np.asarray(sp.mask)] == 0).all()


@pytest.mark.parametrize("stride,padding,ksize", [
    ((2, 2, 2), (1, 1, 1), (3, 3, 3)),
    ((2, 1, 1), (0, 0, 0), (3, 1, 1)),  # the SparseEncoder conv_out shape
])
def test_sparse_conv_matches_dense(stride, padding, ksize):
    sp = random_sparse(seed=3)
    w = jnp.asarray(np.random.default_rng(2).normal(
        size=ksize + (5, 6)).astype(np.float32))
    out = jax.jit(lambda s: sparse_conv3d(s, w, stride, padding,
                                          out_cap=128))(sp)
    oracle = dense_conv(sparse_to_dense(sp), w, stride, padding)
    # every active output site must match the dense conv
    m = np.asarray(out.mask)
    got = np.asarray(out.feats)[m]
    exp = np.asarray(oracle)[tuple(np.asarray(out.coords)[m].T)]
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)
    # and every nonzero dense output site must be active in the sparse out
    nz = np.argwhere(np.abs(np.asarray(oracle)).sum(-1) > 1e-5)
    active = {tuple(c) for c in np.asarray(out.coords)[m]}
    for c in nz:
        assert tuple(c) in active


def test_sparse_conv_ids_sorted_for_chaining():
    sp = random_sparse(seed=4)
    w = jnp.ones((3, 3, 3, 5, 4), jnp.float32)
    out = sparse_conv3d(sp, w, (2, 2, 2), (1, 1, 1), out_cap=128)
    ids = np.asarray(out.ids)
    m = np.asarray(out.mask)
    assert (np.diff(ids[m]) > 0).all()          # strictly ascending
    # invalid slots all trail the valid ones
    assert m.argmin() >= m.sum() or m.all()
    # chaining: subm on the downsampled grid still matches its oracle
    w2 = jnp.asarray(np.random.default_rng(5).normal(
        size=(3, 3, 3, 4, 4)).astype(np.float32))
    out2 = subm_conv3d(out, w2)
    oracle = dense_conv(sparse_to_dense(out), w2)
    got = np.asarray(out2)[m]
    exp = np.asarray(oracle)[tuple(np.asarray(out.coords)[m].T)]
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_vmap_batching():
    sps = [random_sparse(seed=s) for s in (7, 8)]
    batched = SparseGrid(
        feats=jnp.stack([s.feats for s in sps]),
        coords=jnp.stack([s.coords for s in sps]),
        ids=jnp.stack([s.ids for s in sps]),
        mask=jnp.stack([s.mask for s in sps]),
        grid=GRID)
    w = jnp.asarray(np.random.default_rng(9).normal(
        size=(3, 3, 3, 5, 7)).astype(np.float32))
    out = jax.vmap(lambda f, c, i, m: subm_conv3d(
        SparseGrid(f, c, i, m, GRID), w))(
            batched.feats, batched.coords, batched.ids, batched.mask)
    for b, sp in enumerate(sps):
        np.testing.assert_allclose(np.asarray(out[b]),
                                   np.asarray(subm_conv3d(sp, w)),
                                   rtol=1e-5, atol=1e-6)


def test_gradients_flow():
    sp = random_sparse(seed=11)
    w = jnp.asarray(np.random.default_rng(12).normal(
        size=(3, 3, 3, 5, 4)).astype(np.float32))

    def loss(w, feats):
        out = subm_conv3d(sp._replace(feats=feats), w)
        return jnp.sum(out ** 2)

    gw, gf = jax.grad(loss, argnums=(0, 1))(w, sp.feats)
    assert np.isfinite(np.asarray(gw)).all()
    assert np.abs(np.asarray(gw)).sum() > 0
    # no gradient into padded feats
    assert (np.asarray(gf)[~np.asarray(sp.mask)] == 0).all()
