"""Column-sparse conv engine vs dense-conv + site-engine oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isfusion_tpu.ops.sparse import build_sparse_grid, sparse_to_dense
from isfusion_tpu.ops.sparse_cols import (
    ColumnGrid, build_column_grid, column_rulebook, column_sites,
    column_to_dense, dilate_columns, dilate_columns_subm, expand_columns,
    sparse_conv_col, sparse_conv_col_dil, subm_conv_col, subm_conv_col_dil,
    zconv_col)

GRID = (6, 10, 12)  # (nz, ny, nx)


def random_sites(v_cap=64, n_active=40, c=5, seed=0):
    rng = np.random.default_rng(seed)
    nz, ny, nx = GRID
    lin = rng.choice(nz * ny * nx, size=n_active, replace=False)
    coords = np.stack([lin // (ny * nx), (lin // nx) % ny, lin % nx], -1)
    coords = np.concatenate(
        [coords, np.zeros((v_cap - n_active, 3), coords.dtype)], 0)
    mask = np.arange(v_cap) < n_active
    feats = rng.normal(size=(v_cap, c)).astype(np.float32)
    feats[~mask] = 0
    return (jnp.asarray(feats), jnp.asarray(coords.astype(np.int32)),
            jnp.asarray(mask))


def dense_of(feats, coords, mask):
    sp = build_sparse_grid(feats, coords, mask, GRID)
    return np.asarray(sparse_to_dense(sp))


def dense_conv(dense, weight, stride=(1, 1, 1), padding=(1, 1, 1)):
    return jax.lax.conv_general_dilated(
        jnp.asarray(dense)[None], weight, window_strides=stride,
        padding=[(p, p) for p in padding],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0]


def site_map(cg: ColumnGrid):
    coords, feats, mask = (np.asarray(a) for a in column_sites(cg))
    return {tuple(c): f for c, f, m in zip(coords, feats, mask) if m}


def test_build_column_grid_roundtrip():
    feats, coords, mask = random_sites()
    cg = build_column_grid(feats, coords, mask, GRID, col_cap=64)
    dense = dense_of(feats, coords, mask)
    nz, ny, nx = GRID
    got = np.asarray(column_to_dense(cg)).reshape(ny, nx, nz, 5)
    np.testing.assert_allclose(got, dense.transpose(1, 2, 0, 3), atol=0)
    # zmask matches exactly the occupied sites
    sites = site_map(cg)
    occ = {tuple(c) for c in np.asarray(coords)[np.asarray(mask)]}
    assert set(sites) == occ


def test_subm_conv_col_matches_dense():
    feats, coords, mask = random_sites()
    cg = build_column_grid(feats, coords, mask, GRID, col_cap=64)
    w = jnp.asarray(np.random.default_rng(1).normal(
        size=(3, 3, 3, 5, 7)).astype(np.float32))
    out = jax.jit(subm_conv_col)(cg, w)
    oracle = np.asarray(dense_conv(dense_of(feats, coords, mask), w))
    got = site_map(cg.replace(feats=out))
    for c, f in got.items():
        np.testing.assert_allclose(f, oracle[c], rtol=1e-4, atol=1e-5)


def test_subm_conv_col_rulebook_reuse_and_x_adjacency():
    # adjacent-x sites exercise the roll fast path
    nz, ny, nx = GRID
    coords = np.array([[2, 4, 5], [2, 4, 6], [2, 4, 7], [3, 4, 6],
                       [2, 5, 6], [0, 0, 0], [5, 9, 11], [2, 4, 0],
                       [2, 4, 11]], np.int32)
    n = len(coords)
    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
    coords = jnp.asarray(np.concatenate(
        [coords, np.zeros((16 - n, 3), np.int32)]))
    mask = jnp.asarray(np.arange(16) < n)
    feats = jnp.where(mask[:, None], feats, 0.0)
    cg = build_column_grid(feats, coords, mask, GRID, col_cap=16)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 6)).astype(np.float32))
    rb = column_rulebook(cg)
    out = subm_conv_col(cg, w, rb)
    oracle = np.asarray(dense_conv(dense_of(feats, coords, mask), w))
    for c, f in site_map(cg.replace(feats=out)).items():
        np.testing.assert_allclose(f, oracle[c], rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("stride,padding", [
    ((2, 2, 2), (1, 1, 1)),
    ((1, 1, 1), (0, 0, 0)),
])
def test_sparse_conv_col_matches_dense(stride, padding):
    feats, coords, mask = random_sites(seed=3)
    cg = build_column_grid(feats, coords, mask, GRID, col_cap=64)
    w = jnp.asarray(np.random.default_rng(2).normal(
        size=(3, 3, 3, 5, 6)).astype(np.float32))
    out = jax.jit(lambda g: sparse_conv_col(g, w, stride, padding,
                                            out_col_cap=80))(cg)
    oracle = np.asarray(dense_conv(dense_of(feats, coords, mask), w,
                                   stride, padding))
    got = site_map(out)
    for c, f in got.items():
        np.testing.assert_allclose(f, oracle[c], rtol=1e-4, atol=1e-5)
    # all nonzero oracle sites are active (no dropped output sites)
    nzs = np.argwhere(np.abs(oracle).sum(-1) > 1e-5)
    for c in nzs:
        assert tuple(c) in got


def test_zconv_col_matches_dense():
    feats, coords, mask = random_sites(seed=5)
    cg = build_column_grid(feats, coords, mask, GRID, col_cap=64)
    w = jnp.asarray(np.random.default_rng(4).normal(
        size=(3, 1, 1, 5, 6)).astype(np.float32))
    out = jax.jit(lambda g: zconv_col(g, w, stride=2, padding=0))(cg)
    oracle = np.asarray(dense_conv(dense_of(feats, coords, mask), w,
                                   (2, 1, 1), (0, 0, 0)))
    for c, f in site_map(out).items():
        np.testing.assert_allclose(f, oracle[c], rtol=1e-4, atol=1e-5)
    nzs = np.argwhere(np.abs(oracle).sum(-1) > 1e-5)
    got = site_map(out)
    for c in nzs:
        assert tuple(c) in got


@pytest.mark.parametrize("seed,n_active", [(0, 40), (11, 55), (12, 10)])
def test_subm_conv_col_dil_matches_dense(seed, n_active):
    """The factorized (roll + 2-gather) fast path vs the dense oracle."""
    feats, coords, mask = random_sites(seed=seed, n_active=n_active)
    cg = build_column_grid(feats, coords, mask, GRID, col_cap=64)
    dil, rb = dilate_columns(cg, dil_cap=192)
    w = jnp.asarray(np.random.default_rng(seed + 1).normal(
        size=(3, 3, 3, 5, 7)).astype(np.float32))
    out = jax.jit(lambda g, rs, rf: subm_conv_col_dil(g, w, (rs, rf)))(
        dil, *rb)
    oracle = np.asarray(dense_conv(dense_of(feats, coords, mask), w))
    got = site_map(dil.replace(feats=out))
    occ = {tuple(c) for c in np.asarray(coords)[np.asarray(mask)]}
    assert set(got) == occ  # dilation slots carry no active sites
    for c, f in got.items():
        np.testing.assert_allclose(f, oracle[c], rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("stride,padding,seed", [
    ((2, 2, 2), (1, 1, 1), 3),
    ((2, 2, 2), (0, 1, 1), 21),
    ((1, 1, 1), (1, 1, 1), 22),
])
def test_sparse_conv_col_dil_matches_dense(stride, padding, seed):
    """The u-factorized strided conv (3 gathers) vs the dense oracle."""
    feats, coords, mask = random_sites(seed=seed)
    cg = build_column_grid(feats, coords, mask, GRID, col_cap=64)
    dil, _ = dilate_columns(cg, dil_cap=192)
    w = jnp.asarray(np.random.default_rng(seed).normal(
        size=(3, 3, 3, 5, 6)).astype(np.float32))
    cap = 512 if stride == (1, 1, 1) else 96  # stride-1 dilates ~9x
    out = jax.jit(lambda g: sparse_conv_col_dil(
        g, w, stride, padding, out_col_cap=cap))(dil)
    oracle = np.asarray(dense_conv(dense_of(feats, coords, mask), w,
                                   stride, padding))
    got = site_map(out)
    for c, f in got.items():
        np.testing.assert_allclose(f, oracle[c], rtol=1e-4, atol=1e-5)
    nzs = np.argwhere(np.abs(oracle).sum(-1) > 1e-5)
    for c in nzs:
        assert tuple(c) in got


def test_dilate_columns_embeds_and_zeroes():
    feats, coords, mask = random_sites(seed=2)
    cg = build_column_grid(feats, coords, mask, GRID, col_cap=64)
    dil, rb = dilate_columns(cg, dil_cap=192)
    # active sites survive with identical features
    a, b = site_map(dil), site_map(cg)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=0)
    # dilated table contains every x-neighbor id of an active column
    ids = np.asarray(dil.ids)[np.asarray(dil.cmask)]
    nx = GRID[2]
    for i in np.asarray(cg.ids)[np.asarray(cg.cmask)]:
        if i % nx + 1 < nx:
            assert i + 1 in ids
        if i % nx > 0:
            assert i - 1 in ids


def test_column_cap_drops_overflow_columns():
    feats, coords, mask = random_sites(n_active=50)
    cg = build_column_grid(feats, coords, mask, GRID, col_cap=8)
    assert int(cg.cmask.sum()) == 8
    # every surviving site's features are intact
    dense = dense_of(feats, coords, mask)
    for c, f in site_map(cg).items():
        np.testing.assert_allclose(f, dense[c], atol=0)


def test_gradients_flow():
    feats, coords, mask = random_sites()
    cg = build_column_grid(feats, coords, mask, GRID, col_cap=64)
    w = jnp.ones((3, 3, 3, 5, 4), jnp.float32) * 0.1

    def loss(w, f):
        out = subm_conv_col(cg.replace(feats=f), w)
        return jnp.sum(out ** 2)

    gw, gf = jax.grad(loss, argnums=(0, 1))(w, cg.feats)
    assert np.isfinite(np.asarray(gw)).all()
    assert np.isfinite(np.asarray(gf)).all()
    assert float(jnp.abs(gw).sum()) > 0


def test_vmap_batching():
    f1, c1, m1 = random_sites(seed=7)
    f2, c2, m2 = random_sites(seed=8, n_active=30)
    w = jnp.asarray(np.random.default_rng(9).normal(
        size=(3, 3, 3, 5, 6)).astype(np.float32))

    def run(f, c, m):
        cg = build_column_grid(f, c, m, GRID, col_cap=64)
        return subm_conv_col(cg, w)

    batched = jax.vmap(run)(jnp.stack([f1, f2]), jnp.stack([c1, c2]),
                            jnp.stack([m1, m2]))
    np.testing.assert_allclose(np.asarray(batched[0]),
                               np.asarray(run(f1, c1, m1)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(batched[1]),
                               np.asarray(run(f2, c2, m2)), rtol=1e-5)


@pytest.mark.parametrize("seed,n_active", [(0, 40), (11, 55), (12, 10)])
def test_subm_conv_refined_dilation_matches_full(seed, n_active):
    """Subm convs on the REFINED dilation (dilate_columns_subm) +
    expand_columns == the same convs on the full dilation: the refined
    table is the exact consumption set of the u-factorization."""
    feats, coords, mask = random_sites(seed=seed, n_active=n_active)
    cg = build_column_grid(feats, coords, mask, GRID, col_cap=64)
    rng = np.random.default_rng(seed + 5)
    w1 = jnp.asarray(rng.normal(size=(3, 3, 3, 5, 7)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(3, 3, 3, 7, 7)).astype(np.float32))

    dil, rb = dilate_columns(cg, dil_cap=192)
    ref = dil.replace(feats=subm_conv_col_dil(dil, w1, rb))
    ref = ref.replace(feats=subm_conv_col_dil(ref, w2, rb))

    sub, srb, exp = jax.jit(
        lambda g: dilate_columns_subm(g, dil_cap=192, subm_cap=160))(cg)
    # the refined table really is smaller than the full dilation here
    assert int(sub.cmask.sum()) < int(dil.cmask.sum())
    got = sub.replace(feats=subm_conv_col_dil(sub, w1, srb))
    got = got.replace(feats=subm_conv_col_dil(got, w2, srb))
    full = jax.jit(expand_columns)(got, exp)

    np.testing.assert_array_equal(np.asarray(full.ids), np.asarray(ref.ids))
    np.testing.assert_array_equal(np.asarray(full.cmask),
                                  np.asarray(ref.cmask))
    np.testing.assert_array_equal(np.asarray(full.zmask),
                                  np.asarray(ref.zmask))
    a, b = site_map(full), site_map(ref)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-4, atol=1e-5)


def test_strided_after_refined_matches_dense():
    """refined subm -> expand -> u-factorized strided conv == dense
    oracle (the expand restores the strided conv's full-dilation input
    contract)."""
    feats, coords, mask = random_sites(seed=21)
    cg = build_column_grid(feats, coords, mask, GRID, col_cap=64)
    rng = np.random.default_rng(31)
    w1 = jnp.asarray(rng.normal(size=(3, 3, 3, 5, 6)).astype(np.float32))
    ws = jnp.asarray(rng.normal(size=(3, 3, 3, 6, 4)).astype(np.float32))

    sub, srb, exp = dilate_columns_subm(cg, dil_cap=192, subm_cap=160)
    h = sub.replace(feats=subm_conv_col_dil(sub, w1, srb))
    out = jax.jit(lambda g: sparse_conv_col_dil(
        expand_columns(g, exp), ws, (2, 2, 2), (1, 1, 1),
        out_col_cap=96))(h)

    d1 = dense_conv(dense_of(feats, coords, mask), w1)
    occ = (np.abs(np.asarray(dense_of(feats, coords, mask))).sum(-1,
           keepdims=True) > 0)
    d1 = np.asarray(d1) * occ          # submanifold: active sites only
    oracle = np.asarray(dense_conv(jnp.asarray(d1), ws, (2, 2, 2),
                                   (1, 1, 1)))
    got = site_map(out)
    for c, f in got.items():
        np.testing.assert_allclose(f, oracle[c], rtol=1e-4, atol=1e-5)
    nzs = np.argwhere(np.abs(oracle).sum(-1) > 1e-5)
    for c in nzs:
        assert tuple(c) in got
