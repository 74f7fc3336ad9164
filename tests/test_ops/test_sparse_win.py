"""Windowed-column conv engine vs dense-conv oracles.

Two grids: a short one (windows pinned at zoff=0, common-frame regime)
and a TALL one with height-scattered clusters so windows genuinely
differ per column and every re-basing path (x-roll shift-select, side
slice-gather delta, strided window derivation, rewindow) is exercised.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isfusion_tpu.ops.sparse import build_sparse_grid, sparse_to_dense
from isfusion_tpu.ops.sparse_win import (
    WinGrid, build_win_grid, rewindow, sparse_conv_win, subm_conv_win,
    to_common_frame, win_rulebook, win_sites, win_to_dense, zconv_win)

GRID_S = (6, 10, 12)    # (nz, ny, nx) — zoff 0 everywhere
GRID_T = (40, 8, 9)     # tall — windows move


def random_sites(grid, v_cap=64, n_active=40, c=5, seed=0, clustered=False):
    rng = np.random.default_rng(seed)
    nz, ny, nx = grid
    if clustered:
        # columns whose z varies with position: exercises window deltas
        cols = rng.choice(ny * nx, size=min(n_active, ny * nx),
                          replace=False)
        zs = []
        coords = []
        for col in cols:
            zc = int(rng.integers(1, nz - 3))
            for _ in range(int(rng.integers(1, 4))):
                z = int(np.clip(zc + rng.integers(-1, 2), 0, nz - 1))
                coords.append([z, col // nx, col % nx])
        coords = np.unique(np.array(coords, np.int64), axis=0)
        coords = coords[:n_active]
    else:
        lin = rng.choice(nz * ny * nx, size=n_active, replace=False)
        coords = np.stack([lin // (ny * nx), (lin // nx) % ny,
                           lin % nx], -1)
    n = len(coords)
    coords = np.concatenate(
        [coords, np.zeros((v_cap - n, 3), coords.dtype)], 0)
    mask = np.arange(v_cap) < n
    feats = rng.normal(size=(v_cap, c)).astype(np.float32)
    feats[~mask] = 0
    return (jnp.asarray(feats), jnp.asarray(coords.astype(np.int32)),
            jnp.asarray(mask))


def dense_of(feats, coords, mask, grid):
    sp = build_sparse_grid(feats, coords, mask, grid)
    return np.asarray(sparse_to_dense(sp))


def dense_conv(dense, weight, stride=(1, 1, 1), padding=(1, 1, 1)):
    return jax.lax.conv_general_dilated(
        jnp.asarray(dense)[None], weight, window_strides=stride,
        padding=[(p, p) for p in padding],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0]


def site_map(cg: WinGrid):
    coords, feats, mask = (np.asarray(a) for a in win_sites(cg))
    return {tuple(c): f for c, f, m in zip(coords, feats, mask) if m}


@pytest.mark.parametrize("grid,window,clustered", [
    (GRID_S, 8, False), (GRID_T, 16, True)])
def test_build_win_grid_roundtrip(grid, window, clustered):
    feats, coords, mask = random_sites(grid, clustered=clustered)
    cg = build_win_grid(feats, coords, mask, grid, col_cap=64,
                        window=window)
    dense = dense_of(feats, coords, mask, grid)
    sites = site_map(cg)
    occ = {tuple(c) for c in np.asarray(coords)[np.asarray(mask)]}
    assert set(sites) == occ
    for c, f in sites.items():
        np.testing.assert_allclose(f, dense[c], atol=0)
    # guard invariant: active w in [1, W-2] unless zoff == 0
    zm = np.asarray(cg.zmask)
    zoffs = np.asarray(cg.zoff)
    assert not zm[:, window - 1].any()
    assert not zm[zoffs > 0, 0].any()
    # zoff aligned
    assert (zoffs % cg.align == 0).all()


def test_tall_grid_exercises_deltas():
    """The clustered tall fixture must actually produce differing
    neighbor window offsets, or the re-basing paths are untested."""
    feats, coords, mask = random_sites(GRID_T, n_active=60, seed=3,
                                       clustered=True)
    cg = build_win_grid(feats, coords, mask, GRID_T, col_cap=64,
                        window=16)
    _, found, delta = win_rulebook(cg)
    assert int((jnp.abs(delta) > 0).sum()) > 0


@pytest.mark.parametrize("grid,window,clustered,seed", [
    (GRID_S, 8, False, 0), (GRID_S, 8, False, 4),
    (GRID_T, 16, True, 1), (GRID_T, 16, True, 2),
    (GRID_T, 24, True, 3)])
def test_subm_conv_win_matches_dense(grid, window, clustered, seed):
    feats, coords, mask = random_sites(grid, clustered=clustered,
                                       seed=seed)
    cg = build_win_grid(feats, coords, mask, grid, col_cap=64,
                        window=window)
    w = jnp.asarray(np.random.default_rng(seed + 10).normal(
        size=(3, 3, 3, 5, 7)).astype(np.float32))
    out = jax.jit(subm_conv_win)(cg, w)
    oracle = np.asarray(dense_conv(dense_of(feats, coords, mask, grid), w))
    got = site_map(cg.replace(feats=out))
    occ = {tuple(c) for c in np.asarray(coords)[np.asarray(mask)]}
    assert set(got) == occ
    for c, f in got.items():
        np.testing.assert_allclose(f, oracle[c], rtol=1e-4, atol=1e-5)


def test_subm_conv_win_x_adjacency_and_rulebook_reuse():
    nz, ny, nx = GRID_T
    coords = np.array([
        [20, 4, 5], [21, 4, 6], [19, 4, 7],   # x-run, varying z
        [15, 4, 4], [16, 4, 4], [17, 4, 3],    # x-adjacent pair with
                                               # NONZERO window delta and
                                               # interacting cells (16~17)
        [4, 4, 6],                             # same column, far z (drop
                                               # or separate window)
        [20, 5, 6], [36, 5, 7],                # y-neighbor with big delta
        [2, 0, 0], [38, 7, 8], [20, 4, 0], [20, 4, 8]], np.int32)
    n = len(coords)
    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
    coords = jnp.asarray(np.concatenate(
        [coords, np.zeros((16 - n, 3), np.int32)]))
    mask = jnp.asarray(np.arange(16) < n)
    feats = jnp.where(mask[:, None], feats, 0.0)
    cg = build_win_grid(feats, coords, mask, GRID_T, col_cap=16,
                        window=16)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 6)).astype(np.float32))
    rb = win_rulebook(cg)
    out = subm_conv_win(cg, w, rb)
    # oracle only over sites the windows kept (column [4,4,6] may drop:
    # same column as [21,4,6] spans 4..21 > W-2)
    oracle = np.asarray(dense_conv(
        dense_of(feats, coords, mask, GRID_T), w))
    kept = site_map(cg)
    # windowed-out sites must not corrupt kept sites: oracle restricted
    # to kept occupancy
    dense_kept = np.zeros_like(dense_of(feats, coords, mask, GRID_T))
    for c, f in kept.items():
        dense_kept[c] = f
    oracle_kept = np.asarray(dense_conv(dense_kept, w))
    for c, f in site_map(cg.replace(feats=out)).items():
        np.testing.assert_allclose(f, oracle_kept[c], rtol=1e-4,
                                   atol=1e-5)


@pytest.mark.parametrize("grid,window,stride,padding,seed", [
    (GRID_S, 8, (2, 2, 2), (1, 1, 1), 3),
    (GRID_S, 8, (2, 2, 2), (0, 1, 1), 4),
    (GRID_T, 16, (2, 2, 2), (1, 1, 1), 5),
    (GRID_T, 16, (2, 2, 2), (0, 1, 1), 6),
])
def test_sparse_conv_win_matches_dense(grid, window, stride, padding,
                                       seed):
    feats, coords, mask = random_sites(grid, seed=seed,
                                       clustered=grid is GRID_T)
    cg = build_win_grid(feats, coords, mask, grid, col_cap=64,
                        window=window)
    w = jnp.asarray(np.random.default_rng(seed).normal(
        size=(3, 3, 3, 5, 6)).astype(np.float32))
    # spread = full grid height: the tall clustered fixture puts merged
    # columns at arbitrary heights, so completeness needs full coverage
    # (the encoder uses the default, sized to the measured delta stats)
    out = jax.jit(lambda g: sparse_conv_win(
        g, w, stride, padding, out_col_cap=96, z_total=grid[0],
        out_window=max(window, (window + grid[0]) // stride[0] + 2),
        spread=grid[0]))(cg)
    oracle = np.asarray(dense_conv(dense_of(feats, coords, mask, grid), w,
                                   stride, padding))
    got = site_map(out)
    for c, f in got.items():
        np.testing.assert_allclose(f, oracle[c], rtol=1e-4, atol=1e-5)
    nzs = np.argwhere(np.abs(oracle).sum(-1) > 1e-5)
    for c in nzs:
        assert tuple(c) in got


def test_zconv_and_dense_roundtrip():
    grid = GRID_S
    feats, coords, mask = random_sites(grid, seed=5)
    cg = build_win_grid(feats, coords, mask, grid, col_cap=64, window=8)
    cg = to_common_frame(cg, grid[0])
    w = jnp.asarray(np.random.default_rng(4).normal(
        size=(3, 1, 1, 5, 6)).astype(np.float32))
    out = jax.jit(lambda g: zconv_win(g, w, stride=2, padding=0))(cg)
    oracle = np.asarray(dense_conv(dense_of(feats, coords, mask, grid), w,
                                   (2, 1, 1), (0, 0, 0)))
    for c, f in site_map(out).items():
        np.testing.assert_allclose(f, oracle[c], rtol=1e-4, atol=1e-5)
    nzs = np.argwhere(np.abs(oracle).sum(-1) > 1e-5)
    got = site_map(out)
    for c in nzs:
        assert tuple(c) in got
    # dense scatter matches the (masked) site map
    z_out = out.feats.shape[1]
    dense = np.asarray(win_to_dense(out)).reshape(
        grid[1], grid[2], z_out, 6)
    for (z, y, x), f in got.items():
        np.testing.assert_allclose(dense[y, x, z], f, atol=0)


def test_to_common_frame_tall():
    feats, coords, mask = random_sites(GRID_T, clustered=True, seed=9)
    cg = build_win_grid(feats, coords, mask, GRID_T, col_cap=64,
                        window=16)
    full = to_common_frame(cg, GRID_T[0])
    assert int(full.zoff.max()) == 0
    a, b = site_map(full), site_map(cg)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=0)


def test_rewindow_preserves_sites():
    feats, coords, mask = random_sites(GRID_T, clustered=True, seed=11)
    cg = build_win_grid(feats, coords, mask, GRID_T, col_cap=64,
                        window=24)
    rw = rewindow(cg, align=8, target_w=16)
    a, b = site_map(rw), site_map(cg)
    # narrowing may drop far-out cells, but the clustered fixture's
    # spans (<= 3) all fit
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=1e-6)
    assert (np.asarray(rw.zoff) % 8 == 0).all()


def test_window_overflow_drops_cells_not_corrupts():
    """A column spanning more than W-2 cells drops the overflow cells
    (capacity semantics) but keeps the in-window ones intact."""
    coords = np.array([[1, 3, 3], [2, 3, 3], [30, 3, 3], [5, 3, 4]],
                      np.int32)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(8, 5)).astype(np.float32))
    coords = jnp.asarray(np.concatenate(
        [coords, np.zeros((4, 3), np.int32)]))
    mask = jnp.asarray(np.arange(8) < 4)
    feats = jnp.where(mask[:, None], feats, 0.0)
    cg = build_win_grid(feats, coords, mask, GRID_T, col_cap=8, window=16)
    sites = site_map(cg)
    assert (1, 3, 3) in sites and (2, 3, 3) in sites
    assert (30, 3, 3) not in sites        # beyond w = W-2 from zoff 0
    assert (5, 3, 4) in sites
    dense = dense_of(feats, coords, mask, GRID_T)
    for c, f in sites.items():
        np.testing.assert_allclose(f, dense[c], atol=0)


def test_side_tap_custom_vjp_matches_autodiff():
    """The scatter-free backward (opposite-tap gather, `_side_tap_sym`)
    must equal plain autodiff of the tap gather for every tap, on a
    fixture with nonzero window deltas."""
    from isfusion_tpu.ops.sparse_win import (_side_tap_impl,
                                             _side_tap_sym)
    feats, coords, mask = random_sites(GRID_T, clustered=True, seed=13)
    cg = build_win_grid(feats, coords, mask, GRID_T, col_cap=64,
                        window=16)
    slots, found, delta = win_rulebook(cg)
    vc, w, c = cg.feats.shape
    featsf = cg.feats.reshape(vc, w * c)
    rng = np.random.default_rng(5)
    probe = jnp.asarray(rng.normal(
        size=(6,) + featsf.shape).astype(np.float32))
    for t in range(6):
        def loss_custom(f, t=t):
            return jnp.sum(_side_tap_sym(t, cg.align, w, c, f, slots,
                                         found, delta) * probe[t])

        def loss_plain(f, t=t):
            return jnp.sum(_side_tap_impl(t, cg.align, w, c, f, slots,
                                          found, delta) * probe[t])

        np.testing.assert_allclose(
            np.asarray(jax.grad(loss_custom)(featsf)),
            np.asarray(jax.grad(loss_plain)(featsf)),
            rtol=1e-5, atol=1e-5)


def test_gradients_flow():
    feats, coords, mask = random_sites(GRID_T, clustered=True)
    cg = build_win_grid(feats, coords, mask, GRID_T, col_cap=64,
                        window=16)
    w = jnp.ones((3, 3, 3, 5, 4), jnp.float32) * 0.1

    def loss(w, f):
        out = subm_conv_win(cg.replace(feats=f), w)
        return jnp.sum(out ** 2)

    gw, gf = jax.grad(loss, argnums=(0, 1))(w, cg.feats)
    assert np.isfinite(np.asarray(gw)).all()
    assert np.isfinite(np.asarray(gf)).all()
    assert float(jnp.abs(gw).sum()) > 0


def test_vmap_batching():
    f1, c1, m1 = random_sites(GRID_T, seed=7, clustered=True)
    f2, c2, m2 = random_sites(GRID_T, seed=8, n_active=30, clustered=True)
    w = jnp.asarray(np.random.default_rng(9).normal(
        size=(3, 3, 3, 5, 6)).astype(np.float32))

    def run(f, c, m):
        cg = build_win_grid(f, c, m, GRID_T, col_cap=64, window=16)
        return subm_conv_win(cg, w)

    batched = jax.vmap(run)(jnp.stack([f1, f2]), jnp.stack([c1, c2]),
                            jnp.stack([m1, m2]))
    np.testing.assert_allclose(np.asarray(batched[0]),
                               np.asarray(run(f1, c1, m1)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(batched[1]),
                               np.asarray(run(f2, c2, m2)), rtol=1e-5)
