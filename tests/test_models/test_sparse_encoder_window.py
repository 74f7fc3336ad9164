"""Window-engine SparseEncoder vs the column-engine reference.

Same params, same inputs, both engines: on a fixture whose columns fit
comfortably inside windows and capacities, the two engines implement the
same spconv semantics and must agree to fp tolerance end-to-end
(build -> conv_input -> 4 stages with strided downsamples -> conv_out ->
dense BEV). Mirrors the reference contract of
`mmdet3d/models/middle_encoders/sparse_encoder.py:19`.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import isfusion_tpu.models  # noqa: F401  (register modules)
from isfusion_tpu.registry import MIDDLE_ENCODERS, build_from_cfg

GRID = [40, 32, 32]   # (nz, ny, nx)


def make_encoder(engine, block_type):
    return build_from_cfg(dict(
        type="SparseEncoder", in_channels=6,
        sparse_shape=list(GRID), base_channels=8, output_channels=16,
        encoder_channels=((8, 8), (16, 16), (16, 16), (16, 16)),
        encoder_paddings=((1, 1), (1, 1, 1)[:2], (1, 1), ((0, 1, 1), 1)),
        block_type=block_type, engine=engine,
        win_widths=(16, 16, 12, 8),
        norm_cfg=dict(type="BN1d", eps=1e-3, momentum=0.01),
    ), MIDDLE_ENCODERS)


def make_inputs(seed=0, v_cap=256, n_active=180):
    rng = np.random.default_rng(seed)
    nz, ny, nx = GRID
    # LiDAR-like occupancy: a smoothly-varying "ground" height per BEV
    # position plus small object clusters above it. Neighboring columns
    # then carry nearby (but different) window offsets — the re-basing
    # paths are exercised — while merged-column spans stay within the
    # configured widths, like real clouds (measured: 97.7% of neighbor
    # window deltas <= 8 at stage 0). Uniform random heights would be a
    # different workload: stacked far-apart clusters exceed any window
    # (capacity-drop semantics, covered by the overflow test).
    cols = rng.choice(ny * nx, size=80, replace=False)
    coords = []
    for col in cols:
        y, x = col // nx, col % nx
        ground = 6 + 10 * np.sin(2 * np.pi * x / nx) * \
            np.sin(2 * np.pi * y / ny)
        zc = int(np.clip(ground + rng.integers(0, 4), 0, nz - 6))
        for _ in range(int(rng.integers(1, 4))):
            coords.append([int(np.clip(zc + rng.integers(-1, 3), 0,
                                       nz - 1)),
                           y, x])
    coords = np.unique(np.array(coords, np.int64), axis=0)[:n_active]
    n = len(coords)
    coords = np.concatenate(
        [coords, np.zeros((v_cap - n, 3), coords.dtype)], 0)
    mask = np.arange(v_cap) < n
    feats = rng.normal(size=(v_cap, 6)).astype(np.float32)
    feats[~mask] = 0
    return (jnp.asarray(feats), jnp.asarray(coords.astype(np.int32)),
            jnp.asarray(mask))


@pytest.mark.parametrize("block_type", ["conv_module", "basicblock"])
@pytest.mark.slow
def test_window_engine_matches_columns(block_type):
    feats, coords, mask = make_inputs()
    bf = feats[None]
    bc = coords[None]
    bm = mask[None]
    enc_c = make_encoder("columns", block_type)
    enc_w = make_encoder("window", block_type)
    var = enc_c.init(jax.random.PRNGKey(0), bf, bc, bm, train=False)
    # identical parameter trees: engines share kernel layouts
    var_w = enc_w.init(jax.random.PRNGKey(0), bf, bc, bm, train=False)
    assert jax.tree_util.tree_structure(var) == \
        jax.tree_util.tree_structure(var_w)
    out_c = np.asarray(enc_c.apply(var, bf, bc, bm, train=False))
    out_w = np.asarray(enc_w.apply(var, bf, bc, bm, train=False))
    assert out_c.shape == out_w.shape
    np.testing.assert_allclose(out_w, out_c, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_window_engine_grads_finite():
    feats, coords, mask = make_inputs(seed=2)
    enc = make_encoder("window", "basicblock")
    bf, bc, bm = feats[None], coords[None], mask[None]
    var = enc.init(jax.random.PRNGKey(0), bf, bc, bm, train=True)

    def loss(p):
        out, _ = enc.apply(
            {**var, "params": p}, bf, bc, bm, train=True,
            mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(var["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert sum(float(jnp.abs(l).sum()) for l in leaves) > 0
