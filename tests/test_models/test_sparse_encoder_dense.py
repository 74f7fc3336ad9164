"""Dense-stage hybrid SparseEncoder vs the pure column engine.

`dense_from_stage=k` runs encoder stages >= k as masked dense XLA 3D
convs (ops/sparse_dense.py). On a fixture whose active set fits every
capacity, both engines implement the same spconv semantics
(`mmdet3d/models/middle_encoders/sparse_encoder.py:108`) and must agree
end-to-end; the parameter trees are identical, so one init drives both.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import isfusion_tpu.models  # noqa: F401  (register modules)
from isfusion_tpu.registry import MIDDLE_ENCODERS, build_from_cfg

GRID = [40, 32, 32]   # (nz, ny, nx)


def make_inputs(seed=0, v_cap=256, n_active=180):
    """LiDAR-like occupancy: a smoothly-varying "ground" height per BEV
    position plus small object clusters above it, so neighboring columns
    carry nearby (but different) z spans — like real clouds. Uniform
    random heights would be a different workload."""
    rng = np.random.default_rng(seed)
    nz, ny, nx = GRID
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


def make_encoder(block_type, dense_from_stage=99, dilation_ratio=2.5,
                 z_windows=None, stages=4):
    """``stages`` trims the encoder depth (XLA:CPU compile time scales
    with graph size; the all-dense variant needs only enough stages to
    cover dense conv_input + a dense strided transition)."""
    chans = ((8, 8), (16, 16), (16, 16), (16, 16))[:stages]
    pads = ((1, 1), (1, 1), (1, 1), ((0, 1, 1), 1))[:stages]
    return build_from_cfg(dict(
        type="SparseEncoder", in_channels=6,
        sparse_shape=list(GRID), base_channels=8, output_channels=16,
        encoder_channels=chans,
        encoder_paddings=pads,
        block_type=block_type, engine="columns",
        dense_from_stage=dense_from_stage, dilation_ratio=dilation_ratio,
        z_windows=z_windows,
        norm_cfg=dict(type="BN1d", eps=1e-3, momentum=0.01),
    ), MIDDLE_ENCODERS)


@pytest.mark.parametrize("block_type,dense_from,stages", [
    # everything dense incl. conv_input: 2 stages suffice to cover the
    # dense conv_input + dense strided transition (4 stages took 64 s of
    # XLA:CPU compile for no extra semantics). The 0/1 cutovers are
    # non-flagship shapes and the two worst compile hogs of the fast
    # tier (53 s + 30 s of XLA:CPU) — slow tier; the shipped cutover
    # (dense_from=3) and the conv_module variant stay fast.
    pytest.param("basicblock", 0, 2, marks=pytest.mark.slow),
    pytest.param("basicblock", 1, 3, marks=pytest.mark.slow),
    ("basicblock", 3, 4),    # hybrid: columns stages 1-2, dense 3-4
    ("conv_module", 2, 3),
])
def test_dense_hybrid_matches_columns(block_type, dense_from, stages):
    feats, coords, mask = make_inputs()
    bf, bc, bm = feats[None], coords[None], mask[None]
    enc_c = make_encoder(block_type, stages=stages)
    enc_d = make_encoder(block_type, dense_from_stage=dense_from,
                         stages=stages)
    var = enc_c.init(jax.random.PRNGKey(0), bf, bc, bm, train=False)
    var_d = enc_d.init(jax.random.PRNGKey(0), bf, bc, bm, train=False)
    assert jax.tree_util.tree_structure(var) == \
        jax.tree_util.tree_structure(var_d)
    out_c = np.asarray(enc_c.apply(var, bf, bc, bm, train=False))
    out_d = np.asarray(enc_d.apply(var, bf, bc, bm, train=False))
    assert out_c.shape == out_d.shape
    np.testing.assert_allclose(out_d, out_c, rtol=2e-4, atol=2e-4)


def make_band_inputs(seed=1, v_cap=256, n_active=180, z_band=(8, 22)):
    """Like make_inputs but the active z band is confined to ``z_band``
    — the regime a static z WINDOW (SparseEncoder.z_windows) targets."""
    rng = np.random.default_rng(seed)
    nz, ny, nx = GRID
    lo, hi = z_band
    cols = rng.choice(ny * nx, size=80, replace=False)
    coords = []
    for col in cols:
        y, x = col // nx, col % nx
        ground = (lo + hi) / 2 + (hi - lo) / 2.5 * \
            np.sin(2 * np.pi * x / nx) * np.sin(2 * np.pi * y / ny)
        zc = int(np.clip(ground + rng.integers(0, 3), lo, hi - 2))
        for _ in range(int(rng.integers(1, 4))):
            coords.append([int(np.clip(zc + rng.integers(-1, 3), lo, hi)),
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


# active band [8, 22] at table 0; exact images under the pz=1 stride-2
# transitions: [6, 23] -> [3, 12] -> [1, 6] -> [0, 4]
# (check_window_coverage pins these statically at trace time)
_WINS = ((6, 18), (3, 10), (1, 6), (0, 4))


@pytest.mark.parametrize("block_type,dense_from,wins", [
    # all-sparse all-windowed is a 32 s XLA:CPU compile and non-flagship
    # (the ship is windowed columns -> windowed dense) — slow tier
    pytest.param("basicblock", 99, _WINS[:3], marks=pytest.mark.slow),
    # the flagship shape: windowed columns -> windowed DENSE tables
    # (columns_to_dense keep_window, dense strided z_shift, shifted
    # conv_out emitting the full extent)
    ("basicblock", 3, _WINS),
    ("conv_module", 2, _WINS[:1]),
])
def test_z_windowed_matches_full(block_type, dense_from, wins):
    """With every active site inside the configured z windows, the
    windowed encoder is numerically identical to the full-extent one
    (same parameter tree, one init drives both)."""
    feats, coords, mask = make_band_inputs()
    bf, bc, bm = feats[None], coords[None], mask[None]
    enc_f = make_encoder(block_type, dense_from_stage=dense_from)
    enc_w = make_encoder(block_type, dense_from_stage=dense_from,
                         z_windows=wins)
    var = enc_f.init(jax.random.PRNGKey(0), bf, bc, bm, train=False)
    out_f = np.asarray(enc_f.apply(var, bf, bc, bm, train=False))
    out_w = np.asarray(enc_w.apply(var, bf, bc, bm, train=False))
    assert out_f.shape == out_w.shape
    np.testing.assert_allclose(out_w, out_f, rtol=2e-4, atol=2e-4)


def test_z_window_coverage_check_fires():
    """A window that cannot hold the strided image of its input window
    must fail loudly at trace time, not silently drop sites."""
    feats, coords, mask = make_band_inputs()
    bf, bc, bm = feats[None], coords[None], mask[None]
    enc = make_encoder("basicblock", z_windows=((6, 18), (5, 4)))
    with pytest.raises(AssertionError, match="outside the output window"):
        enc.init(jax.random.PRNGKey(0), bf, bc, bm, train=False)


def test_dense_hybrid_grads_finite():
    """One train-mode grads compile covering BOTH the dense-stage hybrid
    AND the z-window path (a separate windowed grads test was another
    40 s of XLA:CPU compile for the same assertion)."""
    feats, coords, mask = make_band_inputs(seed=3)
    enc = make_encoder("basicblock", dense_from_stage=3,
                       z_windows=_WINS[:2])
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


def test_dense_strided_mask_semantics():
    """An output site of a strided sparse conv is active iff its receptive
    field touches an input site — check the reduce_window mask against a
    hand-built occupancy on a tiny grid."""
    from isfusion_tpu.ops.sparse_dense import DenseGrid, sparse_conv_dense

    rng = np.random.default_rng(0)
    z, y, x, c = 8, 10, 10, 4
    zmask = np.zeros((1, z, y, x), bool)
    sites = [(2, 3, 1), (5, 5, 4), (9, 0, 7)]   # (y, x, z)
    for yy, xx, zz in sites:
        zmask[0, zz, yy, xx] = True
    feats = rng.normal(size=(1, z, y, x, c)).astype(np.float32)
    feats[~zmask] = 0.0
    w = rng.normal(size=(3, 3, 3, c, 6)).astype(np.float32)
    out = sparse_conv_dense(DenseGrid(jnp.asarray(feats),
                                      jnp.asarray(zmask)), jnp.asarray(w),
                            stride=(2, 2, 2), padding=(1, 1, 1))
    om = np.asarray(out.zmask[0])
    # brute-force expected mask
    exp = np.zeros_like(om)
    zo, yo, xo = om.shape
    for oy in range(yo):
        for ox in range(xo):
            for oz in range(zo):
                hit = False
                for ky in range(3):
                    for kx in range(3):
                        for kz in range(3):
                            iy, ix, iz = (oy * 2 - 1 + ky, ox * 2 - 1 + kx,
                                          oz * 2 - 1 + kz)
                            if 0 <= iy < y and 0 <= ix < x and 0 <= iz < z:
                                hit |= bool(zmask[0, iz, iy, ix])
                exp[oz, oy, ox] = hit
    np.testing.assert_array_equal(om, exp)
    # features vanish exactly off the active set
    assert np.all(np.asarray(out.feats)[0][~om] == 0.0)
