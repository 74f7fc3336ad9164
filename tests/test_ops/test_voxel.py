"""Voxelization / scatter ops vs. numpy oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isfusion_tpu.ops import (
    voxelize_hard, voxelize_dynamic, dynamic_scatter, group_ranks,
    unique_with_ranks)

PCR = [-1.0, -1.0, -1.0, 1.0, 1.0, 1.0]
VSIZE = [0.5, 0.5, 0.5]


def rand_points(n=200, seed=0, pad=40):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1.2, 1.2, size=(n, 4)).astype(np.float32)
    mask = np.ones(n, bool)
    if pad:
        pts = np.concatenate([pts, np.zeros((pad, 4), np.float32)])
        mask = np.concatenate([mask, np.zeros(pad, bool)])
    return jnp.asarray(pts), jnp.asarray(mask)


def np_voxel_ids(pts, mask):
    coords = np.floor((np.asarray(pts)[:, :3] - np.array(PCR[:3]))
                      / np.array(VSIZE)).astype(np.int64)
    in_range = ((coords >= 0) & (coords < 4)).all(-1) & np.asarray(mask)
    ids = coords[:, 2] * 16 + coords[:, 1] * 4 + coords[:, 0]
    return ids, in_range


def test_group_ranks():
    ids = jnp.array([3, 3, 1, 3, 1, 7], jnp.int32)
    ranks = np.asarray(group_ranks(ids))
    np.testing.assert_array_equal(ranks, [0, 1, 0, 2, 1, 0])


def test_unique_with_ranks_matches_numpy():
    pts, mask = rand_points()
    ids_np, valid_np = np_voxel_ids(pts, mask)
    res = unique_with_ranks(
        jnp.asarray(ids_np.astype(np.int32)), jnp.asarray(valid_np),
        num_groups_cap=128)
    n_unique = len(np.unique(ids_np[valid_np]))
    assert int(res.num_groups) == n_unique
    assert int(res.group_valid.sum()) == n_unique
    # group sizes must match numpy bincount
    sizes = {}
    for gid, size in zip(np.asarray(res.group_ids)[np.asarray(res.group_valid)],
                         np.asarray(res.group_size)[np.asarray(res.group_valid)]):
        sizes[gid] = size
    uniq, counts = np.unique(ids_np[valid_np], return_counts=True)
    for u, c in zip(uniq, counts):
        assert sizes[u] == c
    # every valid point maps to a group whose id matches its own id
    gi = np.asarray(res.group_index)
    gids = np.asarray(res.group_ids)
    for i in np.where(valid_np)[0]:
        assert gids[gi[i]] == ids_np[i]
    # invalid points go to the trash slot
    assert (gi[~valid_np] == 128).all()


def test_voxelize_hard_contents():
    pts, mask = rand_points()
    out = voxelize_hard(pts, mask, PCR, VSIZE, max_points=8, max_voxels=128)
    ids_np, valid_np = np_voxel_ids(pts, mask)
    n_unique = len(np.unique(ids_np[valid_np]))
    assert int(out.voxel_mask.sum()) == n_unique
    # each voxel's stored points must actually belong to that voxel and be
    # ordered by original index (deterministic contract)
    voxels = np.asarray(out.voxels)
    coors = np.asarray(out.coors)
    num_points = np.asarray(out.num_points)
    pts_np = np.asarray(pts)
    for v in range(128):
        if not bool(out.voxel_mask[v]):
            continue
        zyx = coors[v]
        vid = zyx[0] * 16 + zyx[1] * 4 + zyx[2]
        members = np.where((ids_np == vid) & valid_np)[0]
        n = min(len(members), 8)
        assert num_points[v] == n
        np.testing.assert_allclose(voxels[v, :n], pts_np[members[:n]],
                                   atol=1e-6)
        np.testing.assert_allclose(voxels[v, n:], 0.0)


def test_voxelize_hard_max_points_cap():
    # 20 points all in one voxel
    pts = jnp.tile(jnp.array([[0.1, 0.1, 0.1, 1.0]], jnp.float32), (20, 1))
    mask = jnp.ones(20, bool)
    out = voxelize_hard(pts, mask, PCR, VSIZE, max_points=5, max_voxels=4)
    assert int(out.voxel_mask.sum()) == 1
    assert int(out.num_points[0]) == 5


def test_voxelize_dynamic_coords():
    pts, mask = rand_points()
    out = voxelize_dynamic(pts, mask, PCR, VSIZE, max_voxels=128)
    ids_np, valid_np = np_voxel_ids(pts, mask)
    coors = np.asarray(out.coors)
    # out-of-range/padded -> -1 (reference dynamic_voxelize contract)
    assert (coors[~valid_np] == -1).all()
    pts_np = np.asarray(pts)
    expect = np.floor((pts_np[valid_np][:, :3] - np.array(PCR[:3]))
                      / np.array(VSIZE)).astype(np.int32)[:, ::-1]
    np.testing.assert_array_equal(coors[valid_np], expect)


def test_dynamic_scatter_mean_max():
    pts, mask = rand_points(100, pad=20)
    out = voxelize_dynamic(pts, mask, PCR, VSIZE, max_voxels=128)
    feats = pts
    vmax = dynamic_scatter(feats, out.point_voxel_index, 128, "max")
    vmean = dynamic_scatter(feats, out.point_voxel_index, 128, "mean")
    ids_np, valid_np = np_voxel_ids(pts, mask)
    pvi = np.asarray(out.point_voxel_index)
    feats_np = np.asarray(feats)
    for v in range(128):
        members = np.where((pvi == v))[0]
        if len(members) == 0:
            continue
        np.testing.assert_allclose(np.asarray(vmax)[v],
                                   feats_np[members].max(0), atol=1e-5)
        np.testing.assert_allclose(np.asarray(vmean)[v],
                                   feats_np[members].mean(0), atol=1e-5)


def test_dynamic_scatter_grad():
    pts, mask = rand_points(50, pad=10)
    out = voxelize_dynamic(pts, mask, PCR, VSIZE, max_voxels=64)

    def loss_fn(f):
        v = dynamic_scatter(f, out.point_voxel_index, 64, "mean")
        return jnp.sum(v ** 2)

    g = jax.grad(loss_fn)(pts)
    assert np.isfinite(np.asarray(g)).all()
    # padded points get zero grad
    assert (np.asarray(g)[~np.asarray(out.point_mask)] == 0).all()


def test_voxelize_jit_and_vmap():
    pts, mask = rand_points()
    f = jax.jit(lambda p, m: voxelize_hard(p, m, PCR, VSIZE, 8, 128))
    out = f(pts, mask)
    assert out.voxels.shape == (128, 8, 4)
    # batched
    bp = jnp.stack([pts, pts])
    bm = jnp.stack([mask, mask])
    bout = jax.vmap(lambda p, m: voxelize_hard(p, m, PCR, VSIZE, 8, 128))(
        bp, bm)
    assert bout.voxels.shape == (2, 128, 8, 4)
    np.testing.assert_allclose(bout.voxels[0], out.voxels)
