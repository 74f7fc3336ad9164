"""PAConv ops vs brute-force oracle (reference CUDA formula at
`ops/paconv/src/assign_score_withk_cuda.cu:76`)."""
import jax
import jax.numpy as jnp
import numpy as np

from isfusion_tpu.ops.paconv import (PAConv, assign_kernel_withoutk,
                                     assign_score_withk)


def test_assign_score_withk_oracle():
    rng = np.random.default_rng(0)
    b, n, s, k, m, o = 2, 30, 8, 5, 4, 6
    scores = rng.normal(size=(b, s, k, m)).astype(np.float32)
    pf = rng.normal(size=(b, n, m, o)).astype(np.float32)
    cf = rng.normal(size=(b, n, m, o)).astype(np.float32)
    knn = rng.integers(0, n, (b, s, k)).astype(np.int32)
    out = np.asarray(assign_score_withk(
        jnp.asarray(scores), jnp.asarray(pf), jnp.asarray(cf),
        jnp.asarray(knn)))
    # brute force per the CUDA kernel
    exp = np.zeros((b, s, k, o), np.float32)
    for bi in range(b):
        for si in range(s):
            cn = knn[bi, si, 0]
            for ki in range(k):
                kn = knn[bi, si, ki]
                for mi in range(m):
                    exp[bi, si, ki] += scores[bi, si, ki, mi] * (
                        pf[bi, kn, mi] - cf[bi, cn, mi])
    np.testing.assert_allclose(out, exp, rtol=1e-5, atol=1e-5)


def test_assign_kernel_withoutk_shapes_and_consistency():
    """The precomputed-feature path must equal the direct grouped matmul
    for the 'w_neighbor' kernel input (`utils.py:46-85`)."""
    rng = np.random.default_rng(1)
    b, n, cin, m, o = 1, 20, 8, 3, 5
    feats = rng.normal(size=(b, n, cin)).astype(np.float32)
    bank = rng.normal(size=(2 * cin, m * o)).astype(np.float32)
    pf, cf = assign_kernel_withoutk(jnp.asarray(feats),
                                    jnp.asarray(bank), m)
    assert pf.shape == (b, n, m, o) and cf.shape == (b, n, m, o)
    # grouped equivalence: for neighbor j of center i,
    # concat(fj - fi, fj) @ bank == pf[j] - cf[i]  (cin even)
    i, j = 3, 7
    direct = np.concatenate([feats[0, j] - feats[0, i], feats[0, j]]
                            ) @ bank
    via = np.asarray(pf)[0, j].reshape(-1) - np.asarray(cf)[0, i].reshape(-1)
    np.testing.assert_allclose(direct, via, rtol=1e-4, atol=1e-5)


def test_paconv_module_forward_grads():
    rng = np.random.default_rng(2)
    b, s, k, c = 1, 6, 4, 8
    feats = jnp.asarray(rng.normal(size=(b, s, k, c)).astype(np.float32))
    rel = jnp.asarray(rng.normal(size=(b, s, k, 3)).astype(np.float32))
    valid = jnp.asarray(rng.uniform(size=(b, s, k)) > 0.2)
    mod = PAConv(out_channels=16, num_kernels=4)
    vars_ = mod.init(jax.random.PRNGKey(0), feats, rel, valid)
    out = mod.apply(vars_, feats, rel, valid)
    assert out.shape == (b, s, k, 16)
    assert np.isfinite(np.asarray(out)).all()
    assert (np.asarray(out)[~np.asarray(valid)] == 0).all()

    g = jax.grad(lambda p: jnp.sum(mod.apply(
        {**vars_, "params": p}, feats, rel, valid) ** 2))(vars_["params"])
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))


def test_paconv_backbone_and_head_build():
    from isfusion_tpu.models.builder import build_backbone
    from isfusion_tpu.registry import HEADS
    bb = build_backbone(dict(
        type="PAConvSASSG", in_channels=6,
        num_points=(16, 8), radius=(0.5, 1.0), num_samples=(8, 8),
        sa_channels=((16, 16), (16, 32)), fp_channels=((32, 16),)))
    pts = jnp.asarray(np.random.default_rng(3).normal(
        size=(1, 64, 6)).astype(np.float32))
    mask = jnp.ones((1, 64), bool)
    vars_ = bb.init(jax.random.PRNGKey(0), pts, mask)
    out = bb.apply(vars_, pts, mask)
    assert "fp_features" in out or isinstance(out, dict)
    assert "PAConvHead" in HEADS
