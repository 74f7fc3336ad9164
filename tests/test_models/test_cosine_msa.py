"""CosineMultiheadAttention + SRABlock (`mmdet3d/models/sst/cosine_msa.py`,
`sra_block.py`) — TPU-native variants, oracle-tested vs a numpy
re-statement of the scaled-cosine attention math."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isfusion_tpu.models.sst import (CosineMultiHeadAttention, SRABlock,
                                     SSTv2)


def _numpy_cosine_attention(x, params, num_heads, tau_min):
    """_scaled_cosine_attention (`cosine_msa.py:123-170`) in numpy."""
    def dense(x, p):
        return x @ np.asarray(p["kernel"]) + np.asarray(p["bias"])

    q = dense(x, params["query"])
    k = dense(x, params["key"])
    v = dense(x, params["value"])
    B, T, E = q.shape
    dh = E // num_heads
    q = q.reshape(B, T, num_heads, dh)
    k = k.reshape(B, T, num_heads, dh)
    v = v.reshape(B, T, num_heads, dh)
    q = q / (np.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    k = k / (np.linalg.norm(k, axis=-1, keepdims=True) + 1e-12)
    tau = np.maximum(np.asarray(params["tau"]), tau_min).reshape(1, -1, 1, 1)
    logits = np.einsum("bqhd,bkhd->bhqk", q, k) / tau
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    out = np.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, T, E)
    return dense(out, params["out"])


class TestCosineMSA:
    def test_matches_numpy_oracle(self):
        m = CosineMultiHeadAttention(num_heads=4, qkv_features=32,
                                     out_features=32)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 9, 32)),
                        jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)["params"]
        got = np.asarray(m.apply({"params": params}, x))
        want = _numpy_cosine_attention(
            np.asarray(x, np.float64),
            jax.tree_util.tree_map(np.asarray, params), 4, 0.01)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_tau_clamped_at_tau_min(self):
        m = CosineMultiHeadAttention(
            num_heads=2, qkv_features=16, out_features=16, tau_min=0.5)
        x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 5, 16)),
                        jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)["params"]
        # tau below tau_min must behave exactly like tau == tau_min
        lo = jax.tree_util.tree_map(np.asarray, params)
        lo["tau"] = np.full_like(lo["tau"], 0.01)
        hi = jax.tree_util.tree_map(np.asarray, params)
        hi["tau"] = np.full_like(hi["tau"], 0.5)
        np.testing.assert_allclose(
            np.asarray(m.apply({"params": lo}, x)),
            np.asarray(m.apply({"params": hi}, x)), atol=1e-6)

    def test_non_shared_tau_per_head(self):
        m = CosineMultiHeadAttention(num_heads=4, qkv_features=32,
                                     out_features=32, non_shared_tau=True)
        x = jnp.zeros((1, 3, 32))
        params = m.init(jax.random.PRNGKey(0), x)["params"]
        assert params["tau"].shape == (4,)

    def test_scale_invariance_of_logits(self):
        # cosine logits ignore token magnitude when projections are
        # bias-free: scaling the input leaves attention weights unchanged
        m = CosineMultiHeadAttention(num_heads=2, qkv_features=16,
                                     out_features=16)
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(1, 6, 16)), jnp.float32)
        params = jax.tree_util.tree_map(
            np.asarray, m.init(jax.random.PRNGKey(0), x)["params"])
        for name in ("query", "key", "value", "out"):
            params[name]["bias"] = np.zeros_like(params[name]["bias"])
        y1 = np.asarray(m.apply({"params": params}, x))
        y2 = np.asarray(m.apply({"params": params}, 7.0 * x))
        # value path scales by 7, attention weights must not change
        np.testing.assert_allclose(y2, 7.0 * y1, rtol=1e-4, atol=1e-4)


class TestSSTv2Cosine:
    @pytest.mark.slow
    def test_forward_and_grad(self):
        m = SSTv2(d_model=[16], nhead=[2], num_blocks=1,
                  dim_feedforward=[16], window_shape=(3, 3, 1),
                  in_channel=8, layer_cfg=dict(cosine=True, tau_min=0.05),
                  with_cp=False)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 6, 6, 8)),
                        jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        flat = jax.tree_util.tree_leaves(params["params"])
        assert any(p.shape == (1,) for p in flat)  # shared tau present

        def loss(p):
            return jnp.sum(m.apply(p, x) ** 2)

        g = jax.grad(lambda p: loss(p))(params)
        gn = sum(float(jnp.sum(jnp.abs(x)))
                 for x in jax.tree_util.tree_leaves(g))
        assert np.isfinite(gn) and gn > 0

    def test_sparse_backbone_cosine_builds(self):
        from isfusion_tpu.models.sst import SSTv2Sparse
        m = SSTv2Sparse(d_model=16, nhead=2, num_blocks=1,
                        dim_feedforward=16, window_shape=(3, 3, 1),
                        sparse_shape=(6, 6, 1), in_channel=8,
                        win_caps=[8], layer_cfg=dict(cosine=True))
        rng = np.random.default_rng(3)
        feats = jnp.asarray(rng.normal(size=(1, 20, 8)), jnp.float32)
        coords = jnp.asarray(
            np.stack([np.zeros(20), rng.integers(0, 6, 20),
                      rng.integers(0, 6, 20)], -1)[None], jnp.int32)
        valid = jnp.ones((1, 20), bool)
        out, _ = m.init_with_output(
            jax.random.PRNGKey(0), feats, coords, valid)
        assert out.shape == (1, 6, 6, 16)
        assert np.isfinite(np.asarray(out)).all()


class TestSRABlock:
    def test_forward_shape_and_finite(self):
        m = SRABlock(d_model=16, nhead=2, dim_feedforward=32,
                     window_shape=(3, 3, 1))
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 7, 7, 16)),
                        jnp.float32)
        out, _ = m.init_with_output(jax.random.PRNGKey(0), x)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_cosine_layer_cfg(self):
        m = SRABlock(d_model=16, nhead=2, dim_feedforward=32,
                     window_shape=(3, 3, 1), layer_cfg=dict(cosine=True))
        x = jnp.zeros((1, 6, 6, 16))
        params = m.init(jax.random.PRNGKey(0), x)["params"]
        names = jax.tree_util.tree_flatten_with_path(params)[0]
        assert any("tau" in str(p) for p, _ in names)
