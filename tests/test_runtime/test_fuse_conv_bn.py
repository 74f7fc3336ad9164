"""Numeric-equivalence test for conv+BN folding (tools/misc/fuse_conv_bn).

The r3 review found the folded shift term was written into a 'bias'
param flax silently ignores for norm-followed convs (use_bias=False):
fused checkpoints lost BN's affine shift. The fold now carries the shift
in the neutralized BN's running mean; this test asserts EXACT forward
agreement between original and fused parameters.
"""
import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import flax.linen as nn  # noqa: E402

from isfusion_tpu.models.layers import ConvModule  # noqa: E402


class _Tiny(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        x = ConvModule(8, kernel_size=3, padding=1,
                       norm_cfg=dict(type="BN2d", eps=1e-3),
                       act_cfg=dict(type="ReLU"))(x, train=train)
        return ConvModule(4, kernel_size=1,
                          norm_cfg=dict(type="BN2d", eps=1e-3))(x)


def test_fused_forward_matches_original():
    from tools.misc.fuse_conv_bn import fuse_tree

    m = _Tiny()
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 6, 6, 3)).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    # non-trivial BN statistics/affine so the fold has real work to do
    rng = np.random.default_rng(1)

    def randomize(tree, is_stats):
        for k, v in tree.items():
            if isinstance(v, dict):
                randomize(v, is_stats)
            elif k in ("scale",):
                tree[k] = jnp.asarray(
                    rng.uniform(0.5, 1.5, v.shape).astype(np.float32))
            elif k in ("bias", "mean"):
                tree[k] = jnp.asarray(
                    rng.normal(0, 0.3, v.shape).astype(np.float32))
            elif k == "var":
                tree[k] = jnp.asarray(
                    rng.uniform(0.5, 2.0, v.shape).astype(np.float32))

    variables = jax.tree_util.tree_map(np.asarray, variables)
    randomize(variables["params"], False)
    randomize(variables["batch_stats"], True)
    ref = np.asarray(m.apply(variables, x, train=False))

    import copy
    fused = copy.deepcopy(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]})
    n = fuse_tree(fused["params"], fused["batch_stats"], eps=1e-3)
    assert n >= 2, "expected both conv+BN pairs to fold"
    got = np.asarray(m.apply(fused, x, train=False))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
