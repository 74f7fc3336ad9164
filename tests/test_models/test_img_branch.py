"""Swin backbone + GeneralizedLSSFPN image branch (shapes, padding,
shifted-window masking, gradients)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isfusion_tpu.models.backbones.swin import (
    SwinTransformer, _rel_pos_index, _shift_attn_mask)
from isfusion_tpu.models.necks.generalized_lss import GeneralizedLSSFPN


def tiny_swin(**kw):
    cfg = dict(embed_dims=24, depths=(2, 2), num_heads=(3, 6),
               window_size=7, out_indices=(0, 1), drop_path_rate=0.1)
    cfg.update(kw)
    return SwinTransformer(**cfg)


def test_rel_pos_index_properties():
    idx = _rel_pos_index(7)
    assert idx.shape == (49, 49)
    assert idx.min() >= 0 and idx.max() < 13 * 13
    assert (np.diag(idx) == idx[0, 0]).all()  # self-relative is constant


def test_shift_mask_blocks():
    m = _shift_attn_mask(14, 14, 7, 3)
    assert m.shape == (4, 49, 49)
    assert (m[0] == 0).all()  # interior window: no masking
    assert (m[-1] < 0).any()  # corner window mixes 4 regions


def test_swin_shapes_and_padding():
    model = tiny_swin()
    # 50x60 is NOT a multiple of window 7 or patch 4 -> exercises padding
    img = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 50, 60, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), img, train=False)
    outs = model.apply(variables, img, train=False)
    assert len(outs) == 2
    assert outs[0].shape == (2, 13, 15, 24)   # ceil(50/4)=13, ceil(60/4)=15
    assert outs[1].shape == (2, 7, 8, 48)
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()


def test_swin_train_with_droppath():
    # depth 1 per stage: the droppath/grad assertion is per-block, and
    # the 2-deep variant costs 2x the XLA:CPU grad compile for nothing
    model = tiny_swin(depths=(1, 1), num_heads=(3, 6))
    img = jnp.ones((1, 28, 28, 3))
    variables = model.init(jax.random.PRNGKey(0), img, train=False)

    def loss(params):
        outs = model.apply({"params": params["params"]}, img, train=True,
                           rngs={"dropout": jax.random.PRNGKey(7)})
        return sum(jnp.sum(o ** 2) for o in outs)

    g = jax.grad(lambda p: loss(p))(variables)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    assert sum(float(jnp.sum(jnp.abs(x))) for x in leaves) > 0


def test_lss_fpn_shapes():
    neck = GeneralizedLSSFPN(in_channels=[24, 48, 96], out_channels=32,
                             num_outs=3)
    feats = [jnp.ones((2, 24, 32, 24)), jnp.ones((2, 12, 16, 48)),
             jnp.ones((2, 6, 8, 96))]
    variables = neck.init(jax.random.PRNGKey(0), feats, train=False)
    outs = neck.apply(variables, feats, train=False)
    assert len(outs) == 2  # used = len - 1 (reference behavior)
    assert outs[0].shape == (2, 24, 32, 32)
    assert outs[1].shape == (2, 12, 16, 32)
