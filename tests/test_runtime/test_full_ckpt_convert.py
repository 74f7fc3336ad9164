"""Roundtrip coverage test for the full-detector checkpoint converter.

No public IS-Fusion checkpoint exists in this offline environment, so the
test synthesizes a reference-layout state dict: pass 1 runs the converter
against a key-capturing mapping to learn exactly which torch keys each of
OUR parameters resolves to; pass 2 materializes those keys with
reference-layout shapes and checks that conversion covers the ENTIRE tree
with exact shape agreement and invertible layout transforms.
"""
import re

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")


class _Recording(dict):
    """Passes through known keys, records unknown ones (pass 2)."""

    def __init__(self, base):
        super().__init__(base)
        self.missed = set()

    def __missing__(self, key):
        self.missed.add(key)
        raise KeyError(key)


class _Capture(dict):
    """Records requested keys, then raises so the converter marks the leaf
    missing (pass 1)."""

    def __init__(self):
        super().__init__()
        self.requested = set()

    def __getitem__(self, key):
        self.requested.add(key)
        raise KeyError(key)

    def __contains__(self, key):
        self.requested.add(key)
        return False


@pytest.fixture(scope="module")
def tiny_variables():
    from isfusion_tpu.flagship import build_isfusion_flagship
    model, batch_fn = build_isfusion_flagship(tiny=True)
    batch = batch_fn(1)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), batch, train=False,
                           mode="feats"))
    return jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, np.float32), variables)


def _torch_shape(key: str, leaf_shape, leaf_path: str):
    """Reference-layout shape for a captured torch key."""
    if len(leaf_shape) == 0:       # scalar (e.g. mmdet Scale.scale)
        return ()
    if key.endswith("in_proj_weight"):
        e = leaf_shape[0] if len(leaf_shape) == 3 else \
            leaf_shape[0] * leaf_shape[1]
        return (3 * e, e)
    if key.endswith("in_proj_bias"):
        e = leaf_shape[0] if len(leaf_shape) == 3 else \
            leaf_shape[0] * leaf_shape[1]
        return (3 * e,)
    if key.endswith("out_proj.weight"):
        e = leaf_shape[-1]
        return (e, e)
    if key.endswith("out_proj.bias"):
        return (leaf_shape[-1],)
    if len(leaf_shape) == 5:       # sparse conv (out, kz, ky, kx, in)
        kz, ky, kx, ci, co = leaf_shape
        return (co, kz, ky, kx, ci)
    if len(leaf_shape) == 4:
        kh, kw, ci, co = leaf_shape
        if "ConvTranspose" in leaf_path:
            return (ci, co, kh, kw)
        return (co, ci, kh, kw)
    if key.endswith("relative_position_bias_table"):
        return tuple(leaf_shape)
    if key.endswith(("running_mean", "running_var")) or \
            len(leaf_shape) == 1 and not key.endswith(".weight"):
        return tuple(leaf_shape)
    if len(leaf_shape) == 1:       # norm weight / plain bias
        return tuple(leaf_shape)
    # 2-D: dense (out, in) unless it came from a Conv1d
    conv1d = any(s in leaf_path for s in
                 ("class_encoding", "pred_", "pos_embed", "posembed")) and \
        "bn" not in leaf_path.rsplit("/", 2)[-2]
    ci, co = leaf_shape
    return (co, ci, 1) if conv1d else (co, ci)


def test_converter_covers_full_tree(tiny_variables):
    from isfusion_tpu.runner.full_ckpt_convert import \
        convert_isfusion_torch_to_flax

    # pass 1: capture the torch keys each leaf resolves through
    cap = _Capture()
    _, missing1 = convert_isfusion_torch_to_flax(cap, tiny_variables)

    # every leaf must have asked for at least one torch key
    n_leaves = len(jax.tree_util.tree_leaves(tiny_variables))
    assert len(missing1) == n_leaves  # all "missing" in capture mode
    assert cap.requested, "no torch keys were consulted"

    # pass 2: materialize a state dict; shapes need leaf context, so walk
    # the tree leaf-by-leaf, iterating because one resolution can touch a
    # chain of keys (e.g. in_proj_weight then in_proj_bias)
    flat = jax.tree_util.tree_flatten_with_path(tiny_variables)[0]
    sd = {}
    for path, leaf in flat:
        pstr = "/".join(str(p.key) for p in path)
        single = _single_leaf_tree(path, leaf)
        for _ in range(5):
            probe = _Recording(sd)
            _, miss = convert_isfusion_torch_to_flax(probe, single)
            new = probe.missed - set(sd)
            if not miss or not new:
                break
            for key in new:
                rng = np.random.default_rng(abs(hash(key)) % (2 ** 31))
                sd[key] = rng.normal(size=_torch_shape(
                    key, leaf.shape, pstr)).astype(np.float32)

    out, missing = convert_isfusion_torch_to_flax(sd, tiny_variables)
    assert missing == [], f"unconverted params: {missing[:10]}"
    # shapes all agree
    for (path, leaf), (path2, conv) in zip(
            flat, jax.tree_util.tree_flatten_with_path(out)[0]):
        assert np.asarray(conv).shape == leaf.shape, \
            ("/".join(str(p.key) for p in path), np.asarray(conv).shape,
             leaf.shape)

    # numerical spot checks: dense transpose + conv OIHW->HWIO roundtrip
    w = sd["pts_voxel_encoder.vfe_layers.0.linear.weight"]
    got = out["params"]["pts_voxel_encoder_m"]["LinearNormAct_0"][
        "Dense_0"]["kernel"]
    np.testing.assert_allclose(np.asarray(got), w.T)
    w = sd["pts_bbox_head.shared_conv.weight"]
    got = out["params"]["pts_bbox_head_m"]["shared_conv"]["kernel"]
    np.testing.assert_allclose(np.asarray(got), w.transpose(2, 3, 1, 0))
    # spconv2 (out, D, H, W, in) -> (D, H, W, in, out)
    w = sd["pts_middle_encoder.conv_input.0.weight"]
    got = out["params"]["pts_middle_encoder_m"]["conv_input"]["kernel"]
    np.testing.assert_allclose(np.asarray(got),
                               w.transpose(1, 2, 3, 4, 0))


def _single_leaf_tree(path, leaf):
    """Rebuild a minimal nested dict holding one leaf at `path`."""
    tree = leaf
    for p in reversed(path):
        tree = {str(p.key): tree}
    tree.setdefault("params", {})
    tree.setdefault("batch_stats", {})
    return tree
