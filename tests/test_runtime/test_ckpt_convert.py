"""Swin torch->flax checkpoint conversion: key mapping + layout roundtrip."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isfusion_tpu.models.backbones.swin import SwinTransformer
from isfusion_tpu.runner.ckpt_convert import convert_swin_torch_to_flax


def flax_to_torch_sd(params):
    """Inverse mapping: build an mmdet-style torch state_dict from flax
    params (numpy, torch layouts)."""
    sd = {}
    p = params
    sd["patch_embed.projection.weight"] = np.transpose(
        p["patch_embed"]["kernel"], (3, 2, 0, 1))
    sd["patch_embed.projection.bias"] = np.asarray(p["patch_embed"]["bias"])
    sd["patch_embed.norm.weight"] = np.asarray(p["patch_norm"]["scale"])
    sd["patch_embed.norm.bias"] = np.asarray(p["patch_norm"]["bias"])
    for name, sub in p.items():
        if name.startswith("out_norm"):
            i = name[len("out_norm"):]
            sd[f"norm{i}.weight"] = np.asarray(sub["scale"])
            sd[f"norm{i}.bias"] = np.asarray(sub["bias"])
        if name.startswith("downsample"):
            i = name[len("downsample"):]
            sd[f"stages.{i}.downsample.norm.weight"] = \
                np.asarray(sub["norm"]["scale"])
            sd[f"stages.{i}.downsample.norm.bias"] = \
                np.asarray(sub["norm"]["bias"])
            sd[f"stages.{i}.downsample.reduction.weight"] = \
                np.asarray(sub["reduction"]["kernel"]).T
        if name.startswith("stage") and "_block" in name:
            i, d = name[5:].split("_block")
            base = f"stages.{i}.blocks.{d}"
            sd[f"{base}.norm1.weight"] = np.asarray(sub["norm1"]["scale"])
            sd[f"{base}.norm1.bias"] = np.asarray(sub["norm1"]["bias"])
            sd[f"{base}.norm2.weight"] = np.asarray(sub["norm2"]["scale"])
            sd[f"{base}.norm2.bias"] = np.asarray(sub["norm2"]["bias"])
            msa = sub["attn"]["w_msa"]
            sd[f"{base}.attn.w_msa.relative_position_bias_table"] = \
                np.asarray(msa["relative_position_bias_table"])
            sd[f"{base}.attn.w_msa.qkv.weight"] = \
                np.asarray(msa["qkv"]["kernel"]).T
            sd[f"{base}.attn.w_msa.qkv.bias"] = np.asarray(
                msa["qkv"]["bias"])
            sd[f"{base}.attn.w_msa.proj.weight"] = \
                np.asarray(msa["proj"]["kernel"]).T
            sd[f"{base}.attn.w_msa.proj.bias"] = np.asarray(
                msa["proj"]["bias"])
            sd[f"{base}.ffn.layers.0.0.weight"] = \
                np.asarray(sub["ffn_fc1"]["kernel"]).T
            sd[f"{base}.ffn.layers.0.0.bias"] = np.asarray(
                sub["ffn_fc1"]["bias"])
            sd[f"{base}.ffn.layers.1.weight"] = \
                np.asarray(sub["ffn_fc2"]["kernel"]).T
            sd[f"{base}.ffn.layers.1.bias"] = np.asarray(
                sub["ffn_fc2"]["bias"])
    return sd


def tree_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), f"{path}: {set(a)} vs {set(b)}"
        for k in a:
            tree_equal(a[k], b[k], f"{path}/{k}")
    else:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   err_msg=path)


def test_roundtrip_exact():
    model = SwinTransformer(embed_dims=24, depths=(1, 1), num_heads=(3, 6),
                            out_indices=(0, 1))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.ones((1, 28, 28, 3)), train=False)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    sd = flax_to_torch_sd(params)
    back = convert_swin_torch_to_flax(sd)
    tree_equal(params, back)


def test_forward_identical_after_conversion():
    model = SwinTransformer(embed_dims=24, depths=(1, 1), num_heads=(3, 6),
                            out_indices=(0, 1))
    img = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 28, 28, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), img, train=False)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    restored = convert_swin_torch_to_flax(flax_to_torch_sd(params))
    out_a = model.apply({"params": params}, img, train=False)
    out_b = model.apply({"params": restored}, img, train=False)
    for a, b in zip(out_a, out_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_prefix_stripping():
    model = SwinTransformer(embed_dims=24, depths=(1,), num_heads=(3,),
                            out_indices=(0,))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.ones((1, 28, 28, 3)), train=False)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    sd = {f"img_backbone.{k}": v
          for k, v in flax_to_torch_sd(params).items()}
    sd["pts_backbone.some.other.weight"] = np.zeros(3)
    back = convert_swin_torch_to_flax(sd, prefix="img_backbone.")
    tree_equal(params, back)
