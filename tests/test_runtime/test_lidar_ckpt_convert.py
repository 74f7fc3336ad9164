"""Coverage test for the LiDAR-family checkpoint converter
(CenterPoint-style trees: DynamicVFE + SparseEncoder + SECOND +
SECONDFPN + CenterHead) — same capture/materialize harness as
test_full_ckpt_convert.py, driving `convert_detector_torch_to_flax`
so TransFusion-style and CenterPoint-style leaves both resolve.
"""
import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")

from tests.test_runtime.test_full_ckpt_convert import (  # noqa: E402
    _Capture, _Recording, _torch_shape, _single_leaf_tree)


@pytest.fixture(scope="module")
def cp_variables():
    from tests.test_models.test_centerpoint import model_and_vars
    model, variables, batch = model_and_vars.__wrapped__()
    return jax.tree_util.tree_map(np.asarray, variables)


def test_lidar_converter_covers_centerpoint_tree(cp_variables):
    import functools
    from isfusion_tpu.runner.full_ckpt_convert import \
        convert_detector_torch_to_flax
    # routing pinned from the FULL tree: the harness probes single-leaf
    # trees, which lack the sibling keys structural routing inspects
    convert = functools.partial(
        convert_detector_torch_to_flax,
        lidar_mods={"pts_backbone_m", "pts_neck_m", "pts_bbox_head_m"})

    cap = _Capture()
    _, missing1 = convert(cap, cp_variables)
    n_leaves = len(jax.tree_util.tree_leaves(cp_variables))
    assert len(missing1) == n_leaves
    assert cap.requested

    from isfusion_tpu.runner.full_ckpt_convert import (
        convert_isfusion_torch_to_flax, convert_lidar_torch_to_flax)

    flat = jax.tree_util.tree_flatten_with_path(cp_variables)[0]
    sd = {}
    lidar_routed = {"pts_backbone_m", "pts_neck_m", "pts_bbox_head_m"}
    for path, leaf in flat:
        pstr = "/".join(str(p.key) for p in path)
        single = _single_leaf_tree(path, leaf)
        # materialize through the ROUTED family only — the discarded
        # family's probe requests would otherwise create keys with the
        # wrong shapes (e.g. the flagship resolver's deblocks.{i+1})
        fam = convert_lidar_torch_to_flax \
            if str(path[1].key) in lidar_routed \
            else convert_isfusion_torch_to_flax
        for _ in range(5):
            probe = _Recording(sd)
            _, miss = fam(probe, single)
            new = probe.missed - set(sd)
            if not miss or not new:
                break
            for key in new:
                rng = np.random.default_rng(abs(hash(key)) % (2 ** 31))
                sd[key] = rng.normal(size=_torch_shape(
                    key, leaf.shape, pstr)).astype(np.float32)

    out, missing = convert(sd, cp_variables)
    assert missing == [], f"unconverted params: {missing[:10]}"
    for (path, leaf), (_, conv) in zip(
            flat, jax.tree_util.tree_flatten_with_path(out)[0]):
        assert np.asarray(conv).shape == leaf.shape, \
            "/".join(str(p.key) for p in path)

    # layout spot checks
    w = sd["pts_backbone.blocks.0.0.weight"]
    got = out["params"]["pts_backbone_m"]["_SECONDBlock_0"][
        "ConvModule_0"]["Conv_0"]["kernel"]
    np.testing.assert_allclose(np.asarray(got), w.transpose(2, 3, 1, 0))
    w = sd["pts_bbox_head.task_heads.0.reg.0.conv.weight"]
    got = out["params"]["pts_bbox_head_m"]["task_heads_0"]["reg_0"][
        "Conv_0"]["kernel"]
    np.testing.assert_allclose(np.asarray(got), w.transpose(2, 3, 1, 0))
    w = sd["pts_middle_encoder.conv_input.0.weight"]
    got = out["params"]["pts_middle_encoder_m"]["conv_input"]["kernel"]
    np.testing.assert_allclose(np.asarray(got), w.transpose(1, 2, 3, 4, 0))
    # the CenterHead final conv index skipped the ConvModule entries
    assert "pts_bbox_head.task_heads.0.reg.1.weight" in sd
