"""SSD3DNet / GroupFree3DNet / ImVoteNet smoke tests (tiny shapes)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isfusion_tpu.models import build_detector

NC = 3


def backbone_cfg():
    return dict(
        type="PointNet2SASSG", in_channels=1,
        num_points=(128, 64), radius=(0.5, 1.0), num_samples=(8, 8),
        sa_channels=((8, 8, 16), (16, 16, 32)),
        fp_channels=((32, 32),))


def votehead_cfg():
    return dict(
        type="VoteHead", num_classes=NC,
        bbox_coder=dict(type="PartialBinBasedBBoxCoder", num_dir_bins=6,
                        num_sizes=NC, with_rot=True,
                        mean_sizes=[[1, 1, 1]] * NC),
        vote_module_cfg=dict(in_channels=32, conv_channels=(32,)),
        vote_aggregation_cfg=dict(num_point=16, radius=1.0, num_sample=8,
                                  mlp_channels=[32, 32, 32]),
        feat_channels=(32,))


def tiny_batch(b=2, n=256, g=3, seed=0, with_img=False):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-4, 4, size=(b, n, 4)).astype(np.float32)
    pts[..., 2] = rng.uniform(0, 2.5, (b, n))
    boxes = np.zeros((b, g, 7), np.float32)
    boxes[..., :2] = rng.uniform(-3, 3, (b, g, 2))
    boxes[..., 3:6] = rng.uniform(0.5, 2, (b, g, 3))
    boxes[..., 6] = rng.uniform(-np.pi, np.pi, (b, g))
    batch = dict(points=jnp.asarray(pts),
                 points_mask=jnp.ones((b, n), bool),
                 gt_bboxes_3d=jnp.asarray(boxes),
                 gt_labels_3d=jnp.asarray(rng.integers(0, NC, (b, g))),
                 gt_mask=jnp.ones((b, g), bool))
    if with_img:
        batch["img"] = jnp.asarray(
            rng.uniform(size=(b, 32, 48, 3)).astype(np.float32))
        cam2img = np.array([[30, 0, 24, 0], [0, 30, 16, 0],
                            [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
        batch["cam2img"] = jnp.asarray(
            np.broadcast_to(cam2img, (b, 4, 4)).copy())
    return batch


def run_all_modes(model, batch):
    variables = model.init(jax.random.PRNGKey(0), batch, train=False,
                           mode="feats")
    losses, _ = model.apply(variables, batch, train=True, mode="loss",
                            mutable=["batch_stats"],
                            rngs={"dropout": jax.random.PRNGKey(1)})
    assert all(np.isfinite(float(v)) for v in losses.values()), losses
    out = model.apply(variables, batch, train=False, mode="predict")
    assert np.isfinite(np.asarray(out["bboxes"])).all()
    return losses, out


def test_ssd3dnet():
    cfg = dict(
        type="SSD3DNet", backbone=backbone_cfg(),
        bbox_head=dict(
            type="SSD3DHead", num_classes=NC,
            bbox_coder=dict(type="PartialBinBasedBBoxCoder",
                            num_dir_bins=6, num_sizes=NC, with_rot=True,
                            mean_sizes=[[1, 1, 1]] * NC),
            candidate_shift_channels=(16,), feat_channels=(32,),
            vote_aggregation_cfg=dict(num_point=16, radius=2.0,
                                      num_sample=8,
                                      mlp_channels=[16, 16, 32])),
        test_cfg=dict(max_output_num=8))
    losses, out = run_all_modes(build_detector(cfg), tiny_batch())
    assert "center_loss" in losses
    assert out["bboxes"].shape == (2, 8, 7)


def groupfree_head_cfg(size_cls_agnostic=True, num_layers=2):
    return dict(
        type="GroupFree3DHead", num_classes=NC, in_channels=32,
        num_decoder_layers=num_layers, num_proposal=16,
        embed_dims=32, num_heads=4, ffn_channels=64,
        pred_layer_cfg=dict(in_channels=32,
                            shared_conv_channels=(32, 32)),
        bbox_coder=dict(type="GroupFree3DBBoxCoder", num_dir_bins=6,
                        num_sizes=NC, with_rot=True,
                        size_cls_agnostic=size_cls_agnostic,
                        mean_sizes=[[1, 1, 1]] * NC),
        sampling_objectness_loss=dict(type="FocalLoss", loss_weight=8.0),
        center_loss=dict(type="SmoothL1Loss", loss_weight=10.0),
        dir_res_loss=dict(type="SmoothL1Loss", loss_weight=10.0),
        size_reg_loss=dict(type="SmoothL1Loss", loss_weight=10.0),
        size_res_loss=dict(type="SmoothL1Loss", loss_weight=10.0))


@pytest.mark.parametrize("agnostic", [True, False])
def test_groupfree3dnet(agnostic):
    cfg = dict(
        type="GroupFree3DNet", backbone=backbone_cfg(),
        bbox_head=groupfree_head_cfg(size_cls_agnostic=agnostic),
        test_cfg=dict(max_output_num=8, prediction_stages="last"))
    losses, out = run_all_modes(build_detector(cfg), tiny_batch())
    # stage-summed loss surface: KPS sampling loss + per-stage losses for
    # proposal and both decoder layers (groupfree3d_head.py loss:420-533)
    assert "sampling_objectness_loss" in losses
    for prefix in ("proposal.", "s0.", "s1."):
        assert f"{prefix}objectness_loss" in losses
        assert f"{prefix}center_loss" in losses
        assert f"{prefix}dir_res_loss" in losses
        assert f"{prefix}semantic_loss" in losses
        if agnostic:
            assert f"{prefix}size_reg_loss" in losses
        else:
            assert f"{prefix}size_class_loss" in losses
            assert f"{prefix}size_res_loss" in losses
    assert out["bboxes"].shape == (2, 8, 7)


def test_groupfree3d_all_stage_predictions():
    cfg = dict(
        type="GroupFree3DNet", backbone=backbone_cfg(),
        bbox_head=groupfree_head_cfg(),
        test_cfg=dict(max_output_num=8, prediction_stages="all"))
    model = build_detector(cfg)
    batch = tiny_batch()
    variables = model.init(jax.random.PRNGKey(0), batch, train=False,
                           mode="feats")
    out = model.apply(variables, batch, train=False, mode="predict")
    assert out["bboxes"].shape == (2, 8, 7)
    preds = model.apply(variables, batch, train=False, mode="feats")
    # per-stage prediction heads are distinct modules fed the SAME
    # candidates; proposal and s1 outputs must differ (refinement)
    assert not np.allclose(np.asarray(preds["proposal.center"]),
                           np.asarray(preds["s1.center"]))
    # decoded query positions come from the previous stage's box
    assert preds["s0.center"].shape == preds["proposal.center"].shape


def test_imvotenet():
    cfg = dict(
        type="ImVoteNet", backbone=backbone_cfg(),
        img_backbone=dict(type="ResNet", depth=18, base_channels=8,
                          out_indices=(1,)),
        img_feat_dim=8,
        bbox_head=dict(votehead_cfg(),
                       vote_module_cfg=dict(in_channels=40,
                                            conv_channels=(32,))),
        test_cfg=dict(max_output_num=8))
    losses, out = run_all_modes(build_detector(cfg),
                                tiny_batch(with_img=True))
    assert out["bboxes"].shape == (2, 8, 7)
