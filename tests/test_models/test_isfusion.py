"""IS-Fusion flagship detector end-to-end on tiny shapes: forward, loss
(incl. Hungarian matching + aux instance heatmap), gradient flow through
both modalities, and NMS-free decode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isfusion_tpu.models import build_detector

PCR = [-8, -8, -5, 8, 8, 3]
VOXEL = [0.25, 0.25, 0.2]
OSF = 8          # BEV 8x8
H, W = 32, 48    # image size
NC = 3


def pinhole(f=24.0):
    K = np.array([[f, 0, W / 2, 0], [0, f, H / 2, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    R = np.array([[0, -1, 0, 0], [0, 0, -1, 0],
                  [1, 0, 0, 0], [0, 0, 0, 1]], np.float32)
    return K @ R


def tiny_isfusion_cfg():
    return dict(
        type="ISFusionDetector",
        detach=False,
        pc_range=PCR, voxel_size=VOXEL, out_size_factor=OSF,
        pillar_max_voxels=(64, 64),
        img_backbone=dict(
            type="SwinTransformer", embed_dims=24, depths=(1, 1, 1),
            num_heads=(3, 6, 12), window_size=7, out_indices=(0, 1, 2),
            drop_path_rate=0.0),
        img_neck=dict(
            type="GeneralizedLSSFPN", in_channels=[24, 48, 96],
            out_channels=16, num_outs=2),
        pts_voxel_layer=dict(
            max_num_points=-1, point_cloud_range=PCR, voxel_size=VOXEL,
            max_voxels=512),
        pts_voxel_encoder=dict(
            type="DynamicVFE", in_channels=5, feat_channels=[16, 16],
            with_cluster_center=True, with_voxel_center=True,
            voxel_size=VOXEL, point_cloud_range=PCR),
        pts_middle_encoder=dict(
            type="SparseEncoder", in_channels=16,
            sparse_shape=[40, 64, 64], base_channels=8, output_channels=16,
            encoder_channels=((8, 8), (16, 16), (16, 16), (16, 16)),
            encoder_paddings=((1, 1), (1, 1), (1, 1), ((0, 1, 1), 1)),
            block_type="basicblock"),
        fusion_encoder=dict(
            type="ISFusionEncoder", num_points_in_pillar=12,
            embed_dims=16, num_classes=NC, bev_size=8, num_views=2,
            region_shape=((2, 2, 1), (2, 2, 1)),
            grid_size=((8, 8, 1), (4, 4, 1)),
            instance_num=8, nms_kernel_size=3),
        pts_backbone=dict(
            type="SECONDV2", in_channels=8, out_channels=[8, 16],
            layer_nums=[1, 1], layer_strides=[1, 2]),
        pts_neck=dict(
            type="SECONDFPN", in_channels=[8, 16], out_channels=[16, 16],
            upsample_strides=[1, 2], use_conv_for_no_stride=True),
        pts_bbox_head=dict(
            type="TransFusionHeadV2", num_proposals=16, auxiliary=True,
            in_channels=32, hidden_channel=16, num_classes=NC,
            num_decoder_layers=1, num_heads=8, nms_kernel_size=3,
            ffn_channel=32, dropout=0.1,
            common_heads=dict(center=(2, 2), height=(1, 2), dim=(3, 2),
                              rot=(2, 2), vel=(2, 2)),
            bbox_coder=dict(
                type="TransFusionBBoxCoder", pc_range=PCR[:2],
                voxel_size=VOXEL[:2], out_size_factor=OSF,
                post_center_range=[-10, -10, -10, 10, 10, 10],
                score_threshold=0.0, code_size=10),
            loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                          alpha=0.25, reduction="mean", loss_weight=1.0),
            loss_bbox=dict(type="L1Loss", reduction="mean",
                           loss_weight=0.25),
            loss_heatmap=dict(type="GaussianFocalLoss", reduction="mean",
                              loss_weight=1.0)),
        train_cfg=dict(pts=dict(
            dataset="tiny",
            assigner=dict(
                type="HungarianAssigner3D",
                cls_cost=dict(gamma=2.0, alpha=0.25, weight=0.15),
                reg_cost=dict(weight=0.25), iou_cost=dict(weight=0.25)),
            pos_weight=-1, gaussian_overlap=0.1, min_radius=2,
            grid_size=[64, 64, 40], voxel_size=VOXEL, out_size_factor=OSF,
            code_weights=[1.0] * 8 + [0.2, 0.2],
            point_cloud_range=PCR)),
        test_cfg=dict(pts=dict(
            dataset="tiny", grid_size=[64, 64, 40], out_size_factor=OSF,
            pc_range=PCR[:2], voxel_size=VOXEL[:2], nms_type=None)),
    )


def tiny_batch(b=2, p=512, nv=2, g=4, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-7, 7, size=(b, p, 5)).astype(np.float32)
    pts[..., 2] = rng.uniform(-4, 2, size=(b, p))
    pts[..., 4] = 0.0
    mask = rng.uniform(size=(b, p)) > 0.1
    img = rng.uniform(size=(b, nv, H, W, 3)).astype(np.float32)
    l2i = np.broadcast_to(np.stack([pinhole()] * nv), (b, nv, 4, 4)).copy()
    boxes = np.zeros((b, g, 9), np.float32)
    boxes[..., :2] = rng.uniform(-6, 6, size=(b, g, 2))
    boxes[..., 2] = -1.5
    boxes[..., 3:6] = rng.uniform(0.5, 4, size=(b, g, 3))
    boxes[..., 6] = rng.uniform(-np.pi, np.pi, size=(b, g))
    boxes[..., 7:9] = rng.uniform(-1, 1, size=(b, g, 2))
    labels = rng.integers(0, NC, size=(b, g))
    gt_mask = np.ones((b, g), bool)
    gt_mask[:, -1] = False
    view_mask = np.ones((b, nv), bool)
    view_mask[0, 1] = False  # exercise ModalMask3D view dropping
    return dict(points=jnp.asarray(pts), points_mask=jnp.asarray(mask),
                img=jnp.asarray(img), lidar2img=jnp.asarray(l2i),
                img_view_mask=jnp.asarray(view_mask),
                gt_bboxes_3d=jnp.asarray(boxes),
                gt_labels_3d=jnp.asarray(labels),
                gt_mask=jnp.asarray(gt_mask))


@pytest.fixture(scope="module")
def model_and_vars():
    model = build_detector(tiny_isfusion_cfg())
    batch = tiny_batch()
    variables = jax.jit(
        lambda r, b: model.init(r, b, train=False, mode="feats"))(
            jax.random.PRNGKey(0), batch)
    return model, variables, batch


def test_forward_feats(model_and_vars):
    model, variables, batch = model_and_vars
    preds, ins_hm = jax.jit(
        lambda v, b: model.apply(v, b, train=False, mode="feats"))(
            variables, batch)
    assert preds["center"].shape == (2, 16, 2)
    assert preds["heatmap"].shape == (2, 16, NC)
    assert preds["dense_heatmap"].shape == (2, 8, 8, NC)
    assert preds["query_heatmap_score"].shape == (2, 16, NC)
    assert ins_hm.shape == (2, 8, 8, NC)
    assert np.isfinite(np.asarray(preds["center"])).all()


def test_loss_finite(model_and_vars):
    model, variables, batch = model_and_vars
    losses, _ = jax.jit(
        lambda v, b: model.apply(v, b, train=True, mode="loss",
                                 mutable=["batch_stats"],
                                 rngs={"dropout": jax.random.PRNGKey(3)}))(
            variables, batch)
    expected = {"loss_heatmap", "loss_heatmap_ins", "layer_-1_loss_cls",
                "layer_-1_loss_bbox", "matched_ious"}
    assert expected <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses["loss_heatmap"]) > 0


@pytest.mark.slow
def test_grads_flow_both_modalities(model_and_vars):
    model, variables, batch = model_and_vars

    def loss_fn(params):
        losses, _ = model.apply(
            {**variables, "params": params}, batch, train=True,
            mode="loss", mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(5)})
        return sum(jnp.asarray(v) for k, v in losses.items()
                   if "loss" in k)

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]

    def total(substr):
        return sum(float(jnp.sum(jnp.abs(g))) for kp, g in flat
                   if substr in jax.tree_util.keystr(kp))

    assert total("img_backbone") > 0     # through P2G sampling
    assert total("middle_encoder") > 0   # through sparse encoder
    assert total("fusion_encoder") > 0
    assert all(np.isfinite(np.asarray(g)).all() for _, g in flat)


def test_predict(model_and_vars):
    model, variables, batch = model_and_vars
    out = jax.jit(
        lambda v, b: model.apply(v, b, train=False, mode="predict"))(
            variables, batch)
    assert out["bboxes"].shape == (2, 16, 9)
    assert out["scores"].shape == (2, 16)
    assert np.isfinite(np.asarray(out["bboxes"])).all()
    assert np.asarray(out["labels"]).max() < NC


def test_forward_with_host_plan_matches(model_and_vars):
    """The host-precomputed structure plan (ops/host_plan.make_plan_fn)
    must leave the detector's forward outputs bit-identical."""
    from isfusion_tpu.ops.host_plan import make_plan_fn

    model, variables, batch = model_and_vars
    fn = make_plan_fn(tiny_isfusion_cfg(), train=False)
    assert fn is not None
    host_batch = {k: np.asarray(v) for k, v in batch.items()}
    planned = fn(dict(host_batch))
    assert "sparse_plan" in planned
    planned = jax.tree_util.tree_map(jnp.asarray, planned)

    ref = jax.jit(
        lambda v, b: model.apply(v, b, train=False, mode="feats"))(
            variables, batch)
    got = jax.jit(
        lambda v, b: model.apply(v, b, train=False, mode="feats"))(
            variables, planned)
    jax.tree_util.tree_map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=1e-5), ref, got)
