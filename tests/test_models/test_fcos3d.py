"""FCOS3D monocular detector end-to-end on tiny shapes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isfusion_tpu.models import build_detector

H, W = 64, 96
NC = 3


def tiny_fcos3d_cfg():
    return dict(
        type="FCOSMono3D",
        backbone=dict(type="ResNet", depth=18, base_channels=8,
                      out_indices=(1, 2, 3)),
        neck=dict(type="FPN", in_channels=[16, 32, 64], out_channels=16,
                  start_level=0, num_outs=3),
        bbox_head=dict(
            type="FCOSMono3DHead", num_classes=NC, in_channels=16,
            feat_channels=16, stacked_convs=1,
            strides=(8, 16, 32),
            regress_ranges=((-1, 48), (48, 96), (96, 1e8)),
            cls_branch=(16,), reg_branch=((16,), (16,), (16,), (16,), ()),
            dir_branch=(16,), attr_branch=(16,), centerness_branch=(16,),
            num_attrs=4,
            norm_cfg=dict(type="GN", num_groups=4)),
        test_cfg=dict(max_per_img=16),
    )


def tiny_batch(b=2, g=4, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.uniform(size=(b, H, W, 3)).astype(np.float32)
    cam2img = np.broadcast_to(np.array(
        [[50.0, 0, W / 2, 0], [0, 50.0, H / 2, 0],
         [0, 0, 1, 0], [0, 0, 0, 1]], np.float32), (b, 4, 4)).copy()
    centers2d = rng.uniform(10, 50, size=(b, g, 2)).astype(np.float32)
    depths = rng.uniform(5, 40, size=(b, g)).astype(np.float32)
    gt2d = np.zeros((b, g, 4), np.float32)
    gt2d[..., 0] = centers2d[..., 0] - 8
    gt2d[..., 1] = centers2d[..., 1] - 8
    gt2d[..., 2] = centers2d[..., 0] + 8
    gt2d[..., 3] = centers2d[..., 1] + 8
    g3d = np.zeros((b, g, 9), np.float32)
    g3d[..., 0] = rng.uniform(-10, 10, (b, g))   # cam x
    g3d[..., 1] = rng.uniform(-2, 2, (b, g))     # cam y
    g3d[..., 2] = depths                          # cam z
    g3d[..., 3:6] = rng.uniform(0.5, 4, (b, g, 3))
    g3d[..., 6] = rng.uniform(-np.pi, np.pi, (b, g))
    labels = rng.integers(0, NC, (b, g))
    attrs = rng.integers(0, 4, (b, g))
    mask = np.ones((b, g), bool)
    mask[:, -1] = False
    return dict(img=jnp.asarray(img), cam2img=jnp.asarray(cam2img),
                gt_bboxes=jnp.asarray(gt2d),
                centers2d=jnp.asarray(centers2d),
                depths=jnp.asarray(depths),
                gt_bboxes_3d=jnp.asarray(g3d),
                gt_labels_3d=jnp.asarray(labels),
                attr_labels=jnp.asarray(attrs),
                gt_mask=jnp.asarray(mask))


@pytest.fixture(scope="module")
def model_and_vars():
    model = build_detector(tiny_fcos3d_cfg())
    batch = tiny_batch()
    variables = jax.jit(
        lambda r, b: model.init(r, b, train=False, mode="feats"))(
            jax.random.PRNGKey(0), batch)
    return model, variables, batch


def test_forward_levels(model_and_vars):
    model, variables, batch = model_and_vars
    preds = model.apply(variables, batch, train=False, mode="feats")
    assert len(preds) == 3
    assert preds[0]["cls_score"].shape == (2, 8, 12, NC)
    assert preds[0]["bbox_pred"].shape == (2, 8, 12, 9)
    assert preds[0]["dir_cls_pred"].shape == (2, 8, 12, 2)
    assert preds[0]["attr_pred"].shape == (2, 8, 12, 4)
    # depth/size channels must be positive (exp applied)
    assert (np.asarray(preds[0]["bbox_pred"][..., 2:6]) > 0).all()


@pytest.mark.slow
def test_loss_finite_and_grads(model_and_vars):
    model, variables, batch = model_and_vars
    losses = jax.jit(
        lambda v, b: model.apply(v, b, train=False, mode="loss"))(
            variables, batch)
    for k in ("loss_cls", "loss_bbox", "loss_centerness", "loss_dir",
              "loss_attr"):
        assert k in losses and np.isfinite(float(losses[k])), k

    def loss_fn(params):
        out = model.apply({**variables, "params": params}, batch,
                          train=False, mode="loss")
        return sum(jnp.asarray(v) for v in out.values())

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    total = sum(float(jnp.sum(jnp.abs(g)))
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(total) and total > 0


def test_predict_decode(model_and_vars):
    model, variables, batch = model_and_vars
    out = jax.jit(
        lambda v, b: model.apply(v, b, train=False, mode="predict"))(
            variables, batch)
    assert out["bboxes"].shape == (2, 16, 9)
    assert np.isfinite(np.asarray(out["bboxes"])).all()
    assert out["labels"].shape == (2, 16)
    assert "attrs" in out
