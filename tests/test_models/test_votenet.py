"""VoteNet (PointNet++ backbone + vote head) end-to-end on tiny shapes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isfusion_tpu.models import build_detector

NC = 4


def tiny_votenet_cfg():
    return dict(
        type="VoteNet",
        backbone=dict(
            type="PointNet2SASSG", in_channels=1,
            num_points=(128, 64, 32, 16),
            radius=(0.4, 0.8, 1.2, 2.4),
            num_samples=(8, 8, 8, 8),
            sa_channels=((8, 8, 16), (16, 16, 32), (16, 16, 32),
                         (16, 16, 32)),
            fp_channels=((32, 32), (32, 32))),
        bbox_head=dict(
            type="VoteHead", num_classes=NC,
            bbox_coder=dict(
                type="PartialBinBasedBBoxCoder", num_dir_bins=6,
                num_sizes=NC, with_rot=True,
                mean_sizes=[[0.6, 0.6, 0.5], [1.0, 1.0, 1.0],
                            [2.0, 1.0, 1.0], [0.5, 0.5, 1.8]]),
            vote_module_cfg=dict(in_channels=32, vote_per_seed=1,
                                 conv_channels=(32, 32)),
            vote_aggregation_cfg=dict(num_point=32, radius=0.9,
                                      num_sample=8,
                                      mlp_channels=[32, 32, 32, 32]),
            feat_channels=(32, 32)),
        test_cfg=dict(max_output_num=16),
    )


def tiny_batch(b=2, n=256, g=3, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-4, 4, size=(b, n, 4)).astype(np.float32)
    pts[..., 2] = rng.uniform(0, 2.5, (b, n))
    mask = rng.uniform(size=(b, n)) > 0.05
    boxes = np.zeros((b, g, 7), np.float32)
    boxes[..., :2] = rng.uniform(-3, 3, (b, g, 2))
    boxes[..., 2] = 0.0
    boxes[..., 3:6] = rng.uniform(0.5, 2.0, (b, g, 3))
    boxes[..., 6] = rng.uniform(-np.pi, np.pi, (b, g))
    labels = rng.integers(0, NC, (b, g))
    gt_mask = np.ones((b, g), bool)
    gt_mask[:, -1] = False
    return dict(points=jnp.asarray(pts), points_mask=jnp.asarray(mask),
                gt_bboxes_3d=jnp.asarray(boxes),
                gt_labels_3d=jnp.asarray(labels),
                gt_mask=jnp.asarray(gt_mask))


@pytest.fixture(scope="module")
def model_and_vars():
    model = build_detector(tiny_votenet_cfg())
    batch = tiny_batch()
    variables = jax.jit(
        lambda r, b: model.init(r, b, train=False, mode="feats"))(
            jax.random.PRNGKey(0), batch)
    return model, variables, batch


def test_forward(model_and_vars):
    model, variables, batch = model_and_vars
    preds = jax.jit(
        lambda v, b: model.apply(v, b, train=False, mode="feats"))(
            variables, batch)
    assert preds["vote_xyz"].shape == (2, 64, 3)
    assert preds["aggregated_points"].shape == (2, 32, 3)
    assert preds["obj_scores"].shape == (2, 32, 2)
    assert preds["size_res"].shape == (2, 32, NC, 3)


def test_loss_and_grads(model_and_vars):
    model, variables, batch = model_and_vars
    losses, _ = jax.jit(
        lambda v, b: model.apply(v, b, train=True, mode="loss",
                                 mutable=["batch_stats"]))(variables, batch)
    for k in ("vote_loss", "objectness_loss", "center_loss",
              "dir_class_loss", "size_res_loss", "semantic_loss"):
        assert k in losses and np.isfinite(float(losses[k])), k

    def loss_fn(params):
        out, _ = model.apply({**variables, "params": params}, batch,
                             train=True, mode="loss",
                             mutable=["batch_stats"])
        return sum(jnp.asarray(v) for v in out.values())

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    total = sum(float(jnp.sum(jnp.abs(g)))
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(total) and total > 0


def test_predict(model_and_vars):
    model, variables, batch = model_and_vars
    out = jax.jit(
        lambda v, b: model.apply(v, b, train=False, mode="predict"))(
            variables, batch)
    assert out["bboxes"].shape == (2, 16, 7)
    assert np.isfinite(np.asarray(out["bboxes"])).all()
    assert (np.asarray(out["bboxes"][..., 3:6]) > 0).all()
