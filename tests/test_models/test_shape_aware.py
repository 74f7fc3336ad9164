"""SSN ShapeAwareHead: per-task branches, anchors, loss, decode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isfusion_tpu.models.dense_heads import ShapeAwareHead

TASKS = [dict(num_class=1, shared_conv_channels=(16, 16),
              shared_conv_strides=(1, 1)),
         dict(num_class=2, shared_conv_channels=(16, 16, 16),
              shared_conv_strides=(2, 1, 1))]


def make_head():
    return ShapeAwareHead(
        num_classes=3, in_channels=16, feat_channels=16,
        tasks=TASKS,
        anchor_generator=dict(
            type="Anchor3DRangeGenerator",
            ranges=[[-8, -8, -1.8, 8, 8, -1.8]],
            sizes=[[0.6, 0.6, 1.7], [1.9, 4.6, 1.7], [2.9, 10.5, 3.2]],
            rotations=[0, 1.57]),
        bbox_coder=dict(type="DeltaXYZWLHRBBoxCoder"))


@pytest.mark.slow
def test_forward_anchor_alignment_loss_decode():
    head = make_head()
    feats = [jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 16, 16, 16)).astype(np.float32))]
    vars_ = head.init(jax.random.PRNGKey(0), feats)
    preds = head.apply(vars_, feats)
    assert len(preds) == len(TASKS)   # one pseudo-level per task
    # task 0: full res, 1 size x 2 rots; task 1: stride 2, 2 sizes x 2
    assert preds[0][0].shape == (2, 16, 16, 2 * 3)
    assert preds[1][0].shape == (2, 8, 8, 4 * 3)
    fsizes = [p[0].shape[-3:-1] for p in preds]
    anchors = head.anchors_for(fsizes)
    n_pred = sum(int(np.prod(p[0].shape[1:3])) *
                 (p[0].shape[-1] // 3) for p in preds)
    assert anchors.shape[0] == n_pred

    gt = jnp.asarray([[[0, 0, -1.8, 1.9, 4.6, 1.7, 0.0]]] * 2)
    labels = jnp.asarray([[1]] * 2)
    mask = jnp.ones((2, 1), bool)
    losses = head.apply(vars_, preds, gt, labels, mask, method=head.loss)
    assert np.isfinite(float(losses["loss_cls"]))
    assert np.isfinite(float(losses["loss_bbox"]))

    out = head.apply(vars_, preds, method=head.get_bboxes)
    assert np.isfinite(np.asarray(out["bboxes"])).all()
