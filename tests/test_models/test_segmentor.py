"""EncoderDecoder3D segmentation smoke test."""
import jax
import jax.numpy as jnp
import numpy as np

import isfusion_tpu.models  # noqa: F401  (registration side effects)
from isfusion_tpu.registry import SEGMENTORS, build_from_cfg


def tiny_seg_cfg():
    return dict(
        type="EncoderDecoder3D",
        backbone=dict(
            type="PointNet2SASSG", in_channels=3,
            num_points=(128, 64), radius=(0.4, 0.8),
            num_samples=(8, 8),
            sa_channels=((8, 8, 16), (16, 16, 32)),
            fp_channels=()),
        decode_head=dict(
            type="PointNet2Head", num_classes=5,
            fp_channels=((48, 16, 16), (19, 16, 16)),
            channels=16, dropout_ratio=0.5))


def test_seg_forward_loss_predict():
    model = build_from_cfg(tiny_seg_cfg(), SEGMENTORS)
    rng = np.random.default_rng(0)
    n = 256
    batch = dict(
        points=jnp.asarray(rng.normal(size=(2, n, 6))[..., :6]
                           .astype(np.float32)),
        points_mask=jnp.asarray(rng.uniform(size=(2, n)) > 0.1),
        pts_semantic_mask=jnp.asarray(rng.integers(0, 5, (2, n))))
    variables = model.init(jax.random.PRNGKey(0), batch, train=False,
                           mode="feats")
    logits = model.apply(variables, batch, train=False, mode="feats")
    assert logits.shape == (2, n, 5)
    losses, _ = model.apply(variables, batch, train=True, mode="loss",
                            mutable=["batch_stats"],
                            rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.isfinite(float(losses["loss_sem_seg"]))
    out = model.apply(variables, batch, train=False, mode="predict")
    assert out["semantic_pred"].shape == (2, n)
