"""Golden check for the bfloat16 compute policy (VERDICT r2 item 3).

The flagship config runs every module with compute_dtype='bfloat16'
(float32 master params, f32 softmax/norm statistics, f32 box decode —
`models/layers.py:resolve_dtype`). This test initializes ONE float32
parameter tree, runs the tiny IS-Fusion stack once in f32 and once with
the bf16 policy, and asserts the decoded detections agree within mixed-
precision tolerance — the TPU-first equivalent of the reference's
auto_fp16 guard contract (`mmdet3d/models/middle_encoders/
fusion_encoder.py` fp16 wrappers).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isfusion_tpu.flagship import build_isfusion_flagship


@pytest.mark.slow
def test_bf16_predict_matches_f32():
    model32, batch_fn = build_isfusion_flagship(tiny=True)
    model16, _ = build_isfusion_flagship(tiny=True,
                                         tiny_compute_dtype="bfloat16")
    batch = batch_fn(1)
    variables = jax.jit(lambda r, b: model32.init(
        r, b, train=False, mode="feats"))(jax.random.PRNGKey(0), batch)
    # identical param trees: compute_dtype changes computation only
    s32 = jax.eval_shape(lambda: model32.init(
        jax.random.PRNGKey(0), batch, train=False, mode="feats"))
    s16 = jax.eval_shape(lambda: model16.init(
        jax.random.PRNGKey(0), batch, train=False, mode="feats"))
    assert jax.tree_util.tree_structure(s32) == \
        jax.tree_util.tree_structure(s16)
    for a, b_ in zip(jax.tree_util.tree_leaves(s32),
                     jax.tree_util.tree_leaves(s16)):
        assert a.shape == b_.shape and a.dtype == b_.dtype

    out32 = jax.jit(lambda v, b: model32.apply(
        v, b, train=False, mode="predict"))(variables, batch)
    out16 = jax.jit(lambda v, b: model16.apply(
        v, b, train=False, mode="predict"))(variables, batch)
    assert out16["bboxes"].dtype == jnp.float32
    assert out16["scores"].dtype == jnp.float32

    s32_, s16_ = np.asarray(out32["scores"]), np.asarray(out16["scores"])
    b32, b16 = np.asarray(out32["bboxes"]), np.asarray(out16["bboxes"])
    # proposal top-k ordering can swap near-tied queries under bf16;
    # compare the score mass and the boxes of confidently-matched rows
    np.testing.assert_allclose(s32_.sum(), s16_.sum(), rtol=0.1, atol=0.05)
    same = (np.asarray(out32["labels"]) == np.asarray(out16["labels"])) & \
        np.asarray(out32["mask"]) & np.asarray(out16["mask"]) & \
        (np.abs(s32_ - s16_) < 0.02) & (s32_ > 0.05)
    if same.any():
        np.testing.assert_allclose(b16[same][:, :3], b32[same][:, :3],
                                   atol=0.5)
    # untrained-scores sanity: both runs produce finite outputs
    assert np.isfinite(b16).all() and np.isfinite(s16_).all()


@pytest.mark.slow
def test_bf16_train_step_finite():
    """One bf16 train step: finite loss and f32 grads on f32 params."""
    from isfusion_tpu.parallel.train_step import TrainState, make_train_step
    from isfusion_tpu.runner.optim import build_optimizer

    model, batch_fn = build_isfusion_flagship(
        tiny=True, tiny_compute_dtype="bfloat16")
    batch = batch_fn(1)
    variables = jax.jit(lambda r, b: model.init(
        r, b, train=True, mode="loss"))(jax.random.PRNGKey(0), batch)
    for leaf in jax.tree_util.tree_leaves(variables["params"]):
        assert leaf.dtype != jnp.bfloat16  # masters stay f32
    tx = build_optimizer(
        variables["params"],
        optimizer_cfg=dict(type="AdamW", lr=1e-4, weight_decay=0.01),
        optimizer_config=dict(grad_clip=dict(max_norm=0.01)),
        lr_config=None, total_steps=2)
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx, mesh=None, donate=False)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
