"""IoUNegPiecewiseSampler + newly added coders (golden/invariant tests,
pattern of reference tests/test_utils/test_samplers.py and
test_bbox_coders.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isfusion_tpu.core.bbox.samplers import (IoUNegPiecewiseSampler,
                                             PseudoSampler)
from isfusion_tpu.core.bbox.coders import (AnchorFreeBBoxCoder,
                                           GroupFree3DBBoxCoder,
                                           NMSFreeCoder)


def test_iou_neg_piecewise_bands():
    rng = np.random.default_rng(0)
    n = 200
    gt_inds = np.zeros(n, np.int32)
    gt_inds[:20] = rng.integers(1, 5, 20)           # 20 positives
    iou = np.zeros(n, np.float32)
    iou[20:80] = rng.uniform(0.3, 0.54, 60)         # hard negatives
    iou[80:] = rng.uniform(0.0, 0.05, 120)          # easy negatives
    s = IoUNegPiecewiseSampler(
        num=100, pos_fraction=0.5,
        neg_piece_fractions=[0.8, 0.2],
        neg_iou_piece_thrs=[0.55, 0.1])
    out = s.sample(jax.random.PRNGKey(0), jnp.asarray(gt_inds),
                   jnp.asarray(iou))
    pos = np.asarray(out["pos_inds"])[np.asarray(out["pos_valid"])]
    neg = np.asarray(out["neg_inds"])[np.asarray(out["neg_valid"])]
    assert len(pos) == 20 and (gt_inds[pos] > 0).all()
    assert len(neg) == 50 and (gt_inds[neg] == 0).all()
    # hard band budget = 40 of 50, but only 60 hard negs exist; at least
    # the hard-band budget must come from the hard band
    hard = ((iou[neg] >= 0.1) & (iou[neg] < 0.55)).sum()
    assert hard >= 40
    assert len(set(neg.tolist())) == len(neg)  # no duplicates


def test_pseudo_sampler():
    gt_inds = jnp.asarray([0, 2, 0, 1])
    out = PseudoSampler().sample(jax.random.PRNGKey(0), gt_inds)
    assert np.asarray(out["pos_valid"]).sum() == 2
    assert np.asarray(out["neg_valid"]).sum() == 2


def test_anchor_free_coder_roundtrip():
    c = AnchorFreeBBoxCoder(num_dir_bins=12)
    center = jnp.asarray([[1.0, 2.0, 0.5], [-3.0, 0.0, 1.0]])
    dims = jnp.asarray([[4.0, 2.0, 1.5], [0.8, 0.8, 1.8]])
    yaw = jnp.asarray([0.7, -2.1])
    ctr, size_res, dcls, dres = c.encode(center, dims, yaw,
                                         jnp.asarray([0, 1]))
    np.testing.assert_allclose(np.asarray(size_res), np.asarray(dims) / 2)
    # decode from one-hot logits + per-bin residual rows
    logits = jax.nn.one_hot(dcls, 12) * 10
    res_rows = jnp.tile(dres[:, None], (1, 12))
    out = c.decode(center, logits, res_rows, size_res)
    np.testing.assert_allclose(np.asarray(out[:, :3]), np.asarray(center),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[:, 3:6]), np.asarray(dims),
                               atol=1e-5)
    # yaw recovered modulo 2pi
    d = np.abs(((np.asarray(out[:, 6]) - np.asarray(yaw)) + np.pi)
               % (2 * np.pi) - np.pi)
    assert (d < 1e-4).all()


def test_groupfree3d_coder_agnostic_and_cluster():
    mean_sizes = [[4, 2, 1.5], [0.8, 0.8, 1.8]]
    for agnostic in (True, False):
        c = GroupFree3DBBoxCoder(num_dir_bins=6, num_sizes=2,
                                 mean_sizes=mean_sizes,
                                 size_cls_agnostic=agnostic)
        center = jnp.asarray([[[0.0, 0.0, 0.0]]])
        out = c.decode(dict(
            center=center,
            dir_class=jax.nn.one_hot(jnp.asarray([[1]]), 6) * 5,
            dir_res=jnp.zeros((1, 1, 6)),
            size=jnp.asarray([[[3.0, 1.5, 1.2]]]),
            size_class=jax.nn.one_hot(jnp.asarray([[1]]), 2) * 5,
            size_res=jnp.zeros((1, 1, 2, 3))))
        if agnostic:
            np.testing.assert_allclose(np.asarray(out[0, 0, 3:6]),
                                       [3.0, 1.5, 1.2], atol=1e-5)
        else:
            np.testing.assert_allclose(np.asarray(out[0, 0, 3:6]),
                                       [0.8, 0.8, 1.8], atol=1e-5)


def test_nms_free_coder_decode():
    c = NMSFreeCoder(pc_range=[-50, -50, -5, 50, 50, 3], max_num=4,
                     num_classes=3,
                     post_center_range=[-60, -60, -10, 60, 60, 10])
    q = 5
    logits = jnp.full((q, 3), -10.0).at[2, 1].set(10.0)
    bp = jnp.zeros((q, 10)).at[2].set(
        jnp.asarray([0.6, 0.5, jnp.log(2.0), jnp.log(4.0), 0.5,
                     jnp.log(1.5), jnp.sin(0.3), jnp.cos(0.3), 1.0, 0.0]))
    out = c.decode_single(logits, bp)
    top = int(jnp.argmax(out["scores"]))
    assert int(out["labels"][top]) == 1
    np.testing.assert_allclose(float(out["bboxes"][top, 0]), 10.0,
                               atol=1e-4)   # 0.6 * 100 - 50
    np.testing.assert_allclose(float(out["bboxes"][top, 6]), 0.3,
                               atol=1e-5)
