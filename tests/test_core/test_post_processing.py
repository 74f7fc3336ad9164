"""Multiclass NMS + TTA merge tests."""
import jax.numpy as jnp
import numpy as np

from isfusion_tpu.core.post_processing import (box3d_multiclass_nms,
                                               merge_aug_bboxes_3d)


def boxes_at(centers, yaw=0.0):
    b = np.zeros((len(centers), 7), np.float32)
    b[:, :2] = centers
    b[:, 2] = -1
    b[:, 3:6] = 2.0
    b[:, 6] = yaw
    return b


def test_multiclass_nms_suppresses_duplicates():
    boxes = jnp.asarray(boxes_at([[0, 0], [0.1, 0.1], [10, 10]]))
    scores = jnp.asarray(np.array(
        [[0.9, 0.0], [0.8, 0.0], [0.0, 0.7]], np.float32))
    out = box3d_multiclass_nms(boxes, scores, score_thr=0.1, nms_thr=0.3,
                               max_num=4)
    kept = np.asarray(out["mask"])
    assert kept.sum() == 2  # duplicate of box0 suppressed
    assert set(np.asarray(out["labels"])[kept].tolist()) == {0, 1}


def test_merge_aug_undoes_flip():
    base = boxes_at([[5, 3]], yaw=0.4)
    flipped = base.copy()
    flipped[:, 1] *= -1
    flipped[:, 6] *= -1
    res = [dict(bboxes=base, scores=np.array([0.9]),
                labels=np.array([0])),
           dict(bboxes=flipped, scores=np.array([0.8]),
                labels=np.array([0]))]
    metas = [dict(), dict(pcd_horizontal_flip=True)]
    merged = merge_aug_bboxes_3d(res, metas, nms_thr=0.3, max_num=4)
    kept = merged["mask"]
    # the un-flipped duplicate must collapse onto the original
    assert kept.sum() == 1
    np.testing.assert_allclose(merged["bboxes"][0][:2], [5, 3], atol=1e-5)


# ------------------------------------------------- weighted NMS (TorchEx)
def test_weighted_nms_score_weighted_average():
    from isfusion_tpu.core.post_processing import weighted_nms
    # two heavily-overlapping boxes: merged center = score-weighted mean
    b = boxes_at([[0.0, 0.0], [0.3, 0.0], [20, 20]])
    s = np.array([0.8, 0.4, 0.9], np.float32)
    merged, scores, idx = weighted_nms(b, s, nms_thr=0.3, merge_thr=0.3)
    assert len(merged) == 2
    # sorted by score: box at (20,20) first, merged cluster second
    np.testing.assert_allclose(scores, [0.9, 0.8], atol=1e-6)
    expect_x = (0.8 * 0.0 + 0.4 * 0.3) / 1.2
    np.testing.assert_allclose(merged[1][0], expect_x, atol=1e-6)
    # kept score preserved (wnms_kernel.cu:443)
    np.testing.assert_allclose(merged[0][:2], [20, 20], atol=1e-6)


def test_weighted_nms_yaw_outlier_excluded():
    from isfusion_tpu.core.post_processing import weighted_nms
    # yaw-outlier candidate is excluded from the average but still
    # suppressed by the NMS threshold
    b = boxes_at([[0.0, 0.0], [0.1, 0.0], [0.05, 0.0]])
    b[2, 6] = 1.5  # far from median yaw 0
    s = np.array([0.9, 0.5, 0.4], np.float32)
    merged, scores, idx = weighted_nms(b, s, nms_thr=0.3, merge_thr=0.2)
    assert len(merged) == 1
    expect_x = (0.9 * 0.0 + 0.5 * 0.1) / 1.4
    np.testing.assert_allclose(merged[0][0], expect_x, atol=1e-5)


def test_merge_aug_weighted_option():
    base = boxes_at([[5, 3]], yaw=0.4)
    shifted = base.copy()
    shifted[:, 0] += 0.2
    res = [dict(bboxes=base, scores=np.array([0.9]),
                labels=np.array([0])),
           dict(bboxes=shifted, scores=np.array([0.3]),
                labels=np.array([0]))]
    metas = [dict(), dict()]
    merged = merge_aug_bboxes_3d(res, metas, nms_thr=0.3, max_num=4,
                                 use_weighted_nms=True, merge_thr=0.3)
    assert merged["mask"].sum() == 1
    expect_x = (0.9 * 5.0 + 0.3 * 5.2) / 1.2
    np.testing.assert_allclose(merged["bboxes"][0][0], expect_x, atol=1e-5)
    np.testing.assert_allclose(merged["scores"][0], 0.9, atol=1e-6)


def test_weighted_nms_yaw_wrap_at_pi():
    """Yaws straddling +-pi (same physical heading) must merge to that
    heading, not average through zero (r3 review fix)."""
    from isfusion_tpu.core.post_processing import weighted_nms
    b = np.array([[0, 0, 0, 4, 2, 1.5, 3.10],
                  [0.05, 0, 0, 4, 2, 1.5, -3.10]], np.float32)
    s = np.array([0.9, 0.8])
    merged, scores, idx = weighted_nms(b, s, nms_thr=0.3, merge_thr=0.3,
                                       yaw_tol=0.5)
    assert len(merged) == 1
    d = (merged[0, 6] - np.pi + np.pi) % (2 * np.pi) - np.pi
    assert abs(d) < 0.1, merged[0, 6]
