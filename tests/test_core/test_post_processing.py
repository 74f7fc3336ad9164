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
