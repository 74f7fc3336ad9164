"""seg_eval + SemanticKITTIDataset (devkit-free mIoU golden values)."""
import os
import pickle

import numpy as np

from isfusion_tpu.core.evaluation.seg_eval import (fast_hist, per_class_iou,
                                                   seg_eval)


def test_fast_hist_and_iou_golden():
    gt = np.array([0, 0, 1, 1, 2, 2])
    pred = np.array([0, 1, 1, 1, 2, 0])
    h = fast_hist(pred, gt, 3)
    assert h[0, 0] == 1 and h[0, 1] == 1 and h[1, 1] == 2
    iou = per_class_iou(h)
    np.testing.assert_allclose(iou[1], 2 / 3, atol=1e-9)  # tp2 fp1 fn0
    np.testing.assert_allclose(iou[2], 1 / 2, atol=1e-9)  # tp1 fn1


def test_seg_eval_ignore_index():
    label2cat = {0: "a", 1: "b"}
    gt = [np.array([0, 1, 255, 1])]
    pred = [np.array([0, 1, 0, 0])]
    m = seg_eval(gt, pred, label2cat, ignore_index=255)
    np.testing.assert_allclose(m["a_iou"], 0.5)  # tp1, fp1 (the wrong b)
    np.testing.assert_allclose(m["b_iou"], 0.5)  # tp1, fn1
    np.testing.assert_allclose(m["miou"], 0.5)
    np.testing.assert_allclose(m["acc"], 2 / 3)


def test_semantickitti_dataset_eval(tmp_path):
    from isfusion_tpu.datasets import SemanticKITTIDataset
    rng = np.random.default_rng(0)
    infos = []
    for i in range(2):
        pts = rng.normal(size=(100, 4)).astype(np.float32)
        pts_path = os.path.join(tmp_path, f"scan{i}.npy")
        np.save(pts_path, pts)
        labels = rng.integers(1, 20, 100).astype(np.int64)
        lbl_path = os.path.join(tmp_path, f"scan{i}_lbl.npy")
        np.save(lbl_path, labels)
        infos.append(dict(sample_idx=i, lidar_path=pts_path,
                          pts_semantic_mask_path=lbl_path))
    ann = os.path.join(tmp_path, "infos.pkl")
    with open(ann, "wb") as f:
        pickle.dump(dict(infos=infos), f)
    ds = SemanticKITTIDataset(data_root=str(tmp_path), ann_file=ann,
                              test_mode=True)
    assert len(ds) == 2
    # perfect predictions -> miou 1 over present classes
    results = [dict(semantic_mask=np.load(
        os.path.join(tmp_path, f"scan{i}_lbl.npy"))) for i in range(2)]
    m = ds.evaluate(results)
    np.testing.assert_allclose(m["miou"], 1.0)


def test_semantickitti_learning_map():
    from isfusion_tpu.datasets import SemanticKITTIDataset as DS
    raw = np.array([0, 10, 40, 48, 70, 252, 259, 99, 31], np.uint32)
    got = DS.remap_labels(raw)
    # car, road, sidewalk, vegetation; moving-car folds into car,
    # moving-bus into bus; other-object -> unlabeled; bicyclist
    assert got.tolist() == [0, 1, 9, 11, 15, 1, 5, 0, 7]
    # ids beyond the map (e.g. instance-ish garbage) -> unlabeled
    assert DS.remap_labels(np.array([300], np.uint32)).tolist() == [0]
