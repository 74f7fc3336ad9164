"""Golden tests for the official Lyft IoU-mAP protocol
(`core/evaluation/lyft_eval.py` vs hand-computed values; reference
protocol: `mmdet3d/core/evaluation/lyft_eval.py:97-140` + the Lyft SDK's
mAP_evaluation)."""
import numpy as np
import pytest

from isfusion_tpu.core.evaluation.lyft_eval import (
    IOU_THRESHOLDS, get_ap, get_single_class_aps, iou_3d, lyft_eval_core)


def box(x, y, z, dx, dy, dz, yaw=0.0):
    return np.array([x, y, z, dx, dy, dz, yaw], np.float64)


class TestIoU3D:
    def test_identical(self):
        b = box(1, 2, 0, 2, 3, 2)
        assert iou_3d(b, b[None]) == pytest.approx([1.0])

    def test_hand_computed_shift(self):
        # BEV inter 1.5*2=3, z overlap 2 -> inter 6; union 8+8-6=10
        a = box(0, 0, 0, 2, 2, 2)
        b = box(0.5, 0, 0, 2, 2, 2)
        assert iou_3d(a, b[None]) == pytest.approx([0.6])

    def test_z_disjoint(self):
        a = box(0, 0, 0, 2, 2, 1)
        b = box(0, 0, 1.5, 2, 2, 1)
        assert iou_3d(a, b[None]) == pytest.approx([0.0])

    def test_rotated_45_octagon(self):
        # same square rotated 45deg: intersection is the regular octagon
        # with area 8*(sqrt(2)-1)
        a = box(0, 0, 0, 2, 2, 1)
        b = box(0, 0, 0, 2, 2, 1, np.pi / 4)
        inter = 8 * (np.sqrt(2) - 1)
        expect = inter / (8 - inter)
        assert iou_3d(a, b[None]) == pytest.approx([expect], abs=1e-6)

    def test_translation_invariance(self):
        a = box(0, 0, 0, 2, 4, 2, 0.3)
        b = box(0.5, -0.2, 0.1, 2.2, 3.5, 1.8, 0.5)
        shift = np.array([10.0, -7.0, 2.0, 0, 0, 0, 0])
        assert iou_3d(a, b[None]) == pytest.approx(
            iou_3d(a + shift, (b + shift)[None]))


class TestGetAp:
    def test_half_recall(self):
        # recall 0.5 @ precision 1 -> all-point AP = 0.5
        assert get_ap(np.array([0.5]), np.array([1.0])) == pytest.approx(0.5)

    def test_perfect(self):
        assert get_ap(np.array([0.5, 1.0]),
                      np.array([1.0, 1.0])) == pytest.approx(1.0)

    def test_monotone_envelope(self):
        # precision envelope is max-accumulated from the right
        ap = get_ap(np.array([0.5, 1.0]), np.array([0.5, 1.0]))
        assert ap == pytest.approx(1.0)


class TestSingleClass:
    def test_duplicate_detection_is_fp(self):
        gt = {0: np.stack([box(0, 0, 0, 2, 2, 2)])}
        preds = [(0.9, 0, box(0, 0, 0, 2, 2, 2)),
                 (0.8, 0, box(0.05, 0, 0, 2, 2, 2))]
        aps = get_single_class_aps(gt, preds, [0.5])
        # 1 TP then 1 FP on the same GT: PR = (r=1,p=1),(r=1,p=0.5) -> AP 1
        assert aps[0] == pytest.approx(1.0)

    def test_threshold_split(self):
        # IoU 0.6 detection: TP below 0.6, FP at and above
        gt = {0: np.stack([box(0, 0, 0, 2, 2, 2)])}
        preds = [(0.9, 0, box(0.5, 0, 0, 2, 2, 2))]
        aps = get_single_class_aps(gt, preds, list(IOU_THRESHOLDS))
        expect = [1.0 if th < 0.6 else 0.0 for th in IOU_THRESHOLDS]
        assert aps == pytest.approx(expect)

    def test_missed_gt_caps_recall(self):
        gt = {0: np.stack([box(0, 0, 0, 2, 2, 2),
                           box(10, 10, 0, 2, 2, 2)])}
        preds = [(0.9, 0, box(0, 0, 0, 2, 2, 2))]
        aps = get_single_class_aps(gt, preds, [0.5])
        assert aps[0] == pytest.approx(0.5)


class TestLyftEvalCore:
    def test_end_to_end_hand_values(self):
        classes = ["car", "pedestrian"]
        gts = [dict(boxes=np.stack([box(0, 0, 0, 4, 2, 2),
                                    box(8, 0, 0, 1, 1, 2)]),
                    labels=np.array([0, 1]))]
        results = [dict(
            bboxes=np.stack([box(0, 0, 0, 4, 2, 2),     # exact car TP
                             box(8.25, 0, 0, 1, 1, 2)]),  # ped IoU 0.6
            scores=np.array([0.9, 0.8]),
            labels=np.array([0, 1]))]
        m = lyft_eval_core(results, gts, classes)
        aps = np.asarray(m["average_precisions"])
        assert aps[0] == pytest.approx(np.ones(len(IOU_THRESHOLDS)))
        ped_expect = [1.0 if th < 0.6 else 0.0 for th in IOU_THRESHOLDS]
        assert aps[1] == pytest.approx(ped_expect)
        assert m["Final mAP"] == pytest.approx(
            (1.0 + np.mean(ped_expect)) / 2)

    def test_class_without_predictions_scores_zero(self):
        classes = ["car", "pedestrian"]
        gts = [dict(boxes=np.stack([box(0, 0, 0, 4, 2, 2),
                                    box(8, 0, 0, 1, 1, 2)]),
                    labels=np.array([0, 1]))]
        results = [dict(bboxes=np.stack([box(0, 0, 0, 4, 2, 2)]),
                        scores=np.array([0.9]), labels=np.array([0]))]
        m = lyft_eval_core(results, gts, classes)
        assert m["mAPs_cate"][1] == 0.0
        assert m["Final mAP"] == pytest.approx(0.5)

    def test_mask_filters_predictions(self):
        classes = ["car"]
        gts = [dict(boxes=np.stack([box(0, 0, 0, 4, 2, 2)]),
                    labels=np.array([0]))]
        results = [dict(
            bboxes=np.stack([box(50, 50, 0, 4, 2, 2),
                             box(0, 0, 0, 4, 2, 2)]),
            scores=np.array([0.99, 0.9]), labels=np.array([0, 0]),
            mask=np.array([False, True]))]
        m = lyft_eval_core(results, gts, classes)
        assert m["Final mAP"] == pytest.approx(1.0)


def test_final_map_averages_only_gt_present_classes():
    """SDK semantics: mAP_evaluation means over get_class_names(gt) —
    classes absent from the GT must not deflate the headline (r3 fix)."""
    classes = ["car", "pedestrian", "animal"]
    gts = [dict(boxes=np.stack([box(0, 0, 0, 4, 2, 1.6)]),
                labels=np.array([0]))]
    results = [dict(bboxes=np.stack([box(0, 0, 0, 4, 2, 1.6)]),
                    scores=np.array([0.9]), labels=np.array([0]))]
    m = lyft_eval_core(results, gts, classes)
    assert m["Final mAP"] == pytest.approx(1.0)
    assert m["gt_present"] == [True, False, False]
