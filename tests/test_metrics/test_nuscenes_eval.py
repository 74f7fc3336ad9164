"""Devkit-exactness tests for the self-contained nuScenes evaluator.

Pattern: golden/invariant cases hand-derived from the devkit's
`algo.py` semantics (no devkit available offline)."""
import numpy as np
import pytest

from isfusion_tpu.core.evaluation.nuscenes_eval import (
    CLASS_RANGE, nuscenes_style_eval)

CLASSES = ["car", "pedestrian", "barrier", "traffic_cone"]


def box(x, y, yaw=0.0, dims=(4.0, 2.0, 1.5), vel=(0.0, 0.0)):
    return np.array([x, y, 0.0, *dims, yaw, *vel], np.float32)


def det(boxes, labels, scores, attrs=None):
    d = dict(boxes=np.stack(boxes) if boxes else np.zeros((0, 9)),
             labels=np.asarray(labels), scores=np.asarray(scores))
    if attrs is not None:
        d["attrs"] = np.asarray(attrs)
    return d


def gt(boxes, labels, attrs=None, num_pts=None):
    g = dict(boxes=np.stack(boxes) if boxes else np.zeros((0, 9)),
             labels=np.asarray(labels))
    if attrs is not None:
        g["attrs"] = np.asarray(attrs)
    if num_pts is not None:
        g["num_pts"] = np.asarray(num_pts)
    return g


def test_perfect_predictions_give_nds_one():
    boxes = [box(0, 0, 0.3, vel=(1.0, 0.0)), box(5, 5, -1.0)]
    dets = [det(boxes, [0, 1], [0.9, 0.8],
                attrs=["vehicle.moving", "pedestrian.standing"])]
    gts = [gt(boxes, [0, 1],
              attrs=["vehicle.moving", "pedestrian.standing"],
              num_pts=[10, 10])]
    m = nuscenes_style_eval(dets, gts, CLASSES)
    assert m["mAP"] == pytest.approx(1.0)
    assert m["NDS"] == pytest.approx(1.0)
    assert m["mATE"] == pytest.approx(0.0)
    assert m["mAAE"] == pytest.approx(0.0)
    assert m["attr_err_available"] is True


def test_class_range_filters_both_sides():
    # a pedestrian GT at 45 m is outside its 40 m range -> removed; a
    # det there too -> no FP penalty; car range is 50 m -> kept
    dets = [det([box(45, 0), box(45.0, 0.1)], [0, 1], [0.9, 0.9])]
    gts = [gt([box(45, 0), box(45, 0)], [0, 1], num_pts=[5, 5])]
    m = nuscenes_style_eval(dets, gts, CLASSES)
    assert m["car_AP"] == pytest.approx(1.0)
    assert "pedestrian_AP" not in m  # class has no in-range GT


def test_zero_point_gt_removed():
    dets = [det([box(0, 0)], [0], [0.9])]
    gts = [gt([box(0, 0), box(10, 0)], [0, 0], num_pts=[5, 0])]
    m = nuscenes_style_eval(dets, gts, CLASSES)
    # the empty GT is filtered: npos=1, single correct det
    assert m["car_AP"] == pytest.approx(1.0)


def test_barrier_yaw_period_pi():
    b = box(0, 0, 0.4)
    flipped = box(0, 0, 0.4 + np.pi)
    dets = [det([flipped], [2], [0.9])]
    gts = [gt([b], [2], num_pts=[5])]
    m = nuscenes_style_eval(dets, gts, CLASSES)
    assert m["barrier_orient_err"] == pytest.approx(0.0, abs=1e-6)
    # barrier excludes vel/attr errors entirely
    assert "barrier_vel_err" not in m
    assert "barrier_attr_err" not in m


def test_traffic_cone_leaves_out_orientation():
    dets = [det([box(0, 0, 1.0)], [3], [0.9])]
    gts = [gt([box(0, 0, 2.2)], [3], num_pts=[5])]
    m = nuscenes_style_eval(dets, gts, CLASSES)
    assert "traffic_cone_orient_err" not in m
    assert "traffic_cone_AP" in m


def test_wrong_attribute_costs_aae():
    b = box(0, 0, vel=(1.0, 0.0))
    dets = [det([b], [0], [0.9], attrs=["vehicle.parked"])]
    gts = [gt([b], [0], attrs=["vehicle.moving"], num_pts=[5])]
    m = nuscenes_style_eval(dets, gts, CLASSES)
    assert m["car_attr_err"] == pytest.approx(1.0)
    assert m["mAAE"] == pytest.approx(1.0)


def test_hand_computed_ap_curve():
    """Two GT cars; det A matches (d=0.5), det B is a miss. At the 1 m
    threshold: rec=[0.5,0.5], prec=[1,0.5] -> interpolated 101-point curve
    gives AP = (39*0.9 + 0.4) / 81."""
    gts = [gt([box(0, 0), box(10, 0)], [0, 0], num_pts=[5, 5])]
    dets = [det([box(0.5, 0), box(20, 0)], [0, 0], [0.9, 0.8])]
    m_all = {}
    from isfusion_tpu.core.evaluation import nuscenes_eval as ne
    md = ne._accumulate(
        [dict(boxes=dets[0]["boxes"], labels=dets[0]["labels"],
              scores=dets[0]["scores"])],
        [dict(boxes=gts[0]["boxes"], labels=gts[0]["labels"])],
        "car", 0, 1.0)
    ap = ne._calc_ap(md)
    expected = (39 * 0.9 + 0.4) / (90 * 0.9)
    assert ap == pytest.approx(expected, abs=1e-9)
    del m_all


def test_nds_formula_five_metrics():
    """NDS = (5 mAP + sum over 5 TP scores)/10; with no attrs available
    the attr term is flagged and contributes a perfect score."""
    b = box(0, 0)
    dets = [det([box(0.5, 0)], [0], [0.9])]
    gts = [gt([b], [0], num_pts=[5])]
    m = nuscenes_style_eval(dets, gts, CLASSES)
    assert m["attr_err_available"] is False
    tp_sum = sum(1.0 - min(1.0, m[k])
                 for k in ("mATE", "mASE", "mAOE", "mAVE", "mAAE"))
    assert m["NDS"] == pytest.approx((5 * m["mAP"] + tp_sum) / 10.0)


def test_class_range_table_is_cvpr2019():
    assert CLASS_RANGE["car"] == 50 and CLASS_RANGE["barrier"] == 30
    assert CLASS_RANGE["pedestrian"] == 40
