"""Golden-VALUE tests: hand-computed numbers, not invariants.

Round-2 review noted the test deficit is "concentrated in golden-value
breadth" — roundtrip/invariance tests cannot catch consistent-but-wrong
conventions (the r3 rotation-sign bug lived exactly there). These pin
absolute numbers computed by hand from the reference formulas.
"""
import numpy as np
import pytest

from isfusion_tpu.core import limit_period
from isfusion_tpu.core.bbox import box_np_ops
from isfusion_tpu.ops.gaussian import draw_heatmap_gaussian, gaussian_radius


def test_limit_period_golden():
    # limit_period(v, offset, period) = v - floor(v/period + offset)*period
    # mmdet3d core.bbox.structures.utils.limit_period
    np.testing.assert_allclose(limit_period(np.array(3.5), 0.5, np.pi),
                               3.5 - np.pi, rtol=1e-6)
    np.testing.assert_allclose(limit_period(np.array(-0.2), 0.5, np.pi),
                               -0.2, rtol=1e-6)
    np.testing.assert_allclose(limit_period(np.array(7.0), 0.0, 2 * np.pi),
                               7.0 - 2 * np.pi, rtol=1e-6)


def test_gaussian_radius_golden():
    # Reference formula for (h, w) = (6, 10), overlap 0.5
    # (`/root/reference/mmdet3d/core/utils/gaussian.py:69-85`). Note the
    # reference divides EVERY root by 2 regardless of the quadratic's
    # leading coefficient — the well-known CenterNet quirk, kept for
    # parity:
    # r1 = (16 + sqrt(256 - 80)) / 2 = 15.0
    # r2 = (32 + sqrt(1024 - 480)) / 2 = 27.66...
    # r3 = (-16 + sqrt(256 + 240)) / 2 = 3.1355...
    r = float(gaussian_radius((6.0, 10.0), 0.5))
    r1 = (16 + np.sqrt(16 ** 2 - 4 * 1 * 20)) / 2
    r2 = (32 + np.sqrt(32 ** 2 - 4 * 4 * 30)) / 2
    b3, a3, c3 = -2 * 0.5 * 16, 4 * 0.5, (0.5 - 1) * 60
    r3 = (b3 + np.sqrt(b3 ** 2 - 4 * a3 * c3)) / 2
    assert r == pytest.approx(min(r1, r2, r3), rel=1e-5)
    assert r == pytest.approx(3.13552873, rel=1e-6)


def test_draw_heatmap_gaussian_golden():
    hm = np.zeros((7, 7), np.float32)
    draw_heatmap_gaussian(hm, (3, 3), radius=2)
    # center cell exactly 1; one-off cell exp(-1/(2*sigma^2)), sigma=5/6
    assert hm[3, 3] == pytest.approx(1.0)
    sig = 5.0 / 6.0
    assert hm[3, 4] == pytest.approx(np.exp(-1 / (2 * sig * sig)), rel=1e-5)
    assert hm[4, 4] == pytest.approx(np.exp(-2 / (2 * sig * sig)), rel=1e-5)
    assert hm[0, 0] == 0.0  # outside radius window


def test_transfusion_coder_golden():
    from isfusion_tpu.registry import BBOX_CODERS, build_from_cfg
    import isfusion_tpu.core  # noqa: F401
    coder = build_from_cfg(dict(
        type="TransFusionBBoxCoder", pc_range=[-54.0, -54.0],
        voxel_size=[0.075, 0.075], out_size_factor=8,
        code_size=10), BBOX_CODERS)
    box = np.array([[6.0, -12.0, -1.0, 4.0, 2.0, 1.5, 0.5, 1.0, -2.0]],
                   np.float32)
    enc = np.asarray(coder.encode(box))
    # x: (6+54)/(8*0.075) = 100;  y: (-12+54)/0.6 = 70
    assert enc[0, 0] == pytest.approx(100.0, rel=1e-5)
    assert enc[0, 1] == pytest.approx(70.0, rel=1e-5)
    # z: gravity center -1 + 0.75 = -0.25
    assert enc[0, 2] == pytest.approx(-0.25, rel=1e-5)
    np.testing.assert_allclose(enc[0, 3:6], np.log([4.0, 2.0, 1.5]),
                               rtol=1e-5)
    assert enc[0, 6] == pytest.approx(np.sin(0.5), rel=1e-5)
    assert enc[0, 7] == pytest.approx(np.cos(0.5), rel=1e-5)
    np.testing.assert_allclose(enc[0, 8:], [1.0, -2.0], rtol=1e-5)


def test_delta_coder_golden():
    from isfusion_tpu.core.bbox.coders import DeltaXYZWLHRBBoxCoder
    a = np.array([[0.0, 0.0, -1.0, 1.6, 3.9, 1.56, 0.0]], np.float32)
    g = np.array([[1.0, -2.0, -0.5, 2.0, 4.0, 1.5, 0.3]], np.float32)
    enc = np.asarray(DeltaXYZWLHRBBoxCoder.encode(a, g))
    diag = np.sqrt(1.6 ** 2 + 3.9 ** 2)
    assert enc[0, 0] == pytest.approx(1.0 / diag, rel=1e-5)
    assert enc[0, 1] == pytest.approx(-2.0 / diag, rel=1e-5)
    # z encoded between gravity centers, normalized by anchor height:
    # ((-0.5+0.75) - (-1+0.78)) / 1.56
    assert enc[0, 2] == pytest.approx((0.25 - (-0.22)) / 1.56, rel=1e-4)
    assert enc[0, 3] == pytest.approx(np.log(2.0 / 1.6), rel=1e-5)
    assert enc[0, 4] == pytest.approx(np.log(4.0 / 3.9), rel=1e-5)
    assert enc[0, 6] == pytest.approx(0.3, rel=1e-5)
    dec = np.asarray(DeltaXYZWLHRBBoxCoder.decode(a, enc))
    np.testing.assert_allclose(dec, g, rtol=1e-4, atol=1e-5)


def test_points_in_rbbox_golden():
    # one box at (0,0), dims (4, 2), yaw pi/2 (CW convention): the box's
    # LONG axis maps to world direction (cos, -sin) = (0, -1) — i.e. the
    # 4m extent lies along WORLD Y, the 2m extent along X.
    boxes = np.array([[0, 0, 0, 4, 2, 2, np.pi / 2]], np.float32)
    pts = np.array([
        [0.0, 1.8, 1.0],    # inside: |y|=1.8 < 2 (long axis), |x|=0 < 1
        [1.8, 0.0, 1.0],    # outside: |x|=1.8 > 1 (short axis)
        [0.9, 1.9, 1.0],    # inside corner region
    ], np.float32)
    m = box_np_ops.points_in_rbbox(pts, boxes)[:, 0]
    assert m.tolist() == [True, False, True]
