"""Metric-suite tests against hand-constructed masks (SURVEY.md §4 plan (a))."""

import numpy as np
import pytest

from cmrtpu.eval import landmarks as LM


def _mask_with_ips(ant_yx, inf_yx, shape=(32, 32)):
    m = np.zeros(shape, np.uint8)
    m[ant_yx] = 1
    m[inf_yx] = 2
    return m


def test_get_mean_rvip_2d_com():
    m = np.zeros((16, 16), np.uint8)
    m[2:4, 2:4] = 1   # CoM (2.5, 2.5)
    m[10:12, 8:10] = 2  # CoM (10.5, 8.5)
    ant, inf = LM.get_mean_rvip_2d(m)
    np.testing.assert_allclose(ant, [2.5, 2.5])
    np.testing.assert_allclose(inf, [10.5, 8.5])


def test_both_only_flag():
    m = np.zeros((8, 8), np.uint8)
    m[1, 1] = 1  # only anterior present
    ant, inf = LM.get_mean_rvip_2d(m, both_only=True)
    assert ant is None and inf is None
    ant, inf = LM.get_mean_rvip_2d(m, both_only=False)
    assert ant == [1.0, 1.0] and inf is None


def test_keepdim_3d():
    vol = np.stack([_mask_with_ips((2, 2), (5, 5)), np.zeros((32, 32), np.uint8)])
    ants, infs = LM.get_ip_from_rvip_mask_3d(vol, keepdim=True)
    assert len(ants) == 2 and ants[1] is None
    ants, infs = LM.get_ip_from_rvip_mask_3d(vol, keepdim=False)
    assert len(ants) == 1


def test_angle_quadrants_and_wrap():
    # inferior directly right of anterior -> 0 deg
    assert LM.get_angle2x([0, 0], [0, 5]) == pytest.approx(0.0)
    # inferior below (larger y) -> 90 deg anti-clockwise convention
    assert LM.get_angle2x([0, 0], [5, 0]) == pytest.approx(90.0)
    # negative angle wraps to 360
    assert LM.get_angle2x([5, 0], [0, 0]) == pytest.approx(270.0)
    assert LM.get_angle2x(None, [0, 0]) is None


def test_distances_threshold_and_mean():
    ips_gt = ([[0.0, 0.0], [0.0, 0.0], None], [[1.0, 1.0], None, None])
    ips_pred = ([[0.0, 3.0], [0.0, 30.0], [1.0, 1.0]], [[1.0, 1.0], None, None])
    ant, inf = LM.get_distances(ips_gt, ips_pred, spacing=1.0)
    assert ant[0] == pytest.approx(3.0) and ant[1] == pytest.approx(30.0)
    assert ant[2] is None          # gt missing -> None
    assert inf[0] == pytest.approx(0.0)
    ant_t, _ = LM.get_distances(ips_gt, ips_pred, spacing=1.0, threshold=15)
    assert ant_t[1] is None        # beyond threshold filtered
    assert LM.get_mean_dist(ant) == pytest.approx((3.0 + 30.0) / 2)
    assert LM.get_mean_dist([None, None]) is None


def test_upper_bound_distances():
    ips_gt = ([[10.0, 10.0], [10.0, 10.0]], [None, None])
    ips_pred = ([[10.0, 13.0], None], [None, None])
    ant, inf = LM.get_distances_upper_bound(ips_gt, ips_pred, spacing=1.0, dim=224)
    assert ant[0] == pytest.approx(3.0)
    # FN -> farthest corner distance from (10,10): corner (224,224)
    assert ant[1] == pytest.approx(np.hypot(214, 214))
    assert inf[0] is None  # no gt -> stays None


def test_tpr_ppv():
    gt = ([[0.0, 0.0], [0.0, 0.0], [0.0, 0.0]], [[5.0, 5.0], None, [5.0, 5.0]])
    pred = ([[0.0, 1.0], None, [0.0, 2.0]], [[5.0, 5.0], [9.0, 9.0], None])
    tpr_ant, tpr_inf = LM.calc_tpr_thresh(gt, pred)
    assert tpr_ant == pytest.approx(2 / 3)   # 2 TP, 1 FN
    assert tpr_inf == pytest.approx(1 / 2)   # 1 TP, 1 FN
    ppv_ant, ppv_inf = LM.calc_ppv_thresh(gt, pred)
    assert ppv_ant == pytest.approx(1.0)     # no FP for ant
    assert ppv_inf == pytest.approx(1 / 2)   # 1 TP, 1 spurious FP
    # with threshold: ant dist 1,2 <= 1.5? second becomes FP
    ppv_ant_t, _ = LM.calc_ppv_thresh(gt, pred, thresh=1.5)
    assert ppv_ant_t == pytest.approx(1 / 2)


def test_calc_mean_ip():
    ips = ([[2.0, 2.0], None, [4.0, 4.0]], [[1.0, 1.0], None, None])
    mant, minf = LM.calc_mean_ip(ips)
    np.testing.assert_allclose(mant, [3.0, 3.0])
    np.testing.assert_allclose(minf, [1.0, 1.0])
    mant, minf = LM.calc_mean_ip(([], []))
    assert np.isnan(mant) and np.isnan(minf)


def test_contour_walk_finds_two_ips():
    """Synthetic SAX: LV(3) inside MYO(2) ring, RV(1) blob left of the ring.
    The walk must return two distinct points on the MYO/RV junction side."""
    m = np.zeros((40, 40), np.uint8)
    yy, xx = np.mgrid[0:40, 0:40]
    r = np.hypot(yy - 20, xx - 26)
    m[r < 8] = 2          # myo disk
    m[r < 4] = 3          # lv inside
    m[(np.hypot(yy - 20, xx - 12) < 7) & (m == 0)] = 1  # rv left
    ant, inf = LM.get_ip_from_2dmask(m)
    assert ant is not None and inf is not None
    ant_xy, inf_xy = np.array(ant, float), np.array(inf, float)
    assert not np.allclose(ant_xy, inf_xy)
    # both IPs sit on the left (RV-facing) half of the myo ring
    assert ant_xy[0] < 26 and inf_xy[0] < 26  # cv2 returns (x, y)


def test_contour_walk_missing_labels():
    m = np.zeros((20, 20), np.uint8)
    m[5:10, 5:10] = 2  # myo only, no RV
    ant, inf = LM.get_ip_from_2dmask(m)
    assert ant is None and inf is None
