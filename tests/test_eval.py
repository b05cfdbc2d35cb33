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


def test_find_external_contours_matches_opencv():
    """Property test: the first-party Suzuki-Abe tracer reproduces
    cv2.findContours(RETR_EXTERNAL, CHAIN_APPROX_NONE) exactly — point
    sequences AND contour order — on random multi-blob masks. Skipped where
    OpenCV isn't installed (the framework itself no longer needs it)."""
    cv2 = pytest.importorskip("cv2")
    from cmrtpu.eval.contours import find_external_contours

    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:32, 0:32]
    for _ in range(120):
        m = np.zeros((32, 32), np.uint8)
        for _b in range(rng.integers(1, 5)):
            cy, cx = rng.integers(2, 30, 2)
            r = rng.integers(1, 5)
            m[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = 1
        if rng.random() < 0.5:  # sprinkle isolated pixels / ragged edges
            m[tuple(rng.integers(0, 32, (2, 4)))] = 1
        cv_contours, _ = cv2.findContours(m, cv2.RETR_EXTERNAL,
                                          cv2.CHAIN_APPROX_NONE)
        cv_lists = [[(int(p[0][0]), int(p[0][1])) for p in c]
                    for c in cv_contours]
        assert find_external_contours(m) == cv_lists


def test_get_ip_from_2dmask_matches_cv2_reference_walk():
    """The rewritten IP walk returns exactly what the reference's cv2-based
    formulation (ref: src/data/Preprocess.py:15-89) returns, on randomized
    SAX-like LV/MYO/RV masks."""
    cv2 = pytest.importorskip("cv2")

    def reference_walk(nda):  # the reference algorithm, verbatim semantics
        first, second = None, None
        myo = (nda == 2).astype(np.uint8)
        comb = ((nda == 1) | (nda == 2) | (nda == 3)).astype(np.uint8)
        if np.isin(1, nda) and np.isin(2, nda):
            mc, _ = cv2.findContours(myo, cv2.RETR_EXTERNAL,
                                     cv2.CHAIN_APPROX_NONE)
            cc, _ = cv2.findContours(comb, cv2.RETR_EXTERNAL,
                                     cv2.CHAIN_APPROX_NONE)
            if len(mc) > 0 and len(cc) > 0:
                clean = lambda c: [(p[0][0], p[0][1]) for p in c[0]]
                myo_clean, comb_clean = clean(mc), set(clean(cc))
                septum_visited = border_visited = False
                memory_first = None
                for p in myo_clean:
                    if p in comb_clean:
                        border_visited = True
                        if septum_visited and not second:
                            second = p
                        if not first:
                            memory_first = p
                    else:
                        septum_visited = True
                        if border_visited and not first:
                            first = memory_first
                if second and not first:
                    first = memory_first
        return first, second

    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:48, 0:48]
    checked = 0
    for _ in range(60):
        m = np.zeros((48, 48), np.uint8)
        cy, cx = rng.integers(16, 32, 2)
        r_out = rng.integers(6, 12)
        r_in = max(2, r_out - rng.integers(3, 6))
        ring = np.hypot(yy - cy, xx - cx)
        m[ring < r_out] = 2
        m[ring < r_in] = 3
        rvy = cy + rng.integers(-4, 5)
        rvx = cx - r_out - rng.integers(-2, 3)
        m[(np.hypot(yy - rvy, xx - rvx) < rng.integers(4, 9)) & (m == 0)] = 1
        ref = reference_walk(m)
        got = LM.get_ip_from_2dmask(m)
        ref = tuple(tuple(int(v) for v in p) if p is not None else None
                    for p in ref)
        got = tuple(tuple(int(v) for v in p) if p is not None else None
                    for p in got)
        assert got == ref, f"mask seed mismatch: {got} != {ref}"
        checked += 1
    assert checked == 60


def test_landmarks_module_is_opencv_free():
    """cv2 must not be imported anywhere in cmrtpu (SURVEY.md §2.3)."""
    import subprocess
    import sys
    rc = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.modules['cv2'] = None\n"
         "import cmrtpu.eval.landmarks, cmrtpu.eval.contours, "
         "cmrtpu.eval.evaluate\n"
         "import numpy as np\n"
         "m = np.zeros((30, 30), np.uint8)\n"
         "yy, xx = np.mgrid[0:30, 0:30]\n"
         "r = np.hypot(yy - 15, xx - 19); m[r < 7] = 2; m[r < 3] = 3\n"
         "m[(np.hypot(yy - 15, xx - 8) < 6) & (m == 0)] = 1\n"
         "a, b = cmrtpu.eval.landmarks.get_ip_from_2dmask(m)\n"
         "assert a is not None and b is not None\n"],
        capture_output=True, text=True)
    assert rc.returncode == 0, rc.stderr


def test_file_metrics_helpers(tmp_path):
    """File-level comparison helpers (ref: evaluate_cv.py:69-266)."""
    from cmrtpu.eval import file_metrics as FM
    from cmrtpu.io import MedicalImage, write_image

    def rvip_vol(ant, inf, z=3, hw=48):
        nda = np.zeros((z, hw, hw), np.uint8)
        nda[:, ant[0]:ant[0] + 3, ant[1]:ant[1] + 3] = 1
        nda[:, inf[0]:inf[0] + 3, inf[1]:inf[1] + 3] = 2
        return nda

    gt = rvip_vol((10, 30), (30, 10))
    pred = rvip_vol((10, 33), (30, 14))  # shifted +3 / +4 px in x
    gt_f, pred_f = str(tmp_path / "gt.nrrd"), str(tmp_path / "pred.nrrd")
    write_image(MedicalImage(array=gt, spacing=(1.5, 1.5, 8.0)), gt_f)
    write_image(MedicalImage(array=pred, spacing=(1.5, 1.5, 8.0)), pred_f)

    assert FM.isvalid([1.0, 2.0]) and not FM.isvalid(None)
    assert not FM.isvalid([np.nan, np.nan])

    ant, inf = FM.calc_distances(gt, pred)
    np.testing.assert_allclose(ant, [3.0] * 3)
    np.testing.assert_allclose(inf, [4.0] * 3)
    # mean-IP path equals per-slice here (constant offset)
    ant_m, inf_m = FM.calc_distances(gt, pred, usemeanips=True)
    np.testing.assert_allclose([ant_m[0], inf_m[0]], [3.0, 4.0])

    adm, ads, idm, ids = FM.calc_dist_files(gt_f, pred_f, physical=True)
    assert adm == pytest.approx(3.0 * 1.5) and idm == pytest.approx(4.0 * 1.5)
    assert ads == pytest.approx(0.0) and ids == pytest.approx(0.0)

    mean, sd = FM.calc_mean_angle(gt_f)
    # ant (10,30) -> inf (30,10): dy=20, dx=-20 -> 135 deg
    assert mean == pytest.approx(135.0, abs=1e-6)
    diff, g, gs, p, ps = FM.calc_mean_angle_diff(gt_f, pred_f)
    assert g == pytest.approx(135.0, abs=1e-6)
    assert diff == pytest.approx(abs(g - p), abs=1e-9)

    df_a = FM.get_angles_as_df([gt_f], [pred_f])
    assert list(df_a.columns) == ["angle_diff_pred", "gt_angle",
                                  "gt_angle_sd", "pred_angle",
                                  "pred_angle_sd"]
    df_d = FM.get_dist_as_df([gt_f], [pred_f])
    assert df_d["ant_dist_pred"].iloc[0] == pytest.approx(3.0)
