"""Dataset analytics: describe_volume, LV-volume curves, phase prediction."""

import numpy as np
import pandas as pd
import pytest

from cmrtpu.data import analytics as A
from cmrtpu.io import MedicalImage, write_image


def _vol_4d(ed=2, es=7, t=10, z=4, hw=16):
    """Synthetic 4D label volume whose LV (label 3) is biggest at t=ed and
    smallest at t=es."""
    nda = np.zeros((t, z, hw, hw), np.uint8)
    for ti in range(t):
        r = 6 if ti == ed else (1 if ti == es else 3)
        nda[ti, :, 8 - r // 2: 8 + r // 2 + 1, 8 - r // 2: 8 + r // 2 + 1] = 3
    return MedicalImage(array=nda, spacing=(1.0, 1.0, 5.0, 1.0))


def test_describe_volume_keys_4d():
    rep = A.describe_volume(_vol_4d())
    assert rep["t-axis"] == 10 and rep["z-axis"] == 4
    assert rep["slices"] == 40
    assert rep["x-spacing"] == 1.0 and rep["z-spacing"] == 5.0
    assert rep["dimension"] == 4
    assert ".99-quantile" in rep and ".50-quantle" in rep  # [sic] ref key


def test_describe_volume_2d3d():
    img3 = MedicalImage(array=np.zeros((4, 8, 8), np.float32),
                        spacing=(1.2, 1.2, 8.0))
    rep3 = A.describe_volume(img3)
    assert rep3["z-axis"] == 4 and rep3["t-axis"] == 0 and rep3["slices"] == 4
    img2 = MedicalImage(array=np.zeros((8, 8), np.float32), spacing=(1.2, 1.2))
    rep2 = A.describe_volume(img2)
    assert rep2["slices"] == 1 and rep2["z-axis"] == 0


def test_calc_vol_along_t_ml():
    img = _vol_4d()
    vols = A.calc_vol_along_t(img, label=3)
    assert vols.shape == (10,)
    # 7x7 voxels * 4 z * 5 mm3 -> ml
    assert vols[2] == pytest.approx(7 * 7 * 4 * 5.0 / 1000.0)
    assert int(np.argmax(vols)) == 2 and int(np.argmin(vols)) == 7


def test_predict_phase_from_vol(tmp_path):
    paths = []
    for pid, (ed, es) in {"001": (2, 7), "002": (0, 5)}.items():
        p = str(tmp_path / f"patient{pid}_4d.nrrd")
        write_image(_vol_4d(ed=ed, es=es), p)
        paths.append(p)
    df = A.create_lv_vol_df(paths, dataset="acdc")
    assert list(df["ed_idxs"]) == [2, 0]
    assert list(df["es_idxs"]) == [7, 5]
    assert list(df["patient"]) == ["001", "002"]

    gt = pd.DataFrame({"patient": ["1", "2"], "ED#": [2, 1], "ES#": [7, 5]})
    merged = A.predict_phase_from_vol(paths, gt_df=gt, dataset="acdc")
    assert list(merged["pfd_ed"]) == [0, 1]
    assert list(merged["acc_es"]) == [1.0, 1.0]


def test_describe_path_acdc_and_wildcard(tmp_path):
    import numpy as np
    from cmrtpu.data.analytics import describe_path
    from cmrtpu.io import MedicalImage, write_image
    p = tmp_path / "patient001"
    p.mkdir()
    vol = MedicalImage(array=np.zeros((2, 6, 6), np.float32),
                       spacing=(1.3, 1.3, 8.0))
    write_image(vol, str(p / "patient001_frame01.nii.gz"))
    write_image(vol, str(p / "patient001_frame01_gt.nii.gz"))

    df = describe_path(str(tmp_path), dataset="ACDC")
    assert len(df) == 2  # one image + one mask row
    assert set(df["image"]) == {True, False}
    assert df.iloc[0]["z-axis"] == 2

    df_w = describe_path(str(tmp_path), wildcard="**/*frame01.nii.gz")
    assert len(df_w) == 1 and bool(df_w.iloc[0]["image"])


def test_phase_gt_loaders(tmp_path):
    import pandas as pd
    from cmrtpu.data.analytics import load_acdc_phase_gt, load_tof_phase_gt
    cols = ["ED#", "MS#", "ES#", "PF#", "MD#"]
    df = pd.DataFrame({"patient": ["P1", "P1", "p2"],
                       **{c: [1, 1, 4] for c in cols},
                       "extra": [0, 0, 0]})
    f = str(tmp_path / "phase.csv")
    df.to_csv(f, index=False)

    tof = load_tof_phase_gt(f)
    # lower-cased, dedup'd, shifted to 0-based, extra column dropped
    assert list(tof["patient"]) == ["p1", "p2"]
    assert list(tof["ED#"]) == [0, 3]
    assert "extra" not in tof.columns

    df2 = pd.DataFrame({"patient": [7, 42], **{c: [1, 4] for c in cols}})
    df2.to_csv(f, index=False)
    acdc = load_acdc_phase_gt(f)
    # zero-padded ids, indices kept as stored
    assert list(acdc["patient"]) == ["007", "042"]
    assert list(acdc["ED#"]) == [1, 4]
