"""Full evaluate_cv column parity: with all four sources (pred, gt,
inter-observer, original ventricle masks) present, df_eval.csv must carry
every column the reference documents (ref: README.md:196-236)."""

import glob
import os

import numpy as np
import pytest

from cmrtpu.eval.evaluate import evaluate_cv
from cmrtpu.io import MedicalImage, write_image

# the documented column set (ref: README.md:196-236)
EXPECTED = [
    "files_pred", "files_io", "files_orig_msk", "files_gt",
    "patient", "phase", "pathology", "spacing", "inplane_spacing", "EXP",
    "ips_pred", "ips_gt", "ips_io", "ips_orig_msk", "ips_pred_single_also",
    "mips_pred", "mips_gt", "mips_io", "mips_orig_msk", "mips_pred_single_also",
    "mangle_pred", "mangle_gt", "mangle_io", "mangle_orig_msk",
    "diffs_gtpred", "diffs_gtio", "diffs_gtorig",
    "mdiffs_gtpred", "mdiffs_gtio", "mdiffs_gtorig",
    "dists_ant_gtpred", "dists_inf_gtpred", "dists_ant_gtio", "dists_inf_gtio",
    "dists_ant_gtorig", "dists_inf_gtorig",
    "dists_ant_gtpred_single_also", "dists_inf_gtpred_single_also",
    "dists_ant_gtpred_up", "dists_inf_gtpred_up",
    "dists_ant_gtpred_single_also_up", "dists_inf_gtpred_single_also_up",
    "mdists_ant_gtpred", "mdists_inf_gtpred", "mdists_ant_gtio",
    "mdists_inf_gtio", "mdists_ant_gtorig", "mdists_inf_gtorig",
    "mdists_ant_gtpred_single_also", "mdists_inf_gtpred_single_also",
    "mdists_ant_gtpred_slice_wise", "mdists_inf_gtpred_slice_wise",
    "mdists_ant_gtpred_slice_wise_single_also",
    "mdists_inf_gtpred_slice_wise_single_also",
    "mdists_ant_gtpred_slice_wise_up", "mdists_inf_gtpred_slice_wise_up",
    "mdists_ant_gtpred_slice_wise_single_also_up",
    "mdists_inf_gtpred_slice_wise_single_also_up",
    "angles_pred", "angles_gt", "angles_io", "angles_orig_msk",
    "tpr_ant", "tpr_inf", "tpr_ant_io", "tpr_inf_io", "tpr_ant_msk",
    "tpr_inf_msk", "ppv_ant", "ppv_inf", "ppv_ant_io", "ppv_inf_io",
    "ppv_ant_msk", "ppv_inf_msk",
    "tpr_ant_point", "tpr_inf_point", "ppv_ant_point", "ppv_inf_point",
    "tpr_ant_point_th15", "tpr_inf_point_th15",
    "ppv_ant_point_th15", "ppv_inf_point_th15",
]


def _rvip_vol(z=4, hw=48, ant=(10, 30), inf=(30, 10)):
    nda = np.zeros((z, hw, hw), np.uint8)
    nda[:, ant[0]:ant[0] + 3, ant[1]:ant[1] + 3] = 1
    nda[:, inf[0]:inf[0] + 3, inf[1]:inf[1] + 3] = 2
    return nda


def _ventricle_vol(z=4, hw=48):
    """LV(3)/MYO(2)/RV(1) layout the contour-walk can handle."""
    nda = np.zeros((z, hw, hw), np.uint8)
    yy, xx = np.mgrid[0:hw, 0:hw]
    lv = (yy - 24) ** 2 + (xx - 30) ** 2 <= 36
    myo = ((yy - 24) ** 2 + (xx - 30) ** 2 <= 81) & ~lv
    rv = ((yy - 24) ** 2 + (xx - 14) ** 2 <= 64)
    for s in range(z):
        nda[s][rv] = 1
        nda[s][myo] = 2
        nda[s][lv] = 3
    return nda


@pytest.fixture
def full_exp(tmp_path):
    """Synthetic experiment with pred/gt/io/orig for one patient, ED+ES."""
    exp = tmp_path / "exp" / "2020-01-01_00_00" / "f0"
    data = tmp_path / "data"
    spacing3 = (1.25, 1.25, 8.0)
    for phase in ("ED", "ES"):
        vol = _rvip_vol()
        write_image(MedicalImage(array=vol, spacing=spacing3),
                    str(exp / "pred" / f"patient001_{phase}_msk.nrrd"))
        write_image(MedicalImage(array=vol, spacing=spacing3),
                    str(exp / "gt" / f"patient001_{phase}_msk.nrrd"))
        write_image(MedicalImage(array=vol.astype(np.float32), spacing=spacing3),
                    str(exp / "pred" / f"patient001_{phase}_cmr.nrrd"))
    # inter-observer rvip labels: data/io/*rvip.nrrd, frame-sorted
    for frame in ("01", "12"):
        write_image(MedicalImage(array=_rvip_vol(ant=(11, 31)), spacing=spacing3),
                    str(data / "io" / f"patient001_frame{frame}_rvip.nrrd"))
        write_image(MedicalImage(array=_ventricle_vol(), spacing=spacing3),
                    str(data / "original" / "patient001" /
                        f"patient001_frame{frame}_gt.nii.gz"))
        write_image(MedicalImage(array=np.zeros((4, 48, 48), np.float32),
                                 spacing=spacing3),
                    str(data / "original" / "patient001" /
                        f"patient001_frame{frame}.nii.gz"))
    write_image(MedicalImage(array=np.zeros((2, 4, 48, 48), np.float32),
                             spacing=(1.25, 1.25, 8.0, 1.0)),
                str(data / "original" / "patient001" / "patient001_4d.nii.gz"))
    with open(data / "original" / "patient001" / "Info.cfg", "w") as fh:
        fh.write("ED: 1\nES: 12\nGroup: NOR\nHeight: 170\nNbFrame: 2\n")
    return str(tmp_path / "exp"), str(data)


def test_all_documented_columns_present(full_exp):
    exp_path, data_path = full_exp
    df = evaluate_cv(exp_path, data_path)
    missing = [c for c in EXPECTED if c not in df.columns]
    assert not missing, f"missing columns: {missing}"
    assert len(df) == 2  # one row per patient x phase
    assert set(df["phase"]) == {"ED", "ES"}
    assert (df["pathology"] == "NOR").all()


def test_perfect_prediction_metrics(full_exp):
    exp_path, data_path = full_exp
    df = evaluate_cv(exp_path, data_path)
    # pred == gt -> zero distance, tpr/ppv == 1
    assert (df["mdists_ant_gtpred"] == 0).all()
    assert (df["mdists_inf_gtpred"] == 0).all()
    assert (df["tpr_ant"] == 1.0).all() and (df["ppv_inf"] == 1.0).all()
    assert (df["mdiffs_gtpred"] == 0).all()
    # io labels are shifted by (1,1) px -> sqrt(2)*1.25mm ant distance
    assert df["mdists_ant_gtio"].iloc[0] == pytest.approx(
        np.sqrt(2) * 1.25, rel=1e-6)


def test_csv_written(full_exp, tmp_path):
    exp_path, data_path = full_exp
    evaluate_cv(exp_path, data_path)
    assert os.path.exists(os.path.join(exp_path, "df_eval.csv"))


def test_empty_prediction_dir_raises_clear_error(tmp_path):
    with pytest.raises(FileNotFoundError, match="no prediction masks"):
        evaluate_cv(str(tmp_path), str(tmp_path))


def test_partial_io_set_keeps_all_columns(full_exp):
    """One missing inter-observer file must not drop the io/orig column
    families: sources are joined by patient+phase, the affected row gets
    NaN/None (the reference's count-equality gate silently dropped ~20
    columns instead, evaluate_cv.py:668-698)."""
    exp_path, data_path = full_exp
    os.remove(os.path.join(data_path, "io", "patient001_frame12_rvip.nrrd"))
    df = evaluate_cv(exp_path, data_path)
    missing = [c for c in EXPECTED if c not in df.columns]
    assert not missing, f"missing columns: {missing}"
    ed = df[df["phase"] == "ED"].iloc[0]
    es = df[df["phase"] == "ES"].iloc[0]
    # ED (frame01) io file still present -> real values
    assert isinstance(ed["files_io"], str)
    assert ed["mdists_ant_gtio"] == pytest.approx(np.sqrt(2) * 1.25, rel=1e-6)
    # ES (frame12) io file removed -> NaN row, not a dropped column
    assert es["files_io"] is None or (isinstance(es["files_io"], float)
                                      and np.isnan(es["files_io"]))
    assert np.isnan(es["mdists_ant_gtio"])
    assert np.isnan(es["tpr_ant_io"])
    # pred/gt metrics untouched
    assert (df["tpr_ant"] == 1.0).all()


def test_io_files_align_by_patient_not_position(full_exp, tmp_path):
    """A second patient with io labels but no predictions must not shift
    the io<->pred pairing (positional alignment would)."""
    from cmrtpu.io import MedicalImage, write_image
    exp_path, data_path = full_exp
    # extra io files for a patient that has no predictions, sorting BEFORE
    # patient001's files under positional alignment... patient000 < patient001
    for frame in ("01", "10"):
        write_image(
            MedicalImage(array=_rvip_vol(ant=(20, 20)), spacing=(1.25, 1.25, 8.0)),
            str(os.path.join(data_path, "io",
                             f"patient000_frame{frame}_rvip.nrrd")))
    df = evaluate_cv(exp_path, data_path)
    assert len(df) == 2
    # io distances still reflect patient001's own (1,1)-px-shifted labels
    assert df["mdists_ant_gtio"].iloc[0] == pytest.approx(
        np.sqrt(2) * 1.25, rel=1e-6)
    assert all("patient001" in f for f in df["files_io"])


def test_evaluate_cv_save_light_variant(full_exp):
    """evaluate_cv_save: angles+distances-only df with patient/phase/pathology
    (ref: evaluate_cv_save, src/models/evaluate_cv.py:599-660)."""
    import pandas as pd
    from cmrtpu.eval.evaluate import evaluate_cv_save
    exp, data = full_exp
    df = evaluate_cv_save(exp, data)
    for col in ("angle_diff_pred", "gt_angle", "pred_angle",
                "ant_dist_pred", "inf_dist_pred",
                "ant_dist_io", "ant_dist_orig_msk",
                "patient", "phase", "pathology"):
        assert col in df.columns, col
    assert len(df) == 2  # one patient x ED/ES
    assert set(df["phase"]) == {"ED", "ES"}
    assert set(df["pathology"]) == {"NOR"}
    # identical pred == gt rvips -> zero distance/angle diff
    assert float(df["ant_dist_pred"].iloc[0]) == 0.0
    assert os.path.exists(os.path.join(exp, "df_eval.csv"))
    # mismatched source counts are skipped, not mis-paired
    import glob as g
    os.remove(sorted(g.glob(os.path.join(data, "io", "*rvip.nrrd")))[0])
    df2 = evaluate_cv_save(exp, data)
    assert "ant_dist_io" not in df2.columns
    assert "ant_dist_pred" in df2.columns


def test_evaluate_cv_save_empty_sources_raises(full_exp, tmp_path):
    """When even the pred source is skipped (pred/gt counts differ), the
    failure must name the cause instead of surfacing as pd.concat([])'s
    ValueError far from it."""
    import shutil
    from cmrtpu.eval.evaluate import evaluate_cv_save
    exp, data = full_exp
    broken = str(tmp_path / "broken_exp")
    shutil.copytree(exp, broken)
    # delete one gt mask: pred/gt counts now differ -> every source skipped
    gt_files = sorted(glob.glob(os.path.join(broken, "*/*/gt/*msk.nrrd"))) or \
        sorted(glob.glob(os.path.join(broken, "*/gt/*msk.nrrd")))
    assert gt_files
    os.remove(gt_files[0])
    with pytest.raises(FileNotFoundError, match="file counts differ"):
        evaluate_cv_save(broken, data)


def test_malformed_acdc_tree_warns_not_silent(full_exp, caplog):
    """A malformed original ACDC tree (Info.cfg without ED/ES keys) must
    degrade loudly: df_eval still ships with an empty pathology column, but
    a warning names the failure — round-3 finding: the bare-except fallback
    produced a silently empty column (cmrtpu/eval/evaluate.py pathology
    join)."""
    import logging

    exp_path, data_path = full_exp
    with open(os.path.join(data_path, "original", "patient001",
                           "Info.cfg"), "w") as fh:
        fh.write("Group NOR no colon separators at all\n")
    with caplog.at_level(logging.WARNING):
        df = evaluate_cv(exp_path, data_path)
    assert len(df) == 2  # evaluation itself survives
    assert df["pathology"].isna().all()
    assert any("pathology join" in rec.message
               for rec in caplog.records), (
        "expected a warning naming the pathology-join failure")


def test_malformed_acdc_tree_warns_not_silence(full_exp, caplog):
    """Round-3/4 ask: a malformed original tree must produce a LOGGED
    warning, not a silently-empty pathology column (the silent version hid
    broken ACDC trees for a whole round)."""
    import logging as _logging
    import shutil

    exp_path, data_path = full_exp
    # corrupt the ACDC metadata: Info.cfg becomes binary garbage and the
    # frames vanish, so the pathology join cannot succeed
    pdir = os.path.join(data_path, "original", "patient001")
    with open(os.path.join(pdir, "Info.cfg"), "wb") as fh:
        fh.write(b"\x00\xff\x13garbage: [unclosed\n\x07")
    for f in glob.glob(os.path.join(pdir, "*.nii.gz")):
        os.remove(f)
    with caplog.at_level(_logging.WARNING):
        df = evaluate_cv(exp_path, data_path)
    assert any("pathology join" in r.message and "failed" in r.message
               for r in caplog.records), (
        "expected a 'pathology join ... failed' warning, got: "
        + "; ".join(r.message for r in caplog.records))
    assert df["pathology"].isna().all()
