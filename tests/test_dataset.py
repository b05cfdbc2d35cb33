"""Dataset ETL tests: ACDC tree parsing, slicing naming scheme, k-fold dfs."""

import os

import numpy as np
import pandas as pd
import pytest

from cmrtpu.data import dataset as D
from cmrtpu.io import MedicalImage, read_image, write_image


@pytest.fixture
def acdc_tree(tmp_path, rng):
    """Synthetic mini-ACDC: 8 patients, 2 pathologies, ED/ES + 4d files."""
    root = tmp_path / "original"
    pathologies = ["DCM", "NOR"]
    for i in range(1, 9):
        p = root / f"patient{i:03d}"
        p.mkdir(parents=True)
        ed, es = 1, 12
        (p / "Info.cfg").write_text(
            f"ED: {ed}\nES: {es}\nGroup: {pathologies[i % 2]}\nHeight: 170.0\n"
            f"NbFrame: 20\nWeight: 70.0\n")
        vol = rng.normal(300, 80, size=(5, 20, 18)).astype(np.float32)
        gt = rng.integers(0, 3, size=(5, 20, 18)).astype(np.uint8)
        for frame in (ed, es):
            img = MedicalImage(array=vol, spacing=(1.4, 1.4, 8.0))
            write_image(img, str(p / f"patient{i:03d}_frame{frame:02d}.nii.gz"))
            write_image(MedicalImage(array=gt, spacing=(1.4, 1.4, 8.0)),
                        str(p / f"patient{i:03d}_frame{frame:02d}_gt.nii.gz"))
        vol4d = rng.normal(300, 80, size=(3, 5, 20, 18)).astype(np.float32)
        write_image(MedicalImage(array=vol4d, spacing=(1.4, 1.4, 8.0, 1.0)),
                    str(p / f"patient{i:03d}_4d.nii.gz"))
    return str(root)


def test_get_patient_rules():
    assert D.get_patient("/a/patient001__t01_z3_img.nrrd") == "patient001"
    assert D.get_patient("/a/patient042_frame01.nii.gz") == "patient042"
    assert D.get_patient("/a/gcn_0007_something_img.nrrd") == "gcn_0007"


def test_info_cfg_and_phase_files(acdc_tree):
    folder = os.path.join(acdc_tree, "patient001")
    cfg = D.read_cfg_file(os.path.join(folder, "Info.cfg"))
    assert cfg["ED"] == 1 and cfg["ES"] == 12 and cfg["Group"] in ("DCM", "NOR")
    assert D.get_phase_file(folder, "ED").endswith("frame01.nii.gz")
    assert D.get_phase_file(folder, "ES", gt=True).endswith("frame12_gt.nii.gz")
    assert D.get_phase_for_patient_timestep(folder, 12) == "ES"
    assert D.get_phase_for_patient_timestep(folder, 5) == "NOPHASE"


def test_acdc_dataset_as_df(acdc_tree):
    df = D.get_acdc_dataset_as_df(acdc_tree)
    assert len(df) == 8 * 6  # 6 rows per patient
    assert set(df["phase"]) == {"cfg", "ed", "ed_gt", "es", "es_gt", "4d"}
    assert set(df["pathology"]) == {"DCM", "NOR"}


def test_create_2d_slices_naming(acdc_tree, tmp_path):
    folder = os.path.join(acdc_tree, "patient001")
    img_f = os.path.join(folder, "patient001_frame01.nii.gz")
    msk_f = os.path.join(folder, "patient001_frame01_gt.nii.gz")
    out = str(tmp_path / "2D")
    written = D.create_2d_slices_from_3d_volume_files(img_f, msk_f, out)
    assert len(written) == 5
    assert os.path.basename(written[0]) == "patient001__t01_z0_img.nrrd"
    assert os.path.isfile(os.path.join(out, "patient001__t01_z4_msk.nrrd"))
    # slices carry the 2D geometry of the parent volume
    img2d = read_image(written[0])
    assert img2d.array.shape == (20, 18)
    np.testing.assert_allclose(img2d.spacing, (1.4, 1.4), rtol=1e-5)


def test_create_2d_slices_from_4d(acdc_tree, tmp_path):
    img_f = os.path.join(acdc_tree, "patient001", "patient001_4d.nii.gz")
    written = D.create_2d_slices_from_4d_volume_file(img_f, str(tmp_path / "i"))
    assert len(written) == 3 * 5
    assert D.get_patient(written[0]) == "patient001"


@pytest.fixture
def slice_dir(acdc_tree, tmp_path):
    out = str(tmp_path / "2D")
    for i in range(1, 9):
        folder = os.path.join(acdc_tree, f"patient{i:03d}")
        for frame in ("01", "12"):
            D.create_2d_slices_from_3d_volume_files(
                os.path.join(folder, f"patient{i:03d}_frame{frame}.nii.gz"),
                os.path.join(folder, f"patient{i:03d}_frame{frame}_gt.nii.gz"), out)
    return out


def test_kfold_split_patient_disjoint(slice_dir):
    df = D.get_kfolded_data(kfolds=4, path_to_data=slice_dir)
    assert set(df.columns) >= {"fold", "x_path", "y_path", "modality", "patient"}
    for f in range(4):
        fold_df = df[df["fold"] == f]
        train_p = set(fold_df[fold_df["modality"] == "train"]["patient"])
        test_p = set(fold_df[fold_df["modality"] == "test"]["patient"])
        assert train_p and test_p and not (train_p & test_p)


def test_pathology_stratified_cv(slice_dir, acdc_tree):
    df = D.create_acdc_dataframe_for_cv(slice_dir, kfolds=2,
                                        original_acdc_dir=acdc_tree)
    fold0 = df[df["fold"] == 0]
    test_paths = fold0[fold0["modality"] == "test"]
    # both pathologies represented in every test split (stratification)
    assert set(test_paths["pathology"]) == {"DCM", "NOR"}


def test_get_trainings_files(slice_dir, tmp_path):
    df = D.get_kfolded_data(kfolds=4, path_to_data=slice_dir)
    csv = str(tmp_path / "df_kfold.csv")
    df.to_csv(csv, index=False)
    x_train, y_train, x_val, y_val = D.get_trainings_files(slice_dir, fold=0,
                                                           path_to_folds_df=csv)
    assert len(x_train) == len(y_train) > 0
    assert len(x_val) == len(y_val) > 0
    assert all(p.endswith("img.nrrd") for p in x_train)
    assert all(p.endswith("msk.nrrd") for p in y_train)
    train_p = {D.get_patient(p) for p in x_train}
    val_p = {D.get_patient(p) for p in x_val}
    assert not (train_p & val_p)


def test_filter_4d_vol():
    nda = np.zeros((4, 5, 8, 8))
    nda[1, :4] = 1.0  # 4 masked slices -> kept (threshold 2)
    nda[2, :2] = 1.0  # only 2 -> dropped
    filtered, ts = D.filter_4d_vol(nda, slice_threshold=2)
    assert ts == [1]
    assert filtered.shape == (1, 5, 8, 8)


def test_long_tail_filename_helpers(tmp_path):
    from cmrtpu.data import dataset as D
    f = "patient042__t05_z3_img.nrrd"
    assert D.get_z_position_from_filename(f) == 3
    assert D.get_t_position_from_filename(f) == 5
    assert D.get_patient(str(tmp_path / f)) == "patient042"


def test_split_dir_helpers(tmp_path):
    import numpy as np
    from cmrtpu.data import dataset as D
    from cmrtpu.io import MedicalImage, write_image
    for pid in ("patient001", "patient002"):
        for z in range(2):
            for kind in ("img", "msk"):
                write_image(MedicalImage(array=np.zeros((8, 8), np.float32),
                                         spacing=(1.0, 1.0)),
                            str(tmp_path / f"{pid}__t01_z{z}_{kind}.nrrd"))
    imgs, msks = D.get_img_msk_files_from_split_dir(str(tmp_path))
    assert len(imgs) == len(msks) == 4
    assert D.get_patients(str(tmp_path)) == ["patient001", "patient002"]


def test_get_n_patients_and_train_data_from_df(tmp_path):
    import pandas as pd
    from cmrtpu.data import dataset as D
    rows = []
    for p in range(6):
        pid = f"patient{p:03d}"
        for fold in (0, 1):
            rows.append({"x_path": f"{pid}_img.nrrd", "y_path": f"{pid}_msk.nrrd",
                         "fold": fold, "modality": "train" if p % 2 else "test",
                         "patient": pid, "pathology": "NOR"})
    df = pd.DataFrame(rows)
    sub = D.get_n_patients(df, n=2)
    assert sub["patient"].nunique() <= 2
    assert (sub["modality"] == "train").all()
    assert (sub["fold"] == 0).all()

    df_path = str(tmp_path / "df.csv")
    df.to_csv(df_path, index=False)
    x_tr, y_tr, x_va, y_va, extend = D.get_train_data_from_df(df_path, fold=0)
    assert len(x_tr) == len(y_tr) and len(x_va) == len(y_va)
    assert len(x_tr) + len(x_va) == 6
    assert extend["EXTRA_IMAGES"] == 0


def test_split_4d_and_create_3d_volumes(tmp_path):
    import numpy as np
    from cmrtpu.data import dataset as D
    from cmrtpu.io import MedicalImage, read_image, write_image
    vol4d = np.zeros((3, 4, 8, 8), np.float32)
    msk4d = np.zeros((3, 4, 8, 8), np.uint8)
    msk4d[0, :3, 2:5, 2:5] = 1  # only t=0 has >=2 annotated slices
    img_f = str(tmp_path / "patient007_4d.nii.gz")
    msk_f = str(tmp_path / "patient007_4d_msk.nii.gz")
    write_image(MedicalImage(array=vol4d, spacing=(1.2, 1.2, 6.0, 1.0)), img_f)
    write_image(MedicalImage(array=msk4d, spacing=(1.2, 1.2, 6.0, 1.0)), msk_f)

    vols = D.split_4d_into_3d(read_image(img_f))
    assert len(vols) == 3 and vols[0].array.shape == (4, 8, 8)
    np.testing.assert_allclose(vols[0].spacing[:2], (1.2, 1.2), rtol=1e-6)

    out = str(tmp_path / "3D")
    kept = D.create_3d_volumes_from_4d_files(img_f, msk_f, out)
    assert kept == [0]
    import glob as g
    assert len(g.glob(out + "/*img.nrrd")) == 1
    assert len(g.glob(out + "/*msk.nrrd")) == 1


def test_save_gt_and_pred_and_describe(tmp_path):
    import numpy as np
    from cmrtpu.data import dataset as D
    gt = np.zeros((2, 3, 8, 8, 1), np.float32)
    pred = np.ones((2, 3, 8, 8, 1), np.float32)
    D.save_gt_and_pred(gt, pred, str(tmp_path), "patient009")
    import os
    from cmrtpu.io import read_image
    assert os.path.exists(str(tmp_path / "gt_m" / "patient009_ED.nii"))
    assert os.path.exists(str(tmp_path / "pred_m" / "patient009_MS.nii"))
    # channel axis preserved leading, [c, x, y, z] like the reference einsum
    vol = read_image(str(tmp_path / "pred_m" / "patient009_ED.nii")).array
    assert vol.shape == (1, 8, 8, 3)
    text = D.describe_image(np.zeros((4, 8, 8), np.float32))
    assert "spacing" in text and "size" in text


def test_analytics_extremas():
    import pandas as pd
    from cmrtpu.data.analytics import get_extremas
    rows = [{"patient": "p1", "vol in ml": v, "t_norm": t}
            for t, v in enumerate([50, 80, 60])]
    rows += [{"patient": "p2", "vol in ml": v, "t_norm": t}
             for t, v in enumerate([90, 40, 70])]
    df = get_extremas(pd.DataFrame(rows))
    p1 = df[df.patient == "p1"].iloc[0]
    assert p1["min_t"] == 0 and p1["max_t"] == 1
    p2 = df[df.patient == "p2"].iloc[0]
    assert p2["min_t"] == 1 and p2["max_t"] == 0


def test_create_2d_slices_from_4d_pair_gcn_naming(tmp_path):
    """4D pair -> per-t-per-z 2D files with the single-underscore GCN naming
    and mask-derived timestep filtering (ref: Dataset.py:419-466)."""
    import glob as g
    vol4d = np.zeros((3, 4, 8, 8), np.float32)
    msk4d = np.zeros((3, 4, 8, 8), np.uint8)
    msk4d[1, :3, 2:5, 2:5] = 1  # only t=1 has >=2 annotated slices
    img_f = str(tmp_path / "volume_cleanp42.nrrd")
    msk_f = str(tmp_path / "volume_cleanp42_m.nrrd")
    write_image(MedicalImage(array=vol4d, spacing=(1.2, 1.2, 6.0, 1.0)), img_f)
    write_image(MedicalImage(array=msk4d, spacing=(1.2, 1.2, 6.0, 1.0)), msk_f)

    out = str(tmp_path / "2D")
    kept, shape = D.create_2d_slices_from_4d_volume_files(img_f, msk_f, out)
    assert kept == [1] and shape == [1, 4, 8, 8]
    imgs = sorted(g.glob(out + "/*img.nrrd"))
    assert len(imgs) == 4  # z slices of the surviving timestep
    assert os.path.basename(imgs[0]) == "p42_t1_z0_img.nrrd"
    # identity direction: the reference passes copy_direction=False here
    sliced = read_image(imgs[0])
    np.testing.assert_allclose(sliced.direction, (1.0, 0.0, 0.0, 1.0))

    # filter_by_mask=False keeps every timestep
    out2 = str(tmp_path / "2D_all")
    kept, _ = D.create_2d_slices_from_4d_volume_files(
        img_f, msk_f, out2, filter_by_mask=False)
    assert kept == [0, 1, 2]
    assert len(g.glob(out2 + "/*msk.nrrd")) == 12


def test_create_2d_slices_any_filename_and_new_naming(tmp_path):
    import glob as g
    vol = np.zeros((3, 8, 8), np.float32)
    msk = np.zeros((3, 8, 8), np.uint8)

    img_f = str(tmp_path / "site1_p7_img.nrrd")
    msk_f = str(tmp_path / "site1_p7_msk.nrrd")
    write_image(MedicalImage(array=vol, spacing=(1.0, 1.0, 5.0)), img_f)
    write_image(MedicalImage(array=msk, spacing=(1.0, 1.0, 5.0)), msk_f)
    out = str(tmp_path / "any")
    shape = D.create_2d_slices_from_3d_volume_files_any_filename(
        img_f, msk_f, out)
    assert shape == [3, 8, 8]
    # z index extends the original name just before the img/msk suffix
    assert os.path.exists(os.path.join(out, "site1_p7_1_img.nrrd"))
    assert os.path.exists(os.path.join(out, "site1_p7_2_msk.nrrd"))

    img_f = str(tmp_path / "patient009_frame05.nii.gz")
    write_image(MedicalImage(array=vol, spacing=(1.0, 1.0, 5.0)), img_f)
    out2 = str(tmp_path / "newnaming")
    frame, shape = D.create_2d_slices_from_3d_volume_files_new_naming(
        img_f, None, out2)
    assert frame == "05" and shape == [3, 8, 8]
    files = sorted(g.glob(out2 + "/*img.nrrd"))
    assert os.path.basename(files[0]) == "f_patient009__t05_z0_img.nrrd"
    assert D.get_patient(files[0]) == "f_patient009"


def test_create_4d_volumes_from_4d_files(tmp_path):
    vol4d = np.zeros((3, 4, 8, 8), np.float32)
    vol4d[2] = 7.0
    msk4d = np.zeros((3, 4, 8, 8), np.uint8)
    msk4d[2, :3, 1:4, 1:4] = 2
    img_f = str(tmp_path / "volume_cleanp9.nrrd")
    msk_f = str(tmp_path / "volume_cleanp9_m.nrrd")
    write_image(MedicalImage(array=vol4d, spacing=(1.2, 1.2, 6.0, 1.0)), img_f)
    write_image(MedicalImage(array=msk4d, spacing=(1.2, 1.2, 6.0, 1.0)), msk_f)

    out = str(tmp_path / "4D")
    kept, shape = D.create_4d_volumes_from_4d_files(img_f, msk_f, out)
    assert kept == [2] and shape == [1, 4, 8, 8]
    filtered = read_image(os.path.join(out, "p9_img.nrrd"))
    assert filtered.array.shape == (1, 4, 8, 8)
    np.testing.assert_allclose(filtered.array[0], 7.0)
    filtered_msk = read_image(os.path.join(out, "p9_msk.nrrd"))
    assert filtered_msk.array.max() == 2


def test_save_phases_and_all_3d_vols(tmp_path):
    nda = np.zeros((2, 3, 4, 5, 1), np.float32)  # t,z,y,x,c
    nda[1] = 3.0
    D.save_phases(nda, str(tmp_path), "flow.nii")
    v0 = read_image(str(tmp_path / "flow_0_.nii"))
    v1 = read_image(str(tmp_path / "flow_1_.nii"))
    # axis order c,x,y,z after the reference einsum tzyxc->cxyzt
    assert v0.array.shape == (1, 5, 4, 3)
    np.testing.assert_allclose(v1.array, 3.0)

    D.save_all_3d_vols_new([nda], ["vols.nii"], str(tmp_path), exp="myexp")
    assert os.path.exists(str(tmp_path / "myexp" / "vols_0_.nii"))


def test_get_3d_img_msk_files(tmp_path):
    (tmp_path / "images").mkdir()
    (tmp_path / "masks").mkdir()
    vol = MedicalImage(array=np.zeros((2, 4, 4), np.float32))
    write_image(vol, str(tmp_path / "images" / "a_img.nrrd"))
    write_image(vol, str(tmp_path / "masks" / "a_msk.nrrd"))
    imgs, msks = D.get_3d_img_msk_files(str(tmp_path))
    assert len(imgs) == 1 and imgs[0].endswith("a_img.nrrd")
    assert len(msks) == 1 and msks[0].endswith("a_msk.nrrd")
