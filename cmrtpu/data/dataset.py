"""Dataset utilities & ETL — parity with src/data/Dataset.py.

File-naming, fold-dataframe and patient-id conventions are kept bit-exact
with the reference so its df_kfold.csv files and evaluation notebooks keep
working:
  * 2D slice names  '<patient>__t<frame>_z<z>_img|msk.nrrd'
    (ref: Dataset.py:552-559)
  * fold dataframe columns [fold, x_path, y_path, modality, patient(,
    pathology)] (ref: Dataset.py:680-757, :869-949)
  * patient-id extraction rules (ref: get_patient, Dataset.py:609-623)
"""

from __future__ import annotations

import glob
import logging
import os
import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from cmrtpu.io import MedicalImage, read_image, write_image
from cmrtpu.io.geometry import copy_meta
from cmrtpu.utils.io_utils import ensure_dir


# ---------------------------------------------------------------------------
# patient-id and file naming conventions
# ---------------------------------------------------------------------------

def get_patient(filename: str) -> str:
    """Patient id from a 2D nrrd filename (ref: Dataset.py:609-623)."""
    base = os.path.basename(filename)
    if re.search("__", filename):
        return base.split("__")[0]
    if base.startswith("patient"):  # acdc file
        return base.split("_")[0]
    return "_".join(base.split("_")[:2])  # gcn filename


def slice_file_name(patient: str, frame: str, z: int, kind: str) -> str:
    return f"{patient}__t{frame}_z{z}_{kind}.nrrd"


# ---------------------------------------------------------------------------
# volume slicing (ETL to 2D training files)
# ---------------------------------------------------------------------------

def create_2d_slices_from_3d_volume_files(img_f: str, mask_f: Optional[str],
                                          export_path: str) -> List[str]:
    """Slice a 3D img/mask pair into per-z 2D nrrd files
    (ref: Dataset.py:519-562). Returns the written image paths."""
    logging.info("process file: %s", img_f)
    if not mask_f:
        mask_f = img_f
    img_3d = read_image(img_f)
    mask_3d = read_image(mask_f)

    patient = os.path.basename(img_f).split("_")[0]
    frame = os.path.basename(img_f).split("frame")[1][:2]
    ensure_dir(export_path)
    written = []
    for z in range(img_3d.array.shape[0]):
        img2d = copy_meta(MedicalImage(array=img_3d.array[z]), img_3d)
        msk2d = copy_meta(MedicalImage(array=mask_3d.array[z]), img_3d)
        img_path = os.path.join(export_path, slice_file_name(patient, frame, z, "img"))
        write_image(img2d, img_path)
        write_image(msk2d, os.path.join(export_path,
                                        slice_file_name(patient, frame, z, "msk")))
        written.append(img_path)
    return written


def create_2d_slices_from_4d_volume_file(img_f: str, export_path: str) -> List[str]:
    """Slice a 4D cine into t x z 2D nrrd files (ref: Dataset.py:379-516).

    Names follow the reference's wildcard-extension scheme so ``get_patient``
    (double-underscore rule) keeps working.
    """
    img_4d = read_image(img_f)
    nda = img_4d.array
    if nda.ndim == 3:  # already 3D: treat as single timestep
        nda = nda[None]
    base = os.path.basename(img_f)
    stem = re.sub(r"\.(nii\.gz|nii|nrrd)$", "", base)
    patient = stem.split("_")[0]
    ensure_dir(export_path)
    written = []
    for t in range(nda.shape[0]):
        for z in range(nda.shape[1]):
            img2d = copy_meta(MedicalImage(array=nda[t, z]), img_4d)
            path = os.path.join(export_path,
                                slice_file_name(patient, f"{t:02d}", z, "img"))
            write_image(img2d, path)
            written.append(path)
    return written


def create_2d_slices_from_4d_volume_files(img_f: str, mask_f: str,
                                          export_path: str,
                                          filter_by_mask: bool = True,
                                          slice_threshold: int = 2):
    """Slice a 4D img/mask pair into per-t-per-z 2D nrrd files, optionally
    keeping only timesteps with enough annotated slices
    (ref: create_2d_slices_from_4d_volume_files, src/data/Dataset.py:419-466).

    Naming follows the reference's single-underscore GCN scheme
    ``<patient>_t<t>_z<z>_img|msk.nrrd``. Returns [kept timesteps, img shape].
    """
    logging.info("process file: %s", img_f)
    img_4d = read_image(img_f)
    msk_4d = read_image(mask_f)
    if filter_by_mask:
        msk_nda, kept_t = filter_4d_vol(msk_4d.array, slice_threshold)
        img_nda = img_4d.array[kept_t]
    else:
        img_nda = img_4d.array
        kept_t = list(range(img_nda.shape[0]))
        msk_nda = msk_4d.array

    patient = os.path.basename(img_f).split(".")[0].replace("volume_clean", "")
    ensure_dir(export_path)
    for img_3d, msk_3d, t in zip(img_nda, msk_nda, kept_t):
        for z, (img_2d, msk_2d) in enumerate(zip(img_3d, msk_3d)):
            for nda, kind in ((img_2d, "img"), (msk_2d, "msk")):
                out = copy_meta(MedicalImage(array=nda), img_4d,
                                copy_direction=False)
                write_image(out, os.path.join(
                    export_path, f"{patient}_t{t}_z{z}_{kind}.nrrd"))
    return [kept_t, list(img_nda.shape)]


def create_2d_slices_from_3d_volume_files_any_filename(
        img_f: str, mask_f: str, export_path: str) -> List[int]:
    """Slice a 3D img/mask pair into 2D nrrd files, extending the ORIGINAL
    filenames with the z index just before the img/msk suffix
    (ref: create_2d_slices_from_3d_volume_files_any_filename,
    src/data/Dataset.py:467-517). Returns the 3D image shape."""
    logging.info("process file: %s", img_f)
    img_3d = read_image(img_f)
    msk_3d = read_image(mask_f)

    def extended_name(f_name: str, z: int) -> str:
        base = os.path.basename(f_name)
        m = re.search("_img|_msk", base)
        suffix = m.group(0) if m else ""
        return re.sub(f"{suffix}.nrrd", f"_{z}{suffix}.nrrd", base)

    ensure_dir(export_path)
    for z, (img_2d, msk_2d) in enumerate(zip(img_3d.array, msk_3d.array)):
        write_image(copy_meta(MedicalImage(array=img_2d), img_3d),
                    os.path.join(export_path, extended_name(img_f, z)))
        write_image(copy_meta(MedicalImage(array=msk_2d), img_3d),
                    os.path.join(export_path, extended_name(mask_f, z)))
    return list(img_3d.array.shape)


def create_2d_slices_from_3d_volume_files_new_naming(
        img_f: str, mask_f: Optional[str], export_path: str):
    """ACDC 3D→2D slicer with the 'f_'-prefixed patient naming
    ``f_<patient>__t<frame>_z<z>_img|msk.nrrd``
    (ref: create_2d_slices_from_3d_volume_files_new_naming,
    src/data/Dataset.py:564-608). Returns [frame, img shape]."""
    logging.info("process file: %s", img_f)
    if not mask_f:
        mask_f = img_f
    img_3d = read_image(img_f)
    msk_3d = read_image(mask_f)
    patient = "f_" + os.path.basename(img_f).split("_")[0]
    frame = os.path.basename(img_f).split("frame")[1][:2]
    ensure_dir(export_path)
    for z, (img_2d, msk_2d) in enumerate(zip(img_3d.array, msk_3d.array)):
        write_image(copy_meta(MedicalImage(array=img_2d), img_3d),
                    os.path.join(export_path,
                                 slice_file_name(patient, frame, z, "img")))
        write_image(copy_meta(MedicalImage(array=msk_2d), img_3d),
                    os.path.join(export_path,
                                 slice_file_name(patient, frame, z, "msk")))
    return [frame, list(img_3d.array.shape)]


def filter_4d_vol(nda_4d: np.ndarray, slice_threshold: int = 2
                  ) -> Tuple[np.ndarray, List[int]]:
    """Keep timesteps with more than ``slice_threshold`` masked slices
    (ref: Dataset.py:1045-1090)."""
    timesteps = []
    for t, nda_3d in enumerate(nda_4d):
        if nda_3d.max() > 0:
            masked = sum(1 for s in nda_3d if s.max() > 0)
            if masked > slice_threshold:
                timesteps.append(t)
    return nda_4d[timesteps], timesteps


# ---------------------------------------------------------------------------
# ACDC metadata (Info.cfg: ED/ES frame + pathology group)
# ---------------------------------------------------------------------------

def read_cfg_file(path: str) -> Dict[str, object]:
    """Parse an ACDC Info.cfg ('key: value' lines, yaml subset)."""
    out: Dict[str, object] = {}
    with open(path) as fh:
        for line in fh:
            if ":" not in line:
                continue
            key, value = line.split(":", 1)
            value = value.strip()
            try:
                out[key.strip()] = int(value)
            except ValueError:
                try:
                    out[key.strip()] = float(value)
                except ValueError:
                    out[key.strip()] = value
    return out


def get_phase_file(folder: str, phase: str = "ED", gt: bool = False) -> str:
    cfg = read_cfg_file(os.path.join(folder, "Info.cfg"))
    frame = "{:02}".format(cfg.get(phase, "NOPHASE"))
    pattern = f"*frame{frame}_gt.nii.gz" if gt else f"*frame{frame}.nii.gz"
    return glob.glob(os.path.join(folder, pattern))[0]


def get_pathology_group(folder: str) -> str:
    return str(read_cfg_file(os.path.join(folder, "Info.cfg")).get("Group", "NOGROUP"))


def get_phase_for_patient_timestep(folder: str, timestep: int) -> str:
    cfg = read_cfg_file(os.path.join(folder, "Info.cfg"))
    if timestep == cfg.get("ED", 100):
        return "ED"
    if timestep == cfg.get("ES", 100):
        return "ES"
    return "NOPHASE"


def describe_acdc_patient_folder(folder: str) -> pd.DataFrame:
    """One row per file (cfg, ed, ed_gt, es, es_gt, 4d) with pathology
    (ref: Dataset.py:949-985)."""
    patient = os.path.basename(os.path.abspath(folder))
    phases = ["cfg", "ed", "ed_gt", "es", "es_gt", "4d"]
    files = [sorted(glob.glob(os.path.join(folder, "*.cfg")))[0],
             get_phase_file(folder, "ED", False),
             get_phase_file(folder, "ED", True),
             get_phase_file(folder, "ES", False),
             get_phase_file(folder, "ES", True),
             sorted(glob.glob(os.path.join(folder, "*4d.nii.gz")))[0]]
    pathology = get_pathology_group(folder)
    return pd.DataFrame({"pathology": [pathology] * len(files),
                         "patient": [patient] * len(files),
                         "files": files, "phase": phases})


def get_acdc_dataset_as_df(path: str) -> pd.DataFrame:
    """All ACDC patients as one df (ref: Dataset.py:1026-1042)."""
    folders = sorted(glob.glob(os.path.join(path, "**/")))
    dfs = [describe_acdc_patient_folder(f) for f in folders]
    return pd.concat(dfs).reset_index(drop=True)


# ---------------------------------------------------------------------------
# k-fold split construction + fold-file resolution
# ---------------------------------------------------------------------------

def filter_x_by_patient_ids(x: Sequence[str], patient_ids: Sequence[str],
                            modality: str = "test",
                            columns=("x_path", "y_path", "fold", "modality",
                                     "patient", "pathology"),
                            fold: int = 0, pathology: Optional[str] = None,
                            filter: bool = True) -> pd.DataFrame:
    """Create a fold df from a file list filtered by patient ids
    (ref: Dataset.py:758-787)."""
    df = pd.DataFrame(columns=list(columns))
    if filter:
        df["x_path"] = [e for e in x if get_patient(e) in patient_ids]
    else:
        df["x_path"] = list(x)
    df["y_path"] = [e.replace("img", "msk") for e in df["x_path"]]
    df["fold"] = [fold] * len(df["x_path"])
    df["modality"] = [modality] * len(df["x_path"])
    df["patient"] = [get_patient(e) for e in df["x_path"]]
    df["pathology"] = [pathology] * len(df["x_path"])
    return df


def get_kfolded_data(kfolds: int = 4, path_to_data: str = "data/2D/",
                     extract_patient_id=get_patient) -> pd.DataFrame:
    """Patient-level k-fold split of a 2D slice directory
    (ref: Dataset.py:680-757)."""
    from sklearn.model_selection import KFold

    seed = 42
    x = sorted(glob.glob(os.path.join(path_to_data, "**/*img.nrrd")))
    if not x:
        x = sorted(glob.glob(os.path.join(path_to_data, "*img.nrrd")))
    logging.info("found: %d files", len(x))
    patients = sorted({extract_patient_id(f) for f in x})
    kfold = KFold(n_splits=kfolds, shuffle=True, random_state=seed)

    df_folds = pd.DataFrame()
    for f, (train_idx, test_idx) in enumerate(kfold.split(patients)):
        patients_train = [patients[i] for i in train_idx]
        patients_test = [patients[i] for i in test_idx]
        df_train = filter_x_by_patient_ids(x, patients_train, "train", fold=f)
        df_test = filter_x_by_patient_ids(x, patients_test, "test", fold=f)
        df_folds = pd.concat([pd.concat([df_train, df_test]), df_folds])
    return df_folds


def create_acdc_dataframe_for_cv(path_to_data: str, kfolds: int = 4,
                                 original_acdc_dir: str = "original/",
                                 img_pattern: str = "*img.nrrd") -> pd.DataFrame:
    """Pathology-stratified patient-level k-fold CV df
    (ref: Dataset.py:869-948): per pathology, split patients k times, then
    collect that pathology's 2D files per split."""
    from sklearn.model_selection import KFold

    seed = 42
    acdc_x_files = sorted(glob.glob(os.path.join(path_to_data, f"**/{img_pattern}")))
    if not acdc_x_files:
        acdc_x_files = sorted(glob.glob(os.path.join(path_to_data, img_pattern)))
    df = get_acdc_dataset_as_df(original_acdc_dir)
    pathologies = df["pathology"].unique()
    kfold = KFold(kfolds, shuffle=True, random_state=seed)

    df_folds = pd.DataFrame()
    for pathology in pathologies:
        patients = df[df["pathology"] == pathology]["patient"].unique()
        for fold, (train_idx, test_idx) in enumerate(kfold.split(patients)):
            patients_train = [patients[i] for i in train_idx]
            patients_test = [patients[i] for i in test_idx]
            df_train = filter_x_by_patient_ids(acdc_x_files, patients_train,
                                               "train", fold=fold, pathology=pathology)
            df_test = filter_x_by_patient_ids(acdc_x_files, patients_test,
                                              "test", fold=fold, pathology=pathology)
            df_folds = pd.concat([pd.concat([df_train, df_test]), df_folds],
                                 sort=True)
    return df_folds


def get_trainings_files(data_path: str, fold: int = 0,
                        path_to_folds_df: str = "df_kfold.csv"
                        ) -> Tuple[List[str], List[str], List[str], List[str]]:
    """Resolve train/val file lists from a folds dataframe
    (ref: Dataset.py:625-678): glob *img.nrrd / *msk.nrrd, filter by the fold's
    train/test patient lists (case-insensitive)."""
    x = sorted(glob.glob(os.path.join(data_path, "*img.nrrd")))
    y = sorted(glob.glob(os.path.join(data_path, "*msk.nrrd")))
    if not x:
        logging.info("no files found, try clean.nrrd/mask.nrrd pattern")
        x = sorted(glob.glob(os.path.join(data_path, "*clean.nrrd")))
        y = sorted(glob.glob(os.path.join(data_path, "*mask.nrrd")))

    df = pd.read_csv(path_to_folds_df)
    patients = df[df.fold.isin([fold])]
    patients_train = patients[patients["modality"] == "train"]["patient"].str.lower().unique()
    patients_test = patients[patients["modality"] == "test"]["patient"].str.lower().unique()
    logging.info("Found %d images/masks in %s", len(x), data_path)

    def filter_fold(files, patient_list):
        return [f for f in files if get_patient(f).lower() in patient_list]

    x_train = sorted(filter_fold(x, patients_train))
    y_train = sorted(filter_fold(y, patients_train))
    x_test = sorted(filter_fold(x, patients_test))
    y_test = sorted(filter_fold(y, patients_test))
    assert len(x_train) == len(y_train), "len(x_train) != len(y_train)"
    return x_train, y_train, x_test, y_test


def load_acdc_files(data_path: str) -> Tuple[List[str], List[str]]:
    """Original ACDC nii.gz pairs: frameXX.nii.gz + frameXX_gt.nii.gz."""
    y = sorted(glob.glob(os.path.join(data_path, "**/*frame*_gt.nii.gz")))
    x = [f.replace("_gt", "") for f in y]
    return x, y


# ---------------------------------------------------------------------------
# file-list / filename helpers (reference long tail)
# ---------------------------------------------------------------------------

def get_img_msk_files_from_split_dir(path: str) -> Tuple[List[str], List[str]]:
    """All img/msk nrrd pairs in a split directory, falling back to original
    ACDC nii.gz pairs when no nrrd files exist
    (ref: get_img_msk_files_from_split_dir, src/data/Dataset.py:1110-1126)."""
    assert os.path.exists(path), f"Path: {path} does not exist"
    images = sorted(glob.glob(os.path.join(path, "*img.nrrd")))
    masks = sorted(glob.glob(os.path.join(path, "*msk.nrrd")))
    if not images:
        return load_acdc_files(path)
    return images, masks


def get_patients(path: str) -> List[str]:
    """Unique patient ids in a split directory (ref: Dataset.py:1183-1188)."""
    images, _ = get_img_msk_files_from_split_dir(path)
    return sorted({get_patient(f) for f in images})


def get_z_position_from_filename(f_name: str) -> int:
    """z index from ``<patient>__t<frame>_z<z>_img.nrrd`` naming
    (ref: Dataset.py:1128-1129)."""
    return int(os.path.basename(f_name).split("_")[-2].replace("z", ""))


def get_t_position_from_filename(f_name: str):
    """frame token from the slice naming; int where possible
    (ref: Dataset.py:1132-1136)."""
    token = os.path.basename(f_name).split("_")[-3].replace("t", "")
    try:
        return int(token)
    except ValueError:
        return token


def is_patient_in_df(row, df: pd.DataFrame,
                     col: str = "patient_unique") -> bool:
    """(ref: is_patient_in_df, Dataset.py:1139-1146)"""
    return row[col] in df[col].values


def get_n_patients(df: pd.DataFrame, n: int = 1) -> pd.DataFrame:
    """n seeded-random patients from fold 0 with modality forced to 'train'
    (dataset-mixing helper, ref: get_n_patients, Dataset.py:789-817).
    Uses the legacy global MT19937 RNG like the reference so the selected
    subset is identical across the two codebases."""
    np.random.seed(42)
    patients = np.random.choice(sorted(df["patient"].unique()), size=n)
    subset = df[(df["fold"] == 0) & (df["patient"].isin(patients))].copy()
    subset.loc[:, "modality"] = "train"
    return subset.reset_index(drop=True)


def get_train_data_from_df(first_df: str, second_df: Optional[str] = None,
                           n_second_df: int = 0,
                           n_first_df: Optional[int] = None, fold: int = 0):
    """Resolve train/val file lists from one k-fold dataframe, optionally
    mixing in n patients from a second dataframe (cross-dataset training,
    ref: get_train_data_from_df, Dataset.py:820-866). Returns
    (x_train, y_train, x_val, y_val, extend_info)."""
    extend = {"EXTRA_PATIENTS": [], "EXTRA_IMAGES": 0}
    df = pd.read_csv(first_df)
    if n_first_df:
        df = get_n_patients(df, n_first_df)
    if second_df:
        extra = get_n_patients(pd.read_csv(second_df), n_second_df)
        df = pd.concat([df, extra], sort=False)
        extend["EXTRA_PATIENTS"] = sorted(extra["patient"].unique())
        extend["EXTRA_IMAGES"] = len(extra)
    if "fold" in df:
        df = df[df["fold"] == fold]
    df_train = df[df["modality"] == "train"]
    df_val = df[df["modality"] == "test"]
    return (sorted(df_train["x_path"].values), sorted(df_train["y_path"].values),
            sorted(df_val["x_path"].values), sorted(df_val["y_path"].values),
            extend)


# ---------------------------------------------------------------------------
# 4D <-> 3D volume helpers (reference long tail)
# ---------------------------------------------------------------------------

def split_4d_into_3d(img_4d: MedicalImage) -> List[MedicalImage]:
    """Split a 4D image into per-t 3D images with copied geometry
    (ref: split_one_4d_sitk_in_list_of_3d_sitk, Dataset.py:319-344)."""
    return [copy_meta(MedicalImage(array=vol3d), img_4d)
            for vol3d in img_4d.array]


def create_3d_volumes_from_4d_files(img_f: str, mask_f: str, export_path: str,
                                    slice_threshold: int = 2) -> List[int]:
    """Write per-t 3D img/msk nrrd pairs for the timesteps whose mask has
    enough annotated slices (ref: create_3d_volumes_from_4d_files,
    Dataset.py:346-377). Returns the kept timestep indices."""
    from cmrtpu.io import read_image, write_image
    from cmrtpu.utils.io_utils import ensure_dir

    img_4d = read_image(img_f)
    msk_4d = read_image(mask_f)
    msk_nda, kept_t = filter_4d_vol(msk_4d.array, slice_threshold)
    ensure_dir(export_path)
    patient = os.path.basename(img_f).split(".")[0]
    for vol3d, msk3d, t in zip(img_4d.array[kept_t], msk_nda, kept_t):
        for nda, kind in ((vol3d, "img"), (msk3d, "msk")):
            out = copy_meta(MedicalImage(array=nda), img_4d)
            write_image(out, os.path.join(export_path,
                                          f"{patient}_t{t}_{kind}.nrrd"))
    return list(kept_t)


def create_4d_volumes_from_4d_files(img_f: str, mask_f: str,
                                    export_path: str,
                                    slice_threshold: int = 2):
    """Filter a 4D img/mask pair down to the timesteps with enough annotated
    slices and write the filtered 4D pair as ``<patient>_img|msk.nrrd``
    (ref: create_4d_volumes_from_4d_files, src/data/Dataset.py:253-283).
    Returns [kept timesteps, filtered image shape]."""
    logging.info("process file: %s", img_f)
    img_4d = read_image(img_f)
    msk_4d = read_image(mask_f)
    msk_nda, kept_t = filter_4d_vol(msk_4d.array, slice_threshold)
    img_nda = img_4d.array[kept_t]

    patient = os.path.basename(img_f).split(".")[0].replace("volume_clean", "")
    ensure_dir(export_path)
    for nda, kind in ((img_nda, "img"), (msk_nda, "msk")):
        out = copy_meta(MedicalImage(array=nda), img_4d)
        write_image(out, os.path.join(export_path, f"{patient}_{kind}.nrrd"))
    return [kept_t, list(img_nda.shape)]


def save_3d(nda: np.ndarray, fname: str) -> None:
    """Write a bare ndarray as an image file with default geometry
    (ref: save_3d, src/data/Dataset.py:53-56)."""
    write_image(MedicalImage(array=np.asarray(nda)), fname)


def save_phases(nda: np.ndarray, export_dir: str, suffix: str) -> None:
    """Save each timestep of a [t,z,y,x,c] volume as a 3D file with axis
    order c,x,y,z, naming ``<suffix with .nii -> _<t>_.nii>``
    (ref: save_phases, src/data/Dataset.py:83-101)."""
    f_name = os.path.join(export_dir, suffix)
    nda = np.einsum("tzyxc->cxyzt", np.asarray(nda))
    for t in range(nda.shape[-1]):
        save_3d(nda[..., t], f_name.replace(".nii", f"_{t}_.nii"))


def save_all_3d_vols_new(volumes: List[np.ndarray], vol_suffixes: List[str],
                         exp_path: str, exp: str = "example_flows") -> None:
    """Save a list of [t,z,y,x,c] volumes under ``<exp_path>/<exp>/`` via
    ``save_phases`` (ref: save_all_3d_vols_new, src/data/Dataset.py:59-80)."""
    assert isinstance(volumes, list) and isinstance(vol_suffixes, list)
    target = os.path.join(exp_path, exp)
    logging.info(target)
    ensure_dir(target)
    for nda, suffix in zip(volumes, vol_suffixes):
        save_phases(nda, target, suffix)


def get_3d_img_msk_files(path: str) -> Tuple[List[str], List[str]]:
    """img/msk nrrd pairs from ``images/`` and ``masks/`` subdirectories,
    falling back to original ACDC nii.gz pairs
    (ref: get_3d_img_msk_files, src/data/Dataset.py:1205-1221)."""
    assert os.path.exists(path), f"Path: {path} does not exist"
    images = sorted(glob.glob(os.path.join(path, "images/*img.nrrd")))
    masks = sorted(glob.glob(os.path.join(path, "masks/*msk.nrrd")))
    if not images:
        logging.info("no nrrd files found, try to load acdc files.")
        return load_acdc_files(path)
    return images, masks


def save_gt_and_pred(gt: np.ndarray, pred: np.ndarray, exp_path: str,
                     patient: str,
                     phases: Sequence[str] = ("ED", "MS", "ES", "PF", "MD")
                     ) -> None:
    """Write per-phase gt/pred volumes under gt_m/ and pred_m/ as
    ``<patient>_<phase>.nii`` with the channel axis preserved leading
    (ref: save_gt_and_pred, Dataset.py:22-51: [t,z,y,x,c] is transposed
    tzyxc->cxyzt and each [c,x,y,z] phase volume written as .nii)."""
    from cmrtpu.io import write_image
    from cmrtpu.utils.io_utils import ensure_dir

    for sub in ("gt_m", "pred_m"):
        ensure_dir(os.path.join(exp_path, sub))
    gt_c = np.einsum("tzyxc->cxyzt", np.asarray(gt))
    pred_c = np.einsum("tzyxc->cxyzt", np.asarray(pred))
    for t, phase in enumerate(phases[:gt.shape[0]]):
        for nda, sub in ((gt_c, "gt_m"), (pred_c, "pred_m")):
            write_image(MedicalImage(array=nda[..., t]),
                        os.path.join(exp_path, sub, f"{patient}_{phase}.nii"))


def describe_image(img) -> str:
    """Loggable one-stop geometry summary (describe_sitk analogue,
    ref: Dataset.py:1080-1095); accepts MedicalImage or ndarray."""
    if isinstance(img, np.ndarray):
        img = MedicalImage(array=img)
    lines = [f"size: {img.size}", f"spacing: {img.spacing}",
             f"origin: {img.origin}", f"direction: {img.direction}",
             f"dtype: {img.array.dtype}"]
    text = "\n".join(lines)
    logging.info(text)
    return text
