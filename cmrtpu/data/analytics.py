"""Volume/phase analytics over CMR files — parity with the analysis half of
src/data/Dataset.py (describe_volume :1223-1463, calc_vol_along_t :1466-1487,
create_lv_vol_df :1489-1531, predict_phase_from_vol :1532-1556).

Used by the dataset notebooks for cohort statistics and for predicting the
ED/ES phase of a cine from the LV volume curve.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional, Sequence, Union

import numpy as np
import pandas as pd

from cmrtpu.io import MedicalImage, read_image


def describe_volume(f_name: Union[str, MedicalImage],
                    image: bool = True) -> Dict[str, object]:
    """Flat json of geometry + intensity statistics for a 2D/3D/4D file
    (ref: describe_volume, src/data/Dataset.py:1223-1345).

    Keys mirror the reference (x/y/z/t-axis, x/y/z/t-spacing, slices,
    min/max/mean, .99/.75/.50 quantiles, sizes, dimension) so cohort
    dataframes built on top stay column-compatible. DICOM-tag passthroughs
    are served from the image's metadata dict when present.
    """
    img = f_name if isinstance(f_name, MedicalImage) else read_image(str(f_name))
    nda = img.array
    spacing = img.spacing  # x-fastest, sitk order

    rep: Dict[str, object] = {
        "f_name": f_name if isinstance(f_name, str) else "<in-memory>",
        "image": image,
        "shape": nda.shape,
        "spacing": tuple(spacing),
    }
    ndim = nda.ndim
    if ndim == 4:  # t, z, y, x
        rep.update({"x-axis": nda.shape[3], "y-axis": nda.shape[2],
                    "z-axis": nda.shape[1], "t-axis": nda.shape[0],
                    "slices": nda.shape[1] * nda.shape[0],
                    "x-spacing": spacing[0], "y-spacing": spacing[1],
                    "z-spacing": spacing[2], "t-spacing": spacing[3]})
    elif ndim == 3:  # z, y, x
        rep.update({"x-axis": nda.shape[2], "y-axis": nda.shape[1],
                    "z-axis": nda.shape[0], "t-axis": 0,
                    "slices": nda.shape[0],
                    "x-spacing": spacing[0], "y-spacing": spacing[1],
                    "z-spacing": spacing[2], "t-spacing": 0})
    else:  # 2D
        rep.update({"x-axis": nda.shape[1], "y-axis": nda.shape[0],
                    "z-axis": 0, "t-axis": 0, "slices": 1,
                    "x-spacing": spacing[0], "y-spacing": spacing[1],
                    "z-spacing": 0, "t-spacing": 0})

    flat = nda.reshape(-1)
    rep["min"] = float(flat.min())
    rep["max"] = float(flat.max())
    rep["mean"] = float(flat.mean())
    rep[".99-quantile"] = float(np.quantile(flat, 0.99))
    rep[".75-quantile"] = float(np.quantile(flat, 0.75))
    rep[".50-quantle"] = float(np.quantile(flat, 0.50))  # [sic] ref key name
    rep["sizes"] = str(img.size)
    rep["dimension"] = int(ndim)
    for key in ("0028|0010", "0028|0011", "0020|000e", "0008|103e",
                "0018|1090", "0018|0087", "0018|0050", "0018|5100",
                "0020|1041"):
        if key in img.metadata:
            rep[key] = img.metadata[key]
    return rep


def calc_vol_along_t(file_4d: Union[str, MedicalImage], label: int = 3
                     ) -> np.ndarray:
    """Per-timestep volume (ml) of one label in a 4D CMR
    (ref: calc_vol_along_t, Dataset.py:1466-1487). Labels 0,1,2,3 =
    background, RV, MYO, LV."""
    img = file_4d if isinstance(file_4d, MedicalImage) else read_image(str(file_4d))
    assert img.ndim == 4, f"please provide 4D files, got: {img.ndim}"
    nda = img.array
    voxels = (nda == label).sum(axis=(1, 2, 3))
    voxel_size = img.spacing[0] * img.spacing[1] * img.spacing[2]
    return (voxels * voxel_size) / 1000.0


def create_lv_vol_df(filenames: Sequence[str], dataset: str = "acdc"
                     ) -> pd.DataFrame:
    """LV-volume curve dataframe: one row per 4D file with argmax/argmin
    phase indices (ref: create_lv_vol_df, Dataset.py:1489-1531)."""
    assert len(filenames) > 0, "please provide a list of 4D files"
    assert dataset in ("acdc", "tof")
    volumes = [calc_vol_along_t(x) for x in filenames]
    cycle_len = [len(v) for v in volumes]
    patients_long = [os.path.basename(x).split("_")[0] for x in filenames]
    if dataset == "acdc":
        patients = [x.split("patient")[1] for x in patients_long]
    else:
        patients = [x.split("-")[1].lower() for x in patients_long]
    return pd.DataFrame({
        "patient_long": patients_long,
        "patient": patients,
        "ed_idxs": [int(np.argmax(v)) for v in volumes],
        "es_idxs": [int(np.argmin(v)) for v in volumes],
        "volume_change": volumes,
        "cycle_len": cycle_len,
    })


def predict_phase_from_vol(filenames: Sequence[str],
                           gt_df: Optional[pd.DataFrame] = None,
                           dataset: str = "acdc") -> pd.DataFrame:
    """Predict ED/ES phase indices from the LV volume curve and, when a
    ground-truth phase dataframe is given (columns: patient, ED#, ES#),
    report per-phase frame distance (pFD) and accuracy
    (ref: predict_phase_from_vol, Dataset.py:1532-1556)."""
    df = create_lv_vol_df(filenames, dataset=dataset)
    if gt_df is None:
        return df
    gt = gt_df.copy()
    gt["patient"] = gt["patient"].apply(lambda x: str(x).zfill(3))
    merged = df.merge(gt, on="patient", how="inner")
    for phase, pred_col, gt_col in (("ed", "ed_idxs", "ED#"),
                                    ("es", "es_idxs", "ES#")):
        if gt_col not in merged.columns:
            continue
        # cyclic frame distance within each patient's cycle length
        diff = (merged[pred_col] - merged[gt_col]).abs()
        cyc = merged["cycle_len"]
        merged[f"pfd_{phase}"] = np.minimum(diff, cyc - diff)
        merged[f"acc_{phase}"] = (merged[f"pfd_{phase}"] == 0).astype(float)
    for phase in ("ed", "es"):
        col = f"pfd_{phase}"
        if col in merged.columns:
            logging.info("%s: mean pFD %.2f, accuracy %.2f", phase.upper(),
                         merged[col].mean(), merged[f"acc_{phase}"].mean())
    return merged


def get_min_max_t_per_patient(df_patient, col: str = "vol in ml",
                              target_col: str = "t_norm") -> dict:
    """Timesteps of one patient's min/max of ``col``
    (ref: get_min_max_t_per_patient, src/data/Dataset.py:1410-1428)."""
    patients = df_patient["patient"].unique()
    assert len(patients) == 1, "more than one patient in df"
    return {"patient": patients[0],
            "min_t": df_patient.loc[df_patient[col].idxmin(), target_col],
            "max_t": df_patient.loc[df_patient[col].idxmax(), target_col]}


def get_extremas(df, col: str = "vol in ml", target_col: str = "t_norm"):
    """Per-patient min/max-timestep dataframe (ED/ES proxy from volume
    curves, ref: get_extremas, src/data/Dataset.py:1430-1433)."""
    return pd.DataFrame([
        get_min_max_t_per_patient(df[df["patient"] == p], col, target_col)
        for p in df["patient"].unique()])


def describe_path(path: str = "data/processed/train/",
                  dataset: str = "ACDC",
                  wildcard: Optional[str] = None) -> pd.DataFrame:
    """Cohort dataframe of ``describe_volume`` rows over every image (and
    mask) found under ``path`` (ref: describe_path,
    src/data/Dataset.py:1352-1407).

    ``wildcard`` overrides the dataset glob; 'ACDC' globs recursive
    frameXX.nii.gz pairs, 'GCN' walks the clean/img/msk naming fallbacks.
    (The reference additionally plots every 10th histogram inline; plotting
    lives in cmrtpu.visualization — use plot_value_histogram on the files.)
    """
    import glob as _glob

    files: Dict[str, List[str]] = {}
    if wildcard:
        logging.info("Using wildcard description: %s", wildcard)
        files["images"] = sorted(_glob.glob(os.path.join(path, wildcard)))
    elif dataset == "ACDC":
        files["images"] = sorted(_glob.glob(
            os.path.join(path, "**/*frame[0-9][0-9].nii.gz"), recursive=True))
        files["masks"] = sorted(_glob.glob(
            os.path.join(path, "**/*frame*_gt.nii.gz"), recursive=True))
    else:  # GCN naming fallbacks (ref: Dataset.py:1370-1386)
        for img_pat, msk_pat in (("*clean.nrrd", "*mask.nrrd"),
                                 ("*img.nrrd", "*msk.nrrd"),
                                 ("**/*img.nrrd", "**/*msk.nrrd"),
                                 ("**/images/*.nrrd", "**/masks/*.nrrd")):
            files["images"] = sorted(_glob.glob(os.path.join(path, img_pat)))
            files["masks"] = sorted(_glob.glob(os.path.join(path, msk_pat)))
            if files["images"]:
                break
    logging.info("describing path: %s", path)
    assert files.get("images"), "No files found!"

    rows = [describe_volume(f) for f in files["images"]]
    rows += [describe_volume(f, image=False) for f in files.get("masks", [])]
    return pd.DataFrame(rows)


_PHASE_COLS = ["ED#", "MS#", "ES#", "PF#", "MD#"]


def load_tof_phase_gt(filename: str) -> pd.DataFrame:
    """Cardiac-phase ground-truth CSV for the TOF cohort: 1-based phase
    indices shifted to 0-based, patient ids lower-cased, duplicates dropped
    (ref: load_tof_phase_gt, src/data/Dataset.py:1435-1456)."""
    gt_df = pd.read_csv(filename)
    gt_df["patient"] = gt_df["patient"].str.lower()
    gt_df = gt_df[["patient"] + _PHASE_COLS]
    gt_df[_PHASE_COLS] = (gt_df[_PHASE_COLS] - 1).astype("int")
    return gt_df.drop_duplicates(subset="patient")


def load_acdc_phase_gt(filename: str) -> pd.DataFrame:
    """Cardiac-phase ground-truth CSV for ACDC: patient ids zero-padded to
    3 digits, indices kept as stored
    (ref: load_acdc_phase_gt, src/data/Dataset.py:1458-1463)."""
    gt_df = pd.read_csv(filename)
    gt_df["patient"] = gt_df["patient"].apply(lambda x: str(x).zfill(3))
    return gt_df
