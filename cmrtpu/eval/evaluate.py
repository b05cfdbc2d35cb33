"""CV evaluation: assemble the per-patient df_eval.csv.

Column-for-column parity with ``evaluate_cv`` (ref: src/models/evaluate_cv.py:
662-883): per patient x phase, extract insertion points from prediction / GT /
inter-observer / original ventricle masks, compute mean-IP and slice-wise
angles + mm distances (plain, single-also, upper-bound variants) and
slice/point/threshold-based TPR/PPV, then write ``df_eval.csv`` into the
experiment root so the reference's analysis notebooks consume it unchanged.
"""

from __future__ import annotations

import glob
import logging
import os
from typing import Optional

import numpy as np
import pandas as pd

from cmrtpu.eval import landmarks as LM
from cmrtpu.io import read_image

def _align_by_patient_phase(files, patients, phases):
    """Order frame-named source files (``patientXXX_frameYY_*``) onto the
    pred rows' (patient, ED|ES) keys. Per patient, the lowest frame number is
    ED and the next ES (ACDC convention, ref: predict_model.py:109-116).
    Rows with no matching file get None."""
    by_patient = {}
    for f in files:
        base = os.path.basename(f)
        patient = base.split("_")[0]
        frame = int(base.split("_")[1].split("frame")[1].split(".")[0])
        by_patient.setdefault(patient, []).append((frame, f))
    lookup = {}
    for patient, frame_files in by_patient.items():
        # only the two lowest frames map to phases; extra annotated frames
        # (e.g. 4D exports) must not steal the ES slot
        for rank, (_, f) in enumerate(sorted(frame_files)[:2]):
            lookup[(patient, "ED" if rank == 0 else "ES")] = f
    return [lookup.get(key) for key in zip(patients, phases)]


def _head_suffixes(pred_files):
    """Discover extra multi-head output families next to the *_msk.nrrd
    predictions: any sibling ``<patient>_<phase>_<suffix>.nrrd`` whose suffix
    is not the landmark mask or the cmr image (rebuild extension — the
    reference writes msk/cmr only, ref: predict_model.py:184-186; HEADS
    configs additionally write one file family per extra head)."""
    suffixes = set()
    for f in pred_files:
        base = os.path.basename(f)
        if not base.endswith("_msk.nrrd"):
            continue
        stem = base[: -len("_msk.nrrd")]
        for g in glob.glob(os.path.join(os.path.dirname(f), stem + "_*.nrrd")):
            suffix = os.path.basename(g)[len(stem) + 1: -len(".nrrd")]
            if suffix not in ("msk", "cmr"):
                suffixes.add(suffix)
    return sorted(suffixes)


def _sibling_file(path: str, suffix: str):
    cand = path.replace("_msk.nrrd", f"_{suffix}.nrrd")
    return cand if cand != path and os.path.isfile(cand) else None


# ACDC ventricle label semantics (ref: src/data/Dataset.py Info.cfg handling;
# labels 1/2/3 = RV cavity / myocardium / LV cavity)
_ACDC_STRUCTURES = {1: "rv", 2: "myo", 3: "lv"}


def _append_seg_dice_columns(df_eval: pd.DataFrame, suffix: str) -> None:
    """Per-structure hard dice between a seg head's pred and gt label masks,
    one column per foreground label — named rv/myo/lv only when the gt
    labels are EXACTLY the 3-label ACDC set {1,2,3} (a 2-label landmark-
    style head must not inherit anatomically wrong rv/myo names), l<k>
    otherwise. Missing files yield NaN rows; when the gt family is missing
    entirely the column set falls back to the labels predicted, so the
    schema never silently loses the dice columns. One (pred, gt) pair is
    resident at a time — a full-resolution CV's volumes must not all be
    held in memory for a per-pair metric."""
    from cmrtpu.train.losses import dice_numpy

    pred_col = [_sibling_file(f, suffix) for f in df_eval["files_pred"]]
    gt_col = [_sibling_file(f, suffix) for f in df_eval["files_gt"]]
    df_eval[f"files_{suffix}_pred"] = pred_col
    df_eval[f"files_{suffix}_gt"] = gt_col

    # per row: None (missing files) or {label: dice} over the labels present
    # in EITHER mask; a label absent from both masks of a pair scores
    # dice_numpy's empty_score (1.0) without needing the arrays again
    row_dices = []
    gt_labels = set()
    for pf, gf in zip(pred_col, gt_col):
        if not (pf and gf):
            row_dices.append(None)
            continue
        pred = read_image(pf).array
        gt = read_image(gf).array
        present = (set(np.unique(gt).astype(int))
                   | set(np.unique(pred).astype(int))) - {0}
        row_dices.append({l: dice_numpy(gt == l, pred == l)
                          for l in present})
        gt_labels |= set(np.unique(gt).astype(int)) - {0}
    labels = gt_labels
    if not labels:  # gt family absent: keep the schema from the predictions
        labels = {l for d in row_dices if d for l in d}
    labels = sorted(labels)
    names = {l: _ACDC_STRUCTURES[l] for l in labels} \
        if set(labels) == set(_ACDC_STRUCTURES) else {l: f"l{l}" for l in labels}
    for label in labels:
        df_eval[f"{suffix}_dice_{names[label]}"] = [
            np.nan if d is None else d.get(label, 1.0)
            for d in row_dices]


# filename sorting rules (ref: evaluate_cv.py:222-225)
sorting_lambda = lambda x: int(os.path.basename(x).split("_")[0].split("patient")[1])
sorting_lambda_frame = lambda x: (
    int(os.path.basename(x).split("_")[0].split("patient")[1]),
    int(os.path.basename(x).split("_")[1].split("frame")[1]))
sorting_lambda_frame_orig = lambda x: (
    int(os.path.basename(x).split("_")[0].split("patient")[1]),
    int(os.path.basename(x).split("_")[1].split("frame")[1].split(".")[0]))


def evaluate_cv(exp_path: str, data_path: str,
                out_csv: Optional[str] = None) -> pd.DataFrame:
    data_root = data_path
    path_to_exp = exp_path
    glob_exp = os.path.join(path_to_exp, "*/*/")

    io_files = sorted(glob.glob(os.path.join(data_root, "io", "*rvip.nrrd")),
                      key=sorting_lambda_frame)
    pred_files = sorted(glob.glob(os.path.join(glob_exp, "pred", "*msk.nrrd")),
                        key=sorting_lambda)
    gt_files = sorted(glob.glob(os.path.join(glob_exp, "gt", "*msk.nrrd")),
                      key=sorting_lambda)
    cmr_files = sorted(glob.glob(os.path.join(glob_exp, "pred", "*cmr.nrrd")),
                       key=sorting_lambda)
    if not pred_files:  # flat fold layout exp/f<k>/pred as fallback
        pred_files = sorted(glob.glob(os.path.join(path_to_exp, "*/pred/*msk.nrrd")),
                            key=sorting_lambda)
        gt_files = sorted(glob.glob(os.path.join(path_to_exp, "*/gt/*msk.nrrd")),
                          key=sorting_lambda)
        cmr_files = sorted(glob.glob(os.path.join(path_to_exp, "*/pred/*cmr.nrrd")),
                           key=sorting_lambda)
    logging.info("source files: %d pred / %d gt / %d cmr / %d inter-observer",
                 len(pred_files), len(gt_files), len(cmr_files), len(io_files))

    orig_msk_files = sorted(glob.glob(os.path.join(data_root, "original",
                                                   "*/*frame*gt.nii.gz")),
                            key=sorting_lambda_frame)
    logging.info("original ventricle-mask files: %d", len(orig_msk_files))

    if not pred_files:
        raise FileNotFoundError(
            f"no prediction masks under {glob_exp}pred/ or "
            f"{path_to_exp}/*/pred/ — run predict first (pred_fold) or check "
            "the -exp path (expects the timestamped experiment root)")

    df_eval = pd.DataFrame()
    df_eval["files_pred"] = pred_files
    df_eval["files_gt"] = gt_files

    df_eval["patient"] = df_eval["files_pred"].map(
        lambda x: os.path.basename(x).split("_")[0])
    df_eval["phase"] = df_eval["files_pred"].map(
        lambda x: os.path.basename(x).split("_")[1])

    # io / original-mask sources are joined by patient + phase (per patient,
    # the lowest frame number is ED, the next ES) instead of positionally;
    # a missing file yields NaN in that row's io/orig columns rather than
    # silently dropping the whole column family (the reference aligns
    # positionally and only when counts match exactly, evaluate_cv.py:668-698
    # — a fragility the rebuild does not inherit)
    have_io = len(io_files) > 0
    have_orig = len(orig_msk_files) > 0
    if have_io:
        df_eval["files_io"] = _align_by_patient_phase(
            io_files, df_eval["patient"], df_eval["phase"])
    if have_orig:
        df_eval["files_orig_msk"] = _align_by_patient_phase(
            orig_msk_files, df_eval["patient"], df_eval["phase"])
    # pathology from the original ACDC metadata, joined by patient id
    # (ref: evaluate_cv.py:687-698 assigns positionally — same fragility as
    # the io/orig alignment, fixed the same way)
    try:
        from cmrtpu.data.dataset import get_acdc_dataset_as_df
        df_raw = get_acdc_dataset_as_df(os.path.join(data_root, "original"))
        pathology_by_patient = dict(
            df_raw.drop_duplicates("patient")[["patient",
                                               "pathology"]].values)
        df_eval["pathology"] = df_eval["patient"].map(pathology_by_patient)
    except Exception as exc:
        # degraded, not fatal: df_eval still ships, but silently empty
        # pathology columns hid malformed ACDC trees for a whole round —
        # name the failure so it is attributable
        logging.warning(
            "pathology join against %s/original failed (%s: %s) — the "
            "'pathology' column will be empty", data_root,
            type(exc).__name__, exc)
        df_eval["pathology"] = None
    df_eval = df_eval.loc[:, ~df_eval.columns.duplicated()]

    df_eval["spacing"] = df_eval["files_gt"].map(lambda x: read_image(x).spacing)
    df_eval["inplane_spacing"] = df_eval["spacing"].map(lambda x: x[0])

    # --- insertion points per source -----------------------------------
    df_eval["ips_pred"] = df_eval["files_pred"].map(
        lambda x: LM.get_ip_from_rvip_file(x, keepdim=True))
    df_eval["ips_gt"] = df_eval["files_gt"].map(
        lambda x: LM.get_ip_from_rvip_file(x, keepdim=True))
    if have_io:
        df_eval["ips_io"] = df_eval["files_io"].map(
            lambda x: LM.get_ip_from_rvip_file(x, keepdim=True)
            if isinstance(x, str) else None)
    if have_orig:
        df_eval["ips_orig_msk"] = df_eval["files_orig_msk"].map(
            lambda x: LM.get_ip_from_ventriclemsk_file(x, keepdim=True)
            if isinstance(x, str) else None)

    # --- mean ips, mean angles, mean-angle diffs, mean distances -------
    sources = ["pred"] + (["io"] if have_io else []) \
        + (["orig_msk"] if have_orig else [])
    df_eval["mips_gt"] = df_eval["ips_gt"].map(LM.calc_mean_ip)
    df_eval["mangle_gt"] = df_eval["mips_gt"].map(lambda x: LM.get_angle2x(x[0], x[1]))
    suffix_map = {"pred": "gtpred", "io": "gtio", "orig_msk": "gtorig"}
    for src in sources:
        # None ips (source file missing for this patient+phase) flow through
        # as NaN means / None angles so every downstream column still exists
        df_eval[f"mips_{src}"] = df_eval[f"ips_{src}"].map(
            lambda x: LM.calc_mean_ip(x) if x is not None
            else (np.nan, np.nan))
        df_eval[f"mangle_{src}"] = df_eval[f"mips_{src}"].map(
            lambda x: LM.get_angle2x(x[0], x[1]))
        suf = suffix_map[src]
        df_eval[f"mdiffs_{suf}"] = df_eval.apply(
            lambda r: LM.get_diff(r["mangle_gt"], r[f"mangle_{src}"]), axis=1)
        df_eval[f"mdists_ant_{suf}"] = df_eval.apply(
            lambda r: LM.get_dist(r["mips_gt"][0], r[f"mips_{src}"][0]), axis=1)
        df_eval[f"mdists_inf_{suf}"] = df_eval.apply(
            lambda r: LM.get_dist(r["mips_gt"][1], r[f"mips_{src}"][1]), axis=1)
        df_eval[f"mdists_ant_{suf}"] *= df_eval["inplane_spacing"]
        df_eval[f"mdists_inf_{suf}"] *= df_eval["inplane_spacing"]

    # --- slice-wise angles, distances, angle diffs ---------------------
    df_eval["angles_gt"] = df_eval["ips_gt"].map(LM.get_angles2x)
    for src in sources:
        suf = suffix_map[src]
        df_eval[f"angles_{src}"] = df_eval.apply(
            lambda r: LM.get_angles2x(r[f"ips_{src}"])
            if r[f"ips_{src}"] is not None
            else np.array([None] * len(r["ips_gt"][0])), axis=1)
        df_eval[f"dists_ant_{suf}"], df_eval[f"dists_inf_{suf}"] = zip(
            *df_eval.apply(lambda r: LM.get_distances(
                r["ips_gt"], r[f"ips_{src}"], r["inplane_spacing"])
                if r[f"ips_{src}"] is not None
                else (np.array([None] * len(r["ips_gt"][0])),
                      np.array([None] * len(r["ips_gt"][1]))), axis=1))
        df_eval[f"diffs_{suf}"] = df_eval.apply(
            lambda r: LM.get_differences(r["angles_gt"], r[f"angles_{src}"]), axis=1)
    df_eval["EXP"] = [path_to_exp] * len(df_eval)

    # --- TPR / PPV: slice-based ----------------------------------------
    tpr_suffix = {"pred": "", "io": "_io", "orig_msk": "_msk"}
    for src in sources:
        s = tpr_suffix[src]
        df_eval[f"tpr_ant{s}"], df_eval[f"tpr_inf{s}"] = zip(
            *df_eval.apply(lambda r: LM.calc_tpr_thresh(
                r["ips_gt"], r[f"ips_{src}"])
                if r[f"ips_{src}"] is not None else (np.nan, np.nan), axis=1))
        df_eval[f"ppv_ant{s}"], df_eval[f"ppv_inf{s}"] = zip(
            *df_eval.apply(lambda r: LM.calc_ppv_thresh(
                r["ips_gt"], r[f"ips_{src}"])
                if r[f"ips_{src}"] is not None else (np.nan, np.nan), axis=1))

    # --- point-based (single-IP-also) ----------------------------------
    df_eval["ips_pred_single_also"] = df_eval["files_pred"].map(
        lambda x: LM.get_ip_from_rvip_file(x, keepdim=True, both_only=False))
    df_eval["tpr_ant_point"], df_eval["tpr_inf_point"] = zip(
        *df_eval.apply(lambda r: LM.calc_tpr_thresh(
            r["ips_gt"], r["ips_pred_single_also"]), axis=1))
    df_eval["ppv_ant_point"], df_eval["ppv_inf_point"] = zip(
        *df_eval.apply(lambda r: LM.calc_ppv_thresh(
            r["ips_gt"], r["ips_pred_single_also"]), axis=1))

    # --- point-based with 15 mm threshold ------------------------------
    df_eval["tpr_ant_point_th15"], df_eval["tpr_inf_point_th15"] = zip(
        *df_eval.apply(lambda r: LM.calc_tpr_thresh(
            r["ips_gt"], r["ips_pred_single_also"], thresh=15,
            spacing=r["inplane_spacing"]), axis=1))
    df_eval["ppv_ant_point_th15"], df_eval["ppv_inf_point_th15"] = zip(
        *df_eval.apply(lambda r: LM.calc_ppv_thresh(
            r["ips_gt"], r["ips_pred_single_also"], thresh=15,
            spacing=r["inplane_spacing"]), axis=1))

    # --- single-also mean distances ------------------------------------
    df_eval["mips_pred_single_also"] = df_eval["ips_pred_single_also"].map(
        LM.calc_mean_ip)
    df_eval["mdists_ant_gtpred_single_also"] = df_eval.apply(
        lambda r: LM.get_dist(r["mips_gt"][0], r["mips_pred_single_also"][0]), axis=1)
    df_eval["mdists_inf_gtpred_single_also"] = df_eval.apply(
        lambda r: LM.get_dist(r["mips_gt"][1], r["mips_pred_single_also"][1]), axis=1)
    df_eval["mdists_ant_gtpred_single_also"] *= df_eval["inplane_spacing"]
    df_eval["mdists_inf_gtpred_single_also"] *= df_eval["inplane_spacing"]

    # --- slice-wise mean distances (both-only / single-also, plain / UB) -
    df_eval["mdists_ant_gtpred_slice_wise"] = df_eval["dists_ant_gtpred"].map(
        LM.get_mean_dist)
    df_eval["mdists_inf_gtpred_slice_wise"] = df_eval["dists_inf_gtpred"].map(
        LM.get_mean_dist)

    df_eval["dists_ant_gtpred_single_also"], df_eval["dists_inf_gtpred_single_also"] = zip(
        *df_eval.apply(lambda r: LM.get_distances(
            r["ips_gt"], r["ips_pred_single_also"], r["inplane_spacing"]), axis=1))
    df_eval["mdists_ant_gtpred_slice_wise_single_also"] = \
        df_eval["dists_ant_gtpred_single_also"].map(LM.get_mean_dist)
    df_eval["mdists_inf_gtpred_slice_wise_single_also"] = \
        df_eval["dists_inf_gtpred_single_also"].map(LM.get_mean_dist)

    df_eval["dists_ant_gtpred_up"], df_eval["dists_inf_gtpred_up"] = zip(
        *df_eval.apply(lambda r: LM.get_distances_upper_bound(
            r["ips_gt"], r["ips_pred"], r["inplane_spacing"]), axis=1))
    df_eval["mdists_ant_gtpred_slice_wise_up"] = df_eval["dists_ant_gtpred_up"].map(
        LM.get_mean_dist)
    df_eval["mdists_inf_gtpred_slice_wise_up"] = df_eval["dists_inf_gtpred_up"].map(
        LM.get_mean_dist)

    df_eval["dists_ant_gtpred_single_also_up"], df_eval["dists_inf_gtpred_single_also_up"] = zip(
        *df_eval.apply(lambda r: LM.get_distances_upper_bound(
            r["ips_gt"], r["ips_pred_single_also"], r["inplane_spacing"]), axis=1))
    df_eval["mdists_ant_gtpred_slice_wise_single_also_up"] = \
        df_eval["dists_ant_gtpred_single_also_up"].map(LM.get_mean_dist)
    df_eval["mdists_inf_gtpred_slice_wise_single_also_up"] = \
        df_eval["dists_inf_gtpred_single_also_up"].map(LM.get_mean_dist)

    # --- multi-head segmentation heads: per-structure dice --------------
    for suffix in _head_suffixes(pred_files):
        _append_seg_dice_columns(df_eval, suffix)

    out_csv = out_csv or os.path.join(path_to_exp, "df_eval.csv")
    df_eval.to_csv(out_csv, index=False)
    logging.info("evaluation written for %s -> %s", glob_exp, out_csv)
    return df_eval


def evaluate_cv_save(exp_path: str, data_path: str) -> pd.DataFrame:
    """Lighter evaluation variant: only the angle + distance dataframes
    (via ``get_angles_as_df`` / ``get_dist_as_df``) over pred / inter-observer
    / original-mask sources vs GT, extended by patient/phase/pathology and
    written as df_eval.csv (ref: evaluate_cv_save,
    src/models/evaluate_cv.py:599-660).

    Sources whose file count does not match the GT list are skipped with a
    message (they would mis-pair positionally); ``evaluate_cv`` is the
    robust, full-column entry point.
    """
    from cmrtpu.eval.file_metrics import get_angles_as_df, get_dist_as_df

    data_root = data_path
    glob_exp = os.path.join(exp_path, "*/*/")
    io_files = sorted(glob.glob(os.path.join(data_root, "io", "*rvip.nrrd")),
                      key=sorting_lambda_frame)
    pred_files = sorted(glob.glob(os.path.join(glob_exp, "pred", "*msk.nrrd")),
                        key=sorting_lambda)
    gt_files = sorted(glob.glob(os.path.join(glob_exp, "gt", "*msk.nrrd")),
                      key=sorting_lambda)
    if not pred_files:  # flat fold layout exp/f<k>/pred as fallback
        pred_files = sorted(glob.glob(os.path.join(exp_path, "*/pred/*msk.nrrd")),
                            key=sorting_lambda)
        gt_files = sorted(glob.glob(os.path.join(exp_path, "*/gt/*msk.nrrd")),
                          key=sorting_lambda)
    orig_msk_files = sorted(glob.glob(os.path.join(data_root, "original",
                                                   "*/*frame*gt.nii.gz")),
                            key=sorting_lambda_frame)
    if not pred_files:
        raise FileNotFoundError(f"no prediction masks under {glob_exp}pred/")

    sources = []
    for f, ismsk, sfx in [(pred_files, False, "pred"), (io_files, False, "io"),
                          (orig_msk_files, True, "orig_msk")]:
        if len(f) == len(gt_files):
            sources.append((f, ismsk, sfx))
        else:
            logging.warning("skip source '%s': %d files != %d gt files "
                            "(would mis-pair positionally)",
                            sfx, len(f), len(gt_files))
    if not sources:
        # without this, pd.concat([]) raises a confusing ValueError far from
        # the cause — usually an empty/odd gt dir next to a populated pred dir
        raise FileNotFoundError(
            f"every source was skipped: pred/gt file counts differ "
            f"({len(pred_files)} pred vs {len(gt_files)} gt under {glob_exp}) "
            "— check the experiment layout, or use evaluate_cv (which joins "
            "by patient+phase instead of positionally)")

    df_angles = pd.concat(
        [get_angles_as_df(gt_files, f, f2ismsk=ismsk, suffix=sfx, meanips=True)
         for f, ismsk, sfx in sources], axis=1)
    df_dists = pd.concat(
        [get_dist_as_df(gt_files, f, f2ismsk=ismsk, suffix=sfx, meanips=True)
         for f, ismsk, sfx in sources], axis=1)
    df_eval = pd.concat([df_angles, df_dists], axis=1)

    df_eval["pred_files"] = pred_files
    df_eval["patient"] = df_eval["pred_files"].map(
        lambda x: os.path.basename(x).split("_")[0])
    df_eval["phase"] = df_eval["pred_files"].map(
        lambda x: os.path.basename(x).split("_")[1])
    try:
        from cmrtpu.data.dataset import get_acdc_dataset_as_df
        df = get_acdc_dataset_as_df(os.path.join(data_root, "original"))
        df = df.loc[df["phase"].isin(["ed", "es"])].reset_index(drop=True)
        pathology = dict(zip(df["patient"], df["pathology"]))
        df_eval["pathology"] = df_eval["patient"].map(pathology)
    except Exception as exc:
        logging.warning(
            "pathology join against %s/original failed (%s: %s) — the "
            "'pathology' column will be empty", data_root,
            type(exc).__name__, exc)
        df_eval["pathology"] = None
    df_eval = df_eval.loc[:, ~df_eval.columns.duplicated()]
    df_eval.to_csv(os.path.join(exp_path, "df_eval.csv"), index=False)
    logging.info("evaluation written for %s", glob_exp)
    return df_eval
