"""Per-fold inference driver — parity with src/models/predict_model.py.

Flow (ref: pred_fold :7-201): restore the fold's model, iterate the fold's
test patients, split each patient's sorted slice files into ED/ES halves,
predict, threshold 0.5 into flat {1: anterior, 2: inferior} labels, optional
biggest-CC filter, inverse-preprocess into the original CMR geometry and
write ``<patient>_<ED|ES>_msk.nrrd`` (pred + gt) and ``_cmr.nrrd`` so the
reference evaluation consumes the outputs unchanged.

TPU-native difference: all slices of a patient/phase are predicted in ONE
batched jit call (padded to a bucket size to bound recompiles) instead of
BATCHSIZE=1 keras predict.
"""

from __future__ import annotations

import glob
import logging
import os
from typing import Dict, List, Optional

import jax
import numpy as np
import pandas as pd

from cmrtpu import config as C
from cmrtpu.data.dataset import get_trainings_files
from cmrtpu.io import MedicalImage, read_image, write_image
from cmrtpu.models.hybrids import get_model
from cmrtpu.ops import resample as R
from cmrtpu.ops.connected_components import (clean_prediction_2d_cc,
                                             clean_prediction_3d_cc)
from cmrtpu.pipeline.generator import DataGenerator
from cmrtpu.predict.postprocess import undo_generator_steps
from cmrtpu.train.checkpoint import load_weights_for_model
from cmrtpu.utils.io_utils import ensure_dir

_BUCKET = 8  # pad slice batches to a multiple of this to bound recompiles


def cc_clean_fn(cfg: Dict):
    """The CC_FILTER knob's cleaner, or None when off.

    Truthy (reference parity, ref: predict_model.py:159-161) keeps the
    biggest component per label PER SLICE — which cannot remove a spurious
    blob on a slice with no true detection (it is the biggest there), and
    those isolated false positives dominate the volume-CoM localisation
    error (measured in the TTA study and the live loc_fp metric).
    ``CC_FILTER: '3d'`` instead keeps the biggest 26-connected VOLUME
    component per label: the contiguous landmark stack survives, isolated
    off-slice blobs do not. Both run on-device
    (cmrtpu/ops/connected_components.py)."""
    mode = C.get(cfg, "CC_FILTER", False)
    if isinstance(mode, str):
        norm = mode.strip().lower()
        if norm in ("", "false", "none", "0"):
            return None
        if norm == "3d":
            return clean_prediction_3d_cc
        if norm in ("2d", "true", "1"):
            return clean_prediction_2d_cc
        # an unrecognized string must not silently fall back to the 2D
        # cleaner — the user would measure the wrong filter
        raise ValueError(
            f"CC_FILTER={mode!r}: expected a boolean, '2d' or '3d'")
    return clean_prediction_2d_cc if mode else None


class Predictor:
    """Restored model + jitted batched forward."""

    def __init__(self, config: Dict, model_path: Optional[str] = None):
        self.config = C.normalise_config(config)
        from cmrtpu.utils.xla_cache import ensure_compilation_cache
        ensure_compilation_cache(self.config)
        # get_model honors MODEL_VARIANT so hybrid-trained folds
        # restore correctly (the reference's predict path only ever
        # rebuilds the plain U-Net, ref: predict_model.py:75)
        self.model = get_model(self.config)
        model_path = model_path or C.get(self.config, "MODEL_PATH")
        self.params, self.batch_stats = load_weights_for_model(
            model_path, self.config, self.model)
        apply_fn = lambda v, x: self.model.apply(v, x, train=False)
        if C.get(self.config, "TTA", False):
            # rot90-orbit test-time augmentation (cmrtpu/predict/tta.py):
            # TTA_MODE='probs' averages probabilities over the orbit,
            # 'coords' averages landmark coordinates (blur-proof)
            from cmrtpu.predict.tta import tta_forward_from_config
            apply_fn = tta_forward_from_config(apply_fn, self.config)
        variables = {"params": self.params, "batch_stats": self.batch_stats}
        self._forward = jax.jit(lambda x: apply_fn(variables, x))

    def predict(self, x: np.ndarray):
        """Batched forward; multi-head models return a dict of head outputs
        (each trimmed back to the unpadded batch size)."""
        n = x.shape[0]
        padded = -(-n // _BUCKET) * _BUCKET
        if padded != n:
            x = np.concatenate([x, np.zeros((padded - n, *x.shape[1:]), x.dtype)])
        out = jax.device_get(self._forward(x))
        return jax.tree_util.tree_map(lambda a: np.asarray(a)[:n], out)


def filter_by_patient_id(p_id: str, f_names: List[str]) -> List[str]:
    return [elem for elem in f_names if p_id in elem]


def threshold_and_flatten(channels: np.ndarray) -> np.ndarray:
    """sigmoid channels -> flat labels (ch0>0.5 -> 1, ch1>0.5 -> 2; later
    channels overwrite; ref: predict_model.py:149-156)."""
    flat = np.zeros(channels.shape[:-1], dtype=np.float64)
    for c in range(channels.shape[-1]):
        flat[channels[..., c] > 0.5] = c + 1
    return flat


def flatten_head(channels: np.ndarray, activation: str) -> np.ndarray:
    """Channel probabilities -> flat integer labels, per head activation:
    sigmoid heads use the reference's 0.5-threshold overwrite rule (labels
    1..C), softmax heads take the exclusive argmax (labels 0..C-1 with 0 =
    background)."""
    if str(activation) == "softmax":
        return np.argmax(channels, axis=-1).astype(np.float64)
    return threshold_and_flatten(channels)


def _head_outputs(cfg: Dict, preds, gts: Optional[np.ndarray]):
    """Split multi-head predictions/targets into per-head flat label volumes.

    Returns [(file_suffix, pred_flat, gt_flat, label_values), ...] in HEADS
    spec order. The FIRST sigmoid head keeps the reference's ``msk`` suffix
    (so the landmark evaluation contract, ref: predict_model.py:184-186,
    holds unchanged); every other head writes ``_<name>.nrrd``.

    ``gts=None`` (serve time — no targets exist): gt_flat is None and only
    the prediction side is flattened."""
    heads = tuple(tuple(h) for h in C.get(cfg, "HEADS", ()) or ())
    if not heads:
        n_channels = np.asarray(preds).shape[-1] if gts is None \
            else gts.shape[-1]
        label_values = tuple(range(1, n_channels + 1))
        return [("msk", threshold_and_flatten(preds),
                 None if gts is None else threshold_and_flatten(gts),
                 label_values)]
    outputs = []
    offset = 0
    msk_taken = False
    for name, channels, act in heads:
        channels = int(channels)
        gt_h = None if gts is None else gts[..., offset:offset + channels]
        offset += channels
        pred_h = preds[name]
        if str(act) == "softmax":
            # one-hot targets/probabilities -> exclusive labels; 0 = bg
            label_values = tuple(range(1, channels))
        else:
            label_values = tuple(range(1, channels + 1))
        suffix = str(name)
        if str(act) != "softmax" and not msk_taken:
            suffix, msk_taken = "msk", True
        outputs.append((suffix, flatten_head(pred_h, act),
                        None if gt_h is None else flatten_head(gt_h, act),
                        label_values))
    if not msk_taken:
        logging.warning(
            "HEADS=%s has no sigmoid head: no _msk.nrrd is written, so the "
            "landmark evaluation (which globs *msk.nrrd) will find no "
            "predictions — add a sigmoid landmark head or evaluate the "
            "per-head _<name>.nrrd families directly",
            [h[0] for h in heads])
    return outputs


def select_4d_landmark_head(cfg: Dict):
    """Which head the 4D driver tracks: the first sigmoid head (the one that
    owns the ``_msk`` landmark contract in ``_head_outputs``), else the first
    head's argmax labels as a fallback. Returns ``(name, activation,
    cc_label_values)``; name is None for single-head models (label values
    then follow the output's channel count)."""
    heads = [tuple(h) for h in (C.get(cfg, "HEADS") or ())]
    if not heads:
        return None, "sigmoid", None
    head = next((h for h in heads if str(h[2]) != "softmax"), None)
    if head is not None:
        # sigmoid threshold rule: channel c -> label c+1
        return str(head[0]), "sigmoid", tuple(range(1, int(head[1]) + 1))
    head = heads[0]
    logging.warning(
        "predict_4d_on_2d_cv: HEADS has no sigmoid landmark head; using "
        "head %r (argmax labels)", head[0])
    return str(head[0]), str(head[2]), tuple(range(1, int(head[1])))  # 0=bg


def preprocess_model_input(slices: np.ndarray, slice_spacing,
                           cfg: Dict) -> np.ndarray:
    """Deterministic inference-time preprocessing for a stack of raw 2D
    slices: per slice resample (if RESAMPLE) -> quantile clip -> normalise ->
    pad/crop to DIM -> re-normalise — the generator's fix+finalize chain
    without targets (ref: src/data/Generators.py:283-344). ``slices`` is
    [N, y, x]; ``slice_spacing`` the in-plane (x, y) spacing shared by all
    slices. Returns the model-ready [N, H, W, 1] float32 batch."""
    from cmrtpu.pipeline import transforms as T

    cfg = C.normalise_config(cfg)
    dim = tuple(C.get(cfg, "DIM"))
    target_spacing = list(reversed(C.get(cfg, "SPACING")))
    scaler = C.get(cfg, "SCALER")
    resample = bool(C.get(cfg, "RESAMPLE", False))
    xs = []
    for nda in slices:
        img2d = MedicalImage(array=np.asarray(nda), spacing=slice_spacing)
        if resample:
            new_size = T.calc_resampled_size(img2d.size, img2d.spacing,
                                             target_spacing)
            img2d = R.resample_image(img2d, new_size, target_spacing,
                                     R.LINEAR)
        arr = T.normalise_image(T.clip_quantile(img2d.array, 0.999), scaler)
        arr = T.pad_and_crop(arr.astype(np.float32), dim)
        xs.append(T.normalise_image(arr, scaler))
    return np.stack(xs)[..., None]


def pred_fold(config: Dict) -> bool:
    """Run inference for one fold (ref: pred_fold, predict_model.py:7-201)."""
    cfg = C.normalise_config(config)
    fold = C.get(cfg, "FOLD")
    data_path_sax = C.get(cfg, "DATA_PATH_SAX")
    df_folds = C.get(cfg, "DF_FOLDS")

    x_train, y_train, x_val, y_val = get_trainings_files(
        data_path=data_path_sax, path_to_folds_df=df_folds, fold=fold)

    path_to_orig = C.get(cfg, "DATA_PATH_ORIG") or ""
    orig_cmr_files = sorted(glob.glob(
        os.path.join(path_to_orig, "*/*frame[0-9][0-9].nii.gz")))
    orig_given = len(orig_cmr_files) > 0
    logging.info("Found %d orig 3D CMR images", len(orig_cmr_files))

    predictor = Predictor(cfg)

    exp_path = C.get(cfg, "EXP_PATH")
    pred_path = os.path.join(exp_path, "pred")
    gt_path = os.path.join(exp_path, "gt")
    ensure_dir(pred_path)
    ensure_dir(gt_path)

    pred_config = dict(cfg)
    pred_config.update(SHUFFLE=False, AUGMENT=False, BATCHSIZE=1,
                       HIST_MATCHING=False)

    df = pd.read_csv(df_folds)
    df = df[(df["fold"] == fold) & (df["modality"] == "test")]

    cc = cc_clean_fn(cfg)  # constant per fold — resolved once, not per head
    for p in sorted(df["patient"].unique()):
        files_ = filter_by_patient_id(p, x_val)
        masks_ = filter_by_patient_id(p, y_val)
        if not files_:
            continue
        # ED/ES halves of the sorted slice list (ref: predict_model.py:110-116)
        half = len(files_) // 2
        splits = {"ED": (files_[:half], masks_[:half]),
                  "ES": (files_[half:], masks_[half:])}
        assert len(splits["ED"][0]) == len(splits["ED"][1]), (
            "number of images and masks should be the same")

        for phase, (phase_files, phase_masks) in splits.items():
            gen = DataGenerator(phase_files, phase_masks, config=pred_config)
            xs, ys = [], []
            for i in range(len(gen)):
                x, y = gen[i]
                xs.append(np.squeeze(x, axis=0))
                ys.append(np.squeeze(y, axis=0))
            gts_cmr = np.stack([np.squeeze(x) for x in xs])          # [z, H, W]
            gts = np.stack(ys)                                       # [z, H, W, sum(C)]
            preds = predictor.predict(np.stack(xs))    # [z, H, W, C] or head dict

            orig = None
            if orig_given:
                matches = filter_by_patient_id(p, orig_cmr_files)
                if matches:
                    orig = read_image(matches[0])
                else:
                    # partial DATA_PATH_ORIG coverage: fall back to the
                    # config-spacing path for THIS patient instead of
                    # aborting the fold mid-write with an IndexError
                    logging.warning(
                        "pred_fold: no original file for patient %s under "
                        "DATA_PATH_ORIG — writing this patient's outputs "
                        "on the model grid with the config-spacing header",
                        p)
            # config-spacing fallback (ref: predict_model.py:174-181).
            # RESAMPLE=False keeps the slices on their NATIVE in-plane grid,
            # so the header must carry the slice files' own spacing — the
            # reference would stamp config SPACING regardless, silently
            # skewing every downstream mm measurement (quirk not replicated)
            if bool(C.get(cfg, "RESAMPLE", False)):
                inplane = tuple(reversed(C.get(cfg, "SPACING")))
            else:
                inplane = tuple(read_image(phase_files[0]).spacing[:2])
            spacing = inplane + (10.0,)

            def to_orig(flat_labels: np.ndarray) -> MedicalImage:
                if orig is not None:
                    return undo_generator_steps(flat_labels.astype(np.uint8),
                                                cfg, R.NEAREST, orig)
                return MedicalImage(array=flat_labels.astype(np.uint8),
                                    spacing=spacing)

            for suffix, preds_flat, gts_flat, label_values in \
                    _head_outputs(cfg, preds, gts):
                if cc is not None:
                    preds_flat = np.asarray(jax.device_get(
                        cc(preds_flat, label_values)))
                write_image(to_orig(gts_flat),
                            os.path.join(gt_path, f"{p}_{phase}_{suffix}.nrrd"))
                write_image(to_orig(preds_flat),
                            os.path.join(pred_path, f"{p}_{phase}_{suffix}.nrrd"))

            cmr_img = undo_generator_steps(gts_cmr, cfg, R.NEAREST, orig) \
                if orig is not None \
                else MedicalImage(array=gts_cmr, spacing=spacing)
            write_image(cmr_img, os.path.join(pred_path, f"{p}_{phase}_cmr.nrrd"))
            logging.info("patient %s phase %s: %d slices predicted",
                         p, phase, len(phase_files))

    logging.info("done! Check %s and %s", gt_path, pred_path)
    return True


def predict_4d_on_2d_cv(exp_root: str, data_root: str,
                        export_suffix: str = "pred_4d") -> None:
    """Run a trained 2D CV over full 4D CMR sequences
    (ref: src/models/predict_4d_on_seg.py:23-113): per fold, filter the 4D
    files to that fold's test patients, slice t x z, predict, threshold, per-t
    CC-filter, stack back to 4D and write nrrd."""
    fold_dirs = sorted(glob.glob(os.path.join(exp_root, "f[0-9]")))
    files_4d = sorted(glob.glob(os.path.join(data_root, "original",
                                             "*/*4d.nii.gz")))
    for fold_dir in fold_dirs:
        cfg = C.load_config(os.path.join(fold_dir, "config", "config.json"))
        cfg["MODEL_PATH"] = os.path.join(fold_dir, "model")
        fold = C.get(cfg, "FOLD")
        df = pd.read_csv(C.get(cfg, "DF_FOLDS"))
        test_patients = set(df[(df["fold"] == fold) &
                               (df["modality"] == "test")]["patient"].unique())
        fold_files = [f for f in files_4d
                      if any(p in f for p in test_patients)]
        predictor = Predictor(cfg)
        out_dir = os.path.join(fold_dir, export_suffix)
        ensure_dir(out_dir)

        pred_cfg = dict(cfg)
        pred_cfg.update(SHUFFLE=False, AUGMENT=False, BATCHSIZE=1,
                        HIST_MATCHING=False)
        # constant per fold — selected once so the all-softmax fallback
        # warning fires once, not once per 4D file
        head_name, head_act, head_cc = select_4d_landmark_head(cfg)
        # the reference's 4D flow applies per-t 2D CC unconditionally
        # (ref: predict_4d_on_seg.py:93-99); CC_FILTER='3d' upgrades the
        # per-t cleaner to the volume (z-stack) biggest component
        cc = cc_clean_fn(cfg) or clean_prediction_2d_cc
        for f4d in fold_files:
            vol = read_image(f4d)
            nda = vol.array  # [t, z, y, x]
            t_dim, z_dim = nda.shape[0], nda.shape[1]
            # preprocess the t x z slices directly (equivalent to sliceable(),
            # ref: Generators.py:401-424, but batched for throughput)
            dim = tuple(C.get(cfg, "DIM"))
            # the predicted grid's TRUE in-plane spacing: the config target
            # only after resampling; RESAMPLE=False pads/crops the study's
            # native grid, so stamping config SPACING would silently skew
            # every downstream mm measurement on that header
            if bool(C.get(cfg, "RESAMPLE", False)):
                spacing = list(reversed(C.get(cfg, "SPACING")))
            else:
                spacing = list(vol.spacing[:2])
            batch = preprocess_model_input(
                nda.reshape(t_dim * z_dim, *nda.shape[2:]),
                vol.spacing[:2], cfg)
            preds = predictor.predict(batch)
            if isinstance(preds, dict):
                preds = preds[head_name] if head_name in preds \
                    else next(iter(preds.values()))
            cc_labels = head_cc
            if cc_labels is None:
                # single-head model: label values follow the channel count
                # (same derivation as pred_fold's _head_outputs)
                cc_labels = tuple(range(1, np.asarray(preds).shape[-1] + 1))
            flat = flatten_head(preds, head_act).reshape(t_dim, z_dim, *dim)
            cleaned = np.stack([np.asarray(jax.device_get(
                cc(flat[t], cc_labels))) for t in range(t_dim)])
            out = MedicalImage(array=cleaned.astype(np.uint8),
                               spacing=(spacing[0], spacing[1],
                                        vol.spacing[2] if vol.ndim > 2 else 10.0,
                                        1.0))
            name = os.path.basename(f4d).replace(".nii.gz", "_pred.nrrd")
            write_image(out, os.path.join(out_dir, name))
            logging.info("4D prediction written: %s", name)


def predict_override_twin(exp_root: str, overrides: Dict,
                          suffix: str) -> str:
    """Re-run inference for every fold of a trained experiment root with
    inference-only config overrides into a sibling ``<exp_root>_<suffix>``
    root (same checkpoints), ready for evaluate_cv — the generic form of
    the TTA / int8 twin pattern, so ANY predict-time knob (TTA,
    CC_FILTER='3d', DETECTION head choices, ...) can be quality-A/B'd
    against the plain root on identical weights and data.

    The sibling-root layout keeps evaluate_cv's one-fold-family-per-root
    contract (cmrtpu/predict/quantize.py quantize_fold)."""
    import json

    # reject typo'd/lowercase keys up front: normalise_config silently
    # drops non-uppercase keys and C.get never reads unknown ones, so a bad
    # override would otherwise produce a twin identical to the plain root
    # and the A/B would report "the knob doesn't help"
    bad = [k for k in overrides
           if not (isinstance(k, str) and k.isupper()
                   and (k in C.DEFAULTS or k in C._ALIASES
                        or k in C._SETTABLE_EXTRA))]
    if bad:
        raise ValueError(
            f"unknown override key(s) {bad} — keys must be uppercase "
            f"entries of cmrtpu/config.py (DEFAULTS/_SETTABLE_EXTRA)")

    t_root = exp_root.rstrip("/") + f"_{suffix}"
    folds = sorted(glob.glob(os.path.join(exp_root, "f[0-9]*")))
    if not folds:
        raise FileNotFoundError(f"no fold dirs under {exp_root}")
    for fold_dir in folds:
        t_fold = os.path.join(t_root, os.path.basename(fold_dir))
        cfg = C.load_config(os.path.join(fold_dir, "config", "config.json"))
        cfg.update(overrides)
        cfg["EXP_PATH"] = t_fold
        cfg["MODEL_PATH"] = os.path.join(fold_dir, "model")
        ensure_dir(os.path.join(t_fold, "config"))
        with open(os.path.join(t_fold, "config", "config.json"), "w") as fh:
            json.dump(cfg, fh, indent=2, default=str)
        pred_fold(cfg)
    return t_root
