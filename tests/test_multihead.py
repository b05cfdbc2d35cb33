"""BASELINE config 4 end-to-end: multi-head (RVIP sigmoid + ventricle
softmax) train -> predict (per-head nrrd families) -> evaluate_cv with
per-structure seg-dice columns.

The reference is single-head only (ref: src/models/predict_model.py:149-186
defines the msk contract); the multi-head chain is a rebuild extension that
keeps the landmark contract intact (first sigmoid head still writes
``_msk.nrrd``) and adds one ``_<head>.nrrd`` family per extra head.
"""

import glob
import os

import numpy as np
import pytest

from cmrtpu.data import dataset as D
from cmrtpu.io import MedicalImage, read_image, write_image

HEADS = [["rvip", 2, "sigmoid"], ["seg", 4, "softmax"]]


@pytest.fixture(scope="module")
def multihead_root(tmp_path_factory):
    """ACDC-like tree with BOTH rvip (_msk) and ventricle (_seg) 2D slice
    targets per image slice."""
    rng = np.random.default_rng(7)
    root = tmp_path_factory.mktemp("mh_dataset")
    orig = root / "original"
    two_d = root / "2D"
    two_d.mkdir()
    for i in range(1, 5):
        p = orig / f"patient{i:03d}"
        p.mkdir(parents=True)
        ed, es = 1, 12
        (p / "Info.cfg").write_text(f"ED: {ed}\nES: {es}\nGroup: NOR\n")
        for frame in (ed, es):
            vol = rng.normal(300, 60, size=(3, 36, 34)).astype(np.float32)
            rvip = np.zeros((3, 36, 34), np.uint8)
            seg = np.zeros((3, 36, 34), np.uint8)
            yy, xx = np.mgrid[0:36, 0:34]
            ring = np.hypot(yy - 18, xx - 20)
            for z in range(3):
                cy, cx = 10 + i % 3, 8 + i % 3
                vol[z, cy - 1:cy + 2, cx - 1:cx + 2] += 400
                vol[z, cy + 10:cy + 12, cx:cx + 2] += 400
                rvip[z, cy:cy + 2, cx:cx + 2] = 1
                rvip[z, cy + 10:cy + 12, cx:cx + 2] = 2
                seg[z][ring < 8] = 2              # myo
                seg[z][ring < 4] = 3              # lv
                seg[z][(np.hypot(yy - 18, xx - 8) < 5) & (ring >= 8)] = 1  # rv
            spacing = (1.4, 1.4, 8.0)
            img_f = str(p / f"patient{i:03d}_frame{frame:02d}.nii.gz")
            write_image(MedicalImage(array=vol, spacing=spacing), img_f)
            # slice img + rvip mask with the reference naming, then write the
            # seg target as a _seg sibling per slice
            rvip_f = str(root / f"patient{i:03d}_frame{frame:02d}_rvip.nrrd")
            write_image(MedicalImage(array=rvip, spacing=spacing), rvip_f)
            D.create_2d_slices_from_3d_volume_files(img_f, rvip_f, str(two_d))
            for z in range(3):
                seg2d = MedicalImage(array=seg[z], spacing=spacing[:2])
                write_image(seg2d, str(two_d / D.slice_file_name(
                    f"patient{i:03d}", f"{frame:02d}", z, "seg")))
    df = D.get_kfolded_data(kfolds=2, path_to_data=str(two_d))
    df.to_csv(str(root / "df_kfold.csv"), index=False)
    return str(root)


CFG = {"EXPERIMENT": "mh", "DIM": [32, 32], "SPACING": [1.4, 1.4],
       "DEPTH": 2, "FILTERS": 4, "MASK_VALUES": [1, 2], "MASK_CLASSES": 2,
       "HEADS": HEADS, "BATCHSIZE": 4, "EPOCHS": 2, "RESAMPLE": True,
       "SHUFFLE": True, "MIXED_PRECISION": False, "LEARNING_RATE": 1e-3,
       "SEED": 42, "AUGMENT": True, "AUGMENT_PROB": 0.5, "RANDOMROTATE": True,
       "FOLDS": [0], "CC_FILTER": True,
       "SAVE_LEARNING_PROGRESS_AS_PNG": False}


@pytest.fixture(scope="module")
def trained_mh_exp(multihead_root, tmp_path_factory):
    from cmrtpu.train.fold import train_fold

    exp_root = str(tmp_path_factory.mktemp("mh_exp") / "run")
    cfg = dict(CFG)
    cfg["EXP_PATH"] = exp_root
    cfg["DATA_PATH_SAX"] = os.path.join(multihead_root, "2D")
    cfg["DF_FOLDS"] = os.path.join(multihead_root, "df_kfold.csv")
    cfg["DATA_PATH_ORIG"] = os.path.join(multihead_root, "original")
    cfg["FOLD"] = 0
    train_fold(cfg, in_memory=True)
    return exp_root


def test_multihead_generator_targets(multihead_root):
    """The generator stacks one label map per head and finalize concatenates
    sigmoid binary channels + softmax one-hot in HEADS spec order."""
    from cmrtpu.data.dataset import get_trainings_files
    from cmrtpu.pipeline.generator import DataGenerator

    cfg = dict(CFG, AUGMENT=False)
    cfg["DATA_PATH_SAX"] = os.path.join(multihead_root, "2D")
    x_train, y_train, _, _ = get_trainings_files(
        data_path=cfg["DATA_PATH_SAX"],
        path_to_folds_df=os.path.join(multihead_root, "df_kfold.csv"), fold=0)
    gen = DataGenerator(x_train, y_train, config=cfg)
    assert gen._cache_y.shape[1] == 2  # one label map per head
    x, y = gen[0]
    assert np.asarray(x).shape == (4, 32, 32, 1)
    assert np.asarray(y).shape == (4, 32, 32, 2 + 4)
    y = np.asarray(y)
    # sigmoid part is binary per channel; softmax part is a one-hot
    assert set(np.unique(y[..., :2])) <= {0.0, 1.0}
    np.testing.assert_allclose(y[..., 2:].sum(-1), 1.0)


def test_multihead_pred_writes_both_families(trained_mh_exp):
    fold_dir = os.path.join(trained_mh_exp, "f0")
    msk_pred = sorted(glob.glob(os.path.join(fold_dir, "pred", "*_msk.nrrd")))
    seg_pred = sorted(glob.glob(os.path.join(fold_dir, "pred", "*_seg.nrrd")))
    msk_gt = sorted(glob.glob(os.path.join(fold_dir, "gt", "*_msk.nrrd")))
    seg_gt = sorted(glob.glob(os.path.join(fold_dir, "gt", "*_seg.nrrd")))
    assert msk_pred and seg_pred
    assert len(msk_pred) == len(seg_pred) == len(msk_gt) == len(seg_gt)
    # label semantics per family: rvip {0,1,2}, ventricles {0..3}; geometry
    # restored to the original volume
    seg = read_image(seg_gt[0])
    assert seg.array.shape == (3, 36, 34)
    assert set(np.unique(seg.array).astype(int)) <= {0, 1, 2, 3}
    assert {1, 2, 3} <= set(np.unique(seg.array).astype(int))
    msk = read_image(msk_gt[0])
    assert set(np.unique(msk.array).astype(int)) <= {0, 1, 2}


def test_multihead_evaluate_cv_seg_dice_columns(trained_mh_exp, multihead_root):
    from cmrtpu.eval.evaluate import evaluate_cv

    df = evaluate_cv(trained_mh_exp, multihead_root)
    assert len(df) > 0
    # the landmark column family is unchanged
    for col in ("ips_pred", "mdists_ant_gtpred", "tpr_ant", "ppv_inf"):
        assert col in df.columns
    # per-structure dice for the seg head (ACDC naming for labels 1/2/3)
    for col in ("seg_dice_rv", "seg_dice_myo", "seg_dice_lv"):
        assert col in df.columns, f"missing column {col}"
        assert df[col].notna().any()
        assert ((df[col].dropna() >= 0) & (df[col].dropna() <= 1)).all()
    # gt-vs-gt is perfect by construction: the gt seg equals itself, so the
    # pred-vs-gt dice is a real number strictly below/equal 1
    assert os.path.isfile(os.path.join(trained_mh_exp, "df_eval.csv"))


def test_seg_dice_columns_fall_back_for_non_acdc_labels(tmp_path):
    """A 2-label extra head must get l1/l2 dice columns, NOT rv/myo —
    anatomical names apply only when the gt labels are exactly the ACDC
    {1,2,3} set."""
    import pandas as pd

    from cmrtpu.eval.evaluate import _append_seg_dice_columns

    rng = np.random.default_rng(0)
    rows = []
    for phase in ("ED", "ES"):
        lab = (rng.integers(0, 3, size=(2, 8, 8))).astype(np.uint8)
        pf = str(tmp_path / f"patient001_{phase}_ip.nrrd")
        gf = str(tmp_path / f"patient001_{phase}_gt_ip.nrrd")
        write_image(MedicalImage(array=lab, spacing=(1.4, 1.4, 8.0)), pf)
        write_image(MedicalImage(array=lab, spacing=(1.4, 1.4, 8.0)), gf)
        rows.append({"files_pred": pf.replace("_ip.nrrd", "_msk.nrrd"),
                     "files_gt": gf.replace("_ip.nrrd", "_msk.nrrd")})
        # the msk siblings only need to exist for _sibling_file resolution
        write_image(MedicalImage(array=lab, spacing=(1.4, 1.4, 8.0)),
                    rows[-1]["files_pred"])
        write_image(MedicalImage(array=lab, spacing=(1.4, 1.4, 8.0)),
                    rows[-1]["files_gt"])
    df = pd.DataFrame(rows)
    _append_seg_dice_columns(df, "ip")
    assert {"ip_dice_l1", "ip_dice_l2"} <= set(df.columns)
    assert not any(c.startswith("ip_dice_rv") for c in df.columns)
    assert np.allclose(df["ip_dice_l1"], 1.0)  # pred == gt


def test_head_outputs_warn_when_no_sigmoid_head(caplog):
    """An all-softmax HEADS config writes no _msk.nrrd (the landmark eval
    contract) — pred_fold must say so loudly instead of failing far away in
    evaluate_cv's glob."""
    import logging

    from cmrtpu.predict.predictor import _head_outputs

    cfg = {"HEADS": [["seg", 3, "softmax"]]}
    preds = {"seg": np.zeros((2, 8, 8, 3), np.float32)}
    gts = np.zeros((2, 8, 8, 3), np.float32)
    with caplog.at_level(logging.WARNING):
        outs = _head_outputs(cfg, preds, gts)
    assert [o[0] for o in outs] == ["seg"]
    assert any("no sigmoid head" in r.message for r in caplog.records)


def test_predict_4d_on_2d_cv_multihead(trained_mh_exp, multihead_root):
    """The 4D driver end-to-end on a DICT-output (multi-head) model: it must
    track the sigmoid landmark head's channels (not the concatenated stack)
    and CC-filter with that head's label set, writing one 4D nrrd whose
    labels are exactly the rvip head's {0, 1, 2}."""
    import pandas as pd

    from cmrtpu.predict.predictor import predict_4d_on_2d_cv

    df = pd.read_csv(os.path.join(multihead_root, "df_kfold.csv"))
    patient = sorted(df[(df["fold"] == 0) &
                        (df["modality"] == "test")]["patient"].unique())[0]
    rng = np.random.default_rng(13)
    vol4d = rng.normal(300, 60, size=(2, 3, 36, 34)).astype(np.float32)
    vol4d[:, :, 9:12, 7:10] += 400
    vol4d[:, :, 19:22, 8:11] += 400
    f4d = os.path.join(multihead_root, "original", patient,
                       f"{patient}_4d.nii.gz")
    write_image(MedicalImage(array=vol4d, spacing=(1.4, 1.4, 8.0, 1.0)), f4d)

    predict_4d_on_2d_cv(trained_mh_exp, multihead_root)
    out = glob.glob(os.path.join(trained_mh_exp, "f0", "pred_4d",
                                 "*_pred.nrrd"))
    assert len(out) == 1 and patient in out[0]
    pred = read_image(out[0])
    # [t, z, DIM]; labels from the 2-channel rvip head, NOT the seg head's
    # 4-way argmax (which would produce label 3)
    assert pred.array.shape == (2, 3, 32, 32)
    assert set(np.unique(pred.array).astype(int)) <= {0, 1, 2}


def test_select_4d_landmark_head():
    """The 4D driver tracks the first sigmoid head with label values derived
    from ITS channel count (a 3-channel landmark head yields labels 1..3,
    not a hardcoded (1, 2)); all-softmax configs fall back to the first
    head's argmax labels (0 = background)."""
    from cmrtpu.predict.predictor import select_4d_landmark_head

    # single-head model: labels derived later from the output channels
    assert select_4d_landmark_head({}) == (None, "sigmoid", None)
    # standard RVIP head
    name, act, labels = select_4d_landmark_head(
        {"HEADS": [["rvip", 2, "sigmoid"], ["sep", 4, "softmax"]]})
    assert (name, act, labels) == ("rvip", "sigmoid", (1, 2))
    # 3-channel sigmoid head: CC filter must cover label 3 too
    name, act, labels = select_4d_landmark_head(
        {"HEADS": [["sep", 4, "softmax"], ["lm3", 3, "sigmoid"]]})
    assert (name, act, labels) == ("lm3", "sigmoid", (1, 2, 3))
    # all-softmax: first head, argmax labels exclude background
    name, act, labels = select_4d_landmark_head(
        {"HEADS": [["seg", 4, "softmax"]]})
    assert (name, act, labels) == ("seg", "softmax", (1, 2, 3))
