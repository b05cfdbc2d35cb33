"""4D inference on a single-head THREE-channel sigmoid model: the driver
must derive the CC-filter label set {1, 2, 3} from the head's output
channels (ref: src/models/predict_4d_on_seg.py:23-113 hardcodes the
two-channel RVIP contract; the rebuild generalises the label derivation —
see predictor.select_4d_landmark_head and predict_4d_on_2d_cv)."""

import glob
import os

import numpy as np
import pytest

from cmrtpu.data import dataset as D
from cmrtpu.io import MedicalImage, read_image, write_image


@pytest.fixture(scope="module")
def root3(tmp_path_factory):
    """ACDC-like tree whose slice masks carry THREE landmark labels."""
    rng = np.random.default_rng(11)
    root = tmp_path_factory.mktemp("ds3ch")
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
            msk = np.zeros((3, 36, 34), np.uint8)
            for z in range(3):
                cy, cx = 9 + i % 3, 7 + i % 3
                vol[z, cy - 1:cy + 2, cx - 1:cx + 2] += 400
                vol[z, cy + 9:cy + 11, cx:cx + 2] += 400
                vol[z, cy:cy + 2, cx + 14:cx + 16] += 400
                msk[z, cy:cy + 2, cx:cx + 2] = 1
                msk[z, cy + 9:cy + 11, cx:cx + 2] = 2
                msk[z, cy:cy + 2, cx + 14:cx + 16] = 3
            spacing = (1.4, 1.4, 8.0)
            img_f = str(p / f"patient{i:03d}_frame{frame:02d}.nii.gz")
            write_image(MedicalImage(array=vol, spacing=spacing), img_f)
            msk_f = str(root / f"patient{i:03d}_frame{frame:02d}_lm3.nrrd")
            write_image(MedicalImage(array=msk, spacing=spacing), msk_f)
            D.create_2d_slices_from_3d_volume_files(img_f, msk_f, str(two_d))
    df = D.get_kfolded_data(kfolds=2, path_to_data=str(two_d))
    df.to_csv(str(root / "df_kfold.csv"), index=False)
    return str(root)


CFG = {"EXPERIMENT": "lm3", "DIM": [32, 32], "SPACING": [1.4, 1.4],
       "DEPTH": 2, "FILTERS": 4, "MASK_VALUES": [1, 2, 3],
       "MASK_CLASSES": 3, "BATCHSIZE": 4, "EPOCHS": 2, "RESAMPLE": True,
       "SHUFFLE": True, "MIXED_PRECISION": False, "LEARNING_RATE": 1e-3,
       "SEED": 42, "AUGMENT": False, "FOLDS": [0], "CC_FILTER": True,
       "SAVE_LEARNING_PROGRESS_AS_PNG": False}


@pytest.fixture(scope="module")
def trained3(root3, tmp_path_factory):
    from cmrtpu.train.fold import train_fold

    exp_root = str(tmp_path_factory.mktemp("exp3") / "run")
    cfg = dict(CFG, EXP_PATH=exp_root, FOLD=0,
               DATA_PATH_SAX=os.path.join(root3, "2D"),
               DF_FOLDS=os.path.join(root3, "df_kfold.csv"),
               DATA_PATH_ORIG=os.path.join(root3, "original"))
    train_fold(cfg, in_memory=True)
    return exp_root


def test_3ch_predictions_carry_three_labels(trained3):
    """pred_fold on the 3-channel head writes masks whose labels are drawn
    from {0, 1, 2, 3} — the third channel thresholds to label 3."""
    preds = sorted(glob.glob(os.path.join(trained3, "f0", "pred",
                                          "*_msk.nrrd")))
    assert preds
    labels = set()
    for f in preds:
        labels |= set(np.unique(read_image(f).array).astype(int))
    assert labels <= {0, 1, 2, 3}


def test_predict_4d_on_2d_cv_three_channel(trained3, root3):
    """The 4D driver on the single-head 3-channel model: cc_labels must be
    derived as (1, 2, 3) from the output channels (an assumed 2-channel
    contract would CC-filter label 3 away or crash), and the 4D nrrd's
    labels stay within {0..3}."""
    import pandas as pd

    from cmrtpu.predict.predictor import predict_4d_on_2d_cv

    df = pd.read_csv(os.path.join(root3, "df_kfold.csv"))
    patient = sorted(df[(df["fold"] == 0) &
                        (df["modality"] == "test")]["patient"].unique())[0]
    rng = np.random.default_rng(5)
    vol4d = rng.normal(300, 60, size=(2, 3, 36, 34)).astype(np.float32)
    vol4d[:, :, 9:11, 7:9] += 400
    vol4d[:, :, 18:20, 7:9] += 400
    vol4d[:, :, 9:11, 21:23] += 400
    f4d = os.path.join(root3, "original", patient, f"{patient}_4d.nii.gz")
    write_image(MedicalImage(array=vol4d, spacing=(1.4, 1.4, 8.0, 1.0)), f4d)

    predict_4d_on_2d_cv(trained3, root3)
    out = glob.glob(os.path.join(trained3, "f0", "pred_4d", "*_pred.nrrd"))
    assert len(out) == 1 and patient in out[0]
    pred = read_image(out[0])
    assert pred.array.shape == (2, 3, 32, 32)
    assert set(np.unique(pred.array).astype(int)) <= {0, 1, 2, 3}
