"""Full-stack integration: dataset build -> train_fold -> pred_fold ->
evaluate_cv -> df_eval.csv (the reference's user flow, SURVEY.md §3)."""

import glob
import os

import numpy as np
import pandas as pd
import pytest

from cmrtpu.data import dataset as D
from cmrtpu.io import MedicalImage, read_image, write_image


@pytest.fixture(scope="module")
def synthetic_root(tmp_path_factory):
    """ACDC-like tree + rvip masks + 2D slices + df_kfold.csv."""
    rng = np.random.default_rng(3)
    root = tmp_path_factory.mktemp("dataset")
    orig = root / "original"
    two_d = root / "2D"
    pathologies = ["DCM", "NOR"]
    for i in range(1, 7):
        p = orig / f"patient{i:03d}"
        p.mkdir(parents=True)
        ed, es = 1, 12
        (p / "Info.cfg").write_text(
            f"ED: {ed}\nES: {es}\nGroup: {pathologies[i % 2]}\n")
        for frame in (ed, es):
            vol = rng.normal(300, 60, size=(4, 36, 34)).astype(np.float32)
            rvip = np.zeros((4, 36, 34), np.uint8)
            for z in range(4):
                cy, cx = 10 + i % 3, 8 + i % 4
                vol[z, cy - 2:cy + 3, cx - 2:cx + 3] += 400  # ant landmark signal
                vol[z, cy + 10:cy + 13, cx:cx + 3] += 400    # inf landmark signal
                rvip[z, cy:cy + 2, cx:cx + 2] = 1
                rvip[z, cy + 10:cy + 12, cx:cx + 2] = 2
            write_image(MedicalImage(array=vol, spacing=(1.4, 1.4, 8.0)),
                        str(p / f"patient{i:03d}_frame{frame:02d}.nii.gz"))
            # ventricle gt (LV/MYO/RV) for the orig-mask eval branch
            gt = np.zeros((4, 36, 34), np.uint8)
            yy, xx = np.mgrid[0:36, 0:34]
            ring = np.hypot(yy - 18, xx - 22)
            gt[:, :, :][:, ring < 7] = 2
            gt[:, :, :][:, ring < 3] = 3
            gt[:, (np.hypot(yy - 18, xx - 10) < 6) & (ring >= 7)] = 1
            write_image(MedicalImage(array=gt, spacing=(1.4, 1.4, 8.0)),
                        str(p / f"patient{i:03d}_frame{frame:02d}_gt.nii.gz"))
            # slice img + rvip mask into 2D training files
            img_f = str(p / f"patient{i:03d}_frame{frame:02d}.nii.gz")
            rvip_f = str(root / f"patient{i:03d}_frame{frame:02d}_rvip.nrrd")
            write_image(MedicalImage(array=rvip, spacing=(1.4, 1.4, 8.0)), rvip_f)
            D.create_2d_slices_from_3d_volume_files(img_f, rvip_f, str(two_d))

    df = D.get_kfolded_data(kfolds=2, path_to_data=str(two_d))
    df.to_csv(str(root / "df_kfold.csv"), index=False)
    return str(root)


CFG = {"EXPERIMENT": "e2e", "DIM": [32, 32], "SPACING": [1.4, 1.4],
       "DEPTH": 2, "FILTERS": 4, "MASK_VALUES": [1, 2], "MASK_CLASSES": 2,
       "BATCHSIZE": 4, "EPOCHS": 2, "RESAMPLE": True, "SHUFFLE": True,
       "MIXED_PRECISION": False, "LEARNING_RATE": 1e-3, "SEED": 42,
       "AUGMENT": False, "FOLDS": [0], "CC_FILTER": True,
       "SAVE_LEARNING_PROGRESS_AS_PNG": False}


@pytest.fixture(scope="module")
def trained_exp(synthetic_root, tmp_path_factory):
    from cmrtpu.train.fold import train_fold

    exp_root = str(tmp_path_factory.mktemp("exp") / "run")
    cfg = dict(CFG)
    cfg["EXP_PATH"] = exp_root
    cfg["DATA_PATH_SAX"] = os.path.join(synthetic_root, "2D")
    cfg["DF_FOLDS"] = os.path.join(synthetic_root, "df_kfold.csv")
    cfg["DATA_PATH_ORIG"] = os.path.join(synthetic_root, "original")
    cfg["FOLD"] = 0
    train_fold(cfg, in_memory=True)
    return exp_root


def test_artifact_layout(trained_exp):
    fold_dir = os.path.join(trained_exp, "f0")
    assert os.path.isfile(os.path.join(fold_dir, "config", "config.json"))
    assert os.path.isfile(os.path.join(fold_dir, "model", "model.npz"))
    assert os.path.isfile(os.path.join(fold_dir, "model_summary.txt"))
    assert glob.glob(os.path.join(fold_dir, "tensorboard_logs",
                                  "events.out.tfevents.*"))
    assert os.path.isfile(os.path.join(fold_dir, "history.csv"))


def test_predictions_written_in_orig_geometry(trained_exp, synthetic_root):
    preds = sorted(glob.glob(os.path.join(trained_exp, "f0", "pred", "*_msk.nrrd")))
    gts = sorted(glob.glob(os.path.join(trained_exp, "f0", "gt", "*_msk.nrrd")))
    cmrs = sorted(glob.glob(os.path.join(trained_exp, "f0", "pred", "*_cmr.nrrd")))
    assert preds and len(preds) == len(gts) == len(cmrs)
    # ED + ES per test patient
    names = [os.path.basename(p) for p in preds]
    assert any("_ED_msk" in n for n in names) and any("_ES_msk" in n for n in names)
    img = read_image(preds[0])
    # geometry restored to the original volume's
    assert img.array.shape == (4, 36, 34)
    np.testing.assert_allclose(img.spacing, (1.4, 1.4, 8.0), rtol=1e-5)
    # gt roundtrip through the pipeline keeps the label set
    gt = read_image(gts[0])
    assert set(np.unique(gt.array)) <= {0, 1, 2}
    assert (gt.array == 1).sum() > 0 and (gt.array == 2).sum() > 0


def test_evaluate_cv_produces_df_eval(trained_exp, synthetic_root):
    from cmrtpu.eval.evaluate import evaluate_cv

    df = evaluate_cv(trained_exp, synthetic_root)
    assert os.path.isfile(os.path.join(trained_exp, "df_eval.csv"))
    # one row per test patient x phase
    assert len(df) > 0 and len(df) % 2 == 0
    for col in ("patient", "phase", "inplane_spacing", "ips_pred", "ips_gt",
                "mips_pred", "mangle_gt", "mdiffs_gtpred", "mdists_ant_gtpred",
                "mdists_inf_gtpred", "dists_ant_gtpred", "diffs_gtpred",
                "tpr_ant", "tpr_inf", "ppv_ant", "ppv_inf",
                "tpr_ant_point", "ppv_inf_point", "tpr_ant_point_th15",
                "ppv_inf_point_th15", "ips_pred_single_also",
                "mdists_ant_gtpred_single_also",
                "mdists_ant_gtpred_slice_wise",
                "mdists_ant_gtpred_slice_wise_up",
                "mdists_ant_gtpred_slice_wise_single_also_up", "EXP"):
        assert col in df.columns, f"missing column {col}"
    # gt-vs-gt sanity on distances: gt ips exist for every patient
    assert df["ips_gt"].map(lambda x: len(x[0])).min() > 0


def test_cli_evaluate_smoke(trained_exp, synthetic_root, monkeypatch, capsys):
    import sys
    from cmrtpu.cli import evaluate_cv as cli_eval

    monkeypatch.setattr(sys, "argv", ["evaluate_cv", "-exp", trained_exp,
                                      "-data", synthetic_root])
    cli_eval.main()
    out = capsys.readouterr().out
    assert "evaluation done" in out


def test_cli_predict_smoke(trained_exp, synthetic_root, monkeypatch):
    """The predict CLI restores from a fold dir and rewrites the outputs."""
    from cmrtpu.cli import predict as cli_predict
    fold_dir = os.path.join(trained_exp, "f0")
    before = {f: os.path.getmtime(f)
              for f in glob.glob(os.path.join(fold_dir, "pred", "*msk.nrrd"))}
    assert before
    monkeypatch.setattr("sys.argv", ["predict", "-exp", fold_dir,
                                     "-data", synthetic_root])
    cli_predict.main()
    after = {f: os.path.getmtime(f)
             for f in glob.glob(os.path.join(fold_dir, "pred", "*msk.nrrd"))}
    assert after.keys() == before.keys()
    assert any(after[f] > before[f] for f in after)


def test_cli_make_dataset_smoke(synthetic_root, tmp_path, monkeypatch):
    """The dataset CLI slices the original tree against the rvip masks and
    writes the k-fold dataframe when no download is available."""
    import shutil
    from cmrtpu.cli import make_dataset as cli_md
    root = str(tmp_path / "ds")
    os.makedirs(root)
    shutil.copytree(os.path.join(synthetic_root, "original"),
                    os.path.join(root, "original"))
    io_dir = os.path.join(root, "io")
    os.makedirs(io_dir)
    for f in glob.glob(os.path.join(synthetic_root, "*_rvip.nrrd")):
        shutil.copy(f, io_dir)
    monkeypatch.setattr("sys.argv", ["make_dataset", "-data_root", root,
                                     "-acdc_data",
                                     os.path.join(root, "original")])
    cli_md.cli()
    slices = glob.glob(os.path.join(root, "2D", "*img.nrrd"))
    assert len(slices) == 6 * 2 * 4  # patients x phases x z
    df = pd.read_csv(os.path.join(root, "df_kfold.csv"))
    assert {"x_path", "y_path", "fold", "modality", "patient"} <= set(df.columns)


def test_cli_train_smoke(synthetic_root, tmp_path, monkeypatch):
    """The train CLI end-to-end: config json -> run_experiment -> artifacts."""
    import json
    from cmrtpu.cli import train as cli_train
    cfg = dict(CFG, EPOCHS=1, EXPERIMENT="clitrain",
               EXPERIMENTS_ROOT=str(tmp_path / "exp") + "/")
    cfg.pop("EXP_PATH", None)
    cfg_path = str(tmp_path / "cfg.json")
    json.dump(cfg, open(cfg_path, "w"))
    monkeypatch.setattr("sys.argv", ["train", "-cfg", cfg_path,
                                     "-data", synthetic_root])
    cli_train.main()
    runs = glob.glob(str(tmp_path / "exp" / "clitrain" / "*" / "f0"))
    assert runs
    assert os.path.isfile(os.path.join(runs[0], "config", "config.json"))
    assert os.path.isfile(os.path.join(runs[0], "model_summary.txt"))


def test_predict_4d_on_2d_cv(trained_exp, synthetic_root):
    """4D inference driver (ref: src/models/predict_4d_on_seg.py:23-113):
    the trained 2D fold predicts a full 4D cine, per-t CC-filtered, and
    writes one 4D nrrd per test patient file."""
    from cmrtpu.predict.predictor import predict_4d_on_2d_cv

    df = pd.read_csv(os.path.join(synthetic_root, "df_kfold.csv"))
    patient = sorted(df[(df["fold"] == 0) &
                        (df["modality"] == "test")]["patient"].unique())[0]
    rng = np.random.default_rng(11)
    vol4d = rng.normal(300, 60, size=(2, 4, 36, 34)).astype(np.float32)
    vol4d[:, :, 9:12, 7:10] += 400
    vol4d[:, :, 19:22, 8:11] += 400
    f4d = os.path.join(synthetic_root, "original", patient,
                       f"{patient}_4d.nii.gz")
    write_image(MedicalImage(array=vol4d, spacing=(1.4, 1.4, 8.0, 1.0)), f4d)

    predict_4d_on_2d_cv(trained_exp, synthetic_root)
    out = glob.glob(os.path.join(trained_exp, "f0", "pred_4d", "*_pred.nrrd"))
    assert len(out) == 1 and patient in out[0]
    pred = read_image(out[0])
    # [t, z, DIM] in the preprocessed grid, flat labels from the 2ch head
    assert pred.array.shape == (2, 4, 32, 32)
    assert set(np.unique(pred.array).astype(int)) <= {0, 1, 2}


def test_train_fold_resume(synthetic_root, tmp_path_factory):
    """RESUME: a second train_fold on the same run restores the fold's full
    train state (params + optimizer + step) and CONTINUES the epoch count —
    the capability the reference lacks (initial_epoch=0 hard-coded,
    ref: src/models/train_model.py:101). history.csv ends up contiguous
    over all epochs with the pre-crash rows preserved."""
    from cmrtpu.train.fold import train_fold

    exp_root = str(tmp_path_factory.mktemp("resume") / "run")
    cfg = dict(CFG, EPOCHS=2, CC_FILTER=False)
    cfg["EXP_PATH"] = exp_root
    cfg["DATA_PATH_SAX"] = os.path.join(synthetic_root, "2D")
    cfg["DF_FOLDS"] = os.path.join(synthetic_root, "df_kfold.csv")
    cfg["DATA_PATH_ORIG"] = os.path.join(synthetic_root, "original")
    cfg["FOLD"] = 0
    t1 = train_fold(cfg, in_memory=True)
    step1 = int(t1.state.step)
    hist1 = pd.read_csv(os.path.join(exp_root, "f0", "history.csv"))
    assert len(hist1) == 2

    t2 = train_fold(dict(cfg, EPOCHS=4, RESUME=True), in_memory=True)
    assert int(t2.state.step) > step1
    hist2 = pd.read_csv(os.path.join(exp_root, "f0", "history.csv"))
    assert hist2["epoch"].tolist() == list(range(4))
    assert np.isfinite(hist2["loss"]).all()


def test_train_fold_resume_skips_completed_fold(synthetic_root,
                                                tmp_path_factory):
    """A resumed CV must only retrain the fold that crashed: a fold whose
    completion marker exists (and whose epoch target is not being raised)
    is skipped, leaving its checkpoint/history/predictions untouched."""
    from cmrtpu.train.fold import train_fold

    exp_root = str(tmp_path_factory.mktemp("resume_skip") / "run")
    cfg = dict(CFG, EPOCHS=2, CC_FILTER=False)
    cfg["EXP_PATH"] = exp_root
    cfg["DATA_PATH_SAX"] = os.path.join(synthetic_root, "2D")
    cfg["DF_FOLDS"] = os.path.join(synthetic_root, "df_kfold.csv")
    cfg["DATA_PATH_ORIG"] = os.path.join(synthetic_root, "original")
    cfg["FOLD"] = 0
    assert train_fold(cfg, in_memory=True) is not None
    marker = os.path.join(exp_root, "f0", "fold_complete.json")
    assert os.path.isfile(marker)
    hist_before = pd.read_csv(os.path.join(exp_root, "f0", "history.csv"))

    # same epoch target -> the fold is complete, resume must skip it
    assert train_fold(dict(cfg, RESUME=True), in_memory=True) is None
    hist_after = pd.read_csv(os.path.join(exp_root, "f0", "history.csv"))
    pd.testing.assert_frame_equal(hist_before, hist_after)

    # a RAISED epoch target is the explicit train-longer request: re-enter
    assert train_fold(dict(cfg, RESUME=True, EPOCHS=3),
                      in_memory=True) is not None
    hist_ext = pd.read_csv(os.path.join(exp_root, "f0", "history.csv"))
    assert hist_ext["epoch"].tolist() == [0, 1, 2]


def test_train_fold_resume_without_checkpoint_starts_fresh(
        synthetic_root, tmp_path_factory):
    """RESUME on a run with no restorable state warns and trains from
    scratch instead of crashing."""
    from cmrtpu.train.fold import train_fold

    exp_root = str(tmp_path_factory.mktemp("resume_fresh") / "run")
    cfg = dict(CFG, EPOCHS=1, RESUME=True, CC_FILTER=False)
    cfg["EXP_PATH"] = exp_root
    cfg["DATA_PATH_SAX"] = os.path.join(synthetic_root, "2D")
    cfg["DF_FOLDS"] = os.path.join(synthetic_root, "df_kfold.csv")
    cfg["DATA_PATH_ORIG"] = os.path.join(synthetic_root, "original")
    cfg["FOLD"] = 0
    t = train_fold(cfg, in_memory=True)
    hist = pd.read_csv(os.path.join(exp_root, "f0", "history.csv"))
    assert len(hist) == 1 and np.isfinite(hist["loss"]).all()


def test_run_experiment_resume_reenters_prior_run(tmp_path, monkeypatch):
    """RESUME without an explicit run dir must re-enter the experiment's
    latest timestamped run (where the checkpoints live) instead of stamping
    a fresh dir and silently retraining every fold from scratch."""
    import cmrtpu.train.fold as F

    exp_root = tmp_path / "exp" / "e2e"
    old = exp_root / "2026-01-01_00_00"
    new = exp_root / "2026-01-02_00_00"
    for d in (old, new):
        d.mkdir(parents=True)
    seen = []
    monkeypatch.setattr(F, "train_fold",
                        lambda cfg, in_memory=True: seen.append(cfg["EXP_PATH"]))

    cfg = dict(CFG, RESUME=True, EXPERIMENTS_ROOT=str(tmp_path / "exp") + "/")
    got = F.run_experiment(cfg)
    assert got == str(new)
    assert seen == [str(new)]

    # a config that carries its own existing EXP_PATH wins over "latest"
    seen.clear()
    got = F.run_experiment(dict(cfg, EXP_PATH=str(old)))
    assert got == str(old) and seen == [str(old)]

    # no prior run at all: falls back to a fresh timestamped dir
    seen.clear()
    fresh = F.run_experiment(dict(cfg, EXPERIMENT="never-ran"))
    assert "never-ran" in fresh and seen == [fresh]

    # a config copied from ANOTHER experiment carries a foreign EXP_PATH:
    # it must be ignored (else fold B trains into experiment A's run dir)
    foreign = tmp_path / "exp" / "other-exp" / "2026-01-03_00_00"
    foreign.mkdir(parents=True)
    seen.clear()
    got = F.run_experiment(dict(cfg, EXP_PATH=str(foreign)))
    assert got == str(new) and seen == [str(new)]


def test_steps_per_epoch_matches_each_loop():
    """The resume epoch derivation must mirror the actual loop's step count:
    floor(n/B) replicated/streamed, wrap-padded local math sharded, and the
    STREAM_ECHO multiplier on the streamed path."""
    import jax

    from cmrtpu.parallel.mesh import create_mesh
    from cmrtpu.train.fold import _steps_per_epoch

    mesh = create_mesh(devices=jax.devices()[:8])

    class _Gen:
        def __init__(self, n):
            self._cache_x = np.zeros((n, 4, 4), np.float32)
            self._cache_y = np.zeros((n, 4, 4), np.float32)

        def __len__(self):
            return self._cache_x.shape[0] // 16

    # replicated cache: floor(60/16) = 3
    assert _steps_per_epoch({"BATCHSIZE": 16}, _Gen(60), mesh) == 3
    # sharded cache: ceil(60/8)=8 local rows // (16/8)=2 -> 4 steps (the
    # wrap-padding makes this MORE than floor(n/B) — the judge-review bug)
    assert _steps_per_epoch({"BATCHSIZE": 16, "CACHE_SHARDED": True},
                            _Gen(60), mesh) == 4
    # streamed (cache too big for the budget): len(gen) * STREAM_ECHO
    streamed = {"BATCHSIZE": 16, "DEVICE_CACHE_LIMIT_GB": 1e-9,
                "STREAM_ECHO": 3}
    assert _steps_per_epoch(streamed, _Gen(60), mesh) == 9


def test_pred_fold_partial_orig_coverage(trained_exp, synthetic_root,
                                         tmp_path):
    """A DATA_PATH_ORIG that covers only SOME test patients must not abort
    the fold (the positional [0] used to IndexError mid-write): covered
    patients restore original geometry, the rest fall back to the model
    grid with the config-spacing header."""
    import json
    import shutil

    from cmrtpu import config as C
    from cmrtpu.predict.predictor import pred_fold

    cfg = json.load(open(os.path.join(trained_exp, "f0", "config",
                                      "config.json")))
    test_patients = sorted(
        pd.read_csv(cfg["DF_FOLDS"]).query("fold == 0 and modality == 'test'")
        ["patient"].unique())
    assert len(test_patients) >= 2
    covered, uncovered = test_patients[0], test_patients[1]

    partial = tmp_path / "orig_partial"
    partial.mkdir()
    shutil.copytree(os.path.join(synthetic_root, "original", covered),
                    str(partial / covered))
    out = tmp_path / "fold_out"
    cfg = dict(cfg, EXP_PATH=str(out), DATA_PATH_ORIG=str(partial))
    assert pred_fold(cfg)

    cov = read_image(glob.glob(os.path.join(
        str(out), "pred", f"{covered}_ED_msk.nrrd"))[0])
    unc = read_image(glob.glob(os.path.join(
        str(out), "pred", f"{uncovered}_ED_msk.nrrd"))[0])
    assert cov.array.shape == (4, 36, 34)          # original geometry
    np.testing.assert_allclose(cov.spacing, (1.4, 1.4, 8.0), rtol=1e-5)
    assert unc.array.shape[1:] == (32, 32)         # model grid fallback
    np.testing.assert_allclose(unc.spacing, (1.4, 1.4, 10.0), rtol=1e-5)


def test_predict_override_twin_cc3d(trained_exp, synthetic_root):
    """predict_override_twin re-serves every fold with inference-only
    overrides into a sibling root (the generic TTA/int8 twin pattern):
    same checkpoints, twin config carries the override, outputs appear in
    the same layout — the substrate of tools/predict_ab.py."""
    import json

    from cmrtpu.predict.predictor import predict_override_twin

    t_root = predict_override_twin(trained_exp, {"CC_FILTER": "3d"}, "cc3d")
    assert t_root == trained_exp.rstrip("/") + "_cc3d"
    cfg = json.load(open(os.path.join(t_root, "f0", "config", "config.json")))
    assert cfg["CC_FILTER"] == "3d"
    assert cfg["MODEL_PATH"] == os.path.join(trained_exp, "f0", "model")
    preds = sorted(glob.glob(os.path.join(t_root, "f0", "pred", "*_msk.nrrd")))
    plain = sorted(glob.glob(os.path.join(trained_exp, "f0", "pred",
                                          "*_msk.nrrd")))
    assert len(preds) == len(plain) > 0
    out = read_image(preds[0])
    assert set(np.unique(out.array)) <= {0, 1, 2}
