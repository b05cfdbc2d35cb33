"""Post-training int8 quantization: the serving twin must track the float
model (cmrtpu/predict/quantize.py).

The reference has no quantized deployment path (it serves the float keras
graph, ref: src/models/predict_model.py:75-76); these tests pin the PTQ
contract of the TPU-native rebuild: calibrate -> rewrite params -> QUANT_INT8
twin, riding the unchanged npz/export/serving surfaces.
"""

import os

import numpy as np
import pytest

import jax

from cmrtpu.models.hybrids import get_model
from cmrtpu.predict.quantize import (calibrate, quantize_model,
                                     quantize_variables,
                                     calibration_batches_from_studies)
from cmrtpu.train import checkpoint as ckpt
from cmrtpu.train.trainer import Trainer

CFG = {"DIM": [32, 32], "DEPTH": 2, "FILTERS": 8, "MASK_CLASSES": 2,
       "BATCHSIZE": 8, "MIXED_PRECISION": False, "LEARNING_RATE": 1e-3,
       "SEED": 7}


def _trained(cfg, epochs=5):
    rng = np.random.default_rng(0)
    x = rng.random((8, 32, 32, 1)).astype(np.float32)
    y = (rng.random((8, 32, 32, 2)) > 0.95).astype(np.float32)
    trainer = Trainer(cfg)
    trainer.fit([(x, y)], epochs=epochs)
    variables = {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}
    return trainer, variables, x


def test_int8_twin_tracks_float_model():
    trainer, variables, x = _trained(CFG)
    live = np.asarray(trainer.predict(x))

    qcfg, qvars = quantize_model(CFG, variables, [x])
    assert qcfg["QUANT_INT8"] is True
    q = np.asarray(jax.device_get(
        get_model(qcfg).apply(qvars, x, train=False)))

    diff = np.abs(q - live)
    assert diff.max() < 0.05, f"max sigmoid deviation {diff.max()}"
    assert diff.mean() < 0.01

    from flax import traverse_util
    flat = traverse_util.flatten_dict(qvars["params"])
    kq = {k: v for k, v in flat.items() if k[-1] == "kernel_q"}
    # depth-2 UNet: 2 convs per down-block x2 + 2 bottleneck + 2 per
    # up-block x2 = 10 quantized convs
    assert len(kq) == 10
    assert all(v.dtype == np.int8 for v in kq.values())
    # per-output-channel weight scales, per-INPUT-channel activation scales
    # (folded into the kernel offline, see cmrtpu/predict/quantize.py)
    assert all(flat[k[:-1] + ("w_scale",)].shape == (v.shape[-1],)
               for k, v in kq.items())
    assert all(flat[k[:-1] + ("act_scale",)].shape == (v.shape[-2],)
               for k, v in kq.items())
    # the head conv stays float
    assert flat[("head", "kernel")].dtype == np.float32


def test_int8_twin_ws_model():
    """WS kernels quantize from their EFFECTIVE (standardized+gained) kernel;
    the twin then needs no standardization pass at serve time."""
    cfg = dict(CFG, WEIGHT_STANDARDISATION=True, WS_I_UNDERSTAND=True,
               BATCH_NORMALISATION=False)
    trainer, variables, x = _trained(cfg)
    live = np.asarray(trainer.predict(x))
    qcfg, qvars = quantize_model(cfg, variables, [x])
    q = np.asarray(jax.device_get(
        get_model(qcfg).apply(qvars, x, train=False)))
    diff = np.abs(q - live)
    # no BatchNorm re-centering between blocks -> quantization error
    # compounds more than the BN model's; still sub-0.2 on sigmoid outputs
    assert diff.max() < 0.2, f"max sigmoid deviation {diff.max()}"
    assert diff.mean() < 0.03


def test_int8_twin_multihead():
    cfg = dict(CFG, HEADS=[["rvip", 2, "sigmoid"], ["sep", 4, "softmax"]])
    rng = np.random.default_rng(0)
    x = rng.random((8, 32, 32, 1)).astype(np.float32)
    y = np.concatenate(
        [(rng.random((8, 32, 32, 2)) > 0.95).astype(np.float32),
         np.eye(4, dtype=np.float32)[rng.integers(0, 4, (8, 32, 32))]],
        axis=-1)
    trainer = Trainer(cfg)
    trainer.fit([(x, y)], epochs=3)
    variables = {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}
    live = jax.device_get(trainer.predict(x))
    qcfg, qvars = quantize_model(cfg, variables, [x])
    q = jax.device_get(get_model(qcfg).apply(qvars, x, train=False))
    assert set(q) == set(live) == {"rvip", "sep"}
    for head in live:
        diff = np.abs(np.asarray(q[head]) - np.asarray(live[head]))
        assert diff.max() < 0.05, f"{head}: {diff.max()}"


def test_int8_weights_roundtrip_npz_and_export(tmp_path):
    """int8 params survive the npz weights format unchanged, and the
    jax.export artifact of the twin reproduces the live twin exactly."""
    from cmrtpu.predict.export import (export_model, load_exported,
                                       load_exported_weights)

    _, variables, x = _trained(CFG)
    qcfg, qvars = quantize_model(CFG, variables, [x])

    model_dir = str(tmp_path / "model")
    ckpt.save_weights(model_dir, qvars["params"], qvars["batch_stats"])
    params, batch_stats = ckpt.load_weights(model_dir)
    from flax import traverse_util
    flat = traverse_util.flatten_dict(params)
    assert all(v.dtype == np.int8 for k, v in flat.items()
               if k[-1] == "kernel_q")

    live = np.asarray(jax.device_get(get_model(qcfg).apply(
        {"params": params, "batch_stats": batch_stats}, x, train=False)))

    out = str(tmp_path / "exported")
    export_model(qcfg, model_dir, out, batch=8)
    fn, meta = load_exported(out)
    assert meta["config"]["QUANT_INT8"] is True
    eparams, estats = load_exported_weights(out)
    served = np.asarray(fn({"params": eparams, "batch_stats": estats}, x))
    np.testing.assert_allclose(served, live, atol=1e-5)


def test_int8_twin_3d_model():
    """len(DIM)=3 selects the 3D U-Net; QuantConv's rank-3 (DHW) path must
    quantize and track the float model like the 2D one."""
    cfg = dict(CFG, DIM=[8, 32, 32], M_POOL=[2, 2, 2], F_SIZE=[3, 3, 3],
               BATCHSIZE=2, DEPTH=2)
    rng = np.random.default_rng(0)
    x = rng.random((2, 8, 32, 32, 1)).astype(np.float32)
    y = (rng.random((2, 8, 32, 32, 2)) > 0.95).astype(np.float32)
    trainer = Trainer(cfg)
    trainer.fit([(x, y)], epochs=2)
    variables = {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}
    live = np.asarray(trainer.predict(x))
    qcfg, qvars = quantize_model(cfg, variables, [x])
    q = np.asarray(jax.device_get(
        get_model(qcfg).apply(qvars, x, train=False)))
    assert np.abs(q - live).max() < 0.05

    from flax import traverse_util
    kq = [v for k, v in traverse_util.flatten_dict(qvars["params"]).items()
          if k[-1] == "kernel_q"]
    assert kq and all(v.ndim == 5 and v.dtype == np.int8 for v in kq)


def test_double_quantize_refused():
    _, variables, x = _trained(CFG, epochs=1)
    qcfg, qvars = quantize_model(CFG, variables, [x])
    with pytest.raises(ValueError, match="already the int8 twin"):
        quantize_model(qcfg, qvars, [x])


def test_training_the_int8_twin_refused():
    """round/clip quantization has zero gradient — a Trainer on the twin
    config would silently not learn, so it must refuse outright."""
    _, variables, x = _trained(CFG, epochs=1)
    qcfg, _ = quantize_model(CFG, variables, [x])
    with pytest.raises(ValueError, match="serving-only"):
        Trainer(qcfg)


def test_calibrate_reduces_max_across_batches():
    trainer, variables, x = _trained(CFG, epochs=1)
    model = get_model(trainer.config)
    small = calibrate(model, variables, [0.1 * x])
    both = calibrate(model, variables, [0.1 * x, x])
    assert set(small) == set(both)
    # the first block's amax is the raw input's per-channel max-abs: scaling
    # the input up must never DECREASE any calibrated maximum
    assert all(np.all(both[k] >= small[k] - 1e-6) for k in both)
    assert any(np.any(both[k] > small[k] + 1e-6) for k in both)
    with pytest.raises(ValueError):
        calibrate(model, variables, [])


def test_quantize_variables_leaves_non_conv_entries(tmp_path):
    trainer, variables, x = _trained(CFG, epochs=2)
    model = get_model(trainer.config)
    amax = calibrate(model, variables, [x])
    qvars = quantize_variables(model, variables, amax)
    # BatchNorm affines and statistics pass through bit-identically
    from flax import traverse_util
    f = traverse_util.flatten_dict(variables["params"])
    qf = traverse_util.flatten_dict(qvars["params"])
    bn_keys = [k for k in f if "BatchNorm_0" in k]
    assert bn_keys and all(
        np.array_equal(np.asarray(f[k]), np.asarray(qf[k])) for k in bn_keys)
    s = traverse_util.flatten_dict(jax.device_get(variables["batch_stats"]))
    qs = traverse_util.flatten_dict(qvars["batch_stats"])
    assert all(np.array_equal(np.asarray(s[k]), np.asarray(qs[k])) for k in s)


def test_int8_artifact_serves_end_to_end(tmp_path):
    """Deployment chain: trained fold -> calibrate on real studies ->
    int8 jax.export artifact -> ServingEngine serves a study in its
    original geometry (the artifact's embedded QUANT_INT8 config is all
    the engine needs)."""
    from cmrtpu.io import MedicalImage, read_image, write_image
    from cmrtpu.predict.export import export_model
    from cmrtpu.predict.serving import ServingEngine

    cfg = dict(CFG, SPACING=[1.0, 1.0], RESAMPLE=True, SCALER="MinMax",
               MASK_VALUES=[1, 2], BATCHSIZE=4)
    trainer, variables, _ = _trained(cfg, epochs=3)
    model_dir = str(tmp_path / "model")
    ckpt.save_weights(model_dir, variables["params"],
                      variables["batch_stats"])

    rng = np.random.default_rng(5)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    study = str(in_dir / "s.nrrd")
    write_image(MedicalImage(
        array=rng.normal(size=(4, 24, 28)).astype(np.float32),
        spacing=(1.5, 1.5, 8.0), origin=(3.0, -2.0, 10.0)), study)

    artifact = str(tmp_path / "artifact")
    export_model(cfg, model_dir, artifact, batch=4,
                 int8_calib=calibration_batches_from_studies(
                     [study], cfg, batch=4))

    engine = ServingEngine(artifact_dir=artifact)
    assert engine.config["QUANT_INT8"] is True
    out_dir = tmp_path / "out"
    out_dir.mkdir()
    record = engine.process_study(study, str(out_dir))
    out = read_image(str(out_dir / "s_msk_pred.nrrd"))
    assert out.array.shape == (4, 24, 28)
    assert out.spacing == pytest.approx((1.5, 1.5, 8.0))
    assert set(np.unique(out.array)) <= {0, 1, 2}
    assert record["slices"] == 4


def test_quantize_fold_sibling_root_and_int8_ensemble(tmp_path):
    """quantize_fold mirrors folds into a SIBLING experiment root (the
    f[0-9]* layout globs must never mix int8 and float members), and a
    fully-quantized root serves as one vmapped int8 ensemble."""
    import json

    from cmrtpu.io import MedicalImage, write_image
    from cmrtpu.models.hybrids import get_model
    from cmrtpu.predict.ensemble import EnsemblePredictor
    from cmrtpu.predict.quantize import quantize_fold

    rng = np.random.default_rng(0)
    x = rng.random((8, 32, 32, 1)).astype(np.float32)
    y = (rng.random((8, 32, 32, 2)) > 0.95).astype(np.float32)
    exp_root = tmp_path / "exp" / "run" / "ts"
    cfg = dict(CFG, SPACING=[1.0, 1.0], RESAMPLE=True, SCALER="MinMax")
    for k in range(2):
        trainer = Trainer(dict(cfg, SEED=k))
        trainer.fit([(x, y)], epochs=2)
        fold = exp_root / f"f{k}"
        (fold / "config").mkdir(parents=True)
        with open(fold / "config" / "config.json", "w") as fh:
            json.dump(dict(cfg, FOLD=k), fh)
        ckpt.save_weights(str(fold / "model"), trainer.state.params,
                          trainer.state.batch_stats)

    study = str(tmp_path / "calib.nrrd")
    write_image(MedicalImage(
        array=rng.normal(size=(3, 24, 28)).astype(np.float32),
        spacing=(1.5, 1.5, 8.0), origin=(0.0, 0.0, 0.0)), study)

    twins = [quantize_fold(str(exp_root / f"f{k}"), [study])
             for k in range(2)]
    q_root = str(tmp_path / "exp" / "run" / "ts_int8")
    assert twins == [os.path.join(q_root, "f0"), os.path.join(q_root, "f1")]

    ens = EnsemblePredictor.from_exp_root(q_root)
    assert ens.n_members == 2
    assert ens.config["QUANT_INT8"] is True
    probs = ens.predict(x)
    # the vmapped mean equals the mean of the individual int8 twins
    singles = []
    for twin in twins:
        with open(os.path.join(twin, "config", "config.json")) as fh:
            qcfg = json.load(fh)
        params, stats = ckpt.load_weights(os.path.join(twin, "model"))
        singles.append(np.asarray(jax.device_get(get_model(qcfg).apply(
            {"params": params, "batch_stats": stats}, x, train=False))))
    # vmapped conv batching reorders the f32 epilogue accumulation slightly
    np.testing.assert_allclose(probs, np.mean(singles, axis=0), atol=5e-3)


def test_calibration_batches_from_studies(tmp_path):
    from cmrtpu.io import MedicalImage, write_image

    rng = np.random.default_rng(3)
    paths = []
    for i in range(2):
        vol = rng.random((3, 40, 40)).astype(np.float32) * 500
        img = MedicalImage(array=vol, spacing=(1.2, 1.2, 8.0),
                           origin=(0.0, 0.0, 0.0))
        p = str(tmp_path / f"study{i}.nrrd")
        write_image(img, p)
        paths.append(p)
    cfg = dict(CFG, BATCHSIZE=4)
    batches = list(calibration_batches_from_studies(paths, cfg, batch=4))
    # 6 slices in 4-row batches -> 2 batches, the last padded by repetition
    assert len(batches) == 2
    assert all(b.shape == (4, 32, 32, 1) and b.dtype == np.float32
               for b in batches)


def test_calibration_rejects_3d_configs_eagerly():
    # study-based calibration is slice-based (the serving-engine contract);
    # a 3D/cine config must fail AT CALL TIME with a clear message, not with
    # a pad/crop rank assertion at first iteration
    cfg = dict(CFG, DIM=[4, 32, 32], F_SIZE=[3, 3, 3], M_POOL=[1, 2, 2])
    with pytest.raises(ValueError, match="2D config"):
        calibration_batches_from_studies(["unused.nrrd"], cfg)


def test_calib_worklist_excludes_label_families(tmp_path):
    # the export CLI's --calib discovery must never feed ground-truth /
    # prediction masks into activation calibration
    from cmrtpu.predict.serving import (DEFAULT_PATTERNS, LABEL_SUFFIXES,
                                        _worklist)
    names = ["p1__t0_z0_img.nrrd", "p1__t0_z0_msk.nrrd", "p1_ED_pred.nrrd",
             "p1_ED_seg.nrrd", "p1_rvip.nrrd", "p1_ED_cmr.nrrd",
             "study.nii.gz"]
    for n in names:
        (tmp_path / n).write_bytes(b"x")
    got = _worklist(str(tmp_path), DEFAULT_PATTERNS, exclude=LABEL_SUFFIXES)
    assert sorted(os.path.basename(p) for p in got) == [
        "p1_ED_cmr.nrrd", "p1__t0_z0_img.nrrd", "study.nii.gz"]


def test_int8_twin_of_group_norm_model():
    """PTQ composes with GROUP_NORM: the GroupNorm epilogue stays float,
    convs quantize as usual, and quantize_model auto-runs the GroupNorm
    affine recalibration (gn_recalibrate — per-channel least-squares refit
    against the float model on the calibration set).

    Why GN needs it: unlike BatchNorm — whose inference statistics are
    FROZEN, passing conv quantization error through linearly — GroupNorm
    recomputes statistics from the (quantized) activations, so the error
    perturbs the normalization itself and compounds through depth. The
    sigmoid-space gate here is looser than BN's (<0.35 vs <0.05 on this
    tiny random fixture), but the deployment-level verdict is measured at
    the mm level on the converged 300-epoch GN CV: float 0.323/0.400 vs
    int8 0.328/0.397 mm, TPR/PPV 1.0 — quality-neutral (tools/int8_ab.py,
    RESULTS.md round 5)."""
    cfg = dict(CFG, GROUP_NORM=4)
    trainer, variables, x = _trained(cfg)
    live = np.asarray(trainer.predict(x))
    qcfg, qvars = quantize_model(cfg, variables, [x])
    q = np.asarray(jax.device_get(
        get_model(qcfg).apply(qvars, x, train=False)))
    diff = np.abs(q - live)
    assert np.isfinite(q).all()
    assert diff.max() < 0.35, f"max sigmoid deviation {diff.max()}"
    from flax import traverse_util
    flat = traverse_util.flatten_dict(qvars["params"])
    assert any("GroupNorm_0" in k for k in flat)  # float epilogue kept
    assert any(k[-1] == "kernel_q" for k in flat)


def test_factorized_model_ptq_raises_clearly():
    """int8 PTQ of a (2+1)D factorized checkpoint is unsupported: the calib
    model would build unfactorized convs and die on a confusing kernel-shape
    mismatch (advisor r4-medium). quantize_model must refuse up front."""
    for extra in ({"MODEL_VARIANT": "unet_2p1d"}, {"FACTORIZED_3D": True}):
        cfg = dict(CFG, DIM=[4, 32, 32], F_SIZE=[3, 3, 3], M_POOL=[1, 2, 2],
                   **extra)
        with pytest.raises(ValueError, match="does not support factorized"):
            quantize_model(cfg, {"params": {}, "batch_stats": {}},
                           [np.zeros((1, 4, 32, 32, 1), np.float32)])


def test_scalar_act_scale_twin_migrates_on_load(tmp_path):
    """Pre-r4 int8 twins stored a per-tensor (scalar) act_scale; load_weights
    must broadcast it to the per-input-channel vector the current QuantConv
    declares (advisor r4-low)."""
    from flax import traverse_util
    trainer, variables, x = _trained(CFG, epochs=2)
    qcfg, qvars = quantize_model(CFG, variables, [x])
    flat = traverse_util.flatten_dict(qvars["params"])
    legacy = {k: (np.float32(v.max()) if k[-1] == "act_scale" else v)
              for k, v in flat.items()}
    ckpt.save_weights(str(tmp_path), traverse_util.unflatten_dict(legacy),
                      qvars["batch_stats"])
    params, _ = ckpt.load_weights(str(tmp_path))
    out = traverse_util.flatten_dict(params)
    for k, v in out.items():
        if k[-1] == "act_scale":
            assert v.shape == (out[k[:-1] + ("kernel_q",)].shape[-2],)
    # and the migrated tree actually applies
    y = get_model(qcfg).apply({"params": params,
                               "batch_stats": qvars["batch_stats"]},
                              x, train=False)
    assert np.isfinite(np.asarray(y)).all()


def test_int8_twin_composes_with_coords_tta(tmp_path):
    """Serving composition: the int8 twin + identity-anchored coords TTA
    through the real Predictor (deployment stacks compose knobs)."""
    from cmrtpu.predict.predictor import Predictor
    from cmrtpu.train.checkpoint import save_weights

    trainer, variables, x = _trained(CFG, epochs=2)
    qcfg, qvars = quantize_model(CFG, variables, [x])
    save_weights(str(tmp_path), qvars["params"], qvars["batch_stats"])
    pred = Predictor(dict(qcfg, TTA=True, TTA_MODE="coords"),
                     model_path=str(tmp_path))
    out = pred.predict(x)
    assert out.shape == (8, 32, 32, 2)
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0
