"""On-device detection strategies, ensemble inference, multi-head training,
and cine (2D+t) volume-batched training (BASELINE configs 3-5)."""

import numpy as np
import pytest

from cmrtpu.eval.detection import detect, peaks_argmax, peaks_com


def _gaussian_heatmap(h, w, cy, cx, sigma=3.0):
    ys, xs = np.mgrid[0:h, 0:w]
    return np.exp(-((ys - cy) ** 2 + (xs - cx) ** 2) / (2 * sigma ** 2))


def test_peaks_argmax_and_com_agree_on_symmetric_blob():
    hm = np.zeros((2, 64, 64, 2), np.float32)
    hm[0, :, :, 0] = _gaussian_heatmap(64, 64, 20, 30)
    hm[0, :, :, 1] = _gaussian_heatmap(64, 64, 40, 10)
    hm[1, :, :, 0] = _gaussian_heatmap(64, 64, 5, 60)
    # channel (1, 1) left empty -> invalid
    ca, va = peaks_argmax(hm, threshold=0.5)
    cc, vc = peaks_com(hm, threshold=0.5)
    np.testing.assert_allclose(np.asarray(ca)[0, 0], [20, 30], atol=0.5)
    np.testing.assert_allclose(np.asarray(cc)[0, 0], [20, 30], atol=0.5)
    np.testing.assert_allclose(np.asarray(ca)[0, 1], [40, 10], atol=0.5)
    assert not bool(np.asarray(va)[1, 1]) and not bool(np.asarray(vc)[1, 1])
    assert np.isnan(np.asarray(ca)[1, 1]).all()


def test_detect_dispatch():
    hm = np.zeros((1, 16, 16, 1), np.float32)
    hm[0, 8, 8, 0] = 1.0
    for strategy in ("com", "argmax"):
        coords, valid = detect(hm, strategy=strategy)
        np.testing.assert_allclose(np.asarray(coords)[0, 0], [8, 8])
    with pytest.raises(ValueError):
        detect(hm, strategy="bogus")


def test_com_matches_host_reference():
    """CoM strategy must agree with the host get_mean_rvip_2d (ref parity)."""
    from cmrtpu.eval.landmarks import get_mean_rvip_2d
    msk = np.zeros((32, 32), np.uint8)
    msk[4:9, 10:13] = 1   # anterior blob
    msk[20:24, 5:11] = 2  # inferior blob
    host = get_mean_rvip_2d(msk)
    chans = np.stack([msk == 1, msk == 2], -1).astype(np.float32)[None]
    coords, valid = peaks_com(chans, threshold=0.5)
    np.testing.assert_allclose(np.asarray(coords)[0, 0], host[0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(coords)[0, 1], host[1], atol=1e-5)


def test_ensemble_predictor(tmp_path):
    from cmrtpu.predict.ensemble import EnsemblePredictor
    from cmrtpu.train.checkpoint import save_weights
    from cmrtpu.train.trainer import Trainer

    config = {"DIM": [16, 16], "DEPTH": 1, "FILTERS": 2, "MASK_CLASSES": 2,
              "BATCHSIZE": 4, "MIXED_PRECISION": False, "SEED": 0}
    dirs = []
    trainers = []
    for k in range(3):
        t = Trainer(dict(config, SEED=k))
        d = str(tmp_path / f"f{k}" / "model")
        save_weights(d, t.state.params, t.state.batch_stats)
        dirs.append(d)
        trainers.append(t)

    ens = EnsemblePredictor(config, dirs)
    x = np.random.default_rng(0).normal(size=(4, 16, 16, 1)).astype(np.float32)
    mean_prob = ens.predict(x)
    assert mean_prob.shape == (4, 16, 16, 2)
    singles = np.stack([t.predict(x) for t in trainers])
    np.testing.assert_allclose(mean_prob, singles.mean(0), atol=2e-5)
    members = ens.predict_members(x)
    assert members.shape == (3, 4, 16, 16, 2)
    np.testing.assert_allclose(members, singles, atol=2e-5)


def test_ensemble_from_exp_root(tmp_path):
    from cmrtpu.predict.ensemble import EnsemblePredictor
    from cmrtpu.train.checkpoint import save_weights
    from cmrtpu.train.trainer import Trainer
    import json
    import os

    config = {"DIM": [16, 16], "DEPTH": 1, "FILTERS": 2, "MASK_CLASSES": 2,
              "MIXED_PRECISION": False}
    for k in range(2):
        t = Trainer(dict(config, SEED=k))
        save_weights(str(tmp_path / f"f{k}" / "model"),
                     t.state.params, t.state.batch_stats)
        os.makedirs(tmp_path / f"f{k}" / "config", exist_ok=True)
        with open(tmp_path / f"f{k}" / "config" / "config.json", "w") as fh:
            json.dump(config, fh)
    ens = EnsemblePredictor.from_exp_root(str(tmp_path))
    assert ens.n_members == 2
    assert ens.predict(np.zeros((2, 16, 16, 1), np.float32)).shape == (2, 16, 16, 2)


def test_multi_head_training():
    """BASELINE config 4: joint RVIP (sigmoid) + ventricle (softmax) heads."""
    from cmrtpu.train.trainer import Trainer

    heads = [["rvip", 2, "sigmoid"], ["sax", 4, "softmax"]]
    config = {"DIM": [16, 16], "DEPTH": 1, "FILTERS": 4, "MASK_CLASSES": 2,
              "HEADS": heads, "BATCHSIZE": 4, "LEARNING_RATE": 1e-3,
              "MIXED_PRECISION": False, "SEED": 0}
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 16, 16, 1)).astype(np.float32)
    y_rvip = (rng.random((4, 16, 16, 2)) > 0.95).astype(np.float32)
    labels = rng.integers(0, 4, (4, 16, 16))
    y_sax = np.eye(4, dtype=np.float32)[labels]
    y = np.concatenate([y_rvip, y_sax], axis=-1)

    trainer = Trainer(config)
    hist = trainer.fit([(x, y)], epochs=3)
    losses = [h["loss"] for h in hist]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    preds = trainer.predict(x)
    assert set(preds) == {"rvip", "sax"}
    assert preds["rvip"].shape == (4, 16, 16, 2)
    assert preds["sax"].shape == (4, 16, 16, 4)
    np.testing.assert_allclose(preds["sax"].sum(-1), 1.0, atol=1e-5)


def test_cine_volume_training(tmp_path):
    """BASELINE config 3: 2D+t cine volumes batched through a 3D U-Net."""
    from cmrtpu.io import MedicalImage, write_image
    from cmrtpu.pipeline.generator import DataGenerator
    from cmrtpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    xs, ys = [], []
    for i in range(4):
        vol = rng.normal(size=(8, 24, 24)).astype(np.float32)   # t, y, x
        msk = np.zeros((8, 24, 24), np.uint8)
        msk[:, 8:11, 6:9] = 1
        msk[:, 16:19, 12:15] = 2
        xp = str(tmp_path / f"patient{i:03d}__t00_z0_img.nrrd")
        yp = str(tmp_path / f"patient{i:03d}__t00_z0_msk.nrrd")
        write_image(MedicalImage(array=vol, spacing=(1.4, 1.4, 1.0)), xp)
        write_image(MedicalImage(array=msk, spacing=(1.4, 1.4, 1.0)), yp)
        xs.append(xp)
        ys.append(yp)

    config = {"DIM": [8, 24, 24], "F_SIZE": [3, 3, 3], "M_POOL": [1, 2, 2],
              "DEPTH": 2, "FILTERS": 4, "MASK_CLASSES": 2, "BATCHSIZE": 2,
              "MASK_VALUES": [1, 2], "RESAMPLE": False, "AUGMENT": False,
              "LEARNING_RATE": 1e-3, "MIXED_PRECISION": False, "SEED": 0}
    gen = DataGenerator(xs, ys, config=config)
    x, y = gen[0]
    assert x.shape == (2, 8, 24, 24, 1)
    assert y.shape == (2, 8, 24, 24, 2)

    trainer = Trainer(config)
    hist = trainer.fit(gen, epochs=2)
    assert all(np.isfinite(h["loss"]) for h in hist)


def test_localisation_metrics_values_and_upper_bound():
    """loc_mm/loc_det/loc_fp (MONITOR_LOCALISATION): exact px->mm
    distances, the farthest-corner upper bound charged to BOTH one-sided
    cases — FN (ref: get_distances_upper_bound,
    src/models/evaluate_cv.py:572-595) and FP (spurious detections on
    gt-absent slices dominate the offline volume-CoM error; a metric blind
    to them mis-selects checkpoints) — and empty-slot exclusion."""
    import jax.numpy as jnp
    from cmrtpu.eval.detection import localisation_metrics

    m = localisation_metrics({"SPACING": [2.0, 2.0], "MASK_VALUES": [1, 2]})
    y = np.zeros((3, 16, 16, 2), np.float32)
    p = np.zeros_like(y)
    y[0, 4:7, 4:7, 0] = 1.0
    p[0, 4:7, 7:10, 0] = 1.0          # anterior 3 px off -> 6 mm
    y[0, 8:11, 8:11, 1] = 1.0
    p[0, 8:11, 8:11, 1] = 1.0         # inferior exact -> 0 mm
    y[1, 11:14, 11:14, 1] = 1.0       # FN: gt present, prediction missing
    p[2, 2:5, 2:5, 0] = 1.0           # FP: detection on a gt-absent slice
    # remaining slots: neither side detects — excluded
    ub_fn = float(np.hypot(12, 12)) * 2.0  # farthest corner from (12, 12)
    ub_fp = float(np.hypot(12, 12)) * 2.0  # farthest corner from (3, 3)
    loc = float(m["loc_mm"](jnp.asarray(y), jnp.asarray(p)))
    det = float(m["loc_det"](jnp.asarray(y), jnp.asarray(p)))
    fp = float(m["loc_fp"](jnp.asarray(y), jnp.asarray(p)))
    assert loc == pytest.approx((6.0 + 0.0 + ub_fn + ub_fp) / 4, rel=1e-5)
    assert det == pytest.approx(2 / 3, rel=1e-5)
    assert fp == pytest.approx(1 / 3, rel=1e-5)  # 1 FP / 3 gt-absent slots

    # softmax layout (bg + landmarks): trailing-channel selection
    y3 = np.concatenate([1.0 - y.max(-1, keepdims=True), y], axis=-1)
    p3 = np.concatenate([np.zeros_like(p[..., :1]), p], axis=-1)
    assert float(m["loc_mm"](jnp.asarray(y3), jnp.asarray(p3))) \
        == pytest.approx(loc, rel=1e-5)


def test_monitor_localisation_rides_training():
    """MONITOR_LOCALISATION=True: loc metrics appear in train+val logs and
    the best-only checkpoint can monitor val_loc_mm."""
    from cmrtpu.train.trainer import Trainer

    cfg = {"DIM": [24, 24], "DEPTH": 1, "FILTERS": 2, "MASK_CLASSES": 2,
           "MASK_VALUES": [1, 2], "BATCHSIZE": 4, "MIXED_PRECISION": False,
           "LEARNING_RATE": 1e-3, "SEED": 0, "SCALER": "MinMax",
           "MONITOR_LOCALISATION": True, "AUGMENT": False}
    trainer = Trainer(cfg)
    assert "loc_mm" in trainer.metrics and "loc_det" in trainer.metrics

    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 24, 24)).astype(np.float32)
    y = np.zeros((8, 24, 24), np.float32)
    y[:, 4:7, 4:7] = 1.0
    y[:, 16:19, 12:15] = 2.0
    from cmrtpu.train.device_cache import DeviceCachedLoop

    class _ArrGen:  # the cached-loop array facade (padded cache attributes)
        masks = True

        def __init__(self, xa, ya):
            self._cache_x = np.stack(xa)
            self._cache_y = np.stack(ya)

    loop = DeviceCachedLoop(trainer, _ArrGen(x, y), _ArrGen(x[:4], y[:4]))
    logs = loop.run_train_epoch()
    ev = loop.run_eval_epoch()
    assert np.isfinite(float(logs["loc_mm"]))
    assert np.isfinite(float(ev["loc_mm"]))
    assert 0.0 <= float(ev["loc_det"]) <= 1.0


def test_monitor_localisation_rejects_heads_and_3d():
    from cmrtpu.train.trainer import Trainer

    base = {"DIM": [16, 16], "DEPTH": 1, "FILTERS": 2, "MASK_CLASSES": 2,
            "MASK_VALUES": [1, 2], "BATCHSIZE": 2, "MIXED_PRECISION": False,
            "LEARNING_RATE": 1e-3, "SEED": 0, "MONITOR_LOCALISATION": True}
    with pytest.raises(ValueError, match="MONITOR_LOCALISATION"):
        Trainer(dict(base, HEADS=[["rvip", 2, "sigmoid"],
                                  ["sep", 4, "softmax"]]))
    with pytest.raises(ValueError, match="MONITOR_LOCALISATION"):
        Trainer(dict(base, DIM=[8, 16, 16]))
