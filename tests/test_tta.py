"""Rot90-orbit test-time augmentation (cmrtpu/predict/tta.py)."""

import numpy as np
import jax.numpy as jnp

from cmrtpu.predict.tta import rot90_orbit, tta_rot90_forward

CFG = {"DIM": [32, 32], "DEPTH": 2, "FILTERS": 8, "MASK_CLASSES": 2,
       "MASK_VALUES": [1, 2], "BATCHSIZE": 4, "MIXED_PRECISION": False,
       "SEED": 0, "LEARNING_RATE": 1e-3}


def test_orbit_selection():
    assert rot90_orbit([32, 32]) == (0, 1, 2, 3)
    assert rot90_orbit([48, 32]) == (0, 2)          # non-square: 180 only
    assert rot90_orbit([8, 32, 32]) == (0, 1, 2, 3)  # 2D+t in-plane square


def test_identity_model_is_fixed_point():
    # apply(v, x) = x: every rotation inverts exactly, the average is x
    fwd = tta_rot90_forward(lambda v, x: x, (32, 32))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 1)),
                    jnp.float32)
    np.testing.assert_allclose(np.asarray(fwd({}, x)), np.asarray(x),
                               atol=1e-6)


def test_tta_average_matches_manual_orbit():
    # against a REAL model: the wrapped forward equals the hand-computed
    # average over the four rotations of the plain forward
    from cmrtpu.models.hybrids import get_model
    from cmrtpu.train.trainer import Trainer

    trainer = Trainer(CFG)
    model = get_model(trainer.config)
    variables = {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 1)), jnp.float32)

    plain = lambda v, xx: model.apply(v, xx, train=False)
    got = np.asarray(tta_rot90_forward(plain, (32, 32))(variables, x))

    manual = np.mean([np.rot90(np.asarray(plain(
        variables, jnp.rot90(x, k, axes=(1, 2)))), -k, axes=(1, 2))
        for k in range(4)], axis=0)
    np.testing.assert_allclose(got, manual, atol=1e-5)


def test_tta_forward_is_rot90_equivariant():
    # the orbit-averaged model is exactly equivariant under rot90 by
    # construction: f(rot(x)) == rot(f(x))
    from cmrtpu.models.hybrids import get_model
    from cmrtpu.train.trainer import Trainer

    trainer = Trainer(CFG)
    model = get_model(trainer.config)
    variables = {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}
    fwd = tta_rot90_forward(lambda v, xx: model.apply(v, xx, train=False),
                            (32, 32))
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 32, 32, 1)),
                    jnp.float32)
    np.testing.assert_allclose(
        np.asarray(fwd(variables, jnp.rot90(x, 1, axes=(1, 2)))),
        np.rot90(np.asarray(fwd(variables, x)), 1, axes=(1, 2)), atol=1e-5)


def test_predictor_honors_tta_key(tmp_path):
    # Predictor(TTA=True) == manual orbit average of Predictor(TTA=False)
    from cmrtpu.predict.predictor import Predictor
    from cmrtpu.train.checkpoint import save_weights
    from cmrtpu.train.trainer import Trainer

    trainer = Trainer(CFG)
    save_weights(str(tmp_path), trainer.state.params,
                 trainer.state.batch_stats)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 32, 32, 1)).astype(np.float32)

    base = Predictor(dict(CFG), model_path=str(tmp_path))
    tta = Predictor(dict(CFG, TTA=True), model_path=str(tmp_path))
    manual = np.mean([np.rot90(base.predict(
        np.rot90(x, k, axes=(1, 2)).copy()), -k, axes=(1, 2))
        for k in range(4)], axis=0)
    np.testing.assert_allclose(tta.predict(x), manual, atol=1e-5)


def test_multihead_outputs_rotate_per_leaf():
    # dict outputs: every head leaf is rotated back and averaged
    fwd = tta_rot90_forward(
        lambda v, x: {"a": x * 2.0, "b": x[..., :1]}, (16, 16))
    x = jnp.asarray(np.random.default_rng(4).normal(size=(1, 16, 16, 2)),
                    jnp.float32)
    out = fwd({}, x)
    np.testing.assert_allclose(np.asarray(out["a"]), np.asarray(x) * 2.0,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["b"]),
                               np.asarray(x)[..., :1], atol=1e-6)


def test_export_bakes_tta_in(tmp_path):
    # an exported TTA artifact reproduces the live TTA Predictor exactly
    from cmrtpu.predict.export import export_model, load_exported
    from cmrtpu.predict.predictor import Predictor
    from cmrtpu.predict.export import load_exported_weights
    from cmrtpu.train.checkpoint import save_weights
    from cmrtpu.train.trainer import Trainer

    cfg = dict(CFG, TTA=True)
    trainer = Trainer(cfg)
    model_dir = tmp_path / "model"
    save_weights(str(model_dir), trainer.state.params,
                 trainer.state.batch_stats)
    out = export_model(cfg, str(model_dir), str(tmp_path / "art"), batch=2)
    fn, meta = load_exported(out)
    params, stats = load_exported_weights(out)
    assert meta["config"]["TTA"] is True

    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 32, 32, 1)).astype(np.float32)
    live = Predictor(cfg, model_path=str(model_dir)).predict(x)
    art = np.asarray(fn({"params": params, "batch_stats": stats or {}}, x))
    np.testing.assert_allclose(art, live, atol=1e-5)


def test_ensemble_honors_tta_key(tmp_path):
    # cmrtpu.cli.serve -ensemble must not silently drop the rotation
    # averaging the fold-level eval was qualified with (regression)
    from cmrtpu.predict.ensemble import EnsemblePredictor
    from cmrtpu.train.checkpoint import save_weights
    from cmrtpu.train.trainer import Trainer

    dirs = []
    for k in range(2):
        t = Trainer(dict(CFG, SEED=k))
        d = tmp_path / f"f{k}" / "model"
        save_weights(str(d), t.state.params, t.state.batch_stats)
        dirs.append(str(d))

    x = np.random.default_rng(6).normal(size=(2, 32, 32, 1)).astype(np.float32)
    plain = EnsemblePredictor(dict(CFG), dirs)
    tta = EnsemblePredictor(dict(CFG, TTA=True), dirs)
    manual = np.mean([np.rot90(plain.predict(
        np.rot90(x, k, axes=(1, 2)).copy()), -k, axes=(1, 2))
        for k in range(4)], axis=0)
    np.testing.assert_allclose(tta.predict(x), manual, atol=1e-5)
