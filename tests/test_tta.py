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


# -- coordinate-space TTA (TTA_MODE='coords') --------------------------------

def _stamp(h, w, yx, c, channels=2, value=1.0):
    m = np.zeros((1, h, w, channels), np.float32)
    y, x = yx
    m[0, y - 1:y + 2, x - 1:x + 2, c] = value
    return m


def test_coords_identity_anchored_is_passthrough():
    """A healthy identity member (detects + majority confirms) must pass
    its RAW probability map through untouched — the structural guarantee
    that coords-TTA cannot degrade a converged run."""
    from cmrtpu.predict.tta import tta_rot90_coords_forward

    x = jnp.asarray(_stamp(32, 32, (10, 20), 0, value=0.83))
    fwd = tta_rot90_coords_forward(lambda v, xx: xx, (32, 32))
    out = np.asarray(fwd({}, x))
    # ch0 anchored: bit-identical to the single-forward map (0.83 values)
    np.testing.assert_array_equal(out[..., 0], np.asarray(x)[..., 0])
    # ch1: nothing detected anywhere
    assert out[..., 1].sum() == 0.0


def test_coords_mode_rescues_what_prob_averaging_blurs():
    """The rescue path: the identity member MISSES (sub-threshold peak)
    while the rotated members detect — probability averaging loses the
    landmark entirely, coordinate mode stamps the valid members' mean."""
    from cmrtpu.predict.tta import (tta_rot90_coords_forward,
                                    tta_rot90_forward)

    peaks = {1: (16, 17), 2: (17, 17), 3: (17, 16)}
    calls = []

    def apply_fn(v, xr):
        k = len(calls)
        calls.append(k)
        ident = np.zeros((1, 32, 32, 1), np.float32)
        if k in peaks:  # identity (k=0) stays sub-threshold: a miss
            y, x = peaks[k]
            ident[0, y, x, 0] = 0.9
        # return in the member's ROTATED frame; the wrapper rotates it back
        return jnp.asarray(np.rot90(ident, k, axes=(1, 2)).copy())

    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    blurred = np.asarray(tta_rot90_forward(apply_fn, (32, 32))({}, x))
    assert blurred.max() < 0.5  # probability averaging loses the landmark

    calls.clear()
    out = np.asarray(tta_rot90_coords_forward(apply_fn, (32, 32))({}, x))
    assert out.max() == 1.0     # rescued with a full-certainty stamp
    com = np.argwhere(out[0, :, :, 0] > 0).mean(axis=0)
    # mean of (16,17),(17,17),(17,16) = (16.67, 16.67), rounded stamp
    np.testing.assert_allclose(com, [16.67, 16.67], atol=0.8)


def test_coords_majority_rule():
    # a landmark detected by only 1 of 4 members is NOT detected
    from cmrtpu.predict.tta import tta_rot90_coords_forward

    calls = []

    def apply_fn(v, xr):
        k = len(calls)
        calls.append(k)
        ident = np.zeros((1, 32, 32, 1), np.float32)
        if k == 0:
            ident[0, 8, 8, 0] = 0.9
        return jnp.asarray(np.rot90(ident, k, axes=(1, 2)).copy())

    out = np.asarray(tta_rot90_coords_forward(apply_fn, (32, 32))(
        {}, jnp.zeros((1, 32, 32, 1), jnp.float32)))
    assert out.sum() == 0.0


def test_predictor_coords_mode_end_to_end(tmp_path):
    from cmrtpu.predict.predictor import Predictor
    from cmrtpu.train.checkpoint import save_weights
    from cmrtpu.train.trainer import Trainer

    trainer = Trainer(CFG)
    save_weights(str(tmp_path), trainer.state.params,
                 trainer.state.batch_stats)
    x = np.random.default_rng(7).normal(size=(2, 32, 32, 1)).astype(np.float32)
    pred = Predictor(dict(CFG, TTA=True, TTA_MODE="coords"),
                     model_path=str(tmp_path))
    out = pred.predict(x)
    assert out.shape == (2, 32, 32, 2)
    # anchored channels carry raw probabilities, rescued ones 1.0 stamps,
    # suppressed ones zeros — always a valid probability map
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_coords_mode_rejects_multihead():
    import pytest

    from cmrtpu.predict.tta import tta_forward_from_config

    with pytest.raises(ValueError, match="multi-head"):
        tta_forward_from_config(
            lambda v, x: {"a": x},
            dict(CFG, TTA=True, TTA_MODE="coords",
                 HEADS=[["rvip", 2, "sigmoid"], ["seg", 4, "softmax"]]))
