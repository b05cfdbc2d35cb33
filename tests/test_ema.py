"""EMA shadow params (config key EMA) across step/eval/checkpoint paths."""

import numpy as np
import jax
import jax.numpy as jnp

from cmrtpu.train import steps as S
from cmrtpu.train.trainer import Trainer

CFG = {"DIM": [32, 32], "DEPTH": 2, "FILTERS": 8, "MASK_CLASSES": 2,
       "MASK_VALUES": [1, 2], "BATCHSIZE": 4, "MIXED_PRECISION": False,
       "SEED": 0, "LEARNING_RATE": 1e-2, "EMA": 0.5}


def _batch(rng):
    x = rng.normal(size=(4, 32, 32, 1)).astype(np.float32)
    y = np.zeros((4, 32, 32, 2), np.float32)
    y[:, 8:12, 8:12, 0] = 1.0
    y[:, 20:24, 20:24, 1] = 1.0
    return x, y


def test_decay_parsing():
    assert S.ema_decay_from_config({"EMA": False}) is None
    assert S.ema_decay_from_config({}) is None
    assert S.ema_decay_from_config({"EMA": True}) == 0.999
    assert S.ema_decay_from_config({"EMA": 0.9}) == 0.9


def test_ema_matches_manual_recurrence():
    trainer = Trainer(CFG)
    assert trainer.ema_decay == 0.5
    assert trainer.state.ema_params is not None
    x, y = _batch(np.random.default_rng(0))
    manual = jax.device_get(trainer.state.params)
    state = trainer.state
    for t in range(3):
        state, _ = trainer.train_step(state, x, y, trainer.rng)
        live = jax.device_get(state.params)
        # TF-style decay warmup: d = min(decay, (1+t)/(10+t))
        d = min(0.5, (1.0 + (t + 1)) / (10.0 + (t + 1)))
        manual = jax.tree_util.tree_map(
            lambda e, p, d=d: e * d + p * (1 - d), manual, live)
    got = jax.device_get(state.ema_params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5),
        got, manual)


def test_eval_and_predict_use_the_shadow():
    trainer = Trainer(CFG)
    x, y = _batch(np.random.default_rng(1))
    # plant a recognisably different shadow: zeroed params
    zeros = jax.tree_util.tree_map(jnp.zeros_like, trainer.state.params)
    trainer.state = trainer.state.replace(ema_params=zeros)

    zero_state = trainer.state.replace(params=zeros, ema_params=None)
    want = jax.device_get(trainer.eval_step(zero_state, x, y))
    got = jax.device_get(trainer.eval_step(trainer.state, x, y))
    assert np.allclose(got["loss"], want["loss"], atol=1e-6)

    # trainer.predict reads serving_params == the shadow
    pred = trainer.predict(x)
    zero_trainer_out = np.asarray(jax.device_get(trainer.predict_step(
        zeros, trainer.state.batch_stats, x)))
    np.testing.assert_allclose(np.asarray(pred), zero_trainer_out, atol=1e-6)


def test_off_by_default_keeps_structure():
    trainer = Trainer(dict(CFG, EMA=False))
    assert trainer.state.ema_params is None
    x, y = _batch(np.random.default_rng(2))
    state, logs = trainer.train_step(trainer.state, x, y, trainer.rng)
    assert state.ema_params is None
    assert np.isfinite(float(jax.device_get(logs["loss"])))


def test_checkpoint_saves_the_shadow(tmp_path):
    from cmrtpu.train.callbacks import ModelCheckpoint
    from cmrtpu.train.checkpoint import load_weights

    trainer = Trainer(CFG)
    x, y = _batch(np.random.default_rng(3))
    trainer.state, _ = trainer.train_step(trainer.state, x, y, trainer.rng)
    cb = ModelCheckpoint(str(tmp_path), monitor="loss", mode="min",
                         save_full_state=False, async_write=False)
    cb.on_epoch_end(trainer, 0, {"loss": 0.1})
    params, _ = load_weights(str(tmp_path))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(jax.device_get(b)), atol=1e-6),
        params, trainer.serving_params)
    # and the shadow is NOT the live params after one update
    flat_live = jax.tree_util.tree_leaves(jax.device_get(trainer.state.params))
    flat_ema = jax.tree_util.tree_leaves(jax.device_get(trainer.state.ema_params))
    assert any(not np.allclose(a, b) for a, b in zip(flat_live, flat_ema))


def test_cached_loop_updates_ema(synthetic_cohort=None):
    from cmrtpu.train.device_cache import make_cached_train_step, upload_cache
    from cmrtpu.parallel.mesh import create_mesh

    cfg = dict(CFG, AUGMENT=False)
    mesh = create_mesh()
    trainer = Trainer(cfg, mesh=mesh)
    rng = np.random.default_rng(4)
    xs = rng.normal(size=(8, 32, 32)).astype(np.float32)
    ys = np.zeros((8, 32, 32), np.float32)
    ys[:, 8:12, 8:12] = 1.0
    ys[:, 20:24, 20:24] = 2.0
    dx, dy = upload_cache(xs, ys, mesh)
    step = make_cached_train_step(trainer.model, trainer.optimizer,
                                  trainer.loss_fn, trainer.metrics, cfg,
                                  mesh, augment=False)
    from jax.sharding import NamedSharding, PartitionSpec as P
    idxs = jax.device_put(np.arange(8, dtype=np.int32),
                          NamedSharding(mesh, P("data")))
    state = trainer.state
    before = jax.device_get(state.ema_params)
    state, logs = step(state, dx, dy, idxs, trainer.rng)
    after = jax.device_get(state.ema_params)
    assert np.isfinite(float(jax.device_get(logs["loss"])))
    changed = jax.tree_util.tree_map(
        lambda a, b: not np.allclose(a, b), before, after)
    assert any(jax.tree_util.tree_leaves(changed))


def test_full_state_roundtrip_keeps_ema(tmp_path):
    from cmrtpu.train.checkpoint import restore_train_state, save_train_state

    trainer = Trainer(CFG)
    x, y = _batch(np.random.default_rng(5))
    trainer.state, _ = trainer.train_step(trainer.state, x, y, trainer.rng)
    save_train_state(str(tmp_path), jax.device_get(trainer.state))
    restored = restore_train_state(str(tmp_path),
                                   jax.device_get(trainer.state))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        jax.device_get(trainer.state.ema_params), restored.ema_params)


def test_manual_collectives_step_updates_ema():
    # GRAD_ALLREDUCE_DTYPE routes training through the explicit-collectives
    # step (cmrtpu/train/manual_collectives.py) — its state.replace must
    # carry the EMA update too, or eval/checkpoints serve the frozen
    # init-weight shadow (regression: the shadow never moved)
    from cmrtpu.parallel.mesh import create_mesh
    from cmrtpu.train.device_cache import upload_cache
    from cmrtpu.train.manual_collectives import make_manual_train_step
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = dict(CFG, AUGMENT=False, GRAD_ALLREDUCE_DTYPE="bfloat16")
    mesh = create_mesh()
    trainer = Trainer(cfg, mesh=mesh)
    rng = np.random.default_rng(6)
    xs = rng.normal(size=(8, 32, 32)).astype(np.float32)
    ys = np.zeros((8, 32, 32), np.float32)
    ys[:, 8:12, 8:12] = 1.0
    dx, dy = upload_cache(xs, ys, mesh)
    step = make_manual_train_step(trainer.model, trainer.optimizer,
                                  trainer.loss_fn, trainer.metrics, cfg,
                                  mesh, augment=False)
    idxs = jax.device_put(np.arange(8, dtype=np.int32),
                          NamedSharding(mesh, P("data")))
    before = jax.device_get(trainer.state.ema_params)
    state, logs = step(trainer.state, dx, dy, idxs, trainer.rng)
    after = jax.device_get(state.ema_params)
    assert np.isfinite(float(jax.device_get(logs["loss"])))
    changed = jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: not np.allclose(a, b), before, after))
    assert any(changed)
    # shadow lags the live params (decay blend, not a copy)
    live = jax.device_get(state.params)
    differs = jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: not np.allclose(a, b), live, after))
    assert any(differs)


def test_restore_weights_reseeds_the_shadow(tmp_path):
    from cmrtpu.train.checkpoint import save_weights

    donor = Trainer(dict(CFG, SEED=123))
    x, y = _batch(np.random.default_rng(7))
    donor.state, _ = donor.train_step(donor.state, x, y, donor.rng)
    save_weights(str(tmp_path), donor.state.params, donor.state.batch_stats)

    trainer = Trainer(CFG)  # EMA on, shadow = copy of ITS OWN random init
    trainer.restore_weights(str(tmp_path))
    # shadow must now equal the restored weights, not the old init
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(jax.device_get(a)), np.asarray(jax.device_get(b))),
        trainer.state.ema_params, trainer.state.params)
