"""Direct unit pins for the LR schedules (ref: src/utils/KerasCallbacks.py
PolynomialDecay :230-243, StepDecay :154-164, SGDRScheduler :308-384) and
the CCE-family losses (ref: src/models/Loss_and_metrics.py:94-122) that the
e2e flows only exercise indirectly."""

import math

import jax.numpy as jnp
import numpy as np

from cmrtpu.train import losses as L
from cmrtpu.train.optimizers import polynomial_decay, sgdr_schedule


def test_polynomial_decay_endpoints_and_shape():
    assert polynomial_decay(0, 100, 0.01) == 0.01
    assert polynomial_decay(100, 100, 0.01) == 0.0
    # power=1 is linear
    assert math.isclose(polynomial_decay(25, 100, 0.01, power=1.0), 0.0075)
    vals = [polynomial_decay(e, 50, 1e-3) for e in range(51)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_sgdr_schedule_warm_restarts():
    lr_min, lr_max, cycle = 1e-5, 1e-2, 10.0
    # cosine start / midpoint / near-end of the first cycle
    assert math.isclose(sgdr_schedule(0, lr_min, lr_max, cycle), lr_max)
    assert math.isclose(sgdr_schedule(5, lr_min, lr_max, cycle),
                        (lr_min + lr_max) / 2)
    assert sgdr_schedule(9, lr_min, lr_max, cycle) < sgdr_schedule(
        1, lr_min, lr_max, cycle)
    # warm restart: the first iteration of cycle 2 snaps back to lr_max,
    # and cycle 2 is mult_factor x longer (midpoint at 10 + 10)
    assert math.isclose(sgdr_schedule(10, lr_min, lr_max, cycle), lr_max)
    assert math.isclose(sgdr_schedule(20, lr_min, lr_max, cycle),
                        (lr_min + lr_max) / 2)


class _LrRecorder:
    """Minimal trainer stand-in: the schedule callbacks only call set_lr."""

    def __init__(self):
        self.lrs = []

    def set_lr(self, lr):
        self.lrs.append(float(lr))


def test_schedule_callbacks_apply_pure_functions():
    from cmrtpu.train.callbacks import (PolynomialDecaySchedule,
                                        SGDRScheduler, StepDecaySchedule)

    t = _LrRecorder()
    poly = PolynomialDecaySchedule(max_epochs=20, init_alpha=0.01, power=2.0)
    for e in range(3):
        poly.on_epoch_begin(t, e)
    assert t.lrs == [polynomial_decay(e, 20, 0.01, 2.0) for e in range(3)]

    t = _LrRecorder()
    sgdr = SGDRScheduler(lr_min=1e-5, lr_max=1e-2, cycle_length=4,
                         mult_factor=2.0)
    for e in range(6):
        sgdr.on_epoch_begin(t, e)
    assert t.lrs == [sgdr_schedule(e, 1e-5, 1e-2, 4.0, 2.0) for e in range(6)]

    t = _LrRecorder()
    step = StepDecaySchedule(init_alpha=0.01, factor=0.5, drop_every=2)
    for e in range(4):
        step.on_epoch_begin(t, e)
    # exponent = floor((1+epoch)/drop_every) — the reference's off-by-one
    assert t.lrs == [0.01 * 0.5 ** ((1 + e) // 2) for e in range(4)]


def test_categorical_crossentropy_reference_values():
    y = jnp.asarray(np.eye(4, dtype=np.float32)[None])  # [1, 4, 4] one-hot
    assert float(L.categorical_crossentropy(y, y)) < 1e-5
    uniform = jnp.full_like(y, 0.25)
    assert math.isclose(float(L.categorical_crossentropy(y, uniform)),
                        math.log(4.0), rel_tol=1e-5)


def test_cce_dice_loss_perfect_prediction():
    y = jnp.asarray(np.eye(3, dtype=np.float32)[None])
    # cce ~ 0, dice ~ 1 -> loss ~ -1
    assert math.isclose(float(L.cce_dice_loss(y, y)), -1.0, abs_tol=1e-4)


def test_weighted_cce_dice_matches_hand_rolled():
    rng = np.random.default_rng(0)
    y = np.eye(2, dtype=np.float32)[rng.integers(0, 2, size=(4, 5))]
    p = rng.uniform(0.1, 0.9, size=y.shape).astype(np.float32)
    w = np.asarray([1.0, 3.0], np.float32)
    got = float(L.weighted_cce_dice_loss(w)(jnp.asarray(y), jnp.asarray(p)))

    pn = p / p.sum(-1, keepdims=True)
    pn = np.clip(pn, 1e-7, 1 - 1e-7)
    cce = float(np.mean(-np.sum(y * np.log(pn) * w, axis=-1)))
    dice = float(L.dice_coef(jnp.asarray(y), jnp.asarray(p)))
    assert math.isclose(got, cce - dice, rel_tol=1e-5)


def test_dice_coef_squared_extremes():
    a = jnp.asarray(np.ones((2, 8, 8, 1), np.float32))
    assert math.isclose(float(L.dice_coef_squared(a, a)), 1.0, rel_tol=1e-6)
    b = jnp.zeros_like(a)
    assert float(L.dice_coef_squared(a, b)) < 1e-2


def test_multi_head_loss_is_sum_of_per_head_losses():
    heads = [("rvip", 2, "sigmoid"), ("seg", 3, "softmax")]
    rng = np.random.default_rng(1)
    y = rng.uniform(0, 1, size=(2, 6, 6, 5)).astype(np.float32)
    preds = {"rvip": jnp.asarray(rng.uniform(0.01, 0.99, (2, 6, 6, 2)),
                                 jnp.float32),
             "seg": jnp.asarray(rng.dirichlet(np.ones(3), (2, 6, 6)),
                                jnp.float32)}
    got = float(L.multi_head_loss(heads)(jnp.asarray(y), preds))
    want = float(L.bce_dice_loss(jnp.asarray(y[..., :2]), preds["rvip"])) + \
        float(L.cce_dice_loss(jnp.asarray(y[..., 2:]), preds["seg"]))
    assert math.isclose(got, want, rel_tol=1e-5)

    cat = L.concat_heads(heads)(preds)
    assert cat.shape == (2, 6, 6, 5)
    assert np.allclose(np.asarray(cat[..., :2]), np.asarray(preds["rvip"]))
    assert np.allclose(np.asarray(cat[..., 2:]), np.asarray(preds["seg"]))
