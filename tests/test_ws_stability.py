"""Normalization-free (WS) training stabilisers: AGC + head prior init.

Context: at the 224²/depth-4 scale with ~0.05% foreground, a plain WS run
plunged into the all-zero-prediction basin within one epoch (sigmoid pinned
at ~1e-7; BatchNorm configs resist the basin structurally). AGC
(arXiv:2102.06171) and RetinaNet-style head-prior bias init
(arXiv:1708.02002 §3.3) are the published countermeasures; both are config
knobs here.
"""

import numpy as np
import jax

import cmrtpu.config as C
from cmrtpu.train.optimizers import (get_learning_rate, get_optimizer,
                                     set_learning_rate)

CFG = {"DIM": [32, 32], "DEPTH": 2, "FILTERS": 8, "MASK_CLASSES": 2,
       "MASK_VALUES": [1, 2], "BATCHSIZE": 4, "MIXED_PRECISION": False,
       "SEED": 0, "LEARNING_RATE": 1e-3}


def test_agc_clips_oversized_units():
    cfg = C.normalise_config(dict(CFG, AGC=0.08))
    opt = get_optimizer(cfg)
    params = {"w": np.ones((4, 4), np.float32)}
    state = opt.init(params)
    huge = {"w": np.full((4, 4), 1e4, np.float32)}
    updates, _ = opt.update(huge, state, params)
    # adam's unit step is lr; the point is the chain ran and stayed finite
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_lr_plumbing_survives_the_agc_chain():
    # ReduceLROnPlateau / OptimizerChanger read+write the injected lr; with
    # AGC the optimizer state is an optax.chain tuple
    cfg = C.normalise_config(dict(CFG, AGC=0.08))
    opt = get_optimizer(cfg)
    state = opt.init({"w": np.zeros((2,), np.float32)})
    assert get_learning_rate(state) == np.float32(1e-3)
    state2 = set_learning_rate(state, 1e-4)
    assert get_learning_rate(state2) == np.float32(1e-4)
    # structure unchanged: the new state still drives update()
    updates, _ = opt.update({"w": np.ones((2,), np.float32)}, state2,
                            {"w": np.zeros((2,), np.float32)})
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_head_prior_sets_initial_prediction_rate():
    from cmrtpu.models.hybrids import get_model
    from cmrtpu.models.unet import init_variables

    cfg = C.normalise_config(dict(CFG, HEAD_BIAS_PRIOR=0.001))
    model = get_model(cfg)
    v = init_variables(model, cfg, jax.random.key(0))
    x = np.random.default_rng(0).normal(size=(2, 32, 32, 1)).astype(np.float32)
    p = np.asarray(model.apply(
        {"params": v["params"], "batch_stats": v.get("batch_stats", {})},
        x, train=False))
    assert 1e-4 < p.mean() < 1e-2  # sits at the prior, not at 0.5


def test_ws_with_both_stabilisers_trains_a_step():
    from cmrtpu.train.trainer import Trainer

    cfg = dict(CFG, WEIGHT_STANDARDISATION=True, WS_I_UNDERSTAND=True,
               BATCH_NORMALISATION=False,
               AGC=0.08, HEAD_BIAS_PRIOR=0.001)
    trainer = Trainer(cfg)
    x = np.random.default_rng(1).normal(size=(4, 32, 32, 1)).astype(np.float32)
    y = np.zeros((4, 32, 32, 2), np.float32)
    y[:, 8:12, 8:12, 0] = 1.0
    state, logs = trainer.train_step(trainer.state, x, y, trainer.rng)
    assert np.isfinite(float(jax.device_get(logs["loss"])))
    # lr control through the chained state (the ReduceLROnPlateau path)
    trainer.state = state
    trainer.set_lr(5e-4)
    assert abs(trainer.get_lr() - 5e-4) < 1e-9


def test_softmax_heads_ignore_the_prior():
    from cmrtpu.models.hybrids import get_model
    from cmrtpu.models.unet import init_variables

    cfg = C.normalise_config(dict(
        CFG, HEAD_BIAS_PRIOR=0.001,
        HEADS=[["rvip", 2, "sigmoid"], ["sep", 3, "softmax"]]))
    model = get_model(cfg)
    v = init_variables(model, cfg, jax.random.key(0))
    x = np.random.default_rng(2).normal(size=(2, 32, 32, 1)).astype(np.float32)
    out = model.apply(
        {"params": v["params"], "batch_stats": v.get("batch_stats", {})},
        x, train=False)
    assert np.asarray(out["rvip"]).mean() < 1e-2          # prior applied
    assert abs(np.asarray(out["sep"]).mean() - 1 / 3) < 0.05  # softmax uniform


def test_logit_softcap_bounds_head_saturation():
    # LOGIT_SOFTCAP=c bounds head logits to (-c, c): even a head driven to
    # huge pre-activations (the WS collapse signature was ±40k) cannot pin
    # the sigmoid to exactly 0/1, so the BCE gradient stays alive
    from cmrtpu.models.hybrids import get_model
    from cmrtpu.models.unet import init_variables

    cfg = C.normalise_config(dict(CFG, LOGIT_SOFTCAP=15.0))
    model = get_model(cfg)
    v = init_variables(model, cfg, jax.random.key(0))
    # force an absurd head: giant kernel + giant bias -> uncapped logits
    # would be ~1e4 and sigmoid would be exactly 1.0 in float32
    params = jax.tree_util.tree_map(lambda p: p, v["params"])
    params["head"]["kernel"] = np.full_like(np.asarray(params["head"]["kernel"]), 1e4)
    params["head"]["bias"] = np.full_like(np.asarray(params["head"]["bias"]), 1e4)
    x = np.random.default_rng(0).normal(size=(2, 32, 32, 1)).astype(np.float32)
    p = np.asarray(model.apply(
        {"params": params, "batch_stats": v.get("batch_stats", {})},
        x, train=False), np.float64)
    cap = 1.0 / (1.0 + np.exp(-15.0))
    assert p.max() <= cap + 1e-6
    assert p.max() < 1.0  # not saturated: gradient can still flow


def test_logit_softcap_is_identity_near_the_origin():
    # a healthy run (logits O(1)) must be numerically unaffected
    from cmrtpu.models.hybrids import get_model
    from cmrtpu.models.unet import init_variables

    base = C.normalise_config(dict(CFG))
    capped = C.normalise_config(dict(CFG, LOGIT_SOFTCAP=30.0))
    x = np.random.default_rng(3).normal(size=(2, 32, 32, 1)).astype(np.float32)
    outs = []
    for cfg in (base, capped):
        model = get_model(cfg)
        v = init_variables(model, cfg, jax.random.key(0))
        outs.append(np.asarray(model.apply(
            {"params": v["params"], "batch_stats": v.get("batch_stats", {})},
            x, train=False), np.float64))
    # tanh(z/30) deviates from z/30 by z^3/(3*30^2): < 1e-3 in probability
    # space for the few-unit logits an init-scale head produces
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-3)


def test_logit_softcap_applies_to_multi_head_outputs():
    from cmrtpu.models.hybrids import get_model
    from cmrtpu.models.unet import init_variables

    cfg = C.normalise_config(dict(
        CFG, LOGIT_SOFTCAP=10.0,
        HEADS=[["rvip", 2, "sigmoid"], ["sep", 3, "softmax"]]))
    model = get_model(cfg)
    v = init_variables(model, cfg, jax.random.key(0))
    params = v["params"]
    for head in ("head_rvip", "head_sep"):
        params[head]["kernel"] = np.full_like(np.asarray(params[head]["kernel"]), 1e4)
    x = np.random.default_rng(4).normal(size=(2, 32, 32, 1)).astype(np.float32)
    out = model.apply({"params": params,
                       "batch_stats": v.get("batch_stats", {})},
                      x, train=False)
    cap = 1.0 / (1.0 + np.exp(-10.0))
    assert np.asarray(out["rvip"], np.float64).max() <= cap + 1e-6
    # softmax over logits in (-10, 10): no channel can be exactly 1
    assert np.asarray(out["sep"], np.float64).max() < 1.0


def test_logit_softcap_falsy_means_disabled_not_nan():
    """ADVICE round-3 (medium): the documented '--set LOGIT_SOFTCAP=false'
    disable convention maps to bool False / 0.0; dividing logits by a zero
    cap would NaN-poison the forward silently. Falsy and non-positive caps
    must behave exactly like the knob being absent."""
    from cmrtpu.models.hybrids import get_model
    from cmrtpu.models.unet import init_variables

    x = np.random.default_rng(5).normal(size=(2, 32, 32, 1)).astype(np.float32)
    base = C.normalise_config(dict(CFG))
    ref_model = get_model(base)
    v = init_variables(ref_model, base, jax.random.key(0))
    want = np.asarray(ref_model.apply(
        {"params": v["params"], "batch_stats": v.get("batch_stats", {})},
        x, train=False), np.float64)
    for disabled in (False, 0, 0.0, -1.0, None):
        cfg = C.normalise_config(dict(CFG, LOGIT_SOFTCAP=disabled))
        model = get_model(cfg)
        vv = init_variables(model, cfg, jax.random.key(0))
        got = np.asarray(model.apply(
            {"params": vv["params"], "batch_stats": vv.get("batch_stats", {})},
            x, train=False), np.float64)
        assert np.isfinite(got).all(), f"NaN with LOGIT_SOFTCAP={disabled!r}"
        np.testing.assert_array_equal(got, want)


def test_logit_softcap_covers_hybrid_heads():
    """ADVICE round-3 (low): the hybrid variants' own heads (head_3d /
    head_2d / head_avg) must honor LOGIT_SOFTCAP too, not only the inner
    UNet trunks."""
    from cmrtpu.models.hybrids import get_model
    from cmrtpu.models.unet import init_variables

    x = np.random.default_rng(6).normal(
        size=(1, 4, 32, 32, 1)).astype(np.float32)
    for variant, heads in (("followed", ["head_3d"]),
                           ("avg", ["head_2d", "head_3d", "head_avg"])):
        cfg = C.normalise_config(dict(
            CFG, DIM=[4, 32, 32], F_SIZE=[3, 3, 3], M_POOL=[1, 2, 2],
            LOGIT_SOFTCAP=10.0, MODEL_VARIANT=variant, MASK_CLASSES=4))
        model = get_model(cfg)
        v = init_variables(model, cfg, jax.random.key(0))
        params = v["params"]
        for head in heads:
            params[head]["kernel"] = np.full_like(
                np.asarray(params[head]["kernel"]), 1e4)
            params[head]["bias"] = np.asarray(params[head]["bias"])
        out = np.asarray(model.apply(
            {"params": params, "batch_stats": v.get("batch_stats", {})},
            x, train=False), np.float64)
        # softmax over logits bounded to (-10, 10): with all-equal capped
        # logits no channel can reach exactly 1.0
        assert np.isfinite(out).all()
        assert out.max() < 1.0, f"{variant}: head saturation despite softcap"
