"""U-Net model-family tests: shapes, dimension genericity, variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmrtpu.models.unet import UNet, build_model, dropout_schedule, init_variables, model_summary


SMALL_CFG = {"DIM": [32, 32], "DEPTH": 2, "FILTERS": 4, "F_SIZE": [3, 3],
             "M_POOL": [2, 2], "MASK_CLASSES": 2, "IMG_CHANNELS": 1,
             "MIXED_PRECISION": False, "BATCH_NORMALISATION": True}


def _apply(model, cfg, batch=2, train=False):
    rng = jax.random.PRNGKey(0)
    variables = init_variables(model, cfg, rng)
    x = jnp.ones((batch, *cfg["DIM"], 1), jnp.float32)
    if train:
        out, _ = model.apply(variables, x, train=True, rngs={"dropout": rng},
                             mutable=["batch_stats"])
    else:
        out = model.apply(variables, x, train=False)
    return out, variables


def test_2d_output_shape_and_range():
    model = build_model(SMALL_CFG)
    out, _ = _apply(model, SMALL_CFG)
    assert out.shape == (2, 32, 32, 2)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0  # sigmoid head


def test_3d_model_from_dim():
    cfg = dict(SMALL_CFG, DIM=[8, 32, 32], F_SIZE=[3, 3, 3], M_POOL=[2, 2, 2])
    model = build_model(cfg)
    out, _ = _apply(model, cfg)
    assert out.shape == (2, 8, 32, 32, 2)


def test_dropout_schedule_parity():
    cfg = {"DEPTH": 4, "DROPOUT_MIN": 0.3, "DROPOUT_MAX": 0.5}
    # np.linspace(.3,.5,4) = [.3,.367,.433,.5] -> rounded [0.3,0.4,0.4,0.5]
    assert dropout_schedule(cfg) == (0.3, 0.4, 0.4, 0.5)


def test_bn_first_variant():
    cfg = dict(SMALL_CFG, BN_FIRST=True)
    out, _ = _apply(build_model(cfg), cfg)
    assert out.shape == (2, 32, 32, 2)


def test_transpose_conv_variant():
    cfg = dict(SMALL_CFG, USE_UPSAMPLE=False)
    out, _ = _apply(build_model(cfg), cfg)
    assert out.shape == (2, 32, 32, 2)


def test_supervision_variant():
    model = build_model(SMALL_CFG, supervision=True)
    out, _ = _apply(model, SMALL_CFG)
    assert out.shape == (2, 32, 32, 2)


def test_multihead_variant():
    cfg = dict(SMALL_CFG, HEADS=[["rvip", 2, "sigmoid"], ["sep", 4, "softmax"]])
    model = build_model(cfg)
    out, _ = _apply(model, cfg)
    assert set(out) == {"rvip", "sep"}
    assert out["rvip"].shape == (2, 32, 32, 2)
    assert out["sep"].shape == (2, 32, 32, 4)
    np.testing.assert_allclose(np.asarray(out["sep"]).sum(-1), 1.0, rtol=1e-5)


def test_train_mode_updates_batch_stats():
    model = build_model(SMALL_CFG)
    rng = jax.random.PRNGKey(0)
    variables = init_variables(model, SMALL_CFG, rng)
    x = jax.random.normal(rng, (2, 32, 32, 1))
    _, mutated = model.apply(variables, x, train=True, rngs={"dropout": rng},
                             mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_mixed_precision_params_stay_f32():
    cfg = dict(SMALL_CFG, MIXED_PRECISION=True)
    model = build_model(cfg)
    _, variables = _apply(model, cfg)
    for leaf in jax.tree_util.tree_leaves(variables["params"]):
        assert leaf.dtype == jnp.float32


def test_model_summary_text():
    model = build_model(SMALL_CFG)
    _, variables = _apply(model, SMALL_CFG)
    text = model_summary(model, variables)
    assert "Trainable params:" in text


def test_conv_encoder_decoder_compose():
    """ConvEncoder/ConvDecoder compose into a U-Net-shaped trunk
    (ref: ConvEncoder/ConvDecoder, src/models/KerasLayers.py:237-430)."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from cmrtpu.models.unet import ConvDecoder, ConvEncoder

    class Composed(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            enc, skips = ConvEncoder(depth=2, filters=4,
                                     dropouts=(0.1, 0.2),
                                     dtype=jnp.float32)(x, train)
            # reference semantics: decoder filters = starting (largest)
            # count = encoder filters * 2**(depth-1)
            x = ConvDecoder(depth=2, filters=8, dropouts=(0.1, 0.2),
                            dtype=jnp.float32)(enc, skips, train)
            return nn.Conv(2, (1, 1))(x)

    model = Composed()
    x = jnp.zeros((2, 32, 32, 1), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    out = model.apply(variables, x)
    assert out.shape == (2, 32, 32, 2)


def test_weight_standardisation_variant():
    """WEIGHT_STANDARDISATION: normalization-free scaled-WS convs — no
    BatchNorm collections, per-channel gains as params, standardized kernels
    (zero mean per output channel), 2D and 3D, sigmoid output intact."""
    for dim in ([32, 32], [4, 32, 32]):
        cfg = dict(SMALL_CFG, DIM=dim, F_SIZE=[3] * len(dim),
                   M_POOL=([1, 2, 2] if len(dim) == 3 else [2, 2]),
                   WEIGHT_STANDARDISATION=True, WS_I_UNDERSTAND=True)
        model = build_model(cfg)
        out, variables = _apply(model, cfg)
        assert out.shape == (2, *dim, 2)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
        assert "batch_stats" not in variables or not jax.tree_util.tree_leaves(
            variables.get("batch_stats", {}))
        flat = jax.tree_util.tree_leaves_with_path(variables["params"])
        gains = [p for p, _ in flat
                 if any(getattr(k, "key", None) == "gain" for k in p)]
        assert gains, "WS conv gains missing from params"

    # the standardization really is applied: the effective kernel is
    # invariant to a constant shift AND a positive rescale of the raw
    # kernel (mean removed, variance normalised) — same output either way
    from flax.core import freeze, unfreeze
    from cmrtpu.models.unet import WSConv
    ws = WSConv(3, (3, 3), dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 2))
    v = unfreeze(ws.init(jax.random.PRNGKey(1), x))
    out = ws.apply(freeze(v), x)
    v["params"]["kernel"] = v["params"]["kernel"] * 3.0 + 7.0
    out_shifted = ws.apply(freeze(v), x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_shifted),
                               atol=1e-4)


def test_weight_standardisation_trains():
    """A WS U-Net optimizes through the fused cached step and its train /
    inference functions agree (no batch-vs-running-stats divergence)."""
    from cmrtpu.train.trainer import Trainer

    cfg = dict(SMALL_CFG, DIM=[24, 24], WEIGHT_STANDARDISATION=True,
               WS_I_UNDERSTAND=True,
               MASK_VALUES=[1, 2], BATCHSIZE=8, LEARNING_RATE=1e-3,
               SEED=0, AUGMENT=False, SCALER="MinMax", GAUS=True, SIGMA=1)

    class G:
        masks = True

        def __init__(self):
            rng = np.random.default_rng(0)
            self._cache_x = rng.normal(size=(16, 24, 24)).astype(np.float32)
            y = np.zeros((16, 24, 24), np.float32)
            y[:, 4:6, 4:6] = 1
            y[:, 10:12, 10:12] = 2
            self._cache_y = y

    trainer = Trainer(cfg)
    hist = trainer.fit_cached(G(), epochs=15)
    assert hist[-1]["loss"] < hist[0]["loss"]
    # input-independent statistics: train-mode forward (dropout off via
    # deterministic rng path) equals the inference forward
    x = np.random.default_rng(1).normal(size=(2, 24, 24, 1)).astype(np.float32)
    infer = trainer.predict(x)
    variables = {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}
    train_mode = trainer.model.apply(
        variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(0)},
        mutable=["batch_stats"])[0]
    # dropout makes them differ; with the same shapes both must be finite
    # probabilities — the REAL check is that no batch_stats exist to diverge
    assert not jax.tree_util.tree_leaves(trainer.state.batch_stats)
    assert np.isfinite(np.asarray(train_mode)).all()
    assert np.isfinite(np.asarray(infer)).all()


def test_named_channel_dices():
    import jax.numpy as jnp
    from cmrtpu.train import losses as L
    y = jnp.zeros((2, 8, 8, 3))
    y = y.at[..., 2].set(1.0)
    # lv = last channel: perfect overlap; myo = ch[-2]: empty (dice -> 1 via smooth)
    assert float(L.dice_coef_lv(y, y)) > 0.99
    assert float(L.dice_coef_myo(y, y)) > 0.99  # both empty -> smooth/smooth
    assert L.dice_coef_upper is L.dice_coef_lv
    assert L.dice_coef_lower is L.dice_coef_myo
    assert float(L.dice_coef_background(y, y)) > 0.99
    # rv = ch[-3] present in 3-channel input
    assert jnp.isfinite(L.dice_coef_rv(y, y))


def test_bn_bf16_checkpoint_interchange_and_numerics():
    """BN_BF16 swaps in BF16BatchNorm with a byte-identical variable tree
    (checkpoints interchange) and matches nn.BatchNorm within bf16 noise."""
    cfg32 = dict(SMALL_CFG, MIXED_PRECISION=True)
    cfg16 = dict(cfg32, BN_BF16=True)
    m32, m16 = build_model(cfg32), build_model(cfg16)
    rng = jax.random.PRNGKey(0)
    v32 = init_variables(m32, cfg32, rng)
    v16 = init_variables(m16, cfg16, rng)
    paths32 = {jax.tree_util.keystr(p): (l.shape, l.dtype)
               for p, l in jax.tree_util.tree_leaves_with_path(v32)}
    paths16 = {jax.tree_util.keystr(p): (l.shape, l.dtype)
               for p, l in jax.tree_util.tree_leaves_with_path(v16)}
    assert paths32 == paths16
    # cross-restore: the f32-BN variables drive the bf16-BN model
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 1))
    out32 = m32.apply(v32, x, train=False)
    out16 = m16.apply(v32, x, train=False)
    np.testing.assert_allclose(np.asarray(out32, np.float32),
                               np.asarray(out16, np.float32), atol=0.03)
    # train mode: running statistics update equivalently (f32 accumulators)
    _, mut32 = m32.apply(v32, x, train=True, rngs={"dropout": rng},
                         mutable=["batch_stats"])
    _, mut16 = m16.apply(v32, x, train=True, rngs={"dropout": rng},
                         mutable=["batch_stats"])
    for a, b in zip(jax.tree_util.tree_leaves(mut32["batch_stats"]),
                    jax.tree_util.tree_leaves(mut16["batch_stats"])):
        assert a.dtype == jnp.float32 and b.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.05, atol=0.02)


def test_partial_remat_is_semantics_preserving():
    """REMAT=<int> remats only the N shallowest levels; outputs and grads
    are bit-equal to the unremat model (rematerialisation changes the
    schedule, not the math)."""
    import optax
    cfg = dict(SMALL_CFG, DEPTH=3, DROPOUT_MIN=0.0, DROPOUT_MAX=0.0)
    base = build_model(cfg)
    part = build_model(dict(cfg, REMAT=1))
    full = build_model(dict(cfg, REMAT=True))
    rng = jax.random.PRNGKey(0)
    v = init_variables(base, cfg, rng)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 1))
    y = (jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 2)) > 0.9
         ).astype(jnp.float32)

    def loss_fn(model):
        def f(params):
            out, _ = model.apply({"params": params,
                                  "batch_stats": v["batch_stats"]},
                                 x, train=True, rngs={"dropout": rng},
                                 mutable=["batch_stats"])
            return jnp.mean(optax.sigmoid_binary_cross_entropy(
                jnp.log(out / (1 - out + 1e-7) + 1e-7), y))
        return jax.jit(jax.value_and_grad(f))(v["params"])

    l0, g0 = loss_fn(base)
    for model in (part, full):
        l1, g1 = loss_fn(model)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)


def test_group_norm_variant_trains():
    """GROUP_NORM=N swaps BatchNorm for batch-independent GroupNorm (the
    stable normalization probe, round-3 verdict #4): no batch_stats
    collection, identical train/eval function, loss decreases."""
    from flax import traverse_util

    from cmrtpu.train.trainer import Trainer

    cfg = dict(SMALL_CFG, GROUP_NORM=4, SEED=0, LEARNING_RATE=1e-3,
               BATCHSIZE=4, MASK_VALUES=[1, 2])
    model = build_model(cfg)
    variables = init_variables(model, cfg, jax.random.PRNGKey(0))
    flat = traverse_util.flatten_dict(variables["params"])
    assert any("GroupNorm_0" in k for k in flat)
    assert not any("BatchNorm_0" in k for k in flat)
    assert not variables.get("batch_stats")

    trainer = Trainer(cfg)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 32, 32)).astype(np.float32)
    y = np.zeros((8, 32, 32), np.float32)
    y[:, 8:12, 8:12] = 1.0
    y[:, 20:24, 20:24] = 2.0

    class _Gen:
        masks = True
    gen = _Gen()
    gen._cache_x, gen._cache_y = x, y
    hist = trainer.fit_cached(gen, epochs=10)
    assert np.isfinite(hist[-1]["loss"])
    assert hist[-1]["loss"] < hist[0]["loss"]


def test_group_norm_groups_divide_channels():
    """GROUP_NORM larger than (or not dividing) the filter count falls back
    to the largest divisor — odd FILTERS configs must still build."""
    cfg = dict(SMALL_CFG, GROUP_NORM=32, FILTERS=6)
    model = build_model(cfg)
    out, _ = _apply(model, cfg)
    assert np.isfinite(np.asarray(out)).all()
