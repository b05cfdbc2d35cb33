"""Differential parity against the reference's ACTUAL model math (TF/keras).

Every other parity test in this suite checks the rebuild against itself
(structural parity + oracles re-derived from specs). This file closes the
loop with TensorFlow head-to-heads:

* a faithful tf_keras (Keras 2, the reference-era API) twin of
  ``create_unet`` (ref: src/models/Unets.py:61-133, functional blocks
  src/models/KerasLayers.py:660-777) is built FRESH with current APIs,
  its really-saved legacy ``model.h5`` is imported through
  ``cmrtpu.train.keras_import`` and the flax forward is pinned against the
  TF forward on random batches — weights, BN statistics, padding, upsampling
  and transpose-conv semantics all have to line up for this to pass;
* ``BceDiceLoss`` / dice metrics are pinned against the TF implementations
  (ref: src/models/Loss_and_metrics.py:165-226) on random tensors.

The TF twins are written from the reference's structure, not copied: Keras 2
layer calls, same layer creation order, same defaults (BN momentum 0.99 /
eps 1e-3, nearest-neighbour UpSampling, he_normal init).
"""

import numpy as np
import pytest

import cmrtpu.config as C

tf = pytest.importorskip("tensorflow")
keras = pytest.importorskip("tf_keras")  # legacy Keras 2: writes the
# reference-era layer_names h5 format that keras_import consumes


def _linspace_dropouts(config):
    depth = C.get(config, "DEPTH")
    lo = C.get(config, "DROPOUT_MIN")
    hi = C.get(config, "DROPOUT_MAX")
    return [round(v, 1) for v in np.linspace(lo, hi, depth)]


def _tf_conv_block(x, filters, cfg):
    """conv [+BN] with the reference's ordering switch
    (ref: conv_layer_fn, src/models/KerasLayers.py:660-693)."""
    ndims = len(C.get(cfg, "DIM"))
    Conv = getattr(keras.layers, f"Conv{ndims}D")
    f_size = tuple(C.get(cfg, "F_SIZE"))[-ndims:]
    act = C.get(cfg, "ACTIVATION")
    bn = C.get(cfg, "BATCH_NORMALISATION")
    if C.get(cfg, "BN_FIRST"):
        x = Conv(filters, f_size, padding=C.get(cfg, "PAD"),
                 kernel_initializer=C.get(cfg, "KERNEL_INIT"))(x)
        if bn:
            x = keras.layers.BatchNormalization(axis=-1)(x)
        x = keras.layers.Activation(act)(x)
    else:
        x = Conv(filters, f_size, activation=act,
                 padding=C.get(cfg, "PAD"),
                 kernel_initializer=C.get(cfg, "KERNEL_INIT"))(x)
        if bn:
            x = keras.layers.BatchNormalization(axis=-1)(x)
    return x


def build_tf_twin(config):
    """The reference U-Net graph in tf_keras (ref: unet, Unets.py:755-833 +
    create_unet head, Unets.py:128)."""
    cfg = C.normalise_config(config)
    ndims = len(C.get(cfg, "DIM"))
    m_pool = tuple(C.get(cfg, "M_POOL"))[-ndims:]
    f_size = tuple(C.get(cfg, "F_SIZE"))[-ndims:]
    depth = C.get(cfg, "DEPTH")
    act = C.get(cfg, "ACTIVATION")
    Pool = getattr(keras.layers, f"MaxPooling{ndims}D")
    Conv = getattr(keras.layers, f"Conv{ndims}D")
    dropouts = _linspace_dropouts(cfg)

    inputs = keras.layers.Input(
        (*C.get(cfg, "DIM"), C.get(cfg, "IMG_CHANNELS")))
    x = inputs
    filters = C.get(cfg, "FILTERS")
    skips = []
    for level in range(depth):
        x = _tf_conv_block(x, filters, cfg)
        x = keras.layers.Dropout(dropouts[level])(x)
        skip = _tf_conv_block(x, filters, cfg)
        skips.append(skip)
        x = Pool(m_pool)(skip)
        filters *= 2
    x = _tf_conv_block(x, filters, cfg)
    x = keras.layers.Dropout(C.get(cfg, "DROPOUT_MAX"))(x)
    x = _tf_conv_block(x, filters, cfg)
    up_drops = list(dropouts)
    for _ in range(depth):
        filters //= 2
        if C.get(cfg, "USE_UPSAMPLE"):
            Up = getattr(keras.layers, f"UpSampling{ndims}D")
            x = Up(size=m_pool)(x)
            x = Conv(filters, f_size, activation=act,
                     padding=C.get(cfg, "PAD"),
                     kernel_initializer=C.get(cfg, "KERNEL_INIT"))(x)
        else:
            ConvT = getattr(keras.layers, f"Conv{ndims}DTranspose")
            x = ConvT(filters, f_size, strides=m_pool, activation=act,
                      padding=C.get(cfg, "PAD"),
                      kernel_initializer=C.get(cfg, "KERNEL_INIT"))(x)
        x = keras.layers.Concatenate(axis=-1)([x, skips.pop()])
        x = _tf_conv_block(x, filters, cfg)
        x = keras.layers.Dropout(up_drops.pop())(x)
        x = _tf_conv_block(x, filters, cfg)
    outputs = Conv(C.get(cfg, "MASK_CLASSES"), (1,) * ndims,
                   activation="sigmoid", name="unet")(x)
    return keras.Model(inputs=[inputs], outputs=[outputs])


BASE_CFG = {"DIM": [48, 48], "DEPTH": 2, "FILTERS": 8, "MASK_CLASSES": 2,
            "IMG_CHANNELS": 1, "BATCH_NORMALISATION": True, "BN_FIRST": False,
            "USE_UPSAMPLE": True, "ACTIVATION": "relu",
            "MIXED_PRECISION": False, "SEED": 0}


@pytest.mark.parametrize("overrides", [
    {},                                                  # upsample decoder
    {"USE_UPSAMPLE": False},                             # transpose decoder
    {"BN_FIRST": True},                                  # conv-BN-act order
    {"BATCH_NORMALISATION": False, "ACTIVATION": "elu"}, # no BN, elu
], ids=["upsample", "transpose", "bn_first", "nobn_elu"])
def test_forward_parity_with_real_tf_model(tmp_path, overrides):
    """Same weights (via a really-saved keras h5) => same forward, f32."""
    import jax

    from cmrtpu.models.unet import build_model, init_variables
    from cmrtpu.train.keras_import import import_keras_unet_weights

    cfg = C.normalise_config(dict(BASE_CFG, **overrides))
    keras.backend.clear_session()
    tf.random.set_seed(0)
    tf_model = build_tf_twin(cfg)

    rng = np.random.default_rng(42)
    # drive BN moving statistics away from their (0, 1) init so the
    # inference-mode comparison actually exercises the imported statistics
    if C.get(cfg, "BATCH_NORMALISATION"):
        for _ in range(3):
            tf_model(rng.normal(size=(4, 48, 48, 1)).astype(np.float32),
                     training=True)

    h5 = str(tmp_path / "model.h5")
    tf_model.save_weights(h5)

    model = build_model(cfg)
    variables = init_variables(model, cfg, jax.random.key(0))
    variables = import_keras_unet_weights(variables, h5, cfg)

    x = rng.normal(size=(2, 48, 48, 1)).astype(np.float32)
    want = np.asarray(tf_model(x, training=False), np.float64)
    got = np.asarray(model.apply(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})},
        x, train=False), np.float64)
    assert got.shape == want.shape
    delta = np.abs(got - want).max()
    assert delta < 1e-4, f"forward max|flax-tf| = {delta}"


def _tf_dice(y_true, y_pred):
    """Soft dice, smooth=1, fully flattened (ref: Loss_and_metrics.py:165)."""
    yt = tf.reshape(tf.cast(y_true, tf.float32), [-1])
    yp = tf.reshape(tf.cast(y_pred, tf.float32), [-1])
    inter = tf.reduce_sum(yt * yp)
    return (2.0 * inter + 1.0) / (tf.reduce_sum(yt) + tf.reduce_sum(yp) + 1.0)


def _rand_probs(shape, seed):
    rng = np.random.default_rng(seed)
    y_true = (rng.random(shape) > 0.8).astype(np.float32)
    y_pred = rng.random(shape).astype(np.float32)
    return y_true, y_pred


@pytest.mark.parametrize("channels", [2, 3, 4])
def test_bce_dice_loss_matches_tf(channels):
    """BceDiceLoss = w*BCE - w*Dice with background sliced off at 4 channels
    (ref: Loss_and_metrics.py:208-226). The keras loss returns the
    per-position BCE map minus the scalar dice; model.fit reduces it by
    mean — compare against the rebuild's scalar."""
    from cmrtpu.train import losses

    y_true, y_pred = _rand_probs((3, 16, 16, channels), seed=channels)
    for w_bce, w_dice in ((1.0, 1.0), (0.5, 1.0), (2.0, 0.3)):
        yt, yp = y_true, y_pred
        if channels == 4:
            yt, yp = yt[..., -3:], yp[..., -3:]
        tf_map = (tf.cast(keras.losses.binary_crossentropy(yt, yp),
                          tf.float32) * w_bce
                  - _tf_dice(yt, yp) * w_dice)
        want = float(tf.reduce_mean(tf_map))
        got = float(losses.bce_dice_loss(y_true, y_pred,
                                         w_bce=w_bce, w_dice=w_dice))
        assert got == pytest.approx(want, abs=2e-6), (
            f"channels={channels} w=({w_bce},{w_dice})")


def test_binary_crossentropy_matches_keras_clipping():
    """Keras BCE clips probabilities to [eps, 1-eps] (eps=1e-7) and means
    over the channel axis — including at the exact 0/1 boundaries."""
    from cmrtpu.train import losses

    y_true = np.array([[0.0, 1.0, 1.0, 0.0]], np.float32)
    y_pred = np.array([[0.0, 1.0, 0.0, 1.0]], np.float32)  # boundary probs
    want = np.asarray(keras.losses.binary_crossentropy(y_true, y_pred),
                      np.float64)
    got = np.asarray(losses.binary_crossentropy(y_true, y_pred), np.float64)
    np.testing.assert_allclose(got, want, rtol=1e-5)

    y_true, y_pred = _rand_probs((5, 7, 3), seed=9)
    want = np.asarray(keras.losses.binary_crossentropy(y_true, y_pred),
                      np.float64)
    got = np.asarray(losses.binary_crossentropy(y_true, y_pred), np.float64)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_per_channel_dice_metrics_match_tf():
    """lv=ch[-1], myo=ch[-2], rv=ch[-3], labels=ch[-3:], dice over flattened
    tensors (ref: Loss_and_metrics.py:129-171)."""
    from cmrtpu.train import losses

    y_true, y_pred = _rand_probs((2, 8, 8, 3), seed=5)
    pairs = [
        (losses.dice_coef, _tf_dice(y_true, y_pred)),
        (losses.dice_coef_lv, _tf_dice(y_true[..., -1], y_pred[..., -1])),
        (losses.dice_coef_myo, _tf_dice(y_true[..., -2], y_pred[..., -2])),
        (losses.dice_coef_rv, _tf_dice(y_true[..., -3], y_pred[..., -3])),
        (losses.dice_coef_labels,
         _tf_dice(y_true[..., -3:], y_pred[..., -3:])),
    ]
    for fn, want in pairs:
        assert float(fn(y_true, y_pred)) == pytest.approx(
            float(want), abs=1e-6), fn.__name__


def test_dice_coef_squared_matches_tf():
    from cmrtpu.train import losses

    y_true, y_pred = _rand_probs((2, 8, 8, 2), seed=11)
    yt = tf.reshape(tf.cast(y_true, tf.float32), [-1])
    yp = tf.reshape(tf.cast(y_pred, tf.float32), [-1])
    want = (2.0 * tf.reduce_sum(yt * yp) + 1.0) / (
        tf.reduce_sum(tf.square(yt)) + tf.reduce_sum(tf.square(yp)) + 1.0)
    got = float(losses.dice_coef_squared(y_true, y_pred))
    assert got == pytest.approx(float(want), abs=1e-6)
