"""Reference keras model.h5 -> flax UNet weight import.

The fixture h5 is built by hand in the exact keras weights-only layout
(root ``layer_names`` attr, per-layer groups with ``weight_names``), with the
layer sequence the reference graph produces (ref: src/models/Unets.py:755-869,
src/models/KerasLayers.py:660-777). Parity is proven two ways:
  1. structural — imported leaves land on the right flax tree nodes;
  2. functional — an independent numpy implementation of the keras graph
     (conv-SAME + relu + BN(eps=1e-3) inference, nearest upsampling, maxpool,
     sigmoid head) agrees with the flax forward on random input.
"""

import os

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from cmrtpu.models.unet import build_model, init_variables
from cmrtpu.train.keras_import import (import_keras_unet_weights,
                                       read_keras_h5_weights)

CFG = {"DIM": [16, 16], "DEPTH": 2, "FILTERS": 4, "MASK_CLASSES": 2,
       "IMG_CHANNELS": 1, "MIXED_PRECISION": False, "ACTIVATION": "relu",
       "BATCH_NORMALISATION": True, "BN_FIRST": False, "USE_UPSAMPLE": True,
       "F_SIZE": [3, 3], "M_POOL": [2, 2], "DROPOUT_MIN": 0.0,
       "DROPOUT_MAX": 0.0}

# the reference 2D U-Net graph at DEPTH=2/FILTERS=4, as keras saves it:
# (layer_name, kind, shape-spec); weightless layers carry empty weight_names
KERAS_LAYERS = [
    ("input_1", None, None),
    # encoder block 0 (filters 4)
    ("conv2d", "conv", (3, 3, 1, 4)),
    ("batch_normalization", "bn", 4),
    ("dropout", None, None),
    ("conv2d_1", "conv", (3, 3, 4, 4)),
    ("batch_normalization_1", "bn", 4),
    ("max_pooling2d", None, None),
    # encoder block 1 (filters 8)
    ("conv2d_2", "conv", (3, 3, 4, 8)),
    ("batch_normalization_2", "bn", 8),
    ("dropout_1", None, None),
    ("conv2d_3", "conv", (3, 3, 8, 8)),
    ("batch_normalization_3", "bn", 8),
    ("max_pooling2d_1", None, None),
    # bottleneck (filters 16)
    ("conv2d_4", "conv", (3, 3, 8, 16)),
    ("batch_normalization_4", "bn", 16),
    ("dropout_2", None, None),
    ("conv2d_5", "conv", (3, 3, 16, 16)),
    ("batch_normalization_5", "bn", 16),
    # decoder block 0 (filters 8): upsample, conv, concat(8+8), conv bn conv bn
    ("up_sampling2d", None, None),
    ("conv2d_6", "conv", (3, 3, 16, 8)),
    ("concatenate", None, None),
    ("conv2d_7", "conv", (3, 3, 16, 8)),
    ("batch_normalization_6", "bn", 8),
    ("dropout_3", None, None),
    ("conv2d_8", "conv", (3, 3, 8, 8)),
    ("batch_normalization_7", "bn", 8),
    # decoder block 1 (filters 4)
    ("up_sampling2d_1", None, None),
    ("conv2d_9", "conv", (3, 3, 8, 4)),
    ("concatenate_1", None, None),
    ("conv2d_10", "conv", (3, 3, 8, 4)),
    ("batch_normalization_8", "bn", 4),
    ("dropout_4", None, None),
    ("conv2d_11", "conv", (3, 3, 4, 4)),
    ("batch_normalization_9", "bn", 4),
    # head, the only explicitly named layer (ref: Unets.py:128)
    ("unet", "conv", (1, 1, 4, 2)),
]


def _write_keras_h5(path, rng):
    """Hand-built keras weights-only h5; returns {layer_name: {leaf: arr}}."""
    stored = {}
    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = np.array([n.encode()
                                           for n, _, _ in KERAS_LAYERS])
        f.attrs["backend"] = b"tensorflow"
        f.attrs["keras_version"] = b"2.3.0"
        for name, kind, spec in KERAS_LAYERS:
            g = f.create_group(name)
            if kind is None:
                g.attrs["weight_names"] = np.array([], dtype="S1")
                continue
            if kind == "conv":
                arrs = {"kernel": rng.normal(0, 0.1, spec).astype(np.float32),
                        "bias": rng.normal(0, 0.02, spec[-1]).astype(np.float32)}
                names = ["kernel", "bias"]
            else:
                c = spec
                arrs = {"gamma": rng.uniform(0.6, 1.4, c).astype(np.float32),
                        "beta": rng.normal(0, 0.05, c).astype(np.float32),
                        "moving_mean": rng.normal(0, 0.1, c).astype(np.float32),
                        "moving_variance": rng.uniform(0.5, 1.5, c).astype(np.float32)}
                names = ["gamma", "beta", "moving_mean", "moving_variance"]
            g.attrs["weight_names"] = np.array(
                [f"{name}/{w}:0".encode() for w in names])
            for w in names:
                g.create_dataset(f"{name}/{w}:0", data=arrs[w])
            stored[name] = arrs
    return stored


# ---------------------------------------------------------------------------
# independent numpy forward with keras semantics
# ---------------------------------------------------------------------------

def _conv_same(x, k, b):
    kh, kw, _, co = k.shape
    ph, pw = kh // 2, kw // 2
    xp = np.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    h, w = x.shape[1:3]
    out = np.zeros((x.shape[0], h, w, co), np.float64)
    for dy in range(kh):
        for dx in range(kw):
            out += np.einsum("bhwc,co->bhwo",
                             xp[:, dy:dy + h, dx:dx + w, :], k[dy, dx])
    return out + b


def _bn(x, p, eps=1e-3):
    return (p["gamma"] * (x - p["moving_mean"])
            / np.sqrt(p["moving_variance"] + eps) + p["beta"])


def _relu(x):
    return np.maximum(x, 0.0)


def _maxpool2(x):
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))


def _upsample2(x):
    return np.repeat(np.repeat(x, 2, axis=1), 2, axis=2)


def _numpy_forward(x, W):
    def cb(x, conv, bn):  # conv(+relu) then BN  (bn_first=False)
        return _bn(_relu(_conv_same(x, W[conv]["kernel"], W[conv]["bias"])),
                   W[bn])

    c = cb(x, "conv2d", "batch_normalization")
    s0 = cb(c, "conv2d_1", "batch_normalization_1")
    p = _maxpool2(s0)
    c = cb(p, "conv2d_2", "batch_normalization_2")
    s1 = cb(c, "conv2d_3", "batch_normalization_3")
    p = _maxpool2(s1)
    c = cb(p, "conv2d_4", "batch_normalization_4")
    c = cb(c, "conv2d_5", "batch_normalization_5")
    u = _relu(_conv_same(_upsample2(c), W["conv2d_6"]["kernel"],
                         W["conv2d_6"]["bias"]))
    c = np.concatenate([u, s1], axis=-1)
    c = cb(c, "conv2d_7", "batch_normalization_6")
    c = cb(c, "conv2d_8", "batch_normalization_7")
    u = _relu(_conv_same(_upsample2(c), W["conv2d_9"]["kernel"],
                         W["conv2d_9"]["bias"]))
    c = np.concatenate([u, s0], axis=-1)
    c = cb(c, "conv2d_10", "batch_normalization_8")
    c = cb(c, "conv2d_11", "batch_normalization_9")
    logits = _conv_same(c, W["unet"]["kernel"], W["unet"]["bias"])
    return 1.0 / (1.0 + np.exp(-logits))


@pytest.fixture
def fixture_h5(tmp_path):
    rng = np.random.default_rng(3)
    path = str(tmp_path / "model.h5")
    stored = _write_keras_h5(path, rng)
    return path, stored


def test_read_keras_h5_weights(fixture_h5):
    path, stored = fixture_h5
    layers = read_keras_h5_weights(path)
    # only weighted layers, in stored order
    expected = [n for n, kind, _ in KERAS_LAYERS if kind is not None]
    assert [n for n, _ in layers] == expected
    name, weights = layers[0]
    assert name == "conv2d"
    np.testing.assert_array_equal(weights[0][1], stored["conv2d"]["kernel"])


def test_import_lands_on_right_flax_nodes(fixture_h5):
    import jax
    path, stored = fixture_h5
    model = build_model(CFG)
    variables = init_variables(model, CFG, jax.random.PRNGKey(0))
    out = import_keras_unet_weights(variables, path, CFG)
    p, bs = out["params"], out["batch_stats"]

    np.testing.assert_array_equal(
        p["DownBlock_0"]["ConvBlock_0"]["Conv_0"]["kernel"],
        stored["conv2d"]["kernel"])
    np.testing.assert_array_equal(
        p["DownBlock_1"]["ConvBlock_1"]["Conv_0"]["bias"],
        stored["conv2d_3"]["bias"])
    np.testing.assert_array_equal(
        p["ConvBlock_1"]["Conv_0"]["kernel"], stored["conv2d_5"]["kernel"])
    np.testing.assert_array_equal(
        p["UpBlock_0"]["Conv_0"]["kernel"], stored["conv2d_6"]["kernel"])
    np.testing.assert_array_equal(
        p["UpBlock_1"]["ConvBlock_1"]["BatchNorm_0"]["scale"],
        stored["batch_normalization_9"]["gamma"])
    np.testing.assert_array_equal(
        bs["UpBlock_1"]["ConvBlock_1"]["BatchNorm_0"]["var"],
        stored["batch_normalization_9"]["moving_variance"])
    np.testing.assert_array_equal(p["head"]["kernel"], stored["unet"]["kernel"])


def test_forward_matches_independent_numpy_reference(fixture_h5):
    import jax
    path, stored = fixture_h5
    model = build_model(CFG)
    variables = init_variables(model, CFG, jax.random.PRNGKey(0))
    out = import_keras_unet_weights(variables, path, CFG)

    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 16, 16, 1)).astype(np.float32)
    got = np.asarray(model.apply(
        {"params": out["params"], "batch_stats": out["batch_stats"]},
        x, train=False))
    want = _numpy_forward(x.astype(np.float64), stored)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_config_mismatch_raises(fixture_h5):
    import jax
    path, _ = fixture_h5
    bad = dict(CFG, DEPTH=3)
    model = build_model(bad)
    variables = init_variables(model, bad, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="mismatch"):
        import_keras_unet_weights(variables, path, bad)


def test_predictor_restores_from_reference_h5_dir(fixture_h5, tmp_path):
    """A model dir holding only the reference's model.h5 is directly usable
    by the inference stack (ModelUtils fallback-chain parity)."""
    import shutil
    from cmrtpu.predict.predictor import Predictor
    path, stored = fixture_h5
    model_dir = tmp_path / "model"
    model_dir.mkdir()
    shutil.copy(path, model_dir / "model.h5")
    pred = Predictor(dict(CFG, BATCHSIZE=2), model_path=str(model_dir))
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 16, 16, 1)).astype(np.float32)
    got = pred.predict(x)
    want = _numpy_forward(x.astype(np.float64), stored)
    np.testing.assert_allclose(got, want, atol=2e-5)


# ---------------------------------------------------------------------------
# transpose-conv decoder variant (USE_UPSAMPLE=False)
# ---------------------------------------------------------------------------

CFG_T = dict(CFG, USE_UPSAMPLE=False)

KERAS_LAYERS_T = (
    KERAS_LAYERS[:18]  # input through bottleneck bn_5 (identical)
    + [
        ("conv2d_transpose", "convT", (3, 3, 8, 16)),   # (kh,kw,out,in)
        ("concatenate", None, None),
        ("conv2d_6", "conv", (3, 3, 16, 8)),
        ("batch_normalization_6", "bn", 8),
        ("dropout_3", None, None),
        ("conv2d_7", "conv", (3, 3, 8, 8)),
        ("batch_normalization_7", "bn", 8),
        ("conv2d_transpose_1", "convT", (3, 3, 4, 8)),
        ("concatenate_1", None, None),
        ("conv2d_8", "conv", (3, 3, 8, 4)),
        ("batch_normalization_8", "bn", 4),
        ("dropout_4", None, None),
        ("conv2d_9", "conv", (3, 3, 4, 4)),
        ("batch_normalization_9", "bn", 4),
        ("unet", "conv", (1, 1, 4, 2)),
    ])


def _write_keras_h5_layers(path, rng, layers):
    stored = {}
    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = np.array([n.encode() for n, _, _ in layers])
        for name, kind, spec in layers:
            g = f.create_group(name)
            if kind is None:
                g.attrs["weight_names"] = np.array([], dtype="S1")
                continue
            if kind in ("conv", "convT"):
                arrs = {"kernel": rng.normal(0, 0.1, spec).astype(np.float32),
                        "bias": rng.normal(0, 0.02, spec[-2 if kind == "convT"
                                                         else -1]
                                           ).astype(np.float32)}
                names = ["kernel", "bias"]
            else:
                c = spec
                arrs = {"gamma": rng.uniform(0.6, 1.4, c).astype(np.float32),
                        "beta": rng.normal(0, 0.05, c).astype(np.float32),
                        "moving_mean": rng.normal(0, 0.1, c).astype(np.float32),
                        "moving_variance": rng.uniform(0.5, 1.5, c).astype(np.float32)}
                names = ["gamma", "beta", "moving_mean", "moving_variance"]
            g.attrs["weight_names"] = np.array(
                [f"{name}/{w}:0".encode() for w in names])
            for w in names:
                g.create_dataset(f"{name}/{w}:0", data=arrs[w])
            stored[name] = arrs
    return stored


def _tf_conv_transpose(y, w_keras, b, stride=2):
    """TF-definition transpose conv: the vjp of a SAME strided conv whose
    HWIO kernel IS the keras [kh, kw, out, in] transpose kernel."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    y = jnp.asarray(y, jnp.float32)
    wk = jnp.asarray(w_keras, jnp.float32)
    bsz, h, w_dim, _ = y.shape
    c_out = wk.shape[2]

    def fwd(x):
        return lax.conv_general_dilated(
            x, wk, window_strides=(stride, stride), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    _, vjp = jax.vjp(fwd, jnp.zeros((bsz, h * stride, w_dim * stride, c_out),
                                    jnp.float32))
    return np.asarray(vjp(y)[0]) + b


def _numpy_forward_transpose(x, W):
    def cb(x, conv, bn):
        return _bn(_relu(_conv_same(x, W[conv]["kernel"], W[conv]["bias"])),
                   W[bn])

    c = cb(x, "conv2d", "batch_normalization")
    s0 = cb(c, "conv2d_1", "batch_normalization_1")
    p = _maxpool2(s0)
    c = cb(p, "conv2d_2", "batch_normalization_2")
    s1 = cb(c, "conv2d_3", "batch_normalization_3")
    p = _maxpool2(s1)
    c = cb(p, "conv2d_4", "batch_normalization_4")
    c = cb(c, "conv2d_5", "batch_normalization_5")
    u = _relu(_tf_conv_transpose(c, W["conv2d_transpose"]["kernel"],
                                 W["conv2d_transpose"]["bias"]))
    c = np.concatenate([u, s1], axis=-1)
    c = cb(c, "conv2d_6", "batch_normalization_6")
    c = cb(c, "conv2d_7", "batch_normalization_7")
    u = _relu(_tf_conv_transpose(c, W["conv2d_transpose_1"]["kernel"],
                                 W["conv2d_transpose_1"]["bias"]))
    c = np.concatenate([u, s0], axis=-1)
    c = cb(c, "conv2d_8", "batch_normalization_8")
    c = cb(c, "conv2d_9", "batch_normalization_9")
    logits = _conv_same(c, W["unet"]["kernel"], W["unet"]["bias"])
    return 1.0 / (1.0 + np.exp(-logits))


def test_transpose_decoder_forward_matches_tf_semantics(tmp_path):
    """USE_UPSAMPLE=False import: keras Conv2DTranspose kernels must be
    spatially flipped AND channel-swapped for flax's ConvTranspose
    (transpose_kernel=False) to reproduce the TF gradient-of-conv result —
    a channel swap alone silently applies 180-degree-rotated kernels."""
    import jax
    rng = np.random.default_rng(13)
    path = str(tmp_path / "model_t.h5")
    stored = _write_keras_h5_layers(path, rng, KERAS_LAYERS_T)

    model = build_model(CFG_T)
    variables = init_variables(model, CFG_T, jax.random.PRNGKey(0))
    out = import_keras_unet_weights(variables, path, CFG_T)

    x = rng.normal(size=(2, 16, 16, 1)).astype(np.float32)
    got = np.asarray(model.apply(
        {"params": out["params"], "batch_stats": out["batch_stats"]},
        x, train=False))
    want = _numpy_forward_transpose(x.astype(np.float64), stored)
    np.testing.assert_allclose(got, want, atol=2e-5)
