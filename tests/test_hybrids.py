"""Hybrid 2D-in-3D model family + reusable layers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmrtpu.models import layers as KL
from cmrtpu.models.hybrids import build_hybrid_model, get_model
from cmrtpu.models.unet import build_model

CFG_3D = {"DIM": [4, 32, 32], "F_SIZE": [3, 3, 3], "M_POOL": [1, 2, 2],
          "DEPTH": 2, "FILTERS": 4, "MASK_CLASSES": 3, "IMG_CHANNELS": 1,
          "MIXED_PRECISION": False, "BATCH_NORMALISATION": True}


def _init_and_apply(model, x, train=False):
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, x, train=False)
    out = model.apply(variables, x, train=train,
                      rngs={"dropout": rng} if train else None,
                      mutable=["batch_stats"] if train else False)
    return out[0] if train else out


@pytest.mark.parametrize("variant,channels", [
    ("wrapper", 3), ("followed", 3), ("concat", 3), ("avg", 3), ("avg_plain", 3),
])
def test_hybrid_variants_shapes(variant, channels):
    model = build_hybrid_model(CFG_3D, variant=variant)
    x = jnp.zeros((2, 4, 32, 32, 1), jnp.float32)
    out = _init_and_apply(model, x)
    assert out.shape == (2, 4, 32, 32, channels)
    assert np.all(np.isfinite(np.asarray(out)))


def test_hybrid_softmax_head_normalised():
    model = build_hybrid_model(CFG_3D, variant="followed")
    x = jnp.ones((1, 4, 32, 32, 1), jnp.float32)
    out = np.asarray(_init_and_apply(model, x))
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-5)


def test_avg_plain_is_mean_of_probabilities():
    model = build_hybrid_model(CFG_3D, variant="avg_plain")
    x = jnp.ones((1, 4, 32, 32, 1), jnp.float32)
    out = np.asarray(_init_and_apply(model, x))
    # average of two softmaxes still sums to 1
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-5)


def test_slice_distributed_equals_per_slice_2d():
    """Folding z into batch must match forwarding each slice separately."""
    cfg2d = dict(CFG_3D, DIM=[32, 32], F_SIZE=[3, 3], M_POOL=[2, 2])
    unet2d = build_model(cfg2d)
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (2, 4, 32, 32, 1))
    v2d = unet2d.init({"params": rng, "dropout": rng},
                      x[:, 0], train=False)
    per_slice = jnp.stack([unet2d.apply(v2d, x[:, z], train=False)
                           for z in range(4)], axis=1)
    folded = unet2d.apply(v2d, x.reshape(8, 32, 32, 1), train=False)
    folded = folded.reshape(2, 4, 32, 32, -1)
    np.testing.assert_allclose(np.asarray(per_slice), np.asarray(folded),
                               atol=2e-5)


def test_get_model_dispatch():
    cfg2d = {"DIM": [32, 32], "DEPTH": 2, "FILTERS": 4, "MASK_CLASSES": 2}
    assert type(get_model(cfg2d)).__name__ == "UNet"
    assert type(get_model(dict(CFG_3D, MODEL_VARIANT="avg"))).__name__ == "Avg2D3D"


def test_hybrid_train_step_runs():
    """One gradient step through the stacked model (BN + dropout active)."""
    import optax
    model = build_hybrid_model(CFG_3D, variant="concat")
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 4, 32, 32, 1))
    y = jax.nn.one_hot(jnp.zeros((2, 4, 32, 32), jnp.int32), 3)
    variables = model.init({"params": rng, "dropout": rng}, x, train=False)
    opt = optax.adam(1e-3)
    opt_state = opt.init(variables["params"])

    def loss_fn(params):
        out, mut = model.apply({"params": params,
                                "batch_stats": variables["batch_stats"]},
                               x, train=True, rngs={"dropout": rng},
                               mutable=["batch_stats"])
        return -jnp.mean(jnp.sum(y * jnp.log(out + 1e-7), axis=-1))

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    updates, _ = opt.update(grads, opt_state, variables["params"])
    assert np.isfinite(float(loss))
    norms = [float(jnp.linalg.norm(g)) for g in jax.tree_util.tree_leaves(grads)]
    assert any(n > 0 for n in norms)


# ---------------------------------------------------------------------------
# layers
# ---------------------------------------------------------------------------

def test_upsample_3d_interpol_shapes_and_bilinear():
    x = jnp.arange(2 * 3 * 4 * 4 * 1, dtype=jnp.float32).reshape(2, 3, 4, 4, 1)
    up = KL.upsample_3d_interpol(x, size=(1, 2, 2))
    assert up.shape == (2, 3, 8, 8, 1)
    # bilinear must preserve the global mean approximately
    np.testing.assert_allclose(float(up.mean()), float(x.mean()), rtol=0.05)
    up_z = KL.upsample_3d_interpol(x, size=(2, 1, 1))
    assert up_z.shape == (2, 6, 4, 4, 1)
    np.testing.assert_array_equal(np.asarray(up_z[:, 0]), np.asarray(up_z[:, 1]))


def test_euler_to_affine_identity():
    theta = jnp.zeros((2, 6))
    m = np.asarray(KL.euler_to_affine_matrix(theta)).reshape(2, 3, 4)
    np.testing.assert_allclose(m[:, :, :3], np.tile(np.eye(3), (2, 1, 1)),
                               atol=1e-6)
    np.testing.assert_allclose(m[:, :, 3], 0.0, atol=1e-6)


def test_euler_matrix_matches_numpy_reference():
    angles = np.array([0.3, -0.2, 0.5])
    theta = jnp.array([[*angles, 1.0, 2.0, 3.0]])
    m = np.asarray(KL.euler_to_affine_matrix(theta)).reshape(3, 4)
    rot_np = KL.euler_angles_to_rotation_matrix(angles)
    # the jax layer uses the transposed (row-vector) convention of the
    # reference keras layer; |det| and orthogonality must match
    np.testing.assert_allclose(abs(np.linalg.det(m[:, :3])), 1.0, atol=1e-5)
    np.testing.assert_allclose(abs(np.linalg.det(rot_np)), 1.0, atol=1e-10)
    np.testing.assert_allclose(m[:, 3], [1.0, 2.0, 3.0], atol=1e-6)


def test_invert_affine_matrix_roundtrip():
    theta = jnp.array([[0.3, -0.1, 0.7, 5.0, -2.0, 1.0]])
    m = KL.euler_to_affine_matrix(theta)
    minv = KL.invert_affine_matrix(m)
    a = np.asarray(m).reshape(3, 4)
    b = np.asarray(minv).reshape(3, 4)
    prod = np.concatenate([a, [[0, 0, 0, 1]]]) @ np.concatenate([b, [[0, 0, 0, 1]]])
    np.testing.assert_allclose(prod, np.eye(4), atol=1e-4)


def test_affine_matrix_inverter_numpy():
    m = np.array([1.0, 0, 0, 2.0, 0, 1.0, 0, -3.0, 0, 0, 1.0, 0.5])
    inv = KL.affine_matrix_inverter(m)
    np.testing.assert_allclose(inv.reshape(3, 4)[:, 3], [-2.0, 3.0, -0.5])


def test_scale_layer():
    layer = KL.ScaleLayer()
    x = jnp.ones((2, 3))
    variables = layer.init(jax.random.PRNGKey(0), x)
    out = layer.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out), 1.0)
    assert variables["params"]["scale"].shape == ()


def test_unet_wrapper_resizes_inplane():
    cfg2d = {"DIM": [32, 32], "DEPTH": 2, "FILTERS": 4, "MASK_CLASSES": 2,
             "MIXED_PRECISION": False}
    unet2d = build_model(cfg2d)
    wrapper = KL.UnetWrapper(unet=unet2d, unet_inplane=(32, 32), resize=True)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 3, 48, 40, 1))  # odd in-plane size
    variables = wrapper.init({"params": rng, "dropout": rng}, x, train=False)
    out = wrapper.apply(variables, x, train=False)
    assert out.shape == (1, 3, 48, 40, 2)


def test_as_2d_config_with_default_fsize():
    """3D DIM with defaulted (2D) F_SIZE/M_POOL must not produce rank-1
    kernels for the 2D sub-net."""
    from cmrtpu.models.hybrids import _as_2d_config
    cfg = _as_2d_config({"DIM": [16, 64, 64]})
    assert cfg["F_SIZE"] == [3, 3]
    assert cfg["M_POOL"] in ([2, 2], [1, 2][-2:])  # 2D-shaped either way
    cfg3 = _as_2d_config({"DIM": [16, 64, 64], "F_SIZE": [3, 3, 3],
                          "M_POOL": [1, 2, 2]})
    assert cfg3["F_SIZE"] == [3, 3] and cfg3["M_POOL"] == [2, 2]


def test_model_summary_works_for_hybrids():
    import jax
    from cmrtpu.models.unet import model_summary
    model = build_hybrid_model(CFG_3D, variant="avg")
    x = jnp.zeros((1, 4, 32, 32, 1), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    summary = model_summary(model, variables)
    assert "Avg2D3D" in summary
    assert "Trainable params" in summary


def test_hybrid_restores_through_predictor(tmp_path):
    """A fold trained with MODEL_VARIANT must restore for inference: the
    Predictor rebuilds via get_model (the reference's predict path only ever
    rebuilt the plain U-Net, so hybrid folds could not be predicted)."""
    import numpy as np
    from cmrtpu.predict.predictor import Predictor
    from cmrtpu.train import checkpoint as ckpt
    from cmrtpu.train.trainer import Trainer

    cfg = {"DIM": [4, 16, 16], "DEPTH": 1, "FILTERS": 2, "MASK_CLASSES": 2,
           "M_POOL": [1, 2, 2], "F_SIZE": [3, 3, 3], "IMG_CHANNELS": 1,
           "BATCHSIZE": 2, "LEARNING_RATE": 1e-3, "MIXED_PRECISION": False,
           "SEED": 0, "MODEL_VARIANT": "wrapper"}
    trainer = Trainer(cfg)
    model_dir = str(tmp_path / "model")
    ckpt.save_weights(model_dir, trainer.state.params, trainer.state.batch_stats)

    predictor = Predictor(dict(cfg, MODEL_PATH=model_dir))
    x = np.random.default_rng(0).normal(size=(2, 4, 16, 16, 1)).astype(np.float32)
    preds = predictor.predict(x)
    np.testing.assert_allclose(preds, np.asarray(trainer.predict(x)), atol=1e-5)
