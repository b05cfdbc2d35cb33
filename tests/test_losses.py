"""Loss/metric parity tests vs hand-computed values."""

import jax.numpy as jnp
import numpy as np
import pytest

from cmrtpu.train import losses as L


def test_dice_perfect_and_empty():
    y = jnp.ones((2, 4, 4, 2))
    assert float(L.dice_coef(y, y)) == pytest.approx(1.0, rel=1e-5)
    z = jnp.zeros((2, 4, 4, 2))
    # empty-empty with smooth=1 -> (0+1)/(0+1) = 1
    assert float(L.dice_coef(z, z)) == pytest.approx(1.0)
    # full vs empty: (0+1)/(64+0+1)
    assert float(L.dice_coef(y, z)) == pytest.approx(1.0 / 65.0, rel=1e-5)


def test_dice_hand_value():
    yt = jnp.array([1.0, 1.0, 0.0, 0.0])
    yp = jnp.array([1.0, 0.0, 1.0, 0.0])
    # (2*1+1)/(2+2+1) = 3/5
    assert float(L.dice_coef(yt, yp)) == pytest.approx(0.6)


def test_bce_matches_manual():
    yt = jnp.array([[1.0, 0.0]])
    yp = jnp.array([[0.8, 0.3]])
    manual = -(np.log(0.8) + np.log(0.7)) / 2
    assert float(L.binary_crossentropy(yt, yp)[0]) == pytest.approx(manual, rel=1e-4)


def test_bce_dice_loss_scalar_and_direction():
    yt = jnp.zeros((2, 8, 8, 2)).at[:, 2:6, 2:6, 0].set(1.0)
    good = yt * 0.95 + 0.02
    bad = (1.0 - yt) * 0.95 + 0.02
    l_good = float(L.bce_dice_loss(yt, good))
    l_bad = float(L.bce_dice_loss(yt, bad))
    assert l_good < l_bad
    assert np.ndim(l_good) == 0


def test_bce_dice_slices_background_for_4ch():
    yt4 = jnp.zeros((1, 4, 4, 4)).at[..., 0].set(1.0)  # background only
    yp4 = jnp.zeros((1, 4, 4, 4)) + 0.5
    yt3, yp3 = yt4[..., -3:], yp4[..., -3:]
    assert float(L.bce_dice_loss(yt4, yp4)) == pytest.approx(
        float(jnp.mean(L.binary_crossentropy(yt3, yp3)) - L.dice_coef(yt3, yp3)),
        rel=1e-6)


def test_channel_metrics_from_back():
    yt = jnp.zeros((1, 4, 4, 2)).at[..., 1].set(1.0)
    yp = yt
    assert float(L.dice_coef_channel(yt, yp, -1)) == pytest.approx(1.0)
    # channel -3 is absent for 2-class configs -> NaN-guarded (quirk fix)
    assert np.isnan(float(L.dice_coef_channel(yt, yp, -3)))


def test_default_metrics_for_2_classes():
    metrics = L.default_metrics(2)
    assert "dice_coef_labels" in metrics and "dice_coef_lv" in metrics
    assert "dice_coef_rv" not in metrics  # third channel absent


def test_dice_numpy_hard():
    a = np.zeros((4, 4), bool)
    b = np.zeros((4, 4), bool)
    a[:2] = True
    b[1:3] = True
    assert L.dice_numpy(a, b) == pytest.approx(2 * 4 / 16)
    assert L.dice_numpy(np.zeros((2, 2)), np.zeros((2, 2))) == 1.0


def test_get_loss_accepts_misspelling():
    assert L.get_loss({"LOSS_FUNCTION": "BcdDiceLoss"}) is L.bce_dice_loss
    assert L.get_loss({"LOSS_FUNCTION": "BceDiceLoss"}) is L.bce_dice_loss
    assert L.get_loss({"LOSS_FUNCTION": "MSE"}) is L.mse_loss


def test_max_volume_and_masked_losses_run():
    yt = jnp.ones((1, 8, 8, 1)) * 0.5
    yp = jnp.ones((1, 8, 8, 1)) * 0.9
    assert float(L.max_volume_loss(0.8)(yt, yp)) == pytest.approx(0.1, abs=1e-5)
    masked = L.loss_with_zero_mask(xy_shape=8)(yt, yp)
    assert masked.shape == (1, 8, 8)
