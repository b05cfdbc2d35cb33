"""Losses and training metrics (JAX) — parity with src/models/Loss_and_metrics.py.

All functions are jit-compatible and operate on channels-last tensors
[..., C]. Conventions preserved from the reference:
  * soft dice with smooth=1 over the fully flattened tensors
    (ref: Loss_and_metrics.py:165-171);
  * per-channel dice metrics index **from the back** so they work with and
    without a background channel (ref: :129-163);
  * BceDiceLoss = w_bce*BCE - w_dice*Dice, slicing off the background channel
    when 4 channels are present (ref: :208-226). BCE matches keras
    binary_crossentropy (clip to [1e-7, 1-1e-7], mean over the channel axis).

The quirk that the reference's default train metrics assume 3 foreground
channels while RVIP configs have 2 (SURVEY.md "known quirks") is fixed here:
``dice_coef_channel`` guards out-of-range negative indices.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

_KERAS_EPS = 1e-7
SMOOTH = 1.0


def dice_coef(y_true, y_pred) -> jax.Array:
    """Soft dice, smooth=1, flattened (ref: Loss_and_metrics.py:165-171)."""
    yt = y_true.reshape(-1).astype(jnp.float32)
    yp = y_pred.reshape(-1).astype(jnp.float32)
    intersection = jnp.sum(yt * yp)
    return (2.0 * intersection + SMOOTH) / (jnp.sum(yt) + jnp.sum(yp) + SMOOTH)


def dice_coef_squared(y_true, y_pred) -> jax.Array:
    yt = y_true.reshape(-1).astype(jnp.float32)
    yp = y_pred.reshape(-1).astype(jnp.float32)
    intersection = jnp.sum(yt * yp)
    return (2.0 * intersection + SMOOTH) / (jnp.sum(yt ** 2) + jnp.sum(yp ** 2) + SMOOTH)


def dice_coef_channel(y_true, y_pred, channel: int) -> jax.Array:
    """Dice on one channel, negative indices from the back (ref: :129-152)."""
    n = y_pred.shape[-1]
    if channel < 0 and -channel > n:
        return jnp.float32(jnp.nan)  # channel absent in this config
    return dice_coef(y_true[..., channel], y_pred[..., channel])


def dice_coef_labels(y_true, y_pred) -> jax.Array:
    """Dice over the (up to 3) foreground channels from the back (ref: :157-163)."""
    return dice_coef(y_true[..., -3:], y_pred[..., -3:])


# named per-channel dices (ref: Loss_and_metrics.py:124-153 — lv/upper =
# ch[-1], myo/lower = ch[-2], rv = ch[-3], background = ch[0])
def dice_coef_background(y_true, y_pred) -> jax.Array:
    return dice_coef_channel(y_true, y_pred, 0)


def dice_coef_rv(y_true, y_pred) -> jax.Array:
    return dice_coef_channel(y_true, y_pred, -3)


def dice_coef_myo(y_true, y_pred) -> jax.Array:
    return dice_coef_channel(y_true, y_pred, -2)


def dice_coef_lv(y_true, y_pred) -> jax.Array:
    return dice_coef_channel(y_true, y_pred, -1)


dice_coef_lower = dice_coef_myo  # reference aliases (ref: :135-147)
dice_coef_upper = dice_coef_lv


def binary_crossentropy(y_true, y_pred) -> jax.Array:
    """keras.losses.binary_crossentropy parity: elementwise BCE, mean over
    the last (channel) axis.

    Exact keras backend semantics (pinned by tests/test_tf_parity.py against
    tf_keras): probabilities are clipped to [eps, 1-eps] AND eps is added
    again inside each log — ``-(y log(p+eps) + (1-y) log(1-p+eps))`` — all
    in float32. The extra eps caps the boundary penalty at ``-log(2e-7)``
    (~15.4) instead of ``-log(1e-7)`` (~16.1); mid-range values differ from
    the clip-only form by up to ~1e-3 per element.

    Caveat (advisor r4): this pins the EAGER clip-path. In graph mode Keras
    silently rewrites BCE of a direct Sigmoid output into exact
    ``sigmoid_cross_entropy_with_logits`` — the reference's compiled fit()
    can take that branch, so "exact keras parity" is context-dependent, with
    differences up to ~1e-3/element near saturation. The TF-twin head-to-head
    (tools/tf_twin_ab.py, frameworks agree to 0.02 mm) bounds the practical
    impact; no logits-path variant is implemented."""
    p = jnp.clip(y_pred.astype(jnp.float32),
                 jnp.float32(_KERAS_EPS), jnp.float32(1.0 - _KERAS_EPS))
    yt = y_true.astype(jnp.float32)
    bce = -(yt * jnp.log(p + _KERAS_EPS)
            + (1.0 - yt) * jnp.log(1.0 - p + _KERAS_EPS))
    return jnp.mean(bce, axis=-1)


def bce_dice_loss(y_true, y_pred, w_bce: float = 1.0, w_dice: float = 1.0) -> jax.Array:
    """BceDiceLoss (ref: Loss_and_metrics.py:208-226): scalar
    mean(BCE)*w_bce - dice*w_dice, background sliced off for 4-channel heads."""
    if y_pred.shape[-1] == 4:
        y_pred = y_pred[..., -3:]
        y_true = y_true[..., -3:]
    return (jnp.mean(binary_crossentropy(y_true, y_pred)) * w_bce
            - dice_coef(y_true, y_pred) * w_dice)


def mse_loss(y_true, y_pred) -> jax.Array:
    """Default-loss fallback; fixes the reference's broken MSE path
    (ref quirk: src/models/train_model.py:184 would raise)."""
    return jnp.mean((y_true.astype(jnp.float32) - y_pred.astype(jnp.float32)) ** 2)


def weighted_cce_dice_loss(weights):
    """Weighted categorical CE - dice (ref: Loss_and_metrics.py:94-122)."""
    w = jnp.asarray(weights, jnp.float32)

    def loss_fn(y_true, y_pred):
        p = y_pred.astype(jnp.float32)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        p = jnp.clip(p, _KERAS_EPS, 1.0 - _KERAS_EPS)
        cce = -jnp.sum(y_true.astype(jnp.float32) * jnp.log(p) * w, axis=-1)
        return jnp.mean(cce) - dice_coef(y_true, y_pred)

    return loss_fn


def max_volume_loss(min_probability: float = 0.8):
    """Maximise high-confidence foreground voxels (ref: Loss_and_metrics.py:9-37)."""

    def loss_fn(y_true, y_pred):
        p = y_pred
        if p.shape[-1] == 4:
            p = p[..., 1:]
        p = p.astype(jnp.float32)
        m = jnp.max(p, axis=-1)
        m = m * (m > min_probability).astype(jnp.float32)
        return 1.0 - jnp.mean(m)

    return loss_fn


def loss_with_zero_mask(loss: Callable = None, mask_smaller_than: float = 0.01,
                        weight_inplane: bool = False, xy_shape: int = 224):
    """Masked (+ optionally centre-weighted) loss factory
    (ref: Loss_and_metrics.py:40-89)."""
    base = loss or (lambda yt, yp: (yt - yp) ** 2)

    temp = np.zeros((xy_shape, xy_shape), dtype=np.float32)
    for i, l in enumerate(np.linspace(0, 100, xy_shape // 2)):
        temp[i:-i or None, i:-i or None] = l
    weights = jnp.asarray(temp)[None, None, :, :]

    def loss_fn(y_true, y_pred):
        yt = y_true.astype(jnp.float32)
        yp = y_pred.astype(jnp.float32)
        mask = jnp.squeeze((yt > mask_smaller_than).astype(jnp.float32), axis=-1)
        per_vox = base(yt, yp)
        if per_vox.shape != mask.shape:  # loss kept the channel axis
            per_vox = jnp.mean(per_vox, axis=-1)
        out = per_vox * mask
        if weight_inplane:
            out = out * weights + _KERAS_EPS
        return out

    return loss_fn


def dice_numpy(y_true, y_pred, empty_score: float = 1.0) -> float:
    """Hard dice on numpy bool masks (ref: Loss_and_metrics.py:183-206)."""
    im1 = np.asarray(y_true).astype(bool)
    im2 = np.asarray(y_pred).astype(bool)
    if im1.shape != im2.shape:
        raise ValueError("Shape mismatch: im1 and im2 must have the same shape.")
    im_sum = im1.sum() + im2.sum()
    if im_sum == 0:
        return empty_score
    return 2.0 * np.logical_and(im1, im2).sum() / im_sum


def categorical_crossentropy(y_true, y_pred) -> jax.Array:
    """CCE over softmax probabilities (for exclusive-class softmax heads)."""
    eps = 1e-7
    return -jnp.mean(jnp.sum(y_true * jnp.log(jnp.clip(y_pred, eps, 1.0)),
                             axis=-1))


def cce_dice_loss(y_true, y_pred, w_cce: float = 1.0, w_dice: float = 1.0):
    return w_cce * categorical_crossentropy(y_true, y_pred) \
        - w_dice * dice_coef(y_true, y_pred)


def multi_head_loss(heads):
    """Loss for multi-head models (BASELINE config 4: joint RVIP heatmaps +
    LV/RV/MYO segmentation). ``heads`` is the model's HEADS spec
    [(name, channels, 'sigmoid'|'softmax'), ...]; y carries the heads'
    target channels concatenated in spec order. Per head: BCE+Dice for
    sigmoid heads, CCE+Dice for softmax heads; total = sum."""
    heads = [tuple(h) for h in heads]

    def loss(y_true, preds):
        total = jnp.float32(0.0)
        offset = 0
        for name, channels, act in heads:
            y_head = y_true[..., offset:offset + channels]
            p_head = preds[name]
            if act == "softmax":
                total = total + cce_dice_loss(y_head, p_head)
            else:
                total = total + bce_dice_loss(y_head, p_head)
            offset += channels
        return total

    return loss


def concat_heads(heads):
    """preds dict -> channel-concatenated tensor in HEADS spec order (lets
    tensor metrics run on multi-head outputs)."""
    names = [h[0] for h in heads]

    def concat(preds):
        return jnp.concatenate([preds[n] for n in names], axis=-1)

    return concat


def get_loss(config: Dict) -> Callable:
    """Loss-by-name from config (accepts 'BcdDiceLoss' [sic] and 'BceDiceLoss',
    ref: src/models/train_model.py:178-184). HEADS configs get the summed
    per-head loss."""
    heads = config.get("HEADS") or ()
    if heads:
        return multi_head_loss(heads)
    name = str(config.get("LOSS_FUNCTION", "BceDiceLoss"))
    if "DiceLoss" in name or name in ("BcdDiceLoss", "BceDiceLoss", "bce_dice_loss"):
        return bce_dice_loss
    if name.lower() in ("mse", "meansquarederror"):
        return mse_loss
    return bce_dice_loss


def default_metrics(mask_classes: int) -> Dict[str, Callable]:
    """Per-channel dice metrics matching the reference train metrics
    (ref: src/models/train_model.py:54-59) with corrected indexing."""
    metrics = {"dice_coef_labels": dice_coef_labels}
    names = ["dice_coef_lv", "dice_coef_myo", "dice_coef_rv"]  # ch -1, -2, -3
    for i, name in enumerate(names):
        ch = -(i + 1)
        if mask_classes >= -ch:
            metrics[name] = lambda yt, yp, c=ch: dice_coef_channel(yt, yp, c)
    return metrics
