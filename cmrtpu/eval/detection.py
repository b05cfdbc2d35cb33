"""On-device landmark detection strategies (BASELINE config 5).

The reference extracts insertion points on the host with numpy center-of-mass
per slice/label (ref: get_mean_rvip_2d, src/models/evaluate_cv.py:418-431).
Here both detection strategies run jit-compiled and batched over heatmap /
probability channels:

  * ``peaks_com``    — center of mass of the thresholded channel (the
                       reference's strategy, vectorised over [B, H, W, C]);
  * ``peaks_argmax`` — coordinates of the channel's maximum response (the
                       natural strategy for Gaussian-heatmap targets,
                       GAUS/SIGMA configs).

Both return (coords [B, C, 2] (y, x) float32, valid [B, C] bool). Invalid
slots (no response above threshold) hold NaN, matching the None-handling of
the host evaluation (SURVEY.md hard part #5).
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("threshold",))
def peaks_com(heatmaps, threshold: float = 0.5):
    """Center-of-mass detection over [B, H, W, C] channels."""
    x = jnp.asarray(heatmaps, jnp.float32)
    b, h, w, c = x.shape
    mask = (x > threshold).astype(jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :, None]
    total = jnp.sum(mask, axis=(1, 2))                        # [B, C]
    cy = jnp.sum(mask * ys, axis=(1, 2)) / jnp.maximum(total, 1.0)
    cx = jnp.sum(mask * xs, axis=(1, 2)) / jnp.maximum(total, 1.0)
    valid = total > 0
    coords = jnp.stack([cy, cx], axis=-1)                     # [B, C, 2]
    coords = jnp.where(valid[..., None], coords, jnp.nan)
    return coords, valid


@functools.partial(jax.jit, static_argnames=("threshold",))
def peaks_argmax(heatmaps, threshold: float = 0.5):
    """Peak-response detection over [B, H, W, C] channels."""
    x = jnp.asarray(heatmaps, jnp.float32)
    b, h, w, c = x.shape
    flat = x.reshape(b, h * w, c)
    idx = jnp.argmax(flat, axis=1)                            # [B, C]
    peak = jnp.max(flat, axis=1)
    cy = (idx // w).astype(jnp.float32)
    cx = (idx % w).astype(jnp.float32)
    valid = peak > threshold
    coords = jnp.stack([cy, cx], axis=-1)
    coords = jnp.where(valid[..., None], coords, jnp.nan)
    return coords, valid


def detect(heatmaps, strategy: str = "com", threshold: float = 0.5):
    """Strategy dispatcher: 'com' (reference parity) or 'argmax'."""
    if strategy == "argmax":
        return peaks_argmax(heatmaps, threshold=threshold)
    if strategy == "com":
        return peaks_com(heatmaps, threshold=threshold)
    raise ValueError(f"unknown detection strategy: {strategy}")


def localisation_metrics(config):
    """Training-time localisation metrics in mm — the framework's ACTUAL
    target quantity as a live train/eval metric (MONITOR_LOCALISATION).

    The reference can only monitor dice proxies during training (ref:
    src/models/train_model.py:54-59); its mm localisation error exists
    solely in the offline evaluation (ref: get_distances,
    src/models/evaluate_cv.py:549-595). Because this framework's detection
    strategies are jit-compiled and batched (above), the real metric rides
    the fused train/eval steps at negligible cost, and the best-only
    checkpoint monitor can select directly on millimetres
    (``SAVE_MODEL_FUNCTION: 'val_loc_mm'``, ``SAVE_MODEL_MODE: 'min'``):

      * ``loc_mm``  — SYMMETRIC mean localisation error over every slot
        (slice x channel) where gt or prediction detects a landmark:
        both present -> their distance (gt channel CoM vs the detected
        peak, DETECTION_STRATEGY 'com'|'argmax'), converted px->mm with
        the preprocessed grid's in-plane SPACING (constant after
        resampling); one-sided slots — a MISSED gt landmark (FN) or a
        SPURIOUS detection on a gt-absent slice (FP) — are charged the
        distance to the farthest image corner, the host suite's upper
        bound (ref: get_distances_upper_bound,
        src/models/evaluate_cv.py:572-595). The FP charge matters for
        checkpoint SELECTION: spurious off-landmark detections dominate
        the offline volume-CoM error (measured in the TTA study), and a
        gt-present-only metric is blind to them — it preferred a
        spurious-heavy mid-training checkpoint in the at-scale A/B.
      * ``loc_det`` — detected fraction of gt-present landmarks (TPR).
      * ``loc_fp``  — detections on gt-absent slots / gt-absent slots.

    Landmark channels are the TRAILING len(MASK_VALUES) target channels
    (the reference's back-indexing convention), so both sigmoid [ant, inf]
    and softmax [bg, ant, inf] layouts resolve correctly. Slots where
    NEITHER side detects (apex/base slices, correctly) are excluded,
    matching the evaluation suite's None-handling. 2D single-head configs
    (the landmark family)."""
    from cmrtpu import config as C

    spacing = float(jnp.mean(jnp.asarray(
        C.get(config, "SPACING", [1.2, 1.2]), jnp.float32)[-2:]))
    # px->mm uses the PREPROCESSED grid's spacing, which is the config
    # SPACING only when resampling is on; with RESAMPLE=False every study
    # keeps its native (per-file, unknowable-under-jit) spacing, so the
    # logged mm scale is nominal — say so once instead of silently
    # reporting wrong absolute numbers (checkpoint RANKING is unaffected:
    # the scale is a uniform constant)
    if not C.get(config, "RESAMPLE", True):
        logging.warning(
            "MONITOR_LOCALISATION with RESAMPLE=False: loc_mm uses the "
            "config SPACING (%.3g mm/px) as a NOMINAL scale — native "
            "per-study spacing varies, so absolute mm values are "
            "approximate (ranking/monitoring is still consistent)",
            spacing)
    strategy = str(C.get(config, "DETECTION_STRATEGY", "com") or "com").lower()
    n_fg = max(1, len(C.get(config, "MASK_VALUES", [1, 2]) or [1, 2]))

    def _pairs(y_true, y_pred):
        gt, gt_valid = peaks_com(y_true[..., -n_fg:])
        pr, pr_valid = detect(y_pred[..., -n_fg:], strategy=strategy)
        return (jnp.nan_to_num(gt), gt_valid,
                jnp.nan_to_num(pr), pr_valid)

    def loc_mm(y_true, y_pred):
        gt, gt_valid, pr, pr_valid = _pairs(y_true, y_pred)
        d = jnp.sqrt(jnp.sum((gt - pr) ** 2, axis=-1))        # [B, C] px
        h = y_true.shape[-3]
        w = y_true.shape[-2]
        corners = jnp.asarray([[0.0, 0.0], [0.0, w - 1.0],
                               [h - 1.0, 0.0], [h - 1.0, w - 1.0]])

        def farthest_corner(coords):
            return jnp.max(jnp.sqrt(jnp.sum(
                (coords[..., None, :] - corners) ** 2, axis=-1)), axis=-1)

        both = gt_valid & pr_valid
        # one-sided slots charge the upper bound from whichever coordinate
        # exists: FN (gt only) from the gt landmark, FP (pred only) from
        # the spurious detection
        ub = jnp.where(gt_valid, farthest_corner(gt), farthest_corner(pr))
        either = gt_valid | pr_valid
        dist = jnp.where(both, d, ub)
        n = jnp.sum(either)
        return (jnp.sum(jnp.where(either, dist, 0.0))
                / jnp.maximum(n, 1)) * spacing

    def loc_det(y_true, y_pred):
        _, gt_valid, _, pr_valid = _pairs(y_true, y_pred)
        n = jnp.sum(gt_valid)
        return jnp.sum(gt_valid & pr_valid) / jnp.maximum(n, 1)

    def loc_fp(y_true, y_pred):
        _, gt_valid, _, pr_valid = _pairs(y_true, y_pred)
        absent = ~gt_valid
        return (jnp.sum(absent & pr_valid)
                / jnp.maximum(jnp.sum(absent), 1))

    return {"loc_mm": loc_mm, "loc_det": loc_det, "loc_fp": loc_fp}
