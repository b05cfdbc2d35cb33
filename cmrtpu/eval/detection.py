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
