"""Fused on-device augmentation (JAX) — the albumentations replacement.

The reference augments on CPU per-element inside a thread pool with
albumentations' ReplayCompose of RandomRotate90 / ShiftScaleRotate /
GridDistortion / Downscale, identical transform broadcast across z/t slices
(ref: src/data/Preprocess.py:230-422; SURVEY.md hard part #2).

TPU-native redesign: every one of those warps has a *separable per-axis*
coordinate map —

  * ShiftScaleRotate(rotate=0, scale=0, shift=±0.025)  -> axis translation
  * GridDistortion(num_steps=5, distort=±0.3)          -> per-axis piecewise-
                                                          linear monotone map
  * Downscale(scale=0.9, nearest)                      -> floor-quantised axis map
  * RandomRotate90                                     -> exact jnp.rot90

so the whole chain composes into ONE coordinate vector per axis followed by a
single bilinear (image) / nearest (mask) gather with reflect101 borders —
one fused XLA program per batch instead of four sequential OpenCV remaps per
slice. One parameter draw per example, broadcast over the z/t axes exactly
like ReplayCompose's additional_targets. PRNG keys are threaded explicitly,
fixing the reference's unseeded worker-thread RNG (SURVEY.md §5 race note).

Probability semantics preserved: outer compose gate p=AUGMENT_PROB and inner
per-transform gates (SSR/GD/Downscale p=AUGMENT_PROB, Rot90 p=0.2), matching
_create_aug_compose (ref: Preprocess.py:382-422).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from cmrtpu import config as C

GRID_STEPS = 5          # albumentations GridDistortion default num_steps
DISTORT_LIMIT = 0.3     # default distort_limit
SHIFT_LIMIT = 0.025     # ref: ShiftScaleRotate(shift_limit=0.025)
DOWNSCALE = 0.9         # ref: Downscale(scale_min=0.9, scale_max=0.9)
ROT90_P = 0.2           # ref: RandomRotate90(p=0.2)


def _reflect101(coords, size: int):
    """OpenCV BORDER_REFLECT_101 coordinate folding (gdcba|abcdefgh|gfedc)."""
    if size == 1:
        return jnp.zeros_like(coords)
    period = 2.0 * (size - 1)
    c = jnp.abs(coords) % period
    return jnp.where(c > size - 1, period - c, c)


def _downscale_map(coords, size: int, active):
    """Pullback of nearest-down (to round(size*0.9)) + nearest-up."""
    m = max(1, int(round(size * DOWNSCALE)))
    mid = jnp.floor((coords + 0.5) * (m / size))           # up-sample pullback
    src = jnp.floor((mid + 0.5) * (size / m))              # down-sample pullback
    src = jnp.clip(src, 0, size - 1)
    return jnp.where(active, src, coords)


def _grid_distortion_table(key, size: int):
    """Monotone piecewise-linear dst->src axis map (albumentations semantics):
    per-cell scale factor 1+U(-0.3, 0.3), linear within each of 5 cells."""
    factors = 1.0 + jax.random.uniform(key, (GRID_STEPS,),
                                       minval=-DISTORT_LIMIT, maxval=DISTORT_LIMIT)
    step = size // GRID_STEPS
    widths = jnp.full((GRID_STEPS,), float(step)).at[-1].set(float(size - step * (GRID_STEPS - 1)))
    seg = widths * factors
    ends = jnp.cumsum(seg)
    starts = ends - seg
    idx = jnp.minimum(jnp.arange(size) // step, GRID_STEPS - 1)
    frac = (jnp.arange(size) - idx * step) / widths[idx]
    return starts[idx] + frac * seg[idx]


def _eval_table(table, coords, size: int):
    """Evaluate a tabulated axis map at (possibly fractional) coordinates."""
    c = jnp.clip(coords, 0, size - 1)
    lo = jnp.floor(c).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, size - 1)
    w = c - lo
    return table[lo] * (1.0 - w) + table[hi] * w


def _draw_params(key, config: Dict) -> Dict:
    """One transform draw per example (ReplayCompose parity)."""
    keys = jax.random.split(key, 8)
    prob = float(C.get(config, "AUGMENT_PROB", 0.8))
    compose_on = jax.random.uniform(keys[0]) < prob

    def gate(k, p, enabled):
        return compose_on & enabled & (jax.random.uniform(k) < p)

    return {
        "rot_k": jnp.where(
            gate(keys[1], ROT90_P, bool(C.get(config, "RANDOMROTATE", False))),
            jax.random.randint(keys[2], (), 0, 4), 0),
        "ssr_on": gate(keys[3], prob, bool(C.get(config, "SHIFTSCALEROTATE", False))),
        "shift": jax.random.uniform(keys[4], (2,), minval=-SHIFT_LIMIT,
                                    maxval=SHIFT_LIMIT),
        "gd_on": gate(keys[5], prob, bool(C.get(config, "GRIDDISTORTION", False))),
        "gd_key": keys[6],
        "down_on": gate(keys[7], prob, bool(C.get(config, "DOWNSCALE", False))),
    }


def _axis_coords(params, key_axis: int, size: int):
    """Compose downscale -> grid-distortion -> shift pullbacks for one axis."""
    coords = jnp.arange(size, dtype=jnp.float32)
    coords = _downscale_map(coords, size, params["down_on"])
    if size >= GRID_STEPS:  # distortion undefined below one cell per step
        table = _grid_distortion_table(
            jax.random.fold_in(params["gd_key"], key_axis), size)
        distorted = _eval_table(table, coords, size)
        coords = jnp.where(params["gd_on"], distorted, coords)
    coords = jnp.where(params["ssr_on"],
                       coords - params["shift"][key_axis] * size, coords)
    return _reflect101(coords, size)


def _warp2d(img, ys, xs, nearest: bool):
    """Separable gather at (ys x xs); img [..., H, W]."""
    h, w = img.shape[-2], img.shape[-1]
    if nearest:
        iy = jnp.clip(jnp.round(ys).astype(jnp.int32), 0, h - 1)
        ix = jnp.clip(jnp.round(xs).astype(jnp.int32), 0, w - 1)
        return img[..., iy, :][..., ix]
    y0 = jnp.floor(ys).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    wy = (ys - y0).astype(jnp.float32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wx = (xs - x0).astype(jnp.float32)
    f = img.astype(jnp.float32)
    top = f[..., y0, :] * (1 - wy)[..., :, None] + f[..., y1, :] * wy[..., :, None]
    return top[..., x0] * (1 - wx) + top[..., x1] * wx


def augment_example(key, img, msk, config: Dict):
    """Augment one example ([..., H, W] image + mask, same warp for both;
    the leading axes (z or t,z) share the transform like additional_targets)."""
    params = _draw_params(key, config)
    h, w = img.shape[-2], img.shape[-1]

    if h == w:  # RandomRotate90 (exact, square inputs only — DIM is square)
        img = jax.lax.switch(params["rot_k"],
                             [lambda a: a] + [partial(jnp.rot90, k=k, axes=(-2, -1))
                                              for k in (1, 2, 3)], img)
        msk = jax.lax.switch(params["rot_k"],
                             [lambda a: a] + [partial(jnp.rot90, k=k, axes=(-2, -1))
                                              for k in (1, 2, 3)], msk)

    ys = _axis_coords(params, 0, h)
    xs = _axis_coords(params, 1, w)
    img_out = _warp2d(img, ys, xs, nearest=False)
    msk_out = _warp2d(msk, ys, xs, nearest=True)
    return img_out, msk_out


def augment_batch_fn(key, imgs, msks, config: Dict):
    """Un-jitted batched augmentation (key, imgs[B,...,H,W], msks) — for
    composition into larger fused programs (e.g. the device-cached train
    step)."""
    cfg = {k: C.get(config, k) for k in
           ("AUGMENT_PROB", "RANDOMROTATE", "SHIFTSCALEROTATE",
            "GRIDDISTORTION", "DOWNSCALE")}
    keys = jax.random.split(key, imgs.shape[0])
    return jax.vmap(lambda k, i, m: augment_example(k, i, m, cfg))(keys, imgs, msks)


def make_batch_augmenter(config: Dict):
    """jit-compiled (key, imgs[B,...,H,W], msks[B,...,H,W]) -> augmented pair."""
    cfg = dict(config)

    @jax.jit
    def augment_batch(key, imgs, msks):
        return augment_batch_fn(key, imgs, msks, cfg)

    return augment_batch
