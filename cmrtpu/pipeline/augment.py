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


def _fold_coords(coords, size: int, mode: int):
    """Map out-of-range source coordinates per the OpenCV border mode
    (config key BORDER_MODE, ref: _create_aug_compose,
    src/data/Preprocess.py:382-422: 0=constant, 1=replicate, 2=reflect,
    3=wrap, 4=reflect101). Constant-mode fill happens at the gather
    (tap-level masking in _warp2d); here it just clamps."""
    if mode == 1 or mode == 0:
        return jnp.clip(coords, 0.0, size - 1.0)
    if mode == 2:  # edge-repeating reflect: fold around -0.5 / size-0.5
        period = 2.0 * size
        c = (coords + 0.5) % period
        c = jnp.where(c > size, period - c, c) - 0.5
        return jnp.clip(c, 0.0, size - 1.0)
    if mode == 3:  # wrap
        return coords % size
    return _reflect101(coords, size)


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
        # static (compile-time) border handling — config keys BORDER_MODE /
        # BORDER_VALUE (cv2 enum parity; template default 4 = reflect101)
        "border_mode": 4 if C.get(config, "BORDER_MODE", 4) is None
        else int(C.get(config, "BORDER_MODE", 4)),
        "border_value": float(C.get(config, "BORDER_VALUE", 0) or 0.0),
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
    folded = _fold_coords(coords, size, params["border_mode"])
    return folded, coords  # folded for gathering, raw for constant-fill masks


def _warp2d(img, ys, xs, nearest: bool, raw_ys=None, raw_xs=None,
            border_mode: int = 4, fill: float = 0.0):
    """Separable gather at (ys x xs); img [..., H, W]. For BORDER_CONSTANT
    (mode 0) the raw un-folded coordinates drive tap-level masking so
    out-of-range taps blend with ``fill`` exactly like cv2.remap."""
    h, w = img.shape[-2], img.shape[-1]
    constant = border_mode == 0

    wrap = border_mode == 3

    if nearest:
        iy = jnp.round(ys).astype(jnp.int32)
        ix = jnp.round(xs).astype(jnp.int32)
        iy = iy % h if wrap else jnp.clip(iy, 0, h - 1)
        ix = ix % w if wrap else jnp.clip(ix, 0, w - 1)
        out = img[..., iy, :][..., ix]
        if constant:
            oob = (jnp.round(raw_ys)[:, None] < 0) | \
                  (jnp.round(raw_ys)[:, None] > h - 1) | \
                  (jnp.round(raw_xs)[None, :] < 0) | \
                  (jnp.round(raw_xs)[None, :] > w - 1)
            out = jnp.where(oob, jnp.asarray(fill, out.dtype), out)
        return out

    f = img.astype(jnp.float32)
    if constant:
        # bilinear over the virtually value-padded image: each 1D tap that
        # falls outside contributes `fill` instead of the clamped edge pixel
        ry0 = jnp.floor(raw_ys).astype(jnp.int32)
        ry1 = ry0 + 1
        wy = (raw_ys - ry0).astype(jnp.float32)
        rx0 = jnp.floor(raw_xs).astype(jnp.int32)
        rx1 = rx0 + 1
        wx = (raw_xs - rx0).astype(jnp.float32)

        def row(idx):
            valid = (idx >= 0) & (idx <= h - 1)
            taken = f[..., jnp.clip(idx, 0, h - 1), :]
            return jnp.where(valid[..., :, None], taken, fill)

        top = row(ry0) * (1 - wy)[..., :, None] + row(ry1) * wy[..., :, None]

        def col(rows, idx):
            valid = (idx >= 0) & (idx <= w - 1)
            taken = rows[..., jnp.clip(idx, 0, w - 1)]
            return jnp.where(valid, taken, fill)

        return col(top, rx0) * (1 - wx) + col(top, rx1) * wx

    y0 = jnp.floor(ys).astype(jnp.int32)
    wy = (ys - y0).astype(jnp.float32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    wx = (xs - x0).astype(jnp.float32)
    if wrap:  # the hi tap crosses the modular boundary
        y1 = (y0 + 1) % h
        x1 = (x0 + 1) % w
    else:
        y1 = jnp.minimum(y0 + 1, h - 1)
        x1 = jnp.minimum(x0 + 1, w - 1)
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

    ys, raw_ys = _axis_coords(params, 0, h)
    xs, raw_xs = _axis_coords(params, 1, w)
    mode = params["border_mode"]
    fill = params["border_value"]
    img_out = _warp2d(img, ys, xs, nearest=False, raw_ys=raw_ys,
                      raw_xs=raw_xs, border_mode=mode, fill=fill)
    msk_out = _warp2d(msk, ys, xs, nearest=True, raw_ys=raw_ys,
                      raw_xs=raw_xs, border_mode=mode, fill=fill)
    return img_out, msk_out


def augment_batch_fn(key, imgs, msks, config: Dict):
    """Un-jitted batched augmentation (key, imgs[B,...,H,W], msks) — for
    composition into larger fused programs (e.g. the device-cached train
    step)."""
    cfg = {k: C.get(config, k) for k in
           ("AUGMENT_PROB", "RANDOMROTATE", "SHIFTSCALEROTATE",
            "GRIDDISTORTION", "DOWNSCALE", "BORDER_MODE", "BORDER_VALUE")}
    keys = jax.random.split(key, imgs.shape[0])
    return jax.vmap(lambda k, i, m: augment_example(k, i, m, cfg))(keys, imgs, msks)


def make_batch_augmenter(config: Dict):
    """jit-compiled (key, imgs[B,...,H,W], msks[B,...,H,W]) -> augmented pair."""
    cfg = dict(config)

    @jax.jit
    def augment_batch(key, imgs, msks):
        return augment_batch_fn(key, imgs, msks, cfg)

    return augment_batch
