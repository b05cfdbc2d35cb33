"""Separable Gaussian heatmap synthesis (on-device).

Replaces the scipy.ndimage.gaussian_filter target smoothing (GAUS/SIGMA,
ref: src/data/Generators.py:385-391): binary IP channels are blurred with a
separable Gaussian (scipy-parity kernel: truncate=4.0, 'reflect' boundary)
and then jointly minmax-normalised across all channels, exactly like
``normalise_image(mask, 'minmax')`` in the reference.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """scipy.ndimage parity: radius = int(truncate*sigma + 0.5), normalised."""
    radius = int(truncate * float(sigma) + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / float(sigma)) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur_2d(img, sigma: float):
    """Blur the trailing two axes of [..., H, W] with 'reflect' boundary
    (scipy 'reflect' == np.pad 'symmetric')."""
    kernel = jnp.asarray(gaussian_kernel1d(sigma))
    radius = (kernel.shape[0] - 1) // 2

    def conv_axis(x, axis):
        moved = jnp.moveaxis(x, axis, -1)
        pad = [(0, 0)] * (moved.ndim - 1) + [(radius, radius)]
        padded = jnp.pad(moved, pad, mode="symmetric")
        windows = jnp.stack([padded[..., i:i + moved.shape[-1]]
                             for i in range(kernel.shape[0])], axis=-1)
        out = jnp.einsum("...k,k->...", windows, kernel)
        return jnp.moveaxis(out, -1, axis)

    out = conv_axis(img.astype(jnp.float32), -1)
    return conv_axis(out, -2)


def smooth_heatmap_targets(mask_channels, sigma: float):
    """Binary channel masks [..., H, W, C] -> normalised Gaussian heatmaps.

    Joint minmax over the whole tensor (ref: Generators.py:391 normalises the
    stacked mask globally, not per channel). On TPU the blur runs as a
    VMEM-resident pallas kernel (cmrtpu/ops/pallas_kernels.py); the jnp
    fallback materialises shifted windows.
    """
    x = mask_channels.astype(jnp.float32)
    if jax.default_backend() == "tpu":
        from cmrtpu.ops.pallas_kernels import gaussian_blur_2d_pallas
        moved = jnp.moveaxis(x, -1, 0)  # [..., H, W, C] -> [C, ..., H, W]
        blurred = jnp.moveaxis(gaussian_blur_2d_pallas(moved, sigma), 0, -1)
    else:
        blurred = jax.vmap(lambda c: gaussian_blur_2d(c, sigma),
                           in_axes=-1, out_axes=-1)(x)
    lo = jnp.min(blurred)
    hi = jnp.max(blurred)
    return (blurred - lo) / (hi - lo + jnp.finfo(jnp.float32).eps)
