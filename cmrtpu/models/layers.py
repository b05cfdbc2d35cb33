"""Reusable layers beyond the U-Net blocks: interpolating 3D upsampling,
spatial-transformer helpers, and the resizing 2D-in-3D wrapper.

Parity targets (re-designed, not translated):
  * UpSampling3DInterpol  (ref: src/models/KerasLayers.py:15-43) — bilinear
    per-z-slice upsampling; here one jax.image.resize over the full volume
    (XLA lowers it to a single fused gather, no per-slice map_fn).
  * Inverse3DMatrix       (ref: KerasLayers.py:46-77) — invert a batch of
    flattened (3,4) affine matrices via the homogeneous (4,4) extension.
  * Euler2Matrix          (ref: KerasLayers.py:80-169) — euler angles (+
    translation, + optional scaling) -> flattened (3,4) affine matrix.
  * ScaleLayer            (ref: KerasLayers.py:172-183) — single learnable
    scalar multiplier.
  * UnetWrapper           (ref: KerasLayers.py:186-235) — run a 2D U-Net over
    the z-axis of a 3D volume with bilinear in-plane resize to the U-Net's
    trained in-plane shape and back.
  * eulerAnglesToRotationMatrix_fn / affineMatrixInverter_fn
    (ref: KerasLayers.py:864-921) — numpy-side equivalents.

All batched math is rank-static and jit-friendly; nothing here falls back to
per-slice Python loops at trace time.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


# ---------------------------------------------------------------------------
# interpolating upsampling
# ---------------------------------------------------------------------------

def upsample_3d_interpol(x: jax.Array, size: Tuple[int, int, int] = (1, 2, 2),
                         method: str = "bilinear") -> jax.Array:
    """Upsample a NDHWC volume by integer factors, interpolating in-plane
    (ref: UpSampling3DInterpol, KerasLayers.py:15-43).

    The z factor uses nearest (the keras layer never interpolates across z);
    y/x use ``method``. Implemented as one resize over the whole volume.
    """
    b, d, h, w, c = x.shape
    fz, fy, fx = size
    if fz != 1:
        x = jnp.repeat(x, fz, axis=1)
        d *= fz
    if fy == 1 and fx == 1:
        return x
    target = (b, d, h * fy, w * fx, c)
    if method == "nearest":
        return jax.image.resize(x, target, method="nearest")
    return jax.image.resize(x, target, method="bilinear")


def resize_inplane(x: jax.Array, size: Tuple[int, int],
                   method: str = "bilinear") -> jax.Array:
    """Resize the trailing spatial (y, x) dims of a [..., H, W, C] tensor."""
    target = (*x.shape[:-3], *size, x.shape[-1])
    return jax.image.resize(x, target, method=method)


# ---------------------------------------------------------------------------
# spatial-transformer helpers
# ---------------------------------------------------------------------------

def euler_to_affine_matrix(theta: jax.Array, learnable_x: bool = True,
                           learnable_y: bool = True, learnable_z: bool = True,
                           learnable_translation: bool = True,
                           learnable_scaling: bool = False) -> jax.Array:
    """Batch of euler parameters -> flattened (3,4) affine matrices
    (ref: Euler2Matrix, KerasLayers.py:80-169).

    theta: [B, >=3] — (rx, ry, rz, tx, ty, tz, sx, sy, sz) with the trailing
    groups used only when the corresponding flag is on. Rotation order is
    Rz @ Ry @ Rx, scaling is ADDED to the rotation block and translation is
    appended as the 4th column — matching the reference's semantics exactly.
    """
    e1, e2, e3 = theta[:, 0], theta[:, 1], theta[:, 2]
    one, zero = jnp.ones_like(e1), jnp.zeros_like(e1)
    eye = jnp.stack([jnp.stack([one, zero, zero], -1),
                     jnp.stack([zero, one, zero], -1),
                     jnp.stack([zero, zero, one], -1)], axis=1)

    def rx(a):
        return jnp.stack([jnp.stack([one, zero, zero], -1),
                          jnp.stack([zero, jnp.cos(a), jnp.sin(a)], -1),
                          jnp.stack([zero, -jnp.sin(a), jnp.cos(a)], -1)], axis=1)

    def ry(a):
        return jnp.stack([jnp.stack([jnp.cos(a), zero, -jnp.sin(a)], -1),
                          jnp.stack([zero, one, zero], -1),
                          jnp.stack([jnp.sin(a), zero, jnp.cos(a)], -1)], axis=1)

    def rz(a):
        return jnp.stack([jnp.stack([jnp.cos(a), jnp.sin(a), zero], -1),
                          jnp.stack([-jnp.sin(a), jnp.cos(a), zero], -1),
                          jnp.stack([zero, zero, one], -1)], axis=1)

    rot = (rz(e3) if learnable_z else eye) @ \
          (ry(e2) if learnable_y else eye) @ \
          (rx(e1) if learnable_x else eye)

    if learnable_scaling:
        scale = jax.vmap(jnp.diag)(theta[:, 6:9])
        rot = rot + scale

    if learnable_translation:
        translation = theta[:, 3:6][..., None]
    else:
        translation = jnp.zeros((theta.shape[0], 3, 1), theta.dtype)
    matrix = jnp.concatenate([rot, translation], axis=2)
    return matrix.reshape(theta.shape[0], 12)


def invert_affine_matrix(m: jax.Array) -> jax.Array:
    """Invert a batch of flattened (3,4) affines via the homogeneous (4,4)
    extension (ref: Inverse3DMatrix, KerasLayers.py:46-77)."""
    b = m.shape[0]
    mat = m.reshape(b, 3, 4).astype(jnp.float32)
    row = jnp.broadcast_to(jnp.array([[0.0, 0.0, 0.0, 1.0]], jnp.float32),
                           (b, 1, 4))
    square = jnp.concatenate([mat, row], axis=1)
    inv = jnp.linalg.inv(square)
    return inv[:, :3, :].reshape(b, 12).astype(m.dtype)


def euler_angles_to_rotation_matrix(theta: Sequence[float]) -> np.ndarray:
    """numpy: euler angles -> 3x3 rotation matrix, Rz @ Ry @ Rx
    (ref: eulerAnglesToRotationMatrix_fn, KerasLayers.py:864-899)."""
    rx = np.array([[1, 0, 0],
                   [0, np.cos(theta[0]), -np.sin(theta[0])],
                   [0, np.sin(theta[0]), np.cos(theta[0])]])
    ry = np.array([[np.cos(theta[1]), 0, np.sin(theta[1])],
                   [0, 1, 0],
                   [-np.sin(theta[1]), 0, np.cos(theta[1])]])
    rz = np.array([[np.cos(theta[2]), -np.sin(theta[2]), 0],
                   [np.sin(theta[2]), np.cos(theta[2]), 0],
                   [0, 0, 1]])
    return rz @ ry @ rx


def affine_matrix_inverter(m: np.ndarray) -> np.ndarray:
    """numpy: invert one flattened (3,4) affine (ref: affineMatrixInverter_fn,
    KerasLayers.py:902-921)."""
    mat = np.asarray(m, np.float64).reshape(3, 4)
    square = np.concatenate([mat, [[0.0, 0.0, 0.0, 1.0]]], axis=0)
    return np.linalg.inv(square)[:3, :].reshape(12)


class ScaleLayer(nn.Module):
    """Single learnable scalar multiplier (ref: ScaleLayer,
    KerasLayers.py:172-183)."""

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", lambda rng: jnp.array(1.0, jnp.float32))
        return x * scale


class UnetWrapper(nn.Module):
    """Run a 2D model over the z axis of a NDHWC volume, with optional
    bilinear in-plane resize to the model's trained shape and back
    (ref: UnetWrapper, KerasLayers.py:186-235).

    TPU-native: z is folded into the batch axis — one batched forward instead
    of a per-slice Python loop — and both resizes are whole-volume ops.
    """
    unet: Any  # nn.Module with 2D [B, H, W, C] -> [B, H, W, C'] semantics
    unet_inplane: Tuple[int, int] = (224, 224)
    resize: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, z, h, w, c = x.shape
        flat = x.reshape(b * z, h, w, c)
        if self.resize:
            flat = resize_inplane(flat, self.unet_inplane)
        out = self.unet(flat, train=train)
        if self.resize:
            out = resize_inplane(out, (h, w))
        return out.reshape(b, z, h, w, out.shape[-1])
