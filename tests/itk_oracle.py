"""Independent oracle for ITK's ResampleImageFilter index math.

SimpleITK cannot be installed in this environment (no package installs), so
the resampler's ITK-parity claim is pinned against this from-the-definition
reimplementation of the exact code paths `sitk.ResampleImageFilter` executes
for the reference's configuration (`/root/reference/src/data/Preprocess.py:
182-227`: output direction = input direction, output origin = input origin,
default pixel value 0, linear or nearest interpolator).

Why this oracle is authoritative — every branch below transcribes a
*documented ITK source definition* (ITK 5.x, which SimpleITK 1.2.4/2.x wrap),
not the production code under test:

* ``itkResampleImageFilter.hxx::NonlinearThreadedGenerateData``: for every
  output index, compute the output physical point
  (``TransformIndexToPhysicalPoint``), transform it (identity here), convert
  to a continuous INPUT index (``TransformPhysicalPointToContinuousIndex``),
  then ``interpolator->IsInsideBuffer(cindex) ? Evaluate : defaultValue``.
* ``itkImageFunction.hxx``: ``IsInsideBuffer(cindex)`` tests
  ``m_StartContinuousIndex <= c < m_EndContinuousIndex`` per axis, where the
  continuous bounds are start-0.5 and end+0.5 — i.e. ``-0.5 <= c <
  size-0.5`` for a zero-based buffered region.
* ``itkLinearInterpolateImageFunction.hxx::EvaluateUnoptimized``: base index
  = ``Math::Floor(c)`` per axis, weights = fractional distances, value =
  sum over the 2^D corner neighbours with EACH neighbour index CLAMPED into
  [StartIndex, EndIndex] per axis (the clamp is what defines ITK's edge
  behaviour for c in [-0.5, 0) and (size-1, size-0.5)).
* ``itkNearestNeighborInterpolateImageFunction.h``:
  ``ConvertContinuousIndexToNearestIndex`` applies
  ``Math::RoundHalfIntegerUp`` = ``floor(c + 0.5)`` per axis (ties round
  toward +inf — the behaviour the reference's mask resampling inherits).
* ``TransformPhysicalPointToContinuousIndex`` with identity direction:
  ``c_k = (p_k - origin_k) / spacing_k``; with output origin = input origin
  this reduces to ``c_k = out_index_k * out_spacing_k / in_spacing_k``.

Deliberately different implementation SHAPE from the production resampler
(`cmrtpu/ops/resample.py`): the production code is a separable per-axis 1D
gather chain; the oracle is a direct per-voxel 2^D-corner evaluation, so a
bug in the separable factorisation cannot hide in its own oracle.
"""

from __future__ import annotations

from itertools import product

import numpy as np

LINEAR = 2
NEAREST = 1


def _continuous_index(out_index, out_spacing, in_spacing):
    """TransformIndexToPhysicalPoint o identity o
    TransformPhysicalPointToContinuousIndex for equal origins and identity
    (= equal, cancelling) directions. out_index/spacings in numpy axis order."""
    return np.asarray(out_index, np.float64) * (
        np.asarray(out_spacing, np.float64) / np.asarray(in_spacing, np.float64))


def _is_inside_buffer(cindex, shape):
    """itkImageFunction.hxx: start-0.5 <= c < end+0.5 per axis."""
    return all(-0.5 <= c < n - 0.5 for c, n in zip(cindex, shape))


def _linear_evaluate(arr: np.ndarray, cindex) -> float:
    """itkLinearInterpolateImageFunction.hxx EvaluateUnoptimized: 2^D corner
    sum with per-axis neighbour clamping into the buffered region."""
    base = [int(np.floor(c)) for c in cindex]
    dist = [c - b for c, b in zip(cindex, base)]
    value = 0.0
    for corner in product((0, 1), repeat=arr.ndim):
        weight = 1.0
        idx = []
        for d, bit in enumerate(corner):
            weight *= dist[d] if bit else (1.0 - dist[d])
            neighbour = base[d] + bit
            neighbour = min(max(neighbour, 0), arr.shape[d] - 1)  # the clamp
            idx.append(neighbour)
        if weight:
            value += weight * float(arr[tuple(idx)])
    return value


def _nearest_evaluate(arr: np.ndarray, cindex) -> float:
    """itkNearestNeighborInterpolateImageFunction: RoundHalfIntegerUp =
    floor(c + 0.5) per axis (ties toward +inf)."""
    idx = tuple(min(max(int(np.floor(c + 0.5)), 0), n - 1)
                for c, n in zip(cindex, arr.shape))
    return float(arr[idx])


def resample_oracle(arr: np.ndarray, in_spacing_xyz, out_size_xyz,
                    out_spacing_xyz, interpolate: int,
                    default_value: float = 0.0) -> np.ndarray:
    """Per-voxel ResampleImageFilter oracle. Array is numpy [z,y,x]-ordered;
    size/spacing arguments in sitk x,y,z order (matching
    cmrtpu.ops.resample.resample_nd's signature)."""
    ndim = len(out_size_xyz)
    assert arr.ndim == ndim
    # sitk x,y,z -> numpy axis order (z,y,x)
    out_shape = tuple(int(s) for s in reversed(out_size_xyz))
    out_sp = tuple(float(s) for s in reversed(out_spacing_xyz))
    in_sp = tuple(float(s) for s in reversed(in_spacing_xyz))
    out = np.full(out_shape, default_value, np.float64)
    evaluate = _linear_evaluate if interpolate == LINEAR else _nearest_evaluate
    for out_index in np.ndindex(out_shape):
        c = _continuous_index(out_index, out_sp, in_sp)
        if _is_inside_buffer(c, arr.shape):
            out[out_index] = evaluate(arr, c)
    return out
