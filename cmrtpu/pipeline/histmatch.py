"""Histogram matching (skimage.exposure.match_histograms equivalent).

The reference hist-matches ~10% of training samples against a random cached
slice as an augmentation (ref: src/data/Generators.py:350-368,
src/data/Preprocess.py:353-379; Var.1 of the published experiments). The
quantile-mapping formulation below is identical to skimage's implementation:
map each source intensity to the reference intensity at the same empirical
CDF position.
"""

from __future__ import annotations

import numpy as np


def match_histograms(source: np.ndarray, reference: np.ndarray) -> np.ndarray:
    """Monochannel histogram matching, numpy (host) version."""
    src = np.asarray(source)
    ref = np.asarray(reference)
    src_values, src_idx, src_counts = np.unique(src.reshape(-1),
                                                return_inverse=True,
                                                return_counts=True)
    ref_values, ref_counts = np.unique(ref.reshape(-1), return_counts=True)
    src_quantiles = np.cumsum(src_counts) / src.size
    ref_quantiles = np.cumsum(ref_counts) / ref.size
    interp = np.interp(src_quantiles, ref_quantiles, ref_values)
    return interp[src_idx].reshape(src.shape).astype(np.float32)


def match_2d_on_nd(nda: np.ndarray, avg: np.ndarray) -> np.ndarray:
    """Apply 2D matching per slice for 2D/3D/4D inputs
    (ref: Preprocess.py:353-379)."""
    nda = np.asarray(nda, dtype=np.float32)
    if nda.ndim == 2:
        return match_histograms(nda, avg)
    if nda.ndim == 3:
        return np.stack([match_histograms(s, avg) for s in nda])
    if nda.ndim == 4:
        return np.stack([[match_histograms(s, avg) for s in vol] for vol in nda])
    return nda


def match_histograms_jax(source, reference):
    """On-device histogram matching by sorted-quantile mapping
    (SURVEY.md §2.3: skimage match_histograms -> sorted-quantile map on XLA).

    Rank-based formulation with static shapes: each source pixel maps to the
    reference intensity at the same relative rank. For images without heavy
    value ties this equals the host quantile mapping to within one intensity
    step; it is fully jit/vmap-compatible (sort + gather, no unique())."""
    import jax.numpy as jnp

    src = jnp.asarray(source, jnp.float32)
    ref = jnp.asarray(reference, jnp.float32)
    flat = src.reshape(-1)
    n_src = flat.shape[0]
    ref_sorted = jnp.sort(ref.reshape(-1))
    n_ref = ref_sorted.shape[0]
    # rank of every source pixel (average rank over equal values via argsort
    # of argsort), then read the reference value at the same quantile
    order = jnp.argsort(flat)
    ranks = jnp.zeros(n_src, jnp.float32).at[order].set(
        jnp.arange(n_src, dtype=jnp.float32))
    positions = ranks / jnp.float32(max(n_src - 1, 1)) * jnp.float32(n_ref - 1)
    lo = jnp.floor(positions).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, n_ref - 1)
    w = positions - lo
    matched = ref_sorted[lo] * (1.0 - w) + ref_sorted[hi] * w
    return matched.reshape(src.shape)
