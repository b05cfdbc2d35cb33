"""Pallas kernels + their dispatching wrappers.

On the CPU test backend the wrappers take the XLA path; the pallas kernels
themselves run in interpret mode off-TPU (pallas_kernels._interpret()), so
the same kernel code path is exercised everywhere — compiled on real TPU,
interpreted here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmrtpu.ops.connected_components import (
    clean_3d_prediction_2d_cc_host,
    clean_3d_prediction_3d_cc_host,
    clean_prediction_2d_cc,
    largest_component_batch,
)
from cmrtpu.ops.gaussian import gaussian_blur_2d, smooth_heatmap_targets



def test_gaussian_pallas_matches_jnp_interpret():
    from cmrtpu.ops.pallas_kernels import gaussian_blur_2d_pallas
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 48, 40)).astype(np.float32)
    out_p = np.asarray(gaussian_blur_2d_pallas(x, 2.0))
    out_j = np.asarray(gaussian_blur_2d(jnp.asarray(x), 2.0))
    np.testing.assert_allclose(out_p, out_j, atol=1e-5)


def test_gaussian_pallas_leading_axes():
    from cmrtpu.ops.pallas_kernels import gaussian_blur_2d_pallas
    x = np.zeros((2, 3, 16, 16), np.float32)
    x[..., 8, 8] = 1.0
    out = np.asarray(gaussian_blur_2d_pallas(x, 1.0))
    assert out.shape == x.shape
    np.testing.assert_allclose(out.sum(axis=(-2, -1)), 1.0, atol=1e-4)


def test_largest_component_batch_matches_host():
    rng = np.random.default_rng(1)
    masks = (rng.random((4, 24, 24)) > 0.82)
    kept = np.asarray(largest_component_batch(masks))
    for i in range(4):
        host = clean_3d_prediction_2d_cc_host(
            masks[i][None].astype(np.uint8))[0] > 0
        np.testing.assert_array_equal(kept[i], host)


def test_clean_prediction_2d_cc_two_labels():
    pred = np.zeros((2, 20, 20), np.float64)
    pred[0, 2:5, 2:5] = 1     # big ant blob
    pred[0, 10, 10] = 1       # speck -> removed
    pred[0, 14:18, 14:18] = 2
    pred[1, 0, 0] = 2         # single-pixel component survives (only one)
    out = np.asarray(clean_prediction_2d_cc(pred, (1, 2)))
    assert out[0, 10, 10] == 0
    assert out[0, 3, 3] == 1 and out[0, 15, 15] == 2
    assert out[1, 0, 0] == 2
    host = clean_3d_prediction_2d_cc_host(pred.astype(np.uint8))
    np.testing.assert_array_equal(out.astype(np.uint8), host)


def test_smooth_heatmap_targets_dispatch():
    m = np.zeros((2, 32, 32, 2), np.float32)
    m[0, 10, 10, 0] = 1
    m[1, 20, 20, 1] = 1
    hm = np.asarray(smooth_heatmap_targets(jnp.asarray(m), 2.0))
    assert hm.shape == m.shape
    assert hm.max() == pytest.approx(1.0, abs=1e-4)
    assert hm[0, 10, 10, 0] > hm[0, 14, 10, 0] > 0


def test_cc_pallas_kernel():
    # compiled on real TPU; interpret mode on the CPU backend (~1s at this
    # size — same kernel body either way)
    from cmrtpu.ops.connected_components import label_components_2d
    from cmrtpu.ops.pallas_kernels import converge_labels_pallas
    m = np.zeros((2, 64, 64), np.uint8)
    m[0, 2:6, 2:6] = 1
    m[0, 20:30, 20:30] = 1
    m[1, 5, 5] = 1
    lab_p = np.asarray(converge_labels_pallas(m))
    lab_j = np.stack([np.asarray(label_components_2d(jnp.asarray(s) > 0))
                      for s in m])
    np.testing.assert_array_equal(lab_p, lab_j)


def test_3d_cc_matches_host():
    from cmrtpu.ops.connected_components import clean_prediction_3d_cc
    rng = np.random.default_rng(3)
    pred = np.zeros((6, 20, 20), np.float64)
    pred[0:3, 2:6, 2:6] = 1          # big 3D blob label 1
    pred[5, 15, 15] = 1              # disconnected speck -> removed
    pred[2:5, 10:14, 10:14] = 2
    pred[0, 0, 0] = 2                # corner speck -> removed
    out = np.asarray(clean_prediction_3d_cc(pred, (1, 2)))
    host = clean_3d_prediction_3d_cc_host(pred.astype(np.uint8))
    np.testing.assert_array_equal(out.astype(np.uint8), host)


def test_3d_cc_diagonal_connectivity():
    """26-connectivity: diagonal-only touching voxels are ONE component."""
    from cmrtpu.ops.connected_components import clean_prediction_3d_cc
    pred = np.zeros((4, 8, 8), np.float64)
    pred[0, 0, 0] = 1
    pred[1, 1, 1] = 1                # touches only diagonally in 3D
    pred[3, 6, 6] = 1                # separate single voxel
    out = np.asarray(clean_prediction_3d_cc(pred, (1,)))
    assert out[0, 0, 0] == 1 and out[1, 1, 1] == 1
    assert out[3, 6, 6] == 0


def test_histmatch_jax_close_to_host():
    from cmrtpu.pipeline.histmatch import match_histograms, match_histograms_jax
    rng = np.random.default_rng(4)
    src = rng.normal(0, 1, (48, 48)).astype(np.float32)
    ref = rng.gamma(2.0, 2.0, (48, 48)).astype(np.float32)
    host = match_histograms(src, ref)
    dev = np.asarray(match_histograms_jax(src, ref))
    # rank formulation == quantile mapping up to ties/interp: close overall
    assert np.abs(host - dev).mean() < 0.05
    # monotone: ordering of pixels preserved
    flat_src = src.reshape(-1)
    flat_dev = dev.reshape(-1)
    order = np.argsort(flat_src)
    assert (np.diff(flat_dev[order]) >= -1e-5).all()
    # matched distribution ~ reference distribution
    assert abs(np.median(dev) - np.median(ref)) < 0.2


def test_cc_serpentine_converges_to_fixed_point():
    """A serpentine single component with geodesic diameter >> min(h, w)
    must still converge to one label (max_iters defaults to h*w)."""
    from cmrtpu.ops.pallas_kernels import converge_labels_pallas
    from cmrtpu.ops.connected_components import label_components_2d

    h = w = 24
    m = np.zeros((h, w), np.int32)
    for r in range(0, h, 2):          # boustrophedon corridor
        m[r, :] = 1
        if r + 1 < h:
            m[r + 1, -1 if (r // 2) % 2 == 0 else 0] = 1
    got = np.asarray(converge_labels_pallas(m[None]))[0]
    want = np.asarray(label_components_2d(m))
    np.testing.assert_array_equal(got, want)
    fg = got[m == 1]
    assert (fg == fg[0]).all()  # single component, fully propagated


def test_histmatch_binned_close_to_host():
    """The sort-free binned matcher agrees with the host skimage-semantics
    path to within its bin-quantisation bound and preserves ordering."""
    from cmrtpu.pipeline.histmatch import (match_histograms,
                                           match_histograms_binned_jax)
    rng = np.random.default_rng(6)
    src = rng.normal(0, 1, (64, 64)).astype(np.float32)
    ref = rng.gamma(2.0, 2.0, (64, 64)).astype(np.float32)
    host = match_histograms(src, ref)
    dev = np.asarray(match_histograms_binned_jax(src, ref, bins=4096))
    span = float(ref.max() - ref.min())
    # per-pixel error bounded by a few bin widths; mean far below that
    assert np.abs(host - dev).mean() < 3 * span / 4096
    assert np.abs(host - dev).max() < 0.05 * span
    order = np.argsort(src.reshape(-1))
    assert (np.diff(dev.reshape(-1)[order]) >= -1e-5).all()


def test_histmatch_binned_ties_map_identically():
    from cmrtpu.pipeline.histmatch import match_histograms_binned_jax
    rng = np.random.default_rng(7)
    src = np.round(rng.normal(0, 1, (32, 32)), 1).astype(np.float32)  # ties
    ref = rng.normal(5, 2, (32, 32)).astype(np.float32)
    dev = np.asarray(match_histograms_binned_jax(src, ref))
    for v in np.unique(src)[:10]:
        outs = dev[src == v]
        assert np.allclose(outs, outs[0])


def test_histmatch_binned_excludes_padding_zeros():
    """Matching padded cache images must reproduce the host path's
    match-unpadded-then-repad semantics: zero borders stay zero and do not
    drag the interior mapping toward the reference's mid-intensities."""
    from cmrtpu.pipeline.histmatch import (match_histograms,
                                           match_histograms_binned_jax)
    from cmrtpu.pipeline.transforms import pad_and_crop
    rng = np.random.default_rng(8)
    # unpadded interiors strictly positive (MinMax output shifted off zero)
    src = rng.uniform(0.05, 1.0, (40, 44)).astype(np.float32)
    ref = rng.uniform(0.1, 2.0, (64, 64)).astype(np.float32)
    src_padded = pad_and_crop(src, (64, 64))
    ref_padded = pad_and_crop(ref, (64, 64))

    host = pad_and_crop(match_histograms(src, ref), (64, 64))
    dev = np.asarray(match_histograms_binned_jax(src_padded, ref_padded,
                                                 exclude_zeros=True))
    border = src_padded == 0
    assert (dev[border] == 0).all()
    span = float(ref.max() - ref.min())
    assert np.abs(host[~border] - dev[~border]).mean() < 3 * span / 4096
    # without exclusion the interior mapping is visibly wrong (regression
    # guard for the padded-histogram bug)
    naive = np.asarray(match_histograms_binned_jax(src_padded, ref_padded))
    assert np.abs(host[~border] - naive[~border]).mean() > 10 * span / 4096
