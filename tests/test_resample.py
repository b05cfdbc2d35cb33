"""ITK-parity resampling tests (SURVEY.md hard part #1)."""

import numpy as np
import pytest

from cmrtpu.io import MedicalImage
from cmrtpu.ops import resample as R
from cmrtpu.pipeline.transforms import calc_resampled_size


def test_identity_resample(rng):
    arr = rng.normal(size=(4, 16, 16)).astype(np.float32)
    out = R.resample_nd(arr, (1.0, 1.0, 1.0), (16, 16, 4), (1.0, 1.0, 1.0), R.LINEAR)
    np.testing.assert_allclose(out, arr, rtol=1e-6)


def test_nearest_preserves_labels(rng):
    msk = rng.integers(0, 3, size=(4, 20, 20)).astype(np.uint8)
    out = R.resample_nd(msk, (1.0, 1.0, 1.0), (40, 40, 4), (0.5, 0.5, 1.0), R.NEAREST)
    assert out.dtype == np.uint8
    assert set(np.unique(out)) <= {0, 1, 2}
    # 2x upsample with NN: out[0,0] == in[0,0]
    assert out[0, 0, 0] == msk[0, 0, 0]


def test_linear_downsample_2x_exact():
    # in-spacing 1, out-spacing 2 -> out[k] samples continuous index 2k exactly
    arr = np.arange(8, dtype=np.float32).reshape(1, 1, 8)
    out = R.resample_nd(arr, (1.0, 1.0, 1.0), (4, 1, 1), (2.0, 1.0, 1.0), R.LINEAR)
    np.testing.assert_allclose(out[0, 0], [0.0, 2.0, 4.0, 6.0])


def test_linear_upsample_midpoints():
    arr = np.array([[[0.0, 2.0]]], dtype=np.float32)
    out = R.resample_nd(arr, (1.0, 1.0, 1.0), (4, 1, 1), (0.5, 1.0, 1.0), R.LINEAR)
    np.testing.assert_allclose(out[0, 0], [0.0, 1.0, 2.0, 0.0])
    # last sample: continuous index 1.5 >= size-0.5 -> outside -> default 0 (ITK)


def test_outside_is_zero():
    arr = np.ones((1, 1, 4), dtype=np.float32)
    out = R.resample_nd(arr, (1.0, 1.0, 1.0), (8, 1, 1), (1.0, 1.0, 1.0), R.LINEAR)
    np.testing.assert_allclose(out[0, 0], [1, 1, 1, 1, 0, 0, 0, 0])


def test_roundtrip_resample_undo(rng):
    """preprocess->undo ≈ identity: the invariant undo_generator_steps relies on
    (ref: src/data/Postprocess.py:8-61)."""
    arr = np.zeros((1, 32, 32), dtype=np.float32)
    arr[0, 8:24, 8:24] = 1.0
    in_spacing = (1.4, 1.4, 8.0)
    target = (1.2, 1.2, 8.0)
    new_size = calc_resampled_size((32, 32, 1), in_spacing, target)
    up = R.resample_nd(arr, in_spacing, new_size, target, R.NEAREST)
    back = R.resample_nd(up, target, (32, 32, 1), in_spacing, R.NEAREST)
    # interior agreement (borders may differ by one voxel after rounding)
    assert (back[0, 10:22, 10:22] == arr[0, 10:22, 10:22]).mean() > 0.99


def test_jax_matches_numpy(rng):
    import jax

    arr = rng.normal(size=(3, 24, 20)).astype(np.float32)
    args = ((1.3, 1.1, 8.0), (28, 30, 3), (1.0, 0.9, 8.0))
    for interp in (R.LINEAR, R.NEAREST):
        np_out = R.resample_nd(arr, *args, interpolate=interp)
        jax_out = jax.jit(
            lambda a: R.resample_nd_jax(a, *args, interpolate=interp))(arr)
        np.testing.assert_allclose(np.asarray(jax_out), np_out, atol=1e-4)


def test_resample_image_wrapper(rng):
    img = MedicalImage(array=rng.normal(size=(2, 16, 16)).astype(np.float32),
                       spacing=(1.4, 1.4, 8.0), origin=(1.0, 2.0, 3.0))
    out = R.resample_image(img, (19, 19, 2), (1.2, 1.2, 8.0), R.LINEAR)
    assert out.array.shape == (2, 19, 19)
    assert out.spacing == (1.2, 1.2, 8.0)
    assert out.origin == img.origin
