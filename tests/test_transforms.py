"""Parity tests for the preprocessing primitives (SURVEY.md §4 test plan (a))."""

import numpy as np
import pytest

from cmrtpu.pipeline import transforms as T


def _reference_pad_and_crop(ndarray, target_shape):
    """Literal re-derivation of the reference rule for cross-checking
    (behavioural spec of ref: src/data/Preprocess.py:494-541)."""
    cropped = np.zeros(target_shape)
    diff = np.array(ndarray.shape) - np.array(target_shape)
    d = list((int(x // 2), int(x // 2)) if x % 2 == 0
             else (int(np.floor(x / 2)), int(np.floor(x / 2) + 1)) if x < 0
             else (int(np.floor(x / 2) + 1), int(np.floor(x / 2))) for x in diff)
    d = list((abs(x), abs(y)) if y != 0 else (abs(x), None) for x, y in d)
    pad_bool, crop_bool = diff < 0, diff > 0
    pad = list(i if b else (None, None) for i, b in zip(d, pad_bool))
    crop = list(i if b else (None, None) for i, b in zip(d, crop_bool))
    pad = tuple(slice(i[0], -i[1]) if i[1] is not None else slice(i[0], i[1]) for i in pad)
    crop = tuple(slice(i[0], -i[1]) if i[1] is not None else slice(i[0], i[1]) for i in crop)
    cropped[pad] = ndarray[crop]
    return cropped


@pytest.mark.parametrize("shape,target", [
    ((10, 10), (10, 10)),
    ((10, 10), (14, 14)),       # even pad
    ((10, 10), (13, 17)),       # odd pad
    ((20, 20), (10, 10)),       # even crop
    ((21, 19), (10, 10)),       # odd crop
    ((13, 22), (22, 13)),       # mixed pad+crop
    ((5, 9, 8), (8, 5, 9)),     # 3D mixed
    ((224, 224), (223, 225)),
])
def test_pad_and_crop_matches_reference_rule(shape, target, rng):
    x = rng.normal(size=shape)
    ours = T.pad_and_crop(x, target)
    ref = _reference_pad_and_crop(x, target)
    np.testing.assert_allclose(ours, ref)


def test_pad_and_crop_preserves_dtype(rng):
    x = rng.integers(0, 3, size=(9, 9)).astype(np.uint8)
    assert T.pad_and_crop(x, (12, 7)).dtype == np.uint8


def test_calc_resampled_size():
    # 224 voxels at 1.4mm -> 1.2mm target: 224*1.4/1.2 = 261.33 -> 261
    assert T.calc_resampled_size((224, 224, 10), (1.4, 1.4, 8.0), (1.2, 1.2, 8.0)) \
        == [261, 261, 10]
    # np.around banker's rounding parity: 2.5 -> 2
    assert T.calc_resampled_size((5,), (1.0,), (2.0,)) == [2]


def test_clip_quantile(rng):
    x = rng.normal(size=(64, 64)).astype(np.float32)
    out = T.clip_quantile(x, 0.9)
    q = np.quantile(x, 0.9)
    assert out.max() <= q + 1e-6 and out.min() >= 0.0


def test_normalise_minmax_standard(rng):
    x = rng.normal(5.0, 3.0, size=(32, 32)).astype(np.float32)
    mm = T.normalise_image(x, "MinMax")
    assert mm.min() == pytest.approx(0.0, abs=1e-6)
    assert mm.max() == pytest.approx(1.0, rel=1e-5)
    st = T.normalise_image(x, "Standard")
    assert abs(st.mean()) < 1e-4 and st.std() == pytest.approx(1.0, rel=1e-3)


def test_binary_mask_roundtrip(synthetic_slice):
    _, msk = synthetic_slice
    channels = T.transform_to_binary_mask(msk, mask_values=[1, 2])
    assert channels.shape == (*msk.shape, 2)
    flat = T.from_channel_to_flat(channels.astype(np.float32), start_c=1)
    np.testing.assert_array_equal(flat, msk)


def test_threshold_to_flat_labels(synthetic_slice):
    _, msk = synthetic_slice
    channels = T.transform_to_binary_mask(msk, mask_values=[1, 2]).astype(np.float32)
    flat = T.threshold_to_flat_labels(channels * 0.9)
    np.testing.assert_array_equal(flat, msk)
