"""Postprocessing tests: CC filters (host vs device), undo_generator_steps."""

import jax
import numpy as np
import pytest

from cmrtpu.io import MedicalImage
from cmrtpu.ops import resample as R
from cmrtpu.ops.connected_components import (clean_3d_prediction_2d_cc_host,
                                             clean_3d_prediction_3d_cc_host,
                                             clean_prediction_2d_cc,
                                             largest_component_2d)
from cmrtpu.predict.postprocess import undo_generator_steps


def test_largest_component_2d():
    mask = np.zeros((16, 16), bool)
    mask[2:5, 2:5] = True       # 9 px
    mask[10:12, 10:12] = True   # 4 px
    out = np.asarray(jax.device_get(largest_component_2d(mask)))
    assert out[3, 3] and not out[10, 10]
    assert out.sum() == 9


def test_largest_component_diagonal_not_connected():
    # 4-connectivity: diagonal pixels are separate components
    mask = np.zeros((8, 8), bool)
    mask[2, 2] = mask[3, 3] = mask[4, 4] = True
    mask[6, 0:3] = True  # 3-px line is the biggest 4-connected comp
    out = np.asarray(jax.device_get(largest_component_2d(mask)))
    assert out[6, 0] and out[6, 2] and not out[2, 2]


def test_device_cc_matches_host(rng):
    pred = np.zeros((3, 24, 24), np.float64)
    for z in range(3):
        for val in (1, 2):
            for _ in range(3):
                cy, cx = rng.integers(2, 20, size=2)
                h, w = rng.integers(1, 4, size=2)
                pred[z, cy:cy + h, cx:cx + w] = val
    host = clean_3d_prediction_2d_cc_host(pred)
    dev = np.asarray(jax.device_get(clean_prediction_2d_cc(pred, (1, 2))))
    np.testing.assert_array_equal(host, dev)


def test_empty_slice_unchanged():
    pred = np.zeros((2, 8, 8))
    out = np.asarray(jax.device_get(clean_prediction_2d_cc(pred, (1, 2))))
    assert out.sum() == 0


def test_3d_cc_host():
    pred = np.zeros((4, 10, 10))
    pred[0:3, 2:5, 2:5] = 1     # 27-voxel blob
    pred[3, 8, 8] = 1           # isolated voxel
    out = clean_3d_prediction_3d_cc_host(pred)
    assert out[1, 3, 3] == 1 and out[3, 8, 8] == 0


def test_undo_generator_steps_roundtrip(rng):
    """Forward preprocess (resample -> pad/crop) then undo ≈ original geometry
    (ref invariant: src/data/Postprocess.py:8-61)."""
    from cmrtpu.pipeline import transforms as T

    # original: 30x28 in-plane at 1.4mm, 4 slices at 8mm
    orig_arr = np.zeros((4, 30, 28), np.uint8)
    orig_arr[:, 10:18, 9:16] = 1
    orig = MedicalImage(array=orig_arr, spacing=(1.4, 1.4, 8.0))
    cfg = {"SPACING": [1.2, 1.2], "DIM": [48, 48]}

    # forward: resample in-plane to 1.2mm, pad/crop each slice to DIM
    target_spacing = (1.2, 1.2, 8.0)
    new_size = T.calc_resampled_size(orig.size, orig.spacing, target_spacing)
    res = R.resample_nd(orig.array, orig.spacing, new_size, target_spacing,
                        R.NEAREST)
    processed = np.stack([T.pad_and_crop(s, (48, 48)) for s in res])

    undone = undo_generator_steps(processed, cfg, R.NEAREST, orig)
    assert undone.array.shape == orig.array.shape
    assert undone.spacing == orig.spacing
    # geometry round-trip: overwhelming voxel agreement
    agreement = (undone.array == orig.array).mean()
    assert agreement > 0.98, f"agreement {agreement}"


def test_undo_without_resample_noop_shapes():
    orig = MedicalImage(array=np.zeros((2, 32, 32), np.uint8),
                        spacing=(1.2, 1.2, 8.0))
    cfg = {"SPACING": [1.2, 1.2]}
    pred = np.zeros((2, 48, 48), np.uint8)
    pred[:, 20:24, 20:24] = 2
    out = undo_generator_steps(pred, cfg, R.NEAREST, orig)
    assert out.array.shape == (2, 32, 32)
    assert 2 in out.array  # centre blob survives the crop


def test_cc_filter_3d_removes_isolated_offslice_blob():
    """CC_FILTER='3d' keeps the contiguous landmark stack and removes an
    isolated spurious blob on an otherwise-empty slice — exactly the false
    positive per-slice 2D CC (reference parity, truthy CC_FILTER) must keep
    (it is the biggest component on its slice)."""
    import numpy as np

    from cmrtpu.predict.predictor import cc_clean_fn

    pred = np.zeros((4, 12, 12), np.uint8)
    pred[0:3, 4:6, 4:6] = 1          # true stack across z=0..2
    pred[3, 9:11, 9:11] = 1          # spurious blob on an empty slice
    pred[1, 8:10, 2:4] = 2           # label 2 only on one slice (kept)

    assert cc_clean_fn({"CC_FILTER": False}) is None
    cc2d = cc_clean_fn({"CC_FILTER": True})
    cc3d = cc_clean_fn({"CC_FILTER": "3d"})

    out2d = np.asarray(cc2d(pred, (1, 2)))
    assert out2d[3, 9:11, 9:11].sum() > 0    # 2D CC keeps the spurious blob

    out3d = np.asarray(cc3d(pred, (1, 2)))
    assert out3d[3].sum() == 0               # 3D CC removes it
    assert (out3d[0:3, 4:6, 4:6] == 1).all()  # true stack survives
    assert (out3d[1, 8:10, 2:4] == 2).all()   # other label untouched


def test_cc_clean_fn_strict_dispatch():
    import pytest

    from cmrtpu.predict.predictor import (cc_clean_fn,
                                          clean_prediction_2d_cc,
                                          clean_prediction_3d_cc)
    # falsy spellings -> off (the parse_override_pairs 'False' string too)
    for off in (False, 0, None, "", "false", "None", "0"):
        assert cc_clean_fn({"CC_FILTER": off}) is None
    assert cc_clean_fn({"CC_FILTER": "2d"}) is clean_prediction_2d_cc
    assert cc_clean_fn({"CC_FILTER": True}) is clean_prediction_2d_cc
    assert cc_clean_fn({"CC_FILTER": " 3D "}) is clean_prediction_3d_cc
    # unrecognized strings raise instead of silently measuring 2D CC
    with pytest.raises(ValueError, match="CC_FILTER"):
        cc_clean_fn({"CC_FILTER": "volume"})


def test_predict_override_twin_rejects_bad_keys(tmp_path):
    import pytest

    from cmrtpu.predict.predictor import predict_override_twin
    (tmp_path / "f0").mkdir()
    with pytest.raises(ValueError, match="unknown override key"):
        predict_override_twin(str(tmp_path), {"cc_filter": "3d"}, "ab")
    with pytest.raises(ValueError, match="unknown override key"):
        predict_override_twin(str(tmp_path), {"CC_FILTR": "3d"}, "ab")
