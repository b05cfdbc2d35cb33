"""Direct pins for long-tail helpers the e2e flows only touch indirectly:
ACDC folder descriptors (ref: src/data/Dataset.py:53-56, :758-787, :949-985,
:1139-1146, :1410-1428), 3D connected components vs a scipy oracle
(ref: src/data/Postprocess.py:64-102), per-slice histogram matching
(ref: src/data/Preprocess.py:353-379), the pad/crop complement rule
(ref: Preprocess.py:494-541), and the viz/layers utilities."""

import os

import numpy as np
import pandas as pd
import pytest

from cmrtpu.data import dataset as D
from cmrtpu.io import MedicalImage, read_image, write_image


@pytest.fixture()
def acdc_folder(tmp_path):
    p = tmp_path / "patient042"
    p.mkdir()
    (p / "Info.cfg").write_text("ED: 1\nES: 9\nGroup: MINF\n")
    vol = np.zeros((2, 6, 6), np.float32)
    for frame in (1, 9):
        for gt in ("", "_gt"):
            write_image(MedicalImage(array=vol, spacing=(1.0, 1.0, 5.0)),
                        str(p / f"patient042_frame{frame:02d}{gt}.nii.gz"))
    write_image(MedicalImage(array=np.zeros((3, 2, 6, 6), np.float32),
                             spacing=(1.0, 1.0, 5.0, 1.0)),
                str(p / "patient042_4d.nii.gz"))
    return str(p)


def test_acdc_folder_descriptors(acdc_folder):
    assert D.get_pathology_group(acdc_folder) == "MINF"
    df = D.describe_acdc_patient_folder(acdc_folder)
    assert list(df["phase"]) == ["cfg", "ed", "ed_gt", "es", "es_gt", "4d"]
    assert (df["pathology"] == "MINF").all()
    assert (df["patient"] == "patient042").all()
    assert df[df["phase"] == "es_gt"]["files"].iloc[0].endswith(
        "frame09_gt.nii.gz")

    x, y = D.load_acdc_files(os.path.dirname(acdc_folder))
    assert [os.path.basename(f) for f in y] == [
        "patient042_frame01_gt.nii.gz", "patient042_frame09_gt.nii.gz"]
    assert [os.path.basename(f) for f in x] == [
        "patient042_frame01.nii.gz", "patient042_frame09.nii.gz"]


def test_filter_x_by_patient_ids():
    files = [f"/d/patient{i:03d}_frame01_0_img.nrrd" for i in (1, 2, 3)]
    df = D.filter_x_by_patient_ids(files, ["patient001", "patient003"],
                                   fold=2, pathology="NOR")
    assert [D.get_patient(f) for f in df["x_path"]] == ["patient001",
                                                        "patient003"]
    assert (df["y_path"].str.contains("msk")).all()
    assert (df["fold"] == 2).all() and (df["modality"] == "test").all()
    # filter=False keeps everything
    assert len(D.filter_x_by_patient_ids(files, [], filter=False)) == 3


def test_is_patient_in_df_and_minmax_t():
    df = pd.DataFrame({"patient_unique": ["a", "b"]})
    assert D.is_patient_in_df({"patient_unique": "a"}, df) is True
    assert D.is_patient_in_df({"patient_unique": "z"}, df) is False

    from cmrtpu.data.analytics import get_min_max_t_per_patient
    dfp = pd.DataFrame({"patient": ["p"] * 4, "vol in ml": [50, 80, 30, 60],
                        "t_norm": [0, 1, 2, 3]})
    got = get_min_max_t_per_patient(dfp)
    assert got == {"patient": "p", "min_t": 2, "max_t": 1}


def test_save_3d_roundtrip(tmp_path):
    nda = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
    f = str(tmp_path / "vol.nrrd")
    D.save_3d(nda, f)
    assert np.array_equal(read_image(f).array, nda)


def test_label_components_3d_matches_scipy():
    import jax.numpy as jnp
    from scipy import ndimage

    from cmrtpu.ops.connected_components import label_components_3d

    rng = np.random.default_rng(3)
    mask = (rng.uniform(size=(4, 12, 12)) > 0.72)
    ours = np.asarray(label_components_3d(jnp.asarray(mask)))
    theirs, n = ndimage.label(mask, structure=np.ones((3, 3, 3)))
    # same partition: component ids differ (min-index seeds vs 1..n, and a
    # background sentinel instead of 0), but the grouping must be identical
    assert len(np.unique(ours[mask])) == n
    for lbl in range(1, n + 1):
        assert len(np.unique(ours[theirs == lbl])) == 1
    assert set(np.unique(ours[mask])).isdisjoint(np.unique(ours[~mask]))
    # diagonal-only contact merges (26-connectivity)
    diag = np.zeros((2, 2, 2), bool)
    diag[0, 0, 0] = diag[1, 1, 1] = True
    got = np.asarray(label_components_3d(jnp.asarray(diag)))
    assert got[0, 0, 0] == got[1, 1, 1]
    assert got[0, 0, 0] not in got[~diag]


def test_match_2d_on_nd_is_per_slice():
    from cmrtpu.pipeline.histmatch import match_2d_on_nd, match_histograms

    rng = np.random.default_rng(5)
    vol = rng.normal(100, 30, size=(3, 16, 16)).astype(np.float32)
    ref = rng.normal(300, 60, size=(16, 16)).astype(np.float32)
    got = match_2d_on_nd(vol, ref)
    assert got.shape == vol.shape
    for z in range(3):
        assert np.allclose(got[z], match_histograms(vol[z], ref))
    # 4D applies per [t][z] slice; 2D is the direct call
    v4 = vol[None]
    assert np.allclose(match_2d_on_nd(v4, ref)[0], got)
    assert np.allclose(match_2d_on_nd(vol[0], ref), got[0])


def test_pad_crop_margins_complement_rule():
    from cmrtpu.pipeline.transforms import pad_crop_margins

    # odd difference: the FIRST margin takes the extra voxel, padding and
    # cropping alike (the reference's complement rule)
    pads, crops = pad_crop_margins((5, 8), (8, 5))
    assert pads == [(2, 1), (0, 0)]
    assert crops == [(0, 0), (2, 1)]
    pads, crops = pad_crop_margins((6,), (6,))
    assert pads == [(0, 0)] and crops == [(0, 0)]


def test_resize_inplane_shapes_and_constants():
    import jax.numpy as jnp

    from cmrtpu.models.layers import resize_inplane

    x = jnp.full((2, 3, 8, 8, 4), 7.0)
    y = resize_inplane(x, (16, 12))
    assert y.shape == (2, 3, 16, 12, 4)
    assert np.allclose(np.asarray(y), 7.0)


def test_overlay_slice_draws_flat_and_channel_masks(tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from cmrtpu.visualization.visualize import overlay_slice, write_figure

    img = np.random.default_rng(0).uniform(size=(16, 16)).astype(np.float32)
    flat = np.zeros((16, 16), np.uint8)
    flat[2:5, 2:5] = 1
    flat[8:11, 8:11] = 2
    fig, axes = plt.subplots(1, 3)
    overlay_slice(axes[0], img, flat)                    # flat labels
    overlay_slice(axes[1], img, np.eye(16)[..., None])   # channel mask
    overlay_slice(axes[2], img, np.zeros((16, 16)))      # empty mask
    out = str(tmp_path / "fig.png")
    write_figure(fig, out)
    assert os.path.getsize(out) > 0
