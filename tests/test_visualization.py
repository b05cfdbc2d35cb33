"""Visualization layer: every figure builds and writes a PNG."""

import os

import numpy as np
import pandas as pd
import pytest

from cmrtpu.visualization import analysis as VA
from cmrtpu.visualization import visualize as V


@pytest.fixture
def vol():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(6, 32, 32)).astype(np.float32)
    msk = np.zeros((6, 32, 32), np.uint8)
    msk[:, 10:14, 10:14] = 1
    msk[:, 20:24, 20:24] = 2
    return img, msk


def test_plot_2d_or_3d(vol, tmp_path):
    img, msk = vol
    p = str(tmp_path / "fig.png")
    V.plot_2d_or_3d(img[0], msk[0], path=p)
    assert os.path.getsize(p) > 0
    V.plot_2d_or_3d(img, msk, path=p)
    assert os.path.getsize(p) > 0


def test_plot_3d_4d(vol, tmp_path):
    img, _ = vol
    V.plot_3d_vol(img, cols=3, path=str(tmp_path / "v3.png"))
    V.plot_4d_vol(np.stack([img, img]), path=str(tmp_path / "v4.png"))
    assert os.path.getsize(tmp_path / "v3.png") > 0
    assert os.path.getsize(tmp_path / "v4.png") > 0


def test_dice_per_slice_bar(vol, tmp_path):
    _, msk = vol
    pred = msk.copy()
    pred[3] = 0  # one empty prediction slice
    fig, scores = VA.plot_dice_per_slice_bar(msk, pred,
                                             save_path=str(tmp_path / "d.png"))
    assert len(scores) == 6
    assert scores[0] == pytest.approx(1.0)
    assert scores[3] < 1.0


def test_create_eval_plot(tmp_path):
    df = pd.DataFrame({"LV": [0.9, 0.85], "RV": [0.8, 0.7]})
    VA.create_eval_plot(df, df * 10, df * 100, eval_name="test",
                        path=str(tmp_path / "violin.png"))
    assert os.path.getsize(tmp_path / "violin.png") > 0


def test_bland_altman():
    a = np.array([1.0, 2.0, 3.0, 4.0])
    b = a + 0.5
    fig, (md, sd) = VA.bland_altman_metric_plot(a, b)
    assert md == pytest.approx(-0.5)
    assert sd == pytest.approx(0.0)


def test_confusion_matrix(tmp_path):
    y_true = [0, 0, 1, 1, 2]
    y_pred = [0, 1, 1, 1, 2]
    fig, cm = VA.plot_confusion_matrix(y_true, y_pred, ["bg", "ant", "inf"],
                                       path=str(tmp_path / "cm.png"))
    assert cm[0, 0] == 1 and cm[0, 1] == 1 and cm[1, 1] == 2 and cm[2, 2] == 1
    _, cm_n = VA.plot_confusion_matrix(y_true, y_pred, ["bg", "ant", "inf"],
                                       normalize=True)
    np.testing.assert_allclose(cm_n.sum(axis=1), 1.0)


def test_histogram_quiver_radar_phases(vol, tmp_path):
    img, _ = vol
    VA.plot_value_histogram(img, f_name=str(tmp_path / "h.png"))
    assert os.path.getsize(tmp_path / "h.png") > 0
    field = np.zeros((32, 32, 2), np.float32)
    field[..., 0] = 1.0
    VA.create_quiver_plot(field)
    df = pd.DataFrame({"d_ant": [3.2], "d_inf": [2.1], "tpr": [0.9]})
    VA.plot_radar_chart(df)
    gt = np.zeros((2, 30))
    gt[0, 3] = 1
    gt[1, 12] = 1
    VA.show_phases(gt, pred=gt, phase_names=("ED", "ES"),
                   path=str(tmp_path / "ph.png"))
    VA.show_phases_transpose(gt.T)


def test_prediction_overlays(vol, tmp_path):
    img, msk = vol
    chans = np.stack([msk == 1, msk == 2], axis=-1).astype(np.float32)
    V.save_prediction_overlays(img[..., None], chans, chans,
                               str(tmp_path / "ov.png"))
    assert os.path.getsize(tmp_path / "ov.png") > 0


def test_reference_named_fronts(tmp_path):
    from cmrtpu.visualization.visualize import (my_autopct, show_2D_or_3D,
                                                show_slice,
                                                show_slice_transparent)
    assert my_autopct(5.0) == "5%"
    assert my_autopct(0.5) == ""
    img = np.random.default_rng(0).normal(size=(16, 16)).astype(np.float32)
    msk = np.zeros((16, 16), np.uint8)
    msk[4:8, 4:8] = 1
    fig_out = show_slice_transparent(img, msk, show=False)
    assert hasattr(fig_out, "savefig")  # figure, not axes (reference contract)
    assert show_slice(img, msk, show=False) is not None
    # 4-channel background-first mask: background channel must be stripped
    onehot = np.zeros((16, 16, 4), np.float32)
    onehot[..., 0] = 1.0
    onehot[4:8, 4:8, 0] = 0.0
    onehot[4:8, 4:8, 1] = 1.0
    assert show_slice_transparent(img, onehot, show=False) is not None
    assert show_slice_transparent(None, None) is None
    fig = show_2D_or_3D(np.stack([img] * 3), np.stack([msk] * 3))
    assert fig is not None
    import matplotlib.pyplot as plt
    plt.close("all")
