"""Config-surface tests: defaults, aliases, init_config artifact layout."""

import json
import os

from cmrtpu import config as C


def test_defaults_cover_reference_surface():
    cfg = C.normalise_config({})
    for key in ("DIM", "SPACING", "DEPTH", "FILTERS", "MASK_VALUES", "MASK_CLASSES",
                "BATCHSIZE", "SCALER", "LOSS_FUNCTION", "AUGMENT_PROB", "BORDER_MODE"):
        assert key in cfg
    assert cfg["DIM"] == [224, 224]
    assert cfg["MASK_VALUES"] == [1, 2]


def test_misspelled_plateau_alias():
    cfg = C.normalise_config({"REDUCE_LR_ON_PLAEAU_PATIENCE": 9})
    assert C.get(cfg, "REDUCE_LR_ON_PLATEAU_PATIENCE") == 9
    assert C.get(cfg, "REDUCE_LR_ON_PLAEAU_PATIENCE") == 9


def test_lowercase_keys_dropped():
    cfg = C.normalise_config({"batchsize": 4, "BATCHSIZE": 8})
    assert cfg["BATCHSIZE"] == 8
    assert "batchsize" not in cfg


def test_ndims_from_dim():
    assert C.ndims({"DIM": [224, 224]}) == 2
    assert C.ndims({"DIM": [10, 224, 224]}) == 3


def test_init_config_creates_dirs_and_json(tmp_path):
    cfg = {"EXPERIMENT": "exp1", "EXP_PATH": str(tmp_path / "exp1" / "ts"),
           "FOLD": 2, "LOSS_FUNCTION": "BcdDiceLoss", "lower": "dropme"}
    out = C.init_config(cfg, save=True)
    assert os.path.isdir(out["MODEL_PATH"])
    cfg_json = os.path.join(out["CONFIG_PATH"], "config.json")
    assert os.path.isfile(cfg_json)
    with open(cfg_json) as fh:
        saved = json.load(fh)
    assert saved["FOLD"] == 2
    assert "lower" not in saved
    # fold sub-folder convention exp/<EXP>/<ts>/f<k>/
    assert out["MODEL_PATH"].endswith(os.path.join("f2", "model"))


def test_reloadable_roundtrip(tmp_path):
    cfg = {"EXPERIMENT": "exp2", "EXP_PATH": str(tmp_path / "e"), "FOLD": 0,
           "DIM": [32, 32], "BATCHSIZE": 2}
    out = C.init_config(cfg, save=True)
    loaded = C.load_config(os.path.join(out["CONFIG_PATH"], "config.json"))
    assert loaded["DIM"] == [32, 32]
    assert loaded["BATCHSIZE"] == 2


def test_save_plot_versioning(tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from cmrtpu.utils.io_utils import save_plot

    fig, ax = plt.subplots()
    ax.plot([1, 2])
    p1 = save_plot(fig, str(tmp_path), "f.png")
    p2 = save_plot(fig, str(tmp_path), "f.png")
    assert p1.endswith("f.png") and p2.endswith("f_1.png")
    p3 = save_plot(fig, str(tmp_path), "f.png", override=True)
    assert p3 == p1
    plt.close(fig)


def test_get_metadata_maybe():
    from cmrtpu.io import MedicalImage
    from cmrtpu.utils.io_utils import get_metadata_maybe
    import numpy as np

    img = MedicalImage(array=np.zeros((2, 2)), metadata={"0008|103e": "cine"})
    assert get_metadata_maybe(img, "0008|103e") == "cine"
    assert get_metadata_maybe(img, "missing") == "not_found"


def test_load_pretrained_model_chain(tmp_path):
    import numpy as np
    from cmrtpu.train import checkpoint as ckpt

    params = {"conv": {"kernel": np.ones((3, 3, 1, 2), np.float32)}}
    ckpt.save_weights(str(tmp_path), params, {})
    p, bn, state = ckpt.load_pretrained_model(str(tmp_path))
    np.testing.assert_array_equal(p["conv"]["kernel"], params["conv"]["kernel"])
    assert state is None


def test_parse_override_pairs_types_and_python_literals():
    out = C.parse_override_pairs(
        ["TTA=False", "CC_FILTER=3d", "SIGMA=2.5", "EPOCHS=10",
         "GAUS=None", "DIM=[64, 64]"])
    assert out["TTA"] is False          # Python-literal False -> real bool
    assert out["CC_FILTER"] == "3d"
    assert out["SIGMA"] == 2.5 and out["EPOCHS"] == 10
    assert out["GAUS"] is None
    assert out["DIM"] == [64, 64]
    low = C.parse_override_pairs(["tta=true"])  # lowercase key upper-cased
    assert low == {"TTA": True}


def test_parse_override_pairs_rejects_unknown_and_malformed():
    import pytest
    with pytest.raises(ValueError, match="unknown config key"):
        C.parse_override_pairs(["CC_FILTR=3d"])  # typo must not no-op
    with pytest.raises(ValueError, match="not KEY=VAL"):
        C.parse_override_pairs(["JUSTAKEY"])
    # non-DEFAULTS but known-settable keys pass (_SETTABLE_EXTRA)
    assert C.parse_override_pairs(["RESUME=true"])["RESUME"] is True
