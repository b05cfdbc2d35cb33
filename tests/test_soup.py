"""Uniform model soup of fold checkpoints (cmrtpu/predict/ensemble.py)."""

import numpy as np
import pytest

from cmrtpu.predict.ensemble import EnsemblePredictor, soup_experiment
from cmrtpu.train.checkpoint import save_weights
from cmrtpu.train.trainer import Trainer

CFG = {"DIM": [32, 32], "DEPTH": 2, "FILTERS": 4, "MASK_CLASSES": 2,
       "MASK_VALUES": [1, 2], "BATCHSIZE": 4, "MIXED_PRECISION": False,
       "SEED": 0, "LEARNING_RATE": 1e-3}


def test_soup_is_leafwise_mean(tmp_path):
    import jax
    dirs, trees = [], []
    for k in range(3):
        t = Trainer(dict(CFG, SEED=k))
        d = tmp_path / f"f{k}" / "model"
        save_weights(str(d), t.state.params, t.state.batch_stats)
        dirs.append(str(d))
        trees.append(jax.device_get(t.state.params))
    ens = EnsemblePredictor(dict(CFG), dirs)
    params, stats = ens.soup()
    want = jax.tree_util.tree_map(
        lambda *ls: np.mean(np.stack([np.asarray(l) for l in ls]), axis=0),
        *trees)
    for w, g in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_allclose(np.asarray(w), np.asarray(g), atol=1e-6)
        assert np.asarray(g).dtype == np.asarray(w).dtype

    # souped weights drive a plain single-model forward
    from cmrtpu.models.hybrids import get_model
    x = np.random.default_rng(0).normal(size=(2, 32, 32, 1)).astype(np.float32)
    out = get_model(dict(CFG)).apply({"params": params, "batch_stats": stats},
                                     x, train=False)
    assert np.isfinite(np.asarray(out)).all()


def test_soup_experiment_refuses_int8(tmp_path):
    import json
    import os
    t = Trainer(CFG)
    fold = tmp_path / "f0"
    save_weights(str(fold / "model"), t.state.params, t.state.batch_stats)
    os.makedirs(fold / "config")
    with open(fold / "config" / "config.json", "w") as fh:
        json.dump(dict(CFG, QUANT_INT8=True), fh)
    with pytest.raises(ValueError, match="soup the float root"):
        soup_experiment(str(tmp_path))
