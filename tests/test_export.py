"""jax.export serving artifact: export once, serve without model code."""

import numpy as np

from cmrtpu.train.trainer import Trainer
from cmrtpu.train import checkpoint as ckpt

CFG = {"DIM": [32, 32], "DEPTH": 2, "FILTERS": 4, "MASK_CLASSES": 2,
       "BATCHSIZE": 8, "MIXED_PRECISION": False, "LEARNING_RATE": 1e-3,
       "SEED": 7}


def test_export_roundtrip_matches_live_model(tmp_path):
    from cmrtpu.predict.export import (export_model, load_exported,
                                       load_exported_weights)

    trainer = Trainer(CFG)
    model_dir = str(tmp_path / "model")
    ckpt.save_weights(model_dir, trainer.state.params, trainer.state.batch_stats)

    out = str(tmp_path / "exported")
    export_model(CFG, model_dir, out, batch=4)

    fn, meta = load_exported(out)
    assert meta["x_shape"] == [4, 32, 32, 1]
    params, batch_stats = load_exported_weights(out)

    x = np.random.default_rng(0).normal(size=(4, 32, 32, 1)).astype(np.float32)
    served = np.asarray(fn({"params": params, "batch_stats": batch_stats}, x))
    live = np.asarray(trainer.predict(x))
    np.testing.assert_allclose(served, live, atol=1e-5)
    assert served.min() >= 0.0 and served.max() <= 1.0


def test_fold_batch_norm_exact_equality(tmp_path):
    """Folded-BN weights on the BN-less twin model must reproduce the live
    BN model's inference outputs (BN_FIRST ordering: conv->BN->act, where
    the frozen BN is an affine rewrite of the conv)."""
    import jax
    from cmrtpu.models.hybrids import get_model
    from cmrtpu.predict.export import fold_batch_norm

    cfg = dict(CFG, BN_FIRST=True, MIXED_PRECISION=False, BATCHSIZE=4)
    trainer = Trainer(cfg)
    # non-trivial BN statistics: run a few train steps so mean/var move
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 32, 32, 1)).astype(np.float32)
    y = (rng.random((4, 32, 32, 2)) > 0.9).astype(np.float32)
    trainer.fit([(x, y)], epochs=3)

    live = np.asarray(trainer.predict(x))
    folded_cfg, folded_params = fold_batch_norm(
        cfg, trainer.state.params, trainer.state.batch_stats)
    assert folded_cfg["BATCH_NORMALISATION"] is False
    twin = get_model(folded_cfg)
    folded = np.asarray(jax.device_get(twin.apply(
        {"params": folded_params}, x, train=False)))
    np.testing.assert_allclose(folded, live, atol=2e-6)

    # the default conv->act->BN ordering must refuse (non-affine fold)
    import pytest
    with pytest.raises(ValueError, match="BN_FIRST"):
        fold_batch_norm(dict(cfg, BN_FIRST=False), trainer.state.params,
                        trainer.state.batch_stats)


def test_export_with_folded_bn(tmp_path):
    """fold_bn=True exports a BN-less artifact that serves the same
    function."""
    from cmrtpu.predict.export import (export_model, load_exported,
                                       load_exported_weights)

    cfg = dict(CFG, BN_FIRST=True, MIXED_PRECISION=False)
    trainer = Trainer(cfg)
    model_dir = str(tmp_path / "model")
    ckpt.save_weights(model_dir, trainer.state.params,
                      trainer.state.batch_stats)
    out = str(tmp_path / "exported_folded")
    export_model(cfg, model_dir, out, batch=4, fold_bn=True)
    fn, meta = load_exported(out)
    params, batch_stats = load_exported_weights(out)
    assert not batch_stats  # folded away
    x = np.random.default_rng(1).normal(size=(4, 32, 32, 1)).astype(np.float32)
    served = np.asarray(fn({"params": params, "batch_stats": {}}, x))
    live = np.asarray(trainer.predict(x))
    np.testing.assert_allclose(served, live, atol=1e-5)


def test_export_cli_smoke(tmp_path, monkeypatch, capsys):
    """The export CLI reads a fold dir's config + model and writes the
    serving artifact."""
    import json
    import os
    from cmrtpu.cli import export as cli_export
    from cmrtpu.predict.export import load_exported

    trainer = Trainer(CFG)
    fold_dir = tmp_path / "f0"
    (fold_dir / "config").mkdir(parents=True)
    json.dump(CFG, open(fold_dir / "config" / "config.json", "w"))
    ckpt.save_weights(str(fold_dir / "model"), trainer.state.params,
                      trainer.state.batch_stats)
    out = str(tmp_path / "served")
    monkeypatch.setattr("sys.argv", ["export", "-exp", str(fold_dir),
                                     "-out", out, "--batch", "2"])
    cli_export.main()
    assert "exported serving artifact" in capsys.readouterr().out
    fn, meta = load_exported(out)
    assert meta["x_shape"][0] == 2


def test_export_multihead_model(tmp_path):
    """Multi-head models export and serve: the artifact's callable returns
    the per-head dict."""
    from cmrtpu.predict.export import export_model, load_exported, \
        load_exported_weights

    cfg = dict(CFG, HEADS=[["rvip", 2, "sigmoid"], ["seg", 4, "softmax"]])
    trainer = Trainer(cfg)
    model_dir = str(tmp_path / "model")
    ckpt.save_weights(model_dir, trainer.state.params,
                      trainer.state.batch_stats)
    out = str(tmp_path / "exported_mh")
    export_model(cfg, model_dir, out, batch=2)
    fn, meta = load_exported(out)
    params, batch_stats = load_exported_weights(out)
    x = np.random.default_rng(0).normal(size=(2, 32, 32, 1)).astype(np.float32)
    served = fn({"params": params, "batch_stats": batch_stats}, x)
    assert set(served) == {"rvip", "seg"}
    assert np.asarray(served["rvip"]).shape == (2, 32, 32, 2)
    np.testing.assert_allclose(np.asarray(served["seg"]).sum(-1), 1.0,
                               atol=1e-5)
