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
