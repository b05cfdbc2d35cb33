"""Every shipped experiment template must parse, build its model, and run a
training step (the de-facto public API surface, SURVEY.md §2.4)."""

import glob
import json
import os

import numpy as np
import pytest

TEMPLATES = sorted(glob.glob(os.path.join(
    os.path.dirname(os.path.dirname(__file__)), "exp", "template_cfgs",
    "*.json")))


@pytest.mark.parametrize("path", TEMPLATES, ids=[os.path.basename(p)
                                                 for p in TEMPLATES])
def test_template_config_trains(path):
    import jax
    from cmrtpu import config as C
    from cmrtpu.models.unet import build_model, init_variables
    from cmrtpu.train.trainer import Trainer

    cfg = C.normalise_config(json.load(open(path)))
    # shrink geometry/model so the step runs in seconds on CPU while keeping
    # every behavioural switch (loss, optimizer, GAUS/SIGMA, HIST_MATCHING,
    # augmentations, BN settings, 2D-vs-3D rank) from the template
    ndims = len(cfg["DIM"])
    dim = [4, 16, 16] if ndims == 3 else [32, 32]
    cfg.update(DIM=dim, DEPTH=2, FILTERS=4, BATCHSIZE=4,
               MIXED_PRECISION=False, EPOCHS=1)
    model = build_model(cfg)
    variables = init_variables(model, cfg, jax.random.PRNGKey(0))
    assert variables["params"]

    trainer = Trainer(cfg)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, *dim, 1)).astype(np.float32)
    heads = cfg.get("HEADS") or ()
    if heads:
        # multi-head target: concatenated per-head channels in spec order
        # (binary channels for sigmoid heads, one-hot for softmax heads)
        parts = []
        for name, channels, act in heads:
            if act == "softmax":
                labels = rng.integers(0, channels, (4, *dim))
                parts.append(np.eye(channels, dtype=np.float32)[labels])
            else:
                parts.append((rng.random((4, *dim, channels)) > 0.95)
                             .astype(np.float32))
        y = np.concatenate(parts, axis=-1)
    else:
        y = (rng.random((4, *dim, len(cfg["MASK_VALUES"]))) > 0.95
             ).astype(np.float32)
    trainer.state, logs = trainer.train_step(trainer.state, x, y, trainer.rng)
    assert np.isfinite(float(np.asarray(logs["loss"])))


def test_templates_exist():
    assert len(TEMPLATES) >= 4  # base + hist + gaus sigma 2/4 variants
