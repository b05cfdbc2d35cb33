"""SEED determinism: two identically-configured runs produce identical
training trajectories.

This is an advertised capability the reference LACKS: its augmentation RNG
runs unseeded in generator worker threads (ref: src/data/Generators.py:
350-358 — np.random/random from a ThreadPool, so batch composition is
seeded but the stochastic stage is not; SURVEY.md §5 race note). cmrtpu
threads PRNG keys from SEED through batch shuffling, hist-matching,
augmentation and dropout, so a run is a pure function of (config, data) —
these tests pin that, end-to-end through both training loops."""

import numpy as np
import pytest

from cmrtpu.pipeline.generator import DataGenerator
from cmrtpu.train.trainer import Trainer


@pytest.fixture
def cohort(tmp_path):
    from cmrtpu.io import MedicalImage, write_image

    rng = np.random.default_rng(11)
    xs, ys = [], []
    for i in range(8):
        img = rng.normal(size=(24, 24)).astype(np.float32)
        msk = np.zeros((24, 24), np.uint8)
        msk[6:9, 5:8] = 1
        msk[15:18, 12:15] = 2
        xp = str(tmp_path / f"patient{i:03d}__t01_z0_img.nrrd")
        yp = str(tmp_path / f"patient{i:03d}__t01_z0_msk.nrrd")
        write_image(MedicalImage(array=img, spacing=(1.4, 1.4)), xp)
        write_image(MedicalImage(array=msk, spacing=(1.4, 1.4)), yp)
        xs.append(xp)
        ys.append(yp)
    # every stochastic stage ON: batch shuffle, hist-matching, the three
    # augmentation families, dropout
    cfg = {"DIM": [24, 24], "BATCHSIZE": 4, "MASK_VALUES": [1, 2],
           "MASK_CLASSES": 2, "DEPTH": 1, "FILTERS": 2, "SEED": 7,
           "LEARNING_RATE": 1e-3, "MIXED_PRECISION": False,
           "DROPOUT_MIN": 0.3, "DROPOUT_MAX": 0.5,
           "AUGMENT": True, "AUGMENT_PROB": 0.8, "SHIFTSCALEROTATE": True,
           "GRIDDISTORTION": True, "RANDOMROTATE": True,
           "HIST_MATCHING": True, "RESAMPLE": False}
    return xs, ys, cfg


def _run_cached(xs, ys, cfg, epochs=3):
    trainer = Trainer(cfg)
    gen = DataGenerator(xs, ys, config=cfg)
    hist = trainer.fit_cached(gen, epochs=epochs)
    return hist, trainer.state


def _run_streamed(xs, ys, cfg, epochs=3):
    trainer = Trainer(cfg)
    gen = DataGenerator(xs, ys, config=cfg)
    hist = trainer.fit_streamed(gen, epochs=epochs)
    return hist, trainer.state


def _leaves(state):
    import jax
    return jax.tree_util.tree_leaves(jax.device_get(state.params))


def test_cached_loop_is_seed_deterministic(cohort):
    xs, ys, cfg = cohort
    hist_a, state_a = _run_cached(xs, ys, cfg)
    hist_b, state_b = _run_cached(xs, ys, cfg)
    assert [h["loss"] for h in hist_a] == [h["loss"] for h in hist_b]
    for a, b in zip(_leaves(state_a), _leaves(state_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cached_loop_seed_changes_trajectory(cohort):
    xs, ys, cfg = cohort
    hist_a, _ = _run_cached(xs, ys, cfg)
    hist_b, _ = _run_cached(xs, ys, dict(cfg, SEED=8))
    # a different seed must change the stochastic stages (init, shuffle,
    # augmentation draws) — identical histories would mean SEED is ignored
    assert [h["loss"] for h in hist_a] != [h["loss"] for h in hist_b]


def test_streamed_loop_is_seed_deterministic(cohort):
    xs, ys, cfg = cohort
    hist_a, state_a = _run_streamed(xs, ys, cfg)
    hist_b, state_b = _run_streamed(xs, ys, cfg)
    assert [h["loss"] for h in hist_a] == [h["loss"] for h in hist_b]
    for a, b in zip(_leaves(state_a), _leaves(state_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
