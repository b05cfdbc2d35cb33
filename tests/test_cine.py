"""2D+t cine training (BASELINE.json config 3): volume-batched heatmap
regression over temporal SAX stacks with a 3D U-Net (len(DIM)==3 selects the
3D model, ref: src/models/Unets.py:90), the augmentation broadcast across the
t axis exactly like ReplayCompose's additional_targets, and the device-cached
fused train loop.
"""

import numpy as np
import pytest

from cmrtpu.io import MedicalImage, write_image
from cmrtpu.pipeline.generator import DataGenerator
from cmrtpu.train.trainer import Trainer

T_FRAMES, H, W = 4, 32, 32


@pytest.fixture
def cine_files(tmp_path):
    rng = np.random.default_rng(0)
    xs, ys = [], []
    for i in range(8):
        ay, ax = 8 + rng.integers(-2, 3), 20 + rng.integers(-2, 3)
        iy, ix = 20 + rng.integers(-2, 3), 8 + rng.integers(-2, 3)
        img = rng.normal(0, 0.2, size=(T_FRAMES, H, W)).astype(np.float32)
        msk = np.zeros((T_FRAMES, H, W), np.uint8)
        img[:, ay - 1:ay + 2, ax - 1:ax + 2] += 2.0
        img[:, iy - 1:iy + 2, ix - 1:ix + 2] -= 2.0
        msk[:, ay - 1:ay + 2, ax - 1:ax + 2] = 1
        msk[:, iy - 1:iy + 2, ix - 1:ix + 2] = 2
        xp = str(tmp_path / f"patient{i:03d}__cine_img.nrrd")
        yp = str(tmp_path / f"patient{i:03d}__cine_msk.nrrd")
        write_image(MedicalImage(array=img, spacing=(1.4, 1.4, 1.0)), xp)
        write_image(MedicalImage(array=msk, spacing=(1.4, 1.4, 1.0)), yp)
        xs.append(xp)
        ys.append(yp)
    cfg = {"DIM": [T_FRAMES, H, W], "F_SIZE": [3, 3, 3], "M_POOL": [1, 2, 2],
           "BATCHSIZE": 4, "MASK_VALUES": [1, 2], "MASK_CLASSES": 2,
           "DEPTH": 2, "FILTERS": 4, "SEED": 0, "LEARNING_RATE": 1e-3,
           "MIXED_PRECISION": False, "RESAMPLE": False,
           "AUGMENT": True, "AUGMENT_PROB": 1.0, "SHIFTSCALEROTATE": True,
           "GRIDDISTORTION": False, "RANDOMROTATE": True}
    return xs, ys, cfg


def test_cine_generator_batches_full_stacks(cine_files):
    xs, ys, cfg = cine_files
    gen = DataGenerator(xs, ys, config=cfg)
    x, y = gen[0]
    assert np.asarray(x).shape == (4, T_FRAMES, H, W, 1)
    assert np.asarray(y).shape == (4, T_FRAMES, H, W, 2)


def test_cine_augmentation_consistent_across_t(cine_files):
    """One transform draw per example, broadcast over the t axis (the
    reference's ReplayCompose additional_targets semantics,
    ref: src/data/Preprocess.py:230-352): every frame of a cine stack must
    receive the same warp."""
    import jax
    from cmrtpu.pipeline.augment import make_batch_augmenter
    xs, ys, cfg = cine_files
    gen = DataGenerator(xs, ys, config=dict(cfg, AUGMENT=False))
    aug = make_batch_augmenter(dict(cfg, AUGMENT_PROB=1.0))
    imgs = np.repeat(gen._cache_x[:2, :1], T_FRAMES, axis=1)  # identical frames
    msks = np.repeat(gen._cache_y[:2, :1], T_FRAMES, axis=1)
    out_x, out_y = aug(jax.random.key(1), imgs, msks)
    out_x = np.asarray(out_x)
    for t in range(1, T_FRAMES):
        np.testing.assert_allclose(out_x[:, t], out_x[:, 0], atol=1e-5)


def test_cine_cached_training_loss_decreases(cine_files):
    xs, ys, cfg = cine_files
    gen = DataGenerator(xs, ys, config=cfg)
    trainer = Trainer(cfg)
    hist = trainer.fit_cached(gen, epochs=12)
    assert np.isfinite(hist[-1]["loss"])
    assert hist[-1]["loss"] < hist[0]["loss"]


def test_cine_gaus_heatmap_targets(cine_files):
    """GAUS sigma smoothing applies per frame on 3D stacks."""
    xs, ys, cfg = cine_files
    gen = DataGenerator(xs, ys, config=dict(cfg, AUGMENT=False,
                                            GAUS=True, SIGMA=1))
    _, y = gen[0]
    y = np.asarray(y)
    assert y.shape == (4, T_FRAMES, H, W, 2)
    assert 0 < y.max() <= 1.0
    binary_fraction = np.isin(y, (0.0, 1.0)).mean()
    assert binary_fraction < 1.0  # smoothed, not binary


def test_cine_2p1d_factorized_variant(cine_files):
    """MODEL_VARIANT='unet_2p1d': every rank-3 ConvBlock conv factorizes
    into a 1xdxd spatial conv + txlxl temporal conv (R(2+1)D,
    arXiv:1711.11248) — a TPU-first cine option; trains end-to-end."""
    from flax import traverse_util

    from cmrtpu.models.hybrids import get_model
    from cmrtpu.models.unet import init_variables
    from cmrtpu.pipeline.generator import DataGenerator

    xs, ys, cfg = cine_files
    cfg = dict(cfg, MODEL_VARIANT="unet_2p1d")
    import jax
    model = get_model(cfg)
    v = init_variables(model, cfg, jax.random.key(0))
    flat = traverse_util.flatten_dict(v["params"])
    block_kernels = [(k, a) for k, a in flat.items()
                     if k[-1] == "kernel"
                     and any(p.startswith("ConvBlock_") for p in k)]
    # no full t x d x d kernels may remain inside the conv blocks (the
    # UpBlock up-convs intentionally stay full 3D — they are a tiny
    # fraction of the FLOPs): each splits into a TRUE 2D spatial kernel
    # (rank 4 — t folds into batch so XLA tiles the flagship NHWC shape)
    # and a t x 1 x 1 temporal kernel
    assert block_kernels
    assert not any(a.ndim == 5 and a.shape[0] > 1 and a.shape[1] > 1
                   and a.shape[2] > 1 for _, a in block_kernels)
    spatial = [a for _, a in block_kernels
               if a.ndim == 4 and a.shape[:2] == (3, 3)]
    temporal = [a for _, a in block_kernels
                if a.ndim == 5 and a.shape[:3] == (3, 1, 1)]
    assert len(spatial) == len(temporal) > 0

    gen = DataGenerator(xs, ys, config=cfg)
    trainer = Trainer(cfg)
    hist = trainer.fit_cached(gen, epochs=10)
    assert np.isfinite(hist[-1]["loss"])
    assert hist[-1]["loss"] < hist[0]["loss"]
