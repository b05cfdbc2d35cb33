"""Input-pipeline tests: augmentation invariants, heatmaps, generator protocol."""

import os

import jax
import numpy as np
import pytest

from cmrtpu.io import MedicalImage, write_image
from cmrtpu.ops.gaussian import gaussian_kernel1d, smooth_heatmap_targets
from cmrtpu.pipeline.augment import make_batch_augmenter
from cmrtpu.pipeline.generator import DataGenerator
from cmrtpu.pipeline.histmatch import match_histograms


AUG_CFG = {"AUGMENT_PROB": 1.0, "RANDOMROTATE": True, "SHIFTSCALEROTATE": True,
           "GRIDDISTORTION": True, "DOWNSCALE": False}


def test_augmenter_shapes_and_mask_values(rng):
    aug = make_batch_augmenter(AUG_CFG)
    imgs = rng.normal(size=(4, 32, 32)).astype(np.float32)
    msks = rng.integers(0, 3, size=(4, 32, 32)).astype(np.float32)
    key = jax.random.PRNGKey(0)
    out_i, out_m = aug(key, imgs, msks)
    assert out_i.shape == imgs.shape and out_m.shape == msks.shape
    # nearest-interpolated masks keep the discrete label set
    assert set(np.unique(np.asarray(out_m))) <= {0.0, 1.0, 2.0}


def test_augmenter_no_op_when_disabled(rng):
    aug = make_batch_augmenter({"AUGMENT_PROB": 1.0, "RANDOMROTATE": False,
                                "SHIFTSCALEROTATE": False, "GRIDDISTORTION": False,
                                "DOWNSCALE": False})
    imgs = rng.normal(size=(2, 16, 16)).astype(np.float32)
    msks = rng.integers(0, 2, size=(2, 16, 16)).astype(np.float32)
    out_i, out_m = aug(jax.random.PRNGKey(1), imgs, msks)
    np.testing.assert_allclose(np.asarray(out_i), imgs, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out_m), msks)


def test_augmenter_same_warp_across_slices(rng):
    """ReplayCompose parity: one transform broadcast over the z axis."""
    aug = make_batch_augmenter(dict(AUG_CFG, RANDOMROTATE=False))
    base = rng.normal(size=(16, 16)).astype(np.float32)
    vol = np.stack([base] * 3)[None]  # [1, z=3, H, W], identical slices
    out_i, _ = aug(jax.random.PRNGKey(2), vol, vol)
    out = np.asarray(out_i[0])
    np.testing.assert_allclose(out[0], out[1], atol=1e-6)
    np.testing.assert_allclose(out[0], out[2], atol=1e-6)


def test_augmenter_reproducible(rng):
    aug = make_batch_augmenter(AUG_CFG)
    imgs = rng.normal(size=(2, 16, 16)).astype(np.float32)
    msks = np.zeros((2, 16, 16), np.float32)
    a = aug(jax.random.PRNGKey(7), imgs, msks)
    b = aug(jax.random.PRNGKey(7), imgs, msks)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


def test_gaussian_kernel_scipy_parity():
    import scipy.ndimage

    k = gaussian_kernel1d(2.0)
    assert len(k) == 2 * int(4.0 * 2.0 + 0.5) + 1
    x = np.zeros((21, 21), np.float32)
    x[10, 10] = 1.0
    ours = np.asarray(smooth_heatmap_targets(x[..., None], 2.0))[..., 0]
    ref = scipy.ndimage.gaussian_filter(x, 2.0)
    ref = (ref - ref.min()) / (ref.max() - ref.min() + np.finfo(np.float32).eps)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_match_histograms_skimage_semantics(rng):
    src = rng.normal(0, 1, size=(32, 32)).astype(np.float32)
    ref = rng.normal(10, 5, size=(32, 32)).astype(np.float32)
    out = match_histograms(src, ref)
    # matched stats approach the reference's
    assert abs(out.mean() - ref.mean()) < 0.5
    assert abs(out.std() - ref.std()) < 0.5
    # rank order preserved
    flat_src, flat_out = src.reshape(-1), out.reshape(-1)
    order = np.argsort(flat_src)
    assert (np.diff(flat_out[order]) >= -1e-6).all()


@pytest.fixture
def slice_files(tmp_path, rng):
    """12 synthetic 2D nrrd slice pairs with the reference naming scheme."""
    xs, ys = [], []
    for i in range(12):
        img = rng.normal(300, 100, size=(28, 26)).astype(np.float32)
        msk = np.zeros((28, 26), np.uint8)
        msk[8 + i % 4:11 + i % 4, 6:9] = 1
        msk[18:21, 12:15] = 2
        xp = str(tmp_path / f"patient{i:03d}__t01_z0_img.nrrd")
        yp = str(tmp_path / f"patient{i:03d}__t01_z0_msk.nrrd")
        write_image(MedicalImage(array=img, spacing=(1.4, 1.4)), xp)
        write_image(MedicalImage(array=msk, spacing=(1.4, 1.4)), yp)
        xs.append(xp)
        ys.append(yp)
    return xs, ys


GEN_CFG = {"DIM": [32, 32], "BATCHSIZE": 4, "SPACING": [1.2, 1.2],
           "RESAMPLE": True, "MASK_VALUES": [1, 2], "SHUFFLE": True,
           "SEED": 42, "SCALER": "MinMax"}


def test_generator_shapes_and_values(slice_files):
    xs, ys = slice_files
    gen = DataGenerator(xs, ys, config=GEN_CFG)
    assert len(gen) == 3
    x, y = gen[0]
    assert x.shape == (4, 32, 32, 1) and x.dtype == np.float32
    assert y.shape == (4, 32, 32, 2)
    assert 0.0 <= x.min() and x.max() <= 1.0 + 1e-5  # minmax normalised
    assert set(np.unique(y)) <= {0.0, 1.0}           # binary channels


def test_generator_augmented_run(slice_files):
    xs, ys = slice_files
    cfg = dict(GEN_CFG, AUGMENT=True, AUGMENT_PROB=1.0, SHIFTSCALEROTATE=True,
               GRIDDISTORTION=True, RANDOMROTATE=True, HIST_MATCHING=True)
    gen = DataGenerator(xs, ys, config=cfg)
    x, y = gen[0]
    assert x.shape == (4, 32, 32, 1)
    assert set(np.unique(y)) <= {0.0, 1.0}


def test_generator_gaussian_heatmaps(slice_files):
    xs, ys = slice_files
    cfg = dict(GEN_CFG, GAUS=True, SIGMA=2)
    gen = DataGenerator(xs, ys, config=cfg)
    _, y = gen[0]
    # heatmaps: continuous in [0, 1], peak at 1 somewhere
    assert y.max() == pytest.approx(1.0, abs=1e-5)
    assert len(np.unique(y)) > 2


def test_generator_shuffle_reproducible(slice_files):
    xs, ys = slice_files
    g1 = DataGenerator(xs, ys, config=GEN_CFG)
    g2 = DataGenerator(xs, ys, config=GEN_CFG)
    np.testing.assert_array_equal(g1.indices, g2.indices)
    order1 = g1.indices.copy()
    g1.on_epoch_end()
    assert not np.array_equal(order1, g1.indices)  # reshuffled


def test_generator_inference_mode(slice_files):
    xs, _ = slice_files
    cfg = dict(GEN_CFG, SHUFFLE=False, BATCHSIZE=1)
    gen = DataGenerator(xs, None, config=cfg)
    x, y = gen[0]
    assert x.shape == (1, 32, 32, 1)
    assert y.shape == (1, 32, 32, 1)  # autoencoder mode: image twice


def test_generator_feeds_trainer(slice_files):
    from cmrtpu.train.trainer import Trainer

    xs, ys = slice_files
    gen = DataGenerator(xs, ys, config=GEN_CFG)
    trainer = Trainer({"DIM": [32, 32], "DEPTH": 2, "FILTERS": 4,
                       "MASK_CLASSES": 2, "MIXED_PRECISION": False,
                       "LEARNING_RATE": 1e-3, "BATCHSIZE": 4})
    history = trainer.fit(gen, epochs=2)
    assert len(history) == 2 and np.isfinite(history[-1]["loss"])


def test_generator_non_square_dim(tmp_path, rng):
    """Non-square DIM: rot90 is skipped (shape-changing), warps still apply."""
    import jax
    from cmrtpu.io import MedicalImage, write_image

    xs, ys = [], []
    for i in range(4):
        img = rng.normal(size=(40, 28)).astype(np.float32)
        msk = np.zeros((40, 28), np.uint8)
        msk[10:13, 6:9] = 1
        xp = str(tmp_path / f"patient{i:03d}__t01_z0_img.nrrd")
        write_image(MedicalImage(array=img, spacing=(1.4, 1.4)), xp)
        write_image(MedicalImage(array=msk, spacing=(1.4, 1.4)),
                    xp.replace("img", "msk"))
        xs.append(xp)
        ys.append(xp.replace("img", "msk"))
    cfg = {"DIM": [32, 24], "BATCHSIZE": 4, "MASK_VALUES": [1],
           "AUGMENT": True, "AUGMENT_PROB": 1.0, "RANDOMROTATE": True,
           "SHIFTSCALEROTATE": True, "GRIDDISTORTION": True, "SEED": 3,
           "RESAMPLE": False}
    gen = DataGenerator(xs, ys, config=cfg)
    x, y = gen[0]
    assert np.asarray(x).shape == (4, 32, 24, 1)
    assert np.asarray(y).shape == (4, 32, 24, 1)
    assert np.isfinite(np.asarray(x)).all()


def test_grid_distortion_tiny_axis_no_nan(rng):
    """Axes smaller than GRID_STEPS skip distortion instead of emitting NaN."""
    import jax
    aug = make_batch_augmenter({"AUGMENT_PROB": 1.0, "GRIDDISTORTION": True,
                                "SHIFTSCALEROTATE": False, "RANDOMROTATE": False,
                                "DOWNSCALE": False})
    imgs = rng.normal(size=(2, 4, 4)).astype(np.float32)
    msks = np.zeros((2, 4, 4), np.float32)
    out_i, out_m = aug(jax.random.PRNGKey(0), imgs, msks)
    assert np.isfinite(np.asarray(out_i)).all()
    assert np.isfinite(np.asarray(out_m)).all()


def test_border_modes_match_cv2_remap():
    """BORDER_MODE 0..4 parity against cv2.remap on a pure-shift warp (the
    separable coordinate map degenerates to a full 2D remap there)."""
    cv2 = pytest.importorskip("cv2")
    import jax.numpy as jnp
    from cmrtpu.pipeline.augment import _fold_coords, _warp2d

    rng = np.random.default_rng(3)
    img = rng.uniform(0.5, 2.0, (16, 16)).astype(np.float32)
    dy, dx = 3.4, -2.7   # push several pixels out of range
    fill = 0.25
    h, w = img.shape
    raw_ys = jnp.arange(h, dtype=jnp.float32) - dy
    raw_xs = jnp.arange(w, dtype=jnp.float32) - dx

    mx, my = np.meshgrid(np.arange(w, dtype=np.float32) - dx,
                         np.arange(h, dtype=np.float32) - dy)
    cv_modes = {0: cv2.BORDER_CONSTANT, 1: cv2.BORDER_REPLICATE,
                2: cv2.BORDER_REFLECT, 3: cv2.BORDER_WRAP,
                4: cv2.BORDER_REFLECT_101}
    for mode, cv_mode in cv_modes.items():
        ys = _fold_coords(raw_ys, h, mode)
        xs = _fold_coords(raw_xs, w, mode)
        got = np.asarray(_warp2d(jnp.asarray(img), ys, xs, nearest=False,
                                 raw_ys=raw_ys, raw_xs=raw_xs,
                                 border_mode=mode, fill=fill))
        want = cv2.remap(img, mx, my, cv2.INTER_LINEAR,
                         borderMode=cv_mode, borderValue=fill)
        np.testing.assert_allclose(got, want, atol=1e-4,
                                   err_msg=f"border mode {mode}")


def test_border_constant_mask_fill():
    """Nearest (mask) warps under BORDER_CONSTANT fill out-of-range pixels
    with the border value instead of replicating edges."""
    import jax
    from cmrtpu.pipeline.augment import make_batch_augmenter

    msk = np.full((1, 64, 64), 2.0, np.float32)  # nonzero everywhere
    img = np.ones((1, 64, 64), np.float32)
    cfg = {"AUGMENT_PROB": 1.0, "SHIFTSCALEROTATE": True, "BORDER_MODE": 0,
           "BORDER_VALUE": 0.0, "RANDOMROTATE": False, "GRIDDISTORTION": False,
           "DOWNSCALE": False}
    aug = make_batch_augmenter(cfg)
    for seed in range(16):
        out_img, out_msk = aug(jax.random.key(seed), img, msk)
        out_msk = np.asarray(out_msk)
        if (out_msk == 0).any():   # a shift occurred and filled the border
            assert set(np.unique(out_msk)) <= {0.0, 2.0}
            return
    raise AssertionError("no shift produced a constant-filled border")
