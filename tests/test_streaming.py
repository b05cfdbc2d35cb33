"""Packed host-streaming path: raw_batch packing, the fused streamed step,
and semantic agreement with the device-cached path.

(ref queue model being replaced: src/models/train_model.py:105-112)
"""

import numpy as np
import pytest

from cmrtpu.io import MedicalImage, write_image
from cmrtpu.pipeline.generator import DataGenerator
from cmrtpu.train.trainer import Trainer


@pytest.fixture
def gens(tmp_path):
    rng = np.random.default_rng(1)
    xs, ys = [], []
    for i in range(16):
        img = rng.normal(size=(24, 24)).astype(np.float32)
        msk = np.zeros((24, 24), np.uint8)
        msk[8:11, 6:9] = 1
        msk[16:19, 12:15] = 2
        xp = str(tmp_path / f"patient{i:03d}__t01_z0_img.nrrd")
        yp = str(tmp_path / f"patient{i:03d}__t01_z0_msk.nrrd")
        write_image(MedicalImage(array=img, spacing=(1.4, 1.4)), xp)
        write_image(MedicalImage(array=msk, spacing=(1.4, 1.4)), yp)
        xs.append(xp)
        ys.append(yp)
    cfg = {"DIM": [24, 24], "BATCHSIZE": 4, "MASK_VALUES": [1, 2],
           "MASK_CLASSES": 2, "DEPTH": 1, "FILTERS": 2, "SEED": 0,
           "LEARNING_RATE": 1e-3, "MIXED_PRECISION": False,
           "AUGMENT": False, "RESAMPLE": False, "SHUFFLE": False}
    train = DataGenerator(xs[:12], ys[:12], config=cfg)
    val = DataGenerator(xs[12:], ys[12:], config=cfg)
    return train, val, cfg


def test_raw_batch_packs_storage_dtypes(gens):
    """raw_batch moves bf16 images + uint8 masks — 4x fewer bytes than the
    finalized float32 tensors the naive streaming path uploads."""
    import ml_dtypes

    train, _, cfg = gens
    imgs, msks = train.raw_batch(0)
    assert imgs.dtype == ml_dtypes.bfloat16
    assert msks.dtype == np.uint8
    assert imgs.shape == (4, 24, 24)
    assert msks.shape == (4, 24, 24)
    x, y = train[0]  # finalized float32 pair, for the byte comparison
    packed = imgs.nbytes + msks.nbytes
    finalized = np.asarray(x).nbytes + np.asarray(y).nbytes
    assert packed * 3 < finalized  # >3x fewer bytes on the link

    # STREAM_DTYPE='' keeps float32 images (opt-out knob)
    train2 = DataGenerator(train.images, train.labels,
                           config=dict(cfg, STREAM_DTYPE=""))
    imgs2, _ = train2.raw_batch(0)
    assert imgs2.dtype == np.float32


def test_stream_dtype_uint8_quantizes_and_trains(gens):
    """STREAM_DTYPE='uint8': per-example affine-quantized images halve the
    link bytes again vs bf16; the fused step's post-gather re-normalisation
    makes the quantization transparent (see quantize_images_uint8)."""
    train, val, cfg = gens
    u8cfg = dict(cfg, STREAM_DTYPE="uint8")
    train_u8 = DataGenerator(train.images, train.labels, config=u8cfg)
    imgs, msks = train_u8.raw_batch(0)
    assert imgs.dtype == np.uint8 and msks.dtype == np.uint8
    bf16, _ = DataGenerator(train.images, train.labels,
                            config=cfg).raw_batch(0)
    assert imgs.nbytes * 2 == bf16.nbytes

    trainer = Trainer(u8cfg)
    hist = trainer.fit_streamed(train_u8, epochs=8)
    assert np.isfinite(hist[-1]["loss"])
    assert hist[-1]["loss"] < hist[0]["loss"]


def test_fit_streamed_trains_and_logs(gens):
    train, val, cfg = gens
    trainer = Trainer(cfg)
    hist = trainer.fit_streamed(train, val_gen=val, epochs=12)
    assert len(hist) == 12
    assert all(np.isfinite(h["loss"]) for h in hist)
    assert "val_loss" in hist[-1]
    assert hist[-1]["loss"] < hist[0]["loss"]
    assert int(trainer.state.step) == 12 * (12 // 4)


def test_streamed_eval_matches_cached_eval(gens):
    """With augmentation off, the streamed fused step and the cached step
    compute the SAME finalized tensors — eval logs on identical batch
    partitions must agree to float tolerance."""
    from cmrtpu.train.device_cache import DeviceCachedLoop
    from cmrtpu.train.streaming import StreamedLoop

    train, val, cfg = gens
    trainer = Trainer(cfg)
    cached = DeviceCachedLoop(trainer, train, val)
    streamed = StreamedLoop(trainer, train, val)
    a = cached.run_eval_epoch()
    b = streamed.run_eval_epoch()
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=2e-3, atol=2e-4,
                                   err_msg=f"metric {k} diverges")


def test_streamed_augmented_training_converges(gens):
    """The full stochastic stage (augment warps) fused into the streamed
    step still trains."""
    train, val, cfg = gens
    cfg = dict(cfg, AUGMENT=True, AUGMENT_PROB=0.5, RANDOMROTATE=True,
               SHIFTSCALEROTATE=True, SHUFFLE=True)
    train2 = DataGenerator(train.images, train.labels, config=cfg)
    trainer = Trainer(cfg)
    hist = trainer.fit_streamed(train2, epochs=6)
    assert all(np.isfinite(h["loss"]) for h in hist)


def test_fit_streamed_reuses_loop_and_rejects_batch_mismatch(gens):
    """Two guards on the streamed loop: (a) a second fit_streamed with the
    same generators reuses the compiled loop (the memo used to compare a
    fresh tuple with `is`, which could never hit — every call recompiled);
    (b) a generator whose raw_batch rows differ from BATCHSIZE raises
    instead of letting jnp.take's clip mode silently drop/duplicate rows."""
    train, val, cfg = gens
    trainer = Trainer(cfg)
    trainer.fit_streamed(train, val, epochs=1)
    loop = trainer._streamed_loop
    trainer.fit_streamed(train, val, epochs=1)
    assert trainer._streamed_loop is loop

    class _Lying:
        masks = True

        def __len__(self):
            return 1

        def raw_batch(self, i):
            x, y = train.raw_batch(i)
            return x[:-1], y[:-1]

    import pytest as _pytest
    with _pytest.raises(ValueError, match="BATCHSIZE"):
        trainer.fit_streamed(_Lying(), epochs=1)


def test_stream_echo_multiplies_steps_per_upload(gens):
    """STREAM_ECHO=k runs k gradient steps per uploaded batch (data echoing:
    the link-bound path's bubble-filler). Steps advance k-fold, each echo
    draws fresh augmentation RNG (the step folds in state.step), and the
    epoch still trains to finite loss."""
    train, _, cfg = gens
    cfg = dict(cfg, STREAM_ECHO=3, AUGMENT=True, AUGMENT_PROB=0.5,
               RANDOMROTATE=True, SHUFFLE=True)
    train2 = DataGenerator(train.images, train.labels, config=cfg)
    trainer = Trainer(cfg)
    hist = trainer.fit_streamed(train2, epochs=2)
    assert all(np.isfinite(h["loss"]) for h in hist)
    assert int(trainer.state.step) == 2 * (12 // 4) * 3

    # echo without augmentation still works but warns (dropout-only variety)
    import logging

    class _Catch(logging.Handler):
        records = []

        def emit(self, record):
            self.records.append(record.getMessage())

    handler = _Catch()
    logging.getLogger().addHandler(handler)
    try:
        trainer2 = Trainer(dict(cfg, AUGMENT=False, STREAM_ECHO=2))
        trainer2.fit_streamed(
            DataGenerator(train.images, train.labels,
                          config=dict(cfg, AUGMENT=False)), epochs=1)
    finally:
        logging.getLogger().removeHandler(handler)
    assert any("STREAM_ECHO" in m for m in handler.records)
    assert int(trainer2.state.step) == (12 // 4) * 2


def test_streamed_routes_grad_allreduce_dtype(gens, monkeypatch):
    """GRAD_ALLREDUCE_DTYPE must select the explicit-collectives step in the
    STREAMED loop too — a config must not change reduction semantics
    depending on which loop the cache-fit check picks."""
    from cmrtpu.train import manual_collectives as MC

    train, val, cfg = gens
    calls = []
    orig = MC.make_manual_train_step

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(MC, "make_manual_train_step", spy)
    trainer = Trainer(dict(cfg, GRAD_ALLREDUCE_DTYPE="bfloat16"))
    logs = trainer.fit_streamed(train, epochs=1)
    assert calls and np.isfinite(logs[-1]["loss"])


def test_raw_batch_mixed_packability_fails_loudly(tmp_path):
    """Without an in-memory cache the uint8-pack decision is probed from the
    first batch; a later batch with float-valued targets must raise instead
    of being silently astype-truncated (corrupted training targets on the
    exact beyond-RAM streaming path the packing exists for)."""
    rng = np.random.default_rng(3)
    xs, ys = [], []
    for i in range(8):
        img = rng.normal(size=(16, 16)).astype(np.float32)
        msk = np.zeros((16, 16), np.float32)
        if i < 4:
            msk[4:6, 4:6] = 1.0          # exact small ints -> packable
        else:
            msk[4:6, 4:6] = 0.5          # fractional -> NOT packable
        xp = str(tmp_path / f"p{i:03d}__t01_z0_img.nrrd")
        yp = str(tmp_path / f"p{i:03d}__t01_z0_msk.nrrd")
        write_image(MedicalImage(array=img, spacing=(1.0, 1.0)), xp)
        write_image(MedicalImage(array=msk, spacing=(1.0, 1.0)), yp)
        xs.append(xp)
        ys.append(yp)
    cfg = {"DIM": [16, 16], "BATCHSIZE": 4, "MASK_VALUES": [1],
           "MASK_CLASSES": 1, "SEED": 0, "SHUFFLE": False, "RESAMPLE": False,
           "CACHE_IN_MEMORY": False}
    gen = DataGenerator(xs, ys, config=cfg)
    imgs, msks = gen.raw_batch(0)        # probe fixes uint8 packing
    assert msks.dtype == np.uint8
    with pytest.raises(ValueError, match="uint8"):
        gen.raw_batch(1)
