"""End-to-end training smoke tests on the 8-virtual-device CPU mesh."""

import os

import jax
import numpy as np
import pytest

from cmrtpu.parallel import create_mesh, local_batch_size, shard_batch
from cmrtpu.train.callbacks import (EarlyStopping, HistoryCSV, ModelCheckpoint,
                                    OptimizerChanger, ReduceLROnPlateau,
                                    TensorBoardLogger)
from cmrtpu.train.trainer import Trainer

CFG = {"DIM": [32, 32], "DEPTH": 2, "FILTERS": 4, "MASK_CLASSES": 2,
       "BATCHSIZE": 8, "MIXED_PRECISION": False, "LEARNING_RATE": 1e-3,
       "SEED": 42}


class SyntheticBatches:
    """Deterministic synthetic blob-detection batches (the fake-data harness
    from notebooks/Dataset/Basic_generator_concept.ipynb as a fixture)."""

    def __init__(self, n_batches=3, batch=8, dim=32):
        rng = np.random.default_rng(0)
        self.batches = []
        for _ in range(n_batches):
            x = rng.normal(0.3, 0.1, size=(batch, dim, dim, 1)).astype(np.float32)
            y = np.zeros((batch, dim, dim, 2), np.float32)
            for b in range(batch):
                cy, cx = rng.integers(6, dim - 6, size=2)
                x[b, cy - 2:cy + 2, cx - 2:cx + 2, 0] += 1.0
                y[b, cy - 1:cy + 1, cx - 1:cx + 1, 0] = 1.0
                y[b, cy + 1:cy + 3, cx - 3:cx - 1, 1] = 1.0
            self.batches.append((x, y))
        self.epochs_seen = 0

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)

    def on_epoch_end(self):
        self.epochs_seen += 1


def test_mesh_has_8_devices():
    mesh = create_mesh()
    assert mesh.devices.size == 8
    assert local_batch_size(16, mesh) == 2


def test_loss_decreases_over_epochs():
    trainer = Trainer(CFG)
    data = SyntheticBatches()
    history = trainer.fit(data, epochs=8)
    first, last = history[0]["loss"], history[-1]["loss"]
    assert last < first, f"loss did not decrease: {first} -> {last}"
    assert data.epochs_seen == 8


def test_validation_and_predict():
    trainer = Trainer(CFG)
    data = SyntheticBatches(n_batches=2)
    history = trainer.fit(data, val_data=data, epochs=2)
    assert "val_loss" in history[-1]
    x, _ = data.batches[0]
    preds = trainer.predict(x)
    assert preds.shape == (8, 32, 32, 2)
    assert preds.min() >= 0.0 and preds.max() <= 1.0


def test_lr_mutation_without_recompile():
    trainer = Trainer(CFG)
    assert trainer.get_lr() == pytest.approx(1e-3)
    trainer.set_lr(5e-4)
    assert trainer.get_lr() == pytest.approx(5e-4)
    # still trainable after mutation
    trainer.fit(SyntheticBatches(n_batches=1), epochs=1)


def test_reduce_lr_on_plateau_fires():
    trainer = Trainer(CFG)
    cb = ReduceLROnPlateau(monitor="loss", factor=0.5, patience=1, cooldown=0)
    # feed constant loss -> should reduce
    cb.on_epoch_end(trainer, 0, {"loss": 1.0})
    cb.on_epoch_end(trainer, 1, {"loss": 1.0})
    cb.on_epoch_end(trainer, 2, {"loss": 1.0})
    assert trainer.get_lr() < 1e-3


def test_early_stopping_stops():
    trainer = Trainer(CFG)
    cb = EarlyStopping(monitor="loss", patience=2)
    for epoch in range(5):
        cb.on_epoch_end(trainer, epoch, {"loss": 1.0})
    assert trainer.stop_training


def test_optimizer_changer_switches():
    trainer = Trainer(CFG)
    cb = OptimizerChanger(monitor="loss", patience=1)
    cb.on_epoch_end(trainer, 0, {"loss": 1.0})
    cb.on_epoch_end(trainer, 1, {"loss": 1.0})
    cb.on_epoch_end(trainer, 2, {"loss": 1.0})
    assert cb.changed and not trainer.stop_training
    trainer.fit(SyntheticBatches(n_batches=1), epochs=1)  # still trains with SGD


def test_checkpoint_roundtrip(tmp_path):
    from cmrtpu.train import checkpoint as ckpt

    trainer = Trainer(CFG)
    trainer.fit(SyntheticBatches(n_batches=1), epochs=1)
    path = str(tmp_path / "model")
    ckpt.save_weights(path, trainer.state.params, trainer.state.batch_stats)
    params, bn = ckpt.load_weights(path)
    orig = jax.tree_util.tree_leaves(jax.device_get(trainer.state.params))
    loaded = jax.tree_util.tree_leaves(params)
    assert all(np.allclose(a, b) for a, b in zip(orig, loaded))
    assert bn  # batch stats present

    trainer2 = Trainer(CFG)
    trainer2.state = trainer2.state.replace(params=params, batch_stats=bn)
    x, _ = SyntheticBatches(n_batches=1).batches[0]
    np.testing.assert_allclose(trainer.predict(x), trainer2.predict(x), atol=1e-5)


def test_model_checkpoint_best_only(tmp_path):
    trainer = Trainer(CFG)
    cb = ModelCheckpoint(str(tmp_path), monitor="loss", save_full_state=False)
    cb.on_epoch_end(trainer, 0, {"loss": 1.0})
    cb.on_train_end(trainer)  # flush the async writer
    mtime = os.path.getmtime(tmp_path / "model.npz")
    cb.on_epoch_end(trainer, 1, {"loss": 2.0})  # worse -> no save
    cb.on_train_end(trainer)
    assert os.path.getmtime(tmp_path / "model.npz") == mtime


def test_tensorboard_logger_writes_events(tmp_path):
    trainer = Trainer(CFG)
    cb = TensorBoardLogger(str(tmp_path))
    cb.on_train_begin(trainer)
    cb.on_epoch_end(trainer, 0, {"loss": 0.5})
    cb.on_train_end(trainer)
    files = list(tmp_path.glob("events.out.tfevents.*"))
    assert files and files[0].stat().st_size > 0


def test_history_csv(tmp_path):
    trainer = Trainer(CFG)
    cb = HistoryCSV(str(tmp_path / "history.csv"))
    cb.on_epoch_end(trainer, 0, {"loss": 0.5, "dice_coef_labels": 0.2})
    cb.on_epoch_end(trainer, 1, {"loss": 0.4, "dice_coef_labels": 0.3})
    lines = (tmp_path / "history.csv").read_text().strip().splitlines()
    assert lines[0].startswith("epoch,") and len(lines) == 3


def test_weights_saver_and_tb_images(tmp_path):
    """WeightsSaver dumps every n epochs; ImageWriter writes PNG + TB image."""
    import glob as _glob
    import numpy as np
    from cmrtpu.train.callbacks import ImageWriter, WeightsSaver
    from cmrtpu.train.trainer import Trainer

    config = {"DIM": [16, 16], "DEPTH": 1, "FILTERS": 2, "MASK_CLASSES": 2,
              "BATCHSIZE": 4, "LEARNING_RATE": 1e-3, "MIXED_PRECISION": False,
              "SEED": 0}
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 16, 16, 1)).astype(np.float32)
    y = (rng.random(size=(4, 16, 16, 2)) > 0.9).astype(np.float32)
    trainer = Trainer(config)
    ws = WeightsSaver(str(tmp_path / "w"), every_n_epochs=2)
    iw = ImageWriter(str(tmp_path / "figs"), [("val", x, y)], frequency=1,
                     to_tensorboard=True, tb_dir=str(tmp_path / "tb"))
    trainer.fit([(x, y)], epochs=2, callbacks=[ws, iw])
    assert _glob.glob(str(tmp_path / "w" / "*.npz"))
    assert _glob.glob(str(tmp_path / "figs" / "*.png"))
    events = _glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
    assert events and os.path.getsize(events[0]) > 1000  # contains a PNG


def test_png_encoder_roundtrip(tmp_path):
    import numpy as np
    from cmrtpu.utils.tfevents import encode_png_rgb
    rgb = np.random.default_rng(0).integers(0, 255, (20, 30, 3), dtype=np.uint8)
    blob = encode_png_rgb(rgb)
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"
    import matplotlib.image as mpimg
    p = tmp_path / "t.png"
    p.write_bytes(blob)
    back = (mpimg.imread(str(p)) * 255).round().astype(np.uint8)
    np.testing.assert_array_equal(back[..., :3], rgb)


def test_full_state_resume(tmp_path):
    """Save full train state mid-run, restore into a fresh Trainer, continue:
    step counter, params and optimizer state survive."""
    import numpy as np
    from cmrtpu.train import checkpoint as ckpt
    from cmrtpu.train.trainer import Trainer

    config = {"DIM": [16, 16], "DEPTH": 1, "FILTERS": 2, "MASK_CLASSES": 2,
              "BATCHSIZE": 4, "LEARNING_RATE": 1e-3, "MIXED_PRECISION": False,
              "SEED": 0}
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 16, 16, 1)).astype(np.float32)
    y = (rng.random(size=(4, 16, 16, 2)) > 0.9).astype(np.float32)

    t1 = Trainer(config)
    t1.fit([(x, y)], epochs=3)
    ckpt.save_train_state(str(tmp_path), t1.state)
    step1 = int(t1.state.step)

    t2 = Trainer(config)
    assert int(t2.state.step) == 0
    restored_step = t2.restore(str(tmp_path))
    assert restored_step == step1 == 3
    leaf1 = np.asarray(jax.tree_util.tree_leaves(t1.state.params)[0])
    leaf2 = np.asarray(jax.tree_util.tree_leaves(t2.state.params)[0])
    np.testing.assert_array_equal(leaf1, leaf2)
    t2.fit([(x, y)], epochs=5, initial_epoch=3)  # continues without error
    assert int(t2.state.step) == 5


def test_restore_weights_roundtrip(tmp_path):
    import numpy as np
    from cmrtpu.train import checkpoint as ckpt
    from cmrtpu.train.trainer import Trainer

    config = {"DIM": [16, 16], "DEPTH": 1, "FILTERS": 2, "MASK_CLASSES": 2,
              "BATCHSIZE": 4, "MIXED_PRECISION": False, "SEED": 0}
    t1 = Trainer(config)
    ckpt.save_weights(str(tmp_path), t1.state.params, t1.state.batch_stats)
    t2 = Trainer(dict(config, SEED=1))
    t2.restore_weights(str(tmp_path))
    l1 = np.asarray(jax.tree_util.tree_leaves(t1.state.params)[0])
    l2 = np.asarray(jax.tree_util.tree_leaves(t2.state.params)[0])
    np.testing.assert_array_equal(l1, l2)


def test_initialize_distributed_noop_single_host(monkeypatch):
    from cmrtpu.parallel.mesh import initialize_distributed
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert initialize_distributed() is False


def test_step_decay_schedule(gens_cfg=None):
    from cmrtpu.train.callbacks import StepDecaySchedule
    from cmrtpu.train.trainer import Trainer
    cfg = {"DIM": [16, 16], "DEPTH": 1, "FILTERS": 2, "MASK_CLASSES": 2,
           "BATCHSIZE": 2, "MIXED_PRECISION": False, "LEARNING_RATE": 0.01,
           "SEED": 0}
    trainer = Trainer(cfg)
    sched = StepDecaySchedule(init_alpha=0.01, factor=0.5, drop_every=2)
    sched.on_epoch_begin(trainer, 0)   # floor(1/2)=0 -> 0.01
    assert trainer.get_lr() == pytest.approx(0.01)
    sched.on_epoch_begin(trainer, 3)   # floor(4/2)=2 -> 0.0025
    assert trainer.get_lr() == pytest.approx(0.0025)


def test_feed_inputs_4_tensorboard_and_finetune_sgd(tmp_path):
    """feed_inputs_4_tensorboard builds ImageWriter sample triples;
    finetune_with_sgd swaps to SGD and continues fitting."""
    import numpy as np
    import optax
    from cmrtpu.train.callbacks import (feed_inputs_4_tensorboard,
                                        finetune_with_sgd)
    from cmrtpu.train.trainer import Trainer

    class FakeGen:
        def __getitem__(self, i):
            x = np.zeros((8, 32, 32, 1), np.float32)
            y = np.zeros((8, 32, 32, 2), np.float32)
            return x, y
        def __len__(self):
            return 1

    cfg = dict(CFG, BATCHSIZE=8, EPOCHS=1,
               EXP_PATH=str(tmp_path), MODEL_PATH=str(tmp_path / "model"),
               TENSORBOARD_PATH=str(tmp_path / "tb"))
    feeds = feed_inputs_4_tensorboard(cfg, FakeGen(), FakeGen(), samples=2)
    assert [f[0] for f in feeds] == ["gen_train", "gen_val"]
    assert feeds[0][1].shape[0] == 2 and feeds[0][2].shape[0] == 2

    trainer = Trainer(cfg)
    x = np.zeros((8, 32, 32, 1), np.float32)
    y = np.zeros((8, 32, 32, 2), np.float32)
    history = finetune_with_sgd(trainer, [(x, y)], initial_epoch=0, epochs=1)
    assert trainer.optimizer_name == "sgd"
    assert len(history) >= 1 and np.isfinite(history[-1]["loss"])


def test_async_checkpoint_writer_latest_wins(tmp_path):
    """AsyncCheckpointWriter: latest-wins coalescing, flush durability, and
    survival of a failing write."""
    import time
    from cmrtpu.train.checkpoint import AsyncCheckpointWriter

    w = AsyncCheckpointWriter()
    out = tmp_path / "out.txt"

    def slow_write(value):
        time.sleep(0.05)
        out.write_text(value)

    for i in range(20):
        w.submit(slow_write, f"v{i}")
    w.flush()
    # the final submitted value is durable after flush
    assert out.read_text() == "v19"

    def boom(_):
        raise RuntimeError("disk full")
    w.submit(boom, "x")
    # a failed write must surface at flush — fit() returning cleanly while
    # model.npz is missing/stale would break the chained pred_fold
    import pytest
    with pytest.raises(RuntimeError, match="checkpoint write failed"):
        w.flush()
    # the error is consumed: the writer stays alive for later folds
    w.submit(slow_write, "after-failure")
    w.flush()
    assert out.read_text() == "after-failure"

    # a successful write submitted after a failure supersedes the error
    # (latest-wins applies to failures too: the bad snapshot is stale)
    w.submit(boom, "y")
    w.submit(slow_write, "recovered")
    w.flush()
    assert out.read_text() == "recovered"


def test_async_checkpoint_survives_donated_state(tmp_path):
    """The on-device snapshot must stay readable after the donated state
    buffers are invalidated by subsequent train steps."""
    import numpy as np
    from cmrtpu.train.callbacks import ModelCheckpoint
    from cmrtpu.train.checkpoint import load_weights

    trainer = Trainer(CFG)
    cb = ModelCheckpoint(str(tmp_path), monitor="loss", save_full_state=False)
    data = SyntheticBatches()
    trainer.fit(data, epochs=3, callbacks=[cb])
    params, batch_stats = load_weights(str(tmp_path))
    assert params  # checkpoint written and parseable
    leaf = next(iter(jax.tree_util.tree_leaves(params)))
    assert np.all(np.isfinite(np.asarray(leaf)))


def test_model_checkpoint_fallback_when_monitor_never_appears(tmp_path):
    """A monitor key that never shows up (e.g. val_loss with an empty
    validation set) must still leave restorable weights at train end: the
    chained pred_fold reads the checkpoint right after fit."""
    from cmrtpu.train.callbacks import ModelCheckpoint
    from cmrtpu.train.checkpoint import load_weights

    trainer = Trainer(CFG)
    cb = ModelCheckpoint(str(tmp_path), monitor="val_loss",
                         save_full_state=False)
    trainer.fit(SyntheticBatches(n_batches=1), epochs=2, callbacks=[cb])
    params, _ = load_weights(str(tmp_path))
    assert params  # fallback checkpoint written despite missing monitor


def test_persistent_compilation_cache_configured(tmp_path, monkeypatch):
    """Trainer enables the persistent XLA compilation cache (every CV fold
    recompiles identical programs otherwise); '' disables it for real even
    after an earlier enable."""
    import cmrtpu.utils.xla_cache as XC

    # the conftest opt-in env var outranks config keys by design; clear it so
    # the config-driven paths are what this test exercises
    monkeypatch.delenv("CMRTPU_COMPILATION_CACHE_DIR", raising=False)
    previous = getattr(jax.config, "jax_compilation_cache_dir", None)
    try:
        cache_dir = str(tmp_path / "xla")
        Trainer(dict(CFG, COMPILATION_CACHE_DIR=cache_dir))
        assert jax.config.jax_compilation_cache_dir == os.path.abspath(cache_dir)
        assert os.path.isdir(cache_dir)

        # explicit disable must unset the live jax config, not just no-op
        assert XC.ensure_compilation_cache({"COMPILATION_CACHE_DIR": ""}) is None
        assert not jax.config.jax_compilation_cache_dir
    finally:
        jax.config.update("jax_compilation_cache_dir", previous)


def test_cache_dir_scoped_by_host_cpu_fingerprint():
    """XLA:CPU AOT entries are feature-stamped for the COMPILE host; two
    hosts with different CPU feature sets must never share a default cache
    dir (the loader's feature-mismatch path ranges from E-line warnings to a
    SIGILL). Same fingerprint -> same dir (the scoping stays shareable
    across processes on one host)."""
    from cmrtpu.utils.xla_cache import _default_dir, _host_fingerprint

    a = _default_dir(host_fingerprint="x86_64|flags: sse4_2 avx2 avx512f")
    b = _default_dir(host_fingerprint="x86_64|flags: sse4_2 avx2")
    assert a != b
    assert _default_dir(host_fingerprint="x86_64|flags: sse4_2 avx2 avx512f") == a
    # the live fingerprint is non-empty and stable within a process
    assert _host_fingerprint() and _host_fingerprint() == _host_fingerprint()


def test_cpu_default_cache_disabled_without_optin(monkeypatch):
    """On the cpu backend the persistent cache defaults OFF (AOT reuse is
    host-feature-sensitive); env-var / config opt-ins still work."""
    import cmrtpu.utils.xla_cache as XC

    previous = getattr(jax.config, "jax_compilation_cache_dir", None)
    monkeypatch.delenv("CMRTPU_COMPILATION_CACHE_DIR", raising=False)
    try:
        assert jax.default_backend() == "cpu"  # conftest pins cpu
        assert XC.ensure_compilation_cache({}) is None
    finally:
        jax.config.update("jax_compilation_cache_dir", previous)


def test_checkpoint_flushed_when_training_crashes(tmp_path):
    """A mid-training exception must not lose the pending async checkpoint:
    on_train_end (and so the writer flush) runs from the finally path."""
    from cmrtpu.train.callbacks import Callback, ModelCheckpoint
    from cmrtpu.train.checkpoint import load_weights

    class Boom(Callback):
        def on_epoch_end(self, trainer, epoch, logs):
            if epoch == 1:
                raise RuntimeError("nan guard tripped")

    trainer = Trainer(CFG)
    cb = ModelCheckpoint(str(tmp_path), monitor="loss", save_full_state=False)
    with pytest.raises(RuntimeError, match="nan guard"):
        # ModelCheckpoint first so its save is pending when Boom raises
        trainer.fit(SyntheticBatches(), epochs=5, callbacks=[cb, Boom()])
    params, _ = load_weights(str(tmp_path))
    assert params  # epoch-0/1 best checkpoint survived the crash


def test_finetune_sgd_keeps_prior_best_checkpoint(tmp_path):
    """finetune_with_sgd seeds the fresh ModelCheckpoint from the trainer's
    history and suppresses the never-improved fallback when a checkpoint
    already exists — a worse SGD epoch must not replace the adam-phase
    best weights."""
    import numpy as np
    from cmrtpu.train import checkpoint as ckpt
    from cmrtpu.train.callbacks import finetune_with_sgd
    from cmrtpu.train.trainer import Trainer

    model_path = str(tmp_path / "model")
    cfg = dict(CFG, BATCHSIZE=8, EPOCHS=1, EXP_PATH=str(tmp_path),
               MODEL_PATH=model_path, TENSORBOARD_PATH=str(tmp_path / "tb"),
               SAVE_MODEL_FUNCTION="loss", SAVE_MODEL_MODE="min")
    trainer = Trainer(cfg)
    # the "adam-phase best": current params saved, history best unbeatable
    ckpt.save_weights(model_path, trainer.state.params,
                      trainer.state.batch_stats)
    before, _ = ckpt.load_weights(model_path)
    flat_before = jax.tree_util.tree_leaves(before)
    trainer.history = [{"loss": -1e9}]  # no real epoch can improve on this

    x = np.zeros((8, 32, 32, 1), np.float32)
    y = np.zeros((8, 32, 32, 2), np.float32)
    finetune_with_sgd(trainer, [(x, y)], initial_epoch=0, epochs=2)
    after, _ = ckpt.load_weights(model_path)
    for a, b in zip(jax.tree_util.tree_leaves(after), flat_before):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_finetune_sgd_ignores_nan_history_epochs(tmp_path):
    """A NaN epoch in the adam-phase history must not seed cb.best:
    min() propagates a leading NaN, `current < nan` is always False, and
    checkpointing would be silently disabled for the whole SGD phase."""
    import numpy as np
    from cmrtpu.train import checkpoint as ckpt
    from cmrtpu.train.callbacks import finetune_with_sgd
    from cmrtpu.train.trainer import Trainer

    model_path = str(tmp_path / "model")
    cfg = dict(CFG, BATCHSIZE=8, EPOCHS=1, EXP_PATH=str(tmp_path),
               MODEL_PATH=model_path, TENSORBOARD_PATH=str(tmp_path / "tb"),
               SAVE_MODEL_FUNCTION="loss", SAVE_MODEL_MODE="min")
    trainer = Trainer(cfg)
    ckpt.save_weights(model_path, trainer.state.params,
                      trainer.state.batch_stats)
    before, _ = ckpt.load_weights(model_path)
    flat_before = jax.tree_util.tree_leaves(before)
    # leading NaN (transient divergence) then an easily-beatable best
    trainer.history = [{"loss": float("nan")}, {"loss": 1e9}]

    x = np.zeros((8, 32, 32, 1), np.float32)
    y = np.zeros((8, 32, 32, 2), np.float32)
    finetune_with_sgd(trainer, [(x, y)], initial_epoch=0, epochs=1)
    after, _ = ckpt.load_weights(model_path)
    changed = any(not np.array_equal(np.asarray(a), np.asarray(b))
                  for a, b in zip(jax.tree_util.tree_leaves(after),
                                  flat_before))
    assert changed, ("SGD epoch beat the 1e9 best but the checkpoint was "
                     "not updated — NaN poisoned cb.best")


def test_model_checkpoint_sync_saves_multicontroller(monkeypatch, tmp_path):
    """Full-state saves are collective (orbax multihost): under
    process_count>1 the async latest-wins writer could diverge per-process
    entry counts, so ModelCheckpoint must fall back to synchronous."""
    from cmrtpu.train import callbacks as cb

    monkeypatch.setattr(cb.jax, "process_count", lambda: 2)
    mc = cb.ModelCheckpoint(str(tmp_path / "m"), save_full_state=True,
                            async_write=True)
    assert mc.async_write is False and mc._writer is None
    # weights-only saves are pure host-side — async stays allowed
    mc2 = cb.ModelCheckpoint(str(tmp_path / "m2"), save_full_state=False,
                             async_write=True)
    assert mc2.async_write is True and mc2._writer is not None
