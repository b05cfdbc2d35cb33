"""Training callbacks — equivalents of src/utils/KerasCallbacks.py.

Implemented against the trainer protocol (``trainer.get_lr/set_lr``,
``trainer.stop_training``, ``trainer.state``, ``trainer.switch_optimizer``):

  * ModelCheckpoint     best-only weights-only model.npz  (ref: :54-61)
  * ReduceLROnPlateau   factor/patience/cooldown/min_lr   (ref: :63-70)
  * EarlyStopping       patience on monitor               (ref: :105-111)
  * TensorBoardLogger   scalars incl. learning rate       (ref LRTensorBoard :167-174)
  * PolynomialDecaySchedule                               (ref: :80-87, :230-243)
  * SGDRScheduler       cosine annealing with restarts    (ref: :308-384)
  * OptimizerChanger    early-stop -> switch to SGD, keep training (ref: :245-306)
  * HistoryCSV          epoch metrics to history.csv (keras History analogue)
  * ImageWriter         pred-vs-gt overlay PNGs every n epochs (ref
                        CustomImageWritertf2 :386-536 / ImageSaver :661)
"""

from __future__ import annotations

import logging
import math
import os
from typing import Dict, List, Optional

import jax
import numpy as np

from cmrtpu import config as C
from cmrtpu.train import checkpoint as ckpt
from cmrtpu.train.optimizers import polynomial_decay, sgdr_schedule
from cmrtpu.utils.io_utils import ensure_dir


class Callback:
    def on_train_begin(self, trainer):
        pass

    def on_epoch_begin(self, trainer, epoch: int):
        pass

    def on_epoch_end(self, trainer, epoch: int, logs: Dict[str, float]):
        pass

    def on_train_end(self, trainer):
        pass


def _improved(current: float, best: float, mode: str) -> bool:
    if math.isnan(current):
        return False
    return current < best if mode == "min" else current > best


class ModelCheckpoint(Callback):
    """Best-only weights-only checkpoint (ref: KerasCallbacks.py:54-61).

    Writes happen on a background thread by default (``async_write``): the
    callback snapshots the state on device and returns immediately, so the
    device->host transfer + file IO overlap the next epochs' compute instead
    of blocking the loop (see AsyncCheckpointWriter). ``on_train_end`` flushes
    before anyone reads the checkpoint back (e.g. the chained pred_fold)."""

    def __init__(self, model_path: str, monitor: str = "loss", mode: str = "min",
                 save_full_state: bool = True, async_write: bool = True):
        self.model_path = model_path
        self.monitor = monitor
        self.mode = mode
        self.best = math.inf if mode == "min" else -math.inf
        self.save_full_state = save_full_state
        if async_write and save_full_state and jax.process_count() > 1:
            # save_train_state is a cross-process collective (orbax multihost
            # sync). All processes DECIDE to save identically (replicated
            # logs), but the latest-wins async writer coalesces pending
            # snapshots per process by local disk speed — a slow host could
            # skip a save a fast host executes, diverging the collective
            # entry counts and hanging the job. Synchronous in-loop saves
            # keep every process's entries matched.
            logging.info("ModelCheckpoint: multi-controller run — full-state"
                         " saves switch to synchronous (collective entry "
                         "counts must match across processes)")
            async_write = False
        self.async_write = async_write
        self._writer = ckpt.AsyncCheckpointWriter() if async_write else None
        self._saved = False
        self._warned_missing = False

    def _write(self, state):
        # weights-only npz holds the SERVING params (the EMA shadow when EMA
        # is on) — downstream consumers (pred_fold, export, quantize) read
        # this file; the full-state checkpoint keeps live+EMA for resume
        from cmrtpu.train import steps as S
        ckpt.save_weights(self.model_path, S.inference_params(state),
                          state.batch_stats)
        if self.save_full_state:
            try:
                ckpt.save_train_state(self.model_path, state)
            except Exception as e:  # full-state resume is best-effort
                logging.debug("full-state checkpoint skipped: %s", e)

    def _save(self, trainer):
        self._saved = True
        if self.save_full_state:
            job, args = self._write, (ckpt.device_snapshot(trainer.state),)
        else:
            # weights-only mode: don't snapshot the optimizer state (~2x the
            # params for adam) that _write would never read
            job = ckpt.save_weights
            args = (self.model_path,
                    ckpt.device_snapshot(trainer.serving_params),
                    ckpt.device_snapshot(trainer.state.batch_stats))
        if self._writer is not None:
            self._writer.submit(job, *args)
        else:
            job(*args)

    def on_epoch_end(self, trainer, epoch, logs):
        current = logs.get(self.monitor)
        if current is None:
            if not self._warned_missing:
                self._warned_missing = True
                logging.warning(
                    "ModelCheckpoint: monitor '%s' not in epoch logs %s — "
                    "no best-only checkpoints will be written (is the "
                    "validation set empty?)", self.monitor, sorted(logs))
            return
        if _improved(current, self.best, self.mode):
            logging.info("Epoch %d: %s improved from %.5f to %.5f, saving model",
                         epoch + 1, self.monitor, self.best, current)
            self.best = current
            self._save(trainer)

    def on_train_end(self, trainer):
        if not self._saved:
            # the monitored key never appeared (e.g. empty validation set):
            # persist the final state anyway so downstream consumers (the
            # chained pred_fold, a later restore) have weights to load —
            # the reference would crash at predict time in this situation
            logging.warning(
                "ModelCheckpoint: no epoch ever improved monitor '%s'; "
                "saving the final training state as a fallback", self.monitor)
            self._save(trainer)
        if self._writer is not None:
            self._writer.flush()


class ReduceLROnPlateau(Callback):
    """keras-parity plateau scheduler: cooldown=2, verbose (ref: :63-70)."""

    def __init__(self, monitor: str = "loss", factor: float = 0.5, patience: int = 5,
                 cooldown: int = 2, min_lr: float = 1e-12, mode: str = "min",
                 min_delta: float = 1e-4):
        self.monitor, self.factor, self.patience = monitor, factor, patience
        self.cooldown, self.min_lr, self.mode = cooldown, min_lr, mode
        self.min_delta = min_delta
        self.best = math.inf if mode == "min" else -math.inf
        self.wait = 0
        self.cooldown_counter = 0

    def _improved(self, current):
        if self.mode == "min":
            return current < self.best - self.min_delta
        return current > self.best + self.min_delta

    def on_epoch_end(self, trainer, epoch, logs):
        current = logs.get(self.monitor)
        if current is None:
            return
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.wait = 0
        if self._improved(current):
            self.best = current
            self.wait = 0
        elif self.cooldown_counter <= 0:
            self.wait += 1
            if self.wait >= self.patience:
                old_lr = trainer.get_lr()
                if old_lr > self.min_lr:
                    new_lr = max(old_lr * self.factor, self.min_lr)
                    trainer.set_lr(new_lr)
                    logging.info("Epoch %d: ReduceLROnPlateau reducing lr to %.3e",
                                 epoch + 1, new_lr)
                self.cooldown_counter = self.cooldown
                self.wait = 0


class EarlyStopping(Callback):
    def __init__(self, monitor: str = "loss", patience: int = 25, mode: str = "min"):
        self.monitor, self.patience, self.mode = monitor, patience, mode
        self.best = math.inf if mode == "min" else -math.inf
        self.wait = 0

    def on_epoch_end(self, trainer, epoch, logs):
        current = logs.get(self.monitor)
        if current is None:
            return
        if _improved(current, self.best, self.mode):
            self.best = current
            self.wait = 0
        else:
            self.wait += 1
            if self.wait >= self.patience:
                logging.info("Epoch %d: early stopping (%s)", epoch + 1, self.monitor)
                trainer.stop_training = True


class OptimizerChanger(EarlyStopping):
    """When adam stops improving, switch to SGD and continue
    (ref: KerasCallbacks.py:245-306, idea arXiv:1712.07628)."""

    def __init__(self, monitor: str = "loss", patience: int = 15, mode: str = "min"):
        super().__init__(monitor=monitor, patience=patience, mode=mode)
        self.changed = False

    def on_epoch_end(self, trainer, epoch, logs):
        if self.changed:
            return
        super().on_epoch_end(trainer, epoch, logs)
        if trainer.stop_training:
            trainer.stop_training = False
            self.changed = True
            logging.info("Epoch %d: switching optimizer to SGD for fine-tuning",
                         epoch + 1)
            trainer.switch_optimizer("sgd")


class PolynomialDecaySchedule(Callback):
    """lr = init * (1 - epoch/max)^power (ref: :80-87, :230-243)."""

    def __init__(self, max_epochs: int, init_alpha: float, power: float = 2.0):
        self.max_epochs, self.init_alpha, self.power = max_epochs, init_alpha, power

    def on_epoch_begin(self, trainer, epoch):
        trainer.set_lr(polynomial_decay(epoch, self.max_epochs, self.init_alpha,
                                        self.power))


class StepDecaySchedule(Callback):
    """lr = init * factor^floor((1+epoch)/drop_every)
    (ref: StepDecay, KerasCallbacks.py:154-164)."""

    def __init__(self, init_alpha: float = 0.01, factor: float = 0.25,
                 drop_every: int = 10):
        self.init_alpha, self.factor, self.drop_every = \
            init_alpha, factor, drop_every

    def on_epoch_begin(self, trainer, epoch):
        exponent = math.floor((1 + epoch) / self.drop_every)
        trainer.set_lr(float(self.init_alpha * (self.factor ** exponent)))


class SGDRScheduler(Callback):
    """Cosine annealing with warm restarts, stepped per epoch (ref: :308-384)."""

    def __init__(self, lr_min: float, lr_max: float, cycle_length: int = 10,
                 mult_factor: float = 2.0):
        self.lr_min, self.lr_max = lr_min, lr_max
        self.cycle_length, self.mult_factor = cycle_length, mult_factor

    def on_epoch_begin(self, trainer, epoch):
        trainer.set_lr(sgdr_schedule(epoch, self.lr_min, self.lr_max,
                                     self.cycle_length, self.mult_factor))


class TensorBoardLogger(Callback):
    """Scalars + learning rate into tfevents (ref LRTensorBoard :167-174)."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        self.writer = None

    def on_train_begin(self, trainer):
        from cmrtpu.utils.tfevents import EventWriter
        self.writer = EventWriter(self.log_dir)

    def on_epoch_end(self, trainer, epoch, logs):
        if self.writer is None:
            return
        for tag, value in logs.items():
            self.writer.add_scalar(f"epoch_{tag}", float(value), epoch)
        self.writer.add_scalar("epoch_lr", trainer.get_lr(), epoch)
        self.writer.flush()

    def on_train_end(self, trainer):
        if self.writer is not None:
            self.writer.close()


class HistoryCSV(Callback):
    def __init__(self, path: str, append: bool = False):
        self.path = path
        self.keys: Optional[List[str]] = None
        # append: a resumed fold keeps its prior epochs' rows (train_fold
        # truncates the file to the resume epoch first)
        self.append = append

    def on_epoch_end(self, trainer, epoch, logs):
        ensure_dir(os.path.dirname(os.path.abspath(self.path)))
        row = dict(logs, lr=trainer.get_lr())
        if self.keys is None:
            if self.append and os.path.isfile(self.path):
                with open(self.path) as fh:
                    self.keys = fh.readline().strip().split(",")
            else:
                self.keys = ["epoch"] + sorted(row)
                with open(self.path, "w") as fh:
                    fh.write(",".join(self.keys) + "\n")
        with open(self.path, "a") as fh:
            fh.write(",".join([str(epoch)] + [f"{row.get(k, float('nan')):.6g}"
                                              for k in self.keys[1:]]) + "\n")


class ImageWriter(Callback):
    """Pred-vs-gt overlay images every n epochs, written as PNGs and/or TB
    image summaries (ref CustomImageWritertf2 :386-536 / ImageSaver :661)."""

    def __init__(self, image_dir: str, sample_batches: List, frequency: int = 2,
                 samples: int = 4, to_tensorboard: bool = False,
                 tb_dir: Optional[str] = None):
        self.image_dir = image_dir
        self.sample_batches = sample_batches  # list of (name, x, y) numpy triples
        self.frequency = max(1, frequency)
        self.samples = samples
        self.to_tensorboard = to_tensorboard
        self.tb_dir = tb_dir or image_dir
        self._writer = None
        self._warned = False

    def on_epoch_end(self, trainer, epoch, logs):
        if epoch % self.frequency:
            return
        from cmrtpu.visualization.visualize import save_prediction_overlays
        for name, x, y in self.sample_batches:
            preds = trainer.predict(x)
            if isinstance(preds, dict):
                # multi-head models return a dict of head outputs; overlay
                # the channel concatenation in HEADS spec order
                heads = [h[0] for h in (trainer.config.get("HEADS") or ())] \
                    or sorted(preds)
                preds = np.concatenate([np.asarray(preds[h]) for h in heads],
                                       axis=-1)
            preds = np.asarray(preds)
            out = os.path.join(self.image_dir, f"epoch{epoch:04d}_{name}.png")
            try:
                save_prediction_overlays(x[: self.samples], y[: self.samples],
                                         preds[: self.samples], out)
                if self.to_tensorboard:
                    self._tb_image(name, out, epoch)
            except Exception as e:
                # warn once per training run, then demote to debug — a
                # silently missing learning-progress image family is
                # otherwise invisible until someone opens tensorboard
                level = logging.DEBUG if self._warned else logging.WARNING
                logging.log(level, "learning-progress image rendering failed"
                            " (batch '%s', epoch %d): %s", name, epoch, e)
                self._warned = True

    def _tb_image(self, name: str, png_path: str, epoch: int) -> None:
        import matplotlib.image as mpimg
        if self._writer is None:
            from cmrtpu.utils.tfevents import EventWriter
            self._writer = EventWriter(self.tb_dir, filename_suffix=".images")
        rgb = (mpimg.imread(png_path)[..., :3] * 255).astype(np.uint8)
        self._writer.add_image(name, rgb, epoch)
        self._writer.flush()

    def on_train_end(self, trainer):
        if self._writer is not None:
            self._writer.close()


class WeightsSaver(Callback):
    """Unconditional weights dump every n epochs
    (ref: WeightsSaver, src/utils/KerasCallbacks.py:804-840). Async by
    default like ModelCheckpoint; per-epoch paths each get their own write
    (latest-wins only collapses writes to the SAME path)."""

    def __init__(self, model_path: str, every_n_epochs: int = 5,
                 keep_per_epoch: bool = False, async_write: bool = True):
        self.model_path = model_path
        self.every_n_epochs = max(1, every_n_epochs)
        self.keep_per_epoch = keep_per_epoch
        self._writer = ckpt.AsyncCheckpointWriter() if async_write else None

    def on_epoch_end(self, trainer, epoch, logs):
        if (epoch + 1) % self.every_n_epochs:
            return
        path = (os.path.join(self.model_path, f"epoch_{epoch:04d}")
                if self.keep_per_epoch else self.model_path)
        if self._writer is not None:
            if self.keep_per_epoch:
                self._writer.flush()  # don't drop distinct per-epoch dumps
            self._writer.submit(ckpt.save_weights, path,
                                ckpt.device_snapshot(trainer.serving_params),
                                ckpt.device_snapshot(trainer.state.batch_stats))
        else:
            ckpt.save_weights(path, trainer.serving_params,
                              trainer.state.batch_stats)
        logging.info("Epoch %d: weights saved to %s", epoch + 1, path)

    def on_train_end(self, trainer):
        if self._writer is not None:
            self._writer.flush()


class TimeBudget(Callback):
    """Stop training when wall-clock exceeds ``budget_s`` seconds.

    No reference analog (the reference trains by epoch count only) — this is
    the equal-wall-clock lever for architecture head-to-heads (e.g. the cine
    SliceDistributed2D-vs-3D comparison): give both arms the same seconds and
    let each take as many epochs as its step rate affords. The clock starts
    at on_train_begin, so compile time counts — matching what a user pays."""

    def __init__(self, budget_s: float):
        self.budget_s = float(budget_s)
        self._t0 = None

    def on_train_begin(self, trainer):
        import time
        self._t0 = time.time()

    def on_epoch_end(self, trainer, epoch, logs):
        import time
        elapsed = time.time() - self._t0
        if elapsed >= self.budget_s:
            logging.info("TimeBudget: %.1fs >= %.1fs after epoch %d — "
                         "stopping", elapsed, self.budget_s, epoch + 1)
            trainer.stop_training = True


def get_callbacks(config: Dict, sample_batches: Optional[List] = None,
                  use_optimizer_changer: bool = False) -> List[Callback]:
    """Assemble the reference callback set from config
    (ref: get_callbacks, src/utils/KerasCallbacks.py:20-115)."""
    cbs: List[Callback] = []
    model_path = C.get(config, "MODEL_PATH", "temp/models")
    tb_path = C.get(config, "TENSORBOARD_PATH", "temp/tf_log")
    cbs.append(ModelCheckpoint(model_path,
                               monitor=C.get(config, "SAVE_MODEL_FUNCTION", "loss"),
                               mode=C.get(config, "SAVE_MODEL_MODE", "min")))
    cbs.append(ReduceLROnPlateau(
        monitor=C.get(config, "MONITOR_FUNCTION", "loss"),
        factor=C.get(config, "DECAY_FACTOR", 0.5),
        patience=C.get(config, "REDUCE_LR_ON_PLATEAU_PATIENCE", 5),
        cooldown=2,
        mode=C.get(config, "MONITOR_MODE", "min"),
        min_lr=C.get(config, "MIN_LR", 1e-12)))
    cbs.append(TensorBoardLogger(tb_path))
    cbs.append(HistoryCSV(os.path.join(C.get(config, "EXP_PATH", "tmp"), "history.csv")))
    if C.get(config, "POLY_LR_DECAY", False):
        cbs.append(PolynomialDecaySchedule(C.get(config, "EPOCHS", 100),
                                           C.get(config, "LEARNING_RATE", 1e-4)))
    if use_optimizer_changer:
        cbs.append(OptimizerChanger(monitor=C.get(config, "MONITOR_FUNCTION", "loss"),
                                    patience=15,
                                    mode=C.get(config, "MONITOR_MODE", "min")))
    else:
        cbs.append(EarlyStopping(monitor=C.get(config, "MONITOR_FUNCTION", "loss"),
                                 patience=C.get(config, "EARLY_STOPPING_PATIENCE", 25),
                                 mode=C.get(config, "MONITOR_MODE", "min")))
    if sample_batches and (C.get(config, "SAVE_LEARNING_PROGRESS_AS_PNG", False)
                           or C.get(config, "SAVE_LEARNING_PROGRESS_AS_TF", False)):
        cbs.append(ImageWriter(
            os.path.join(C.get(config, "EXP_PATH", "tmp"), "figures"),
            sample_batches,
            frequency=C.get(config, "SAVE_LEARNING_PROGRESS_FREQUENCY", 2),
            to_tensorboard=C.get(config, "SAVE_LEARNING_PROGRESS_AS_TF", False),
            tb_dir=tb_path))
    return cbs


def feed_inputs_4_tensorboard(config: Dict, batch_generator=None,
                              validation_generator=None,
                              samples: int = 4) -> List:
    """Fixed sample batches for the ImageWriter callback, drawn once from the
    train/val generators (ref: feed_inputs_4_tensorboard,
    src/utils/KerasCallbacks.py:117-151). Returns [(name, x, y), ...] triples
    — the ``sample_batches`` format ImageWriter/get_callbacks consume."""
    samples = min(C.get(config, "BATCHSIZE", 32), samples)
    feeds: List = []
    for name, gen in (("gen_train", batch_generator),
                      ("gen_val", validation_generator)):
        if gen is None:
            continue
        x, y = gen[0]
        feeds.append((name, np.asarray(x)[:samples],
                      None if y is None else np.asarray(y)[:samples]))
    logging.info("feed 4 Tensorboard is ready")
    return feeds


def seed_best_from_history(cb: ModelCheckpoint, history) -> None:
    """Seed a fresh ModelCheckpoint's ``best`` from prior epoch rows (dicts
    of monitor -> value), so the first epoch of a continued fit cannot
    "improve" on ±inf and overwrite a better earlier checkpoint. NaN epochs
    (transient divergence) are skipped: min()/max() propagate a NaN and
    every later `current < nan` comparison is False, which would silently
    disable checkpointing for the whole continued phase. Shared by
    finetune_with_sgd and the crash-resume path (fold.py::_resume_fold)."""
    vals = [float(r[cb.monitor]) for r in history if cb.monitor in r]
    vals = [v for v in vals if not math.isnan(v)]
    if vals:
        cb.best = min(vals) if cb.mode == "min" else max(vals)


def finetune_with_sgd(trainer, train_data, val_data=None,
                      initial_epoch: int = 0, epochs: Optional[int] = None):
    """Fine-tune an already-trained model with plain SGD: swap the optimizer
    in place (fresh opt state, compiled steps rebuilt) and continue fitting
    from ``initial_epoch`` with the standard callback set
    (ref: finetune_with_SGD, src/utils/KerasCallbacks.py:280-306 — the
    OptimizerChanger callback automates the same hand-off mid-fit)."""
    trainer.switch_optimizer("sgd")
    cbs = get_callbacks(trainer.config)
    # seed the fresh checkpoint monitor with the pre-fine-tune best: a new
    # ModelCheckpoint starts at ±inf, so the FIRST SGD epoch (typically
    # worse right after the swap — fresh optimizer state) would otherwise
    # always "improve" and overwrite the better adam-phase checkpoint
    for cb in cbs:
        if isinstance(cb, ModelCheckpoint):
            seed_best_from_history(cb, trainer.history)
            if os.path.exists(os.path.join(cb.model_path, "model.npz")):
                # the never-improved train-end fallback exists so downstream
                # consumers have SOME weights; here they already do (the
                # pre-fine-tune best) — don't let the fallback replace them
                # with the final SGD state
                cb._saved = True
    return trainer.fit(train_data, val_data, epochs=epochs,
                       initial_epoch=initial_epoch,
                       callbacks=cbs)
