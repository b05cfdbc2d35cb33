"""Per-fold training orchestration — parity with src/models/train_model.py.

``train_fold``: fold paths, config persistence, train/val generators (val
with AUGMENT/HIST_MATCHING off), model build + summary artifact, callback
set, fit, then chained ``pred_fold`` (ref: train_model.py:1-132).

``run_experiment``: the reference ``main``: load JSON config, timestamped
EXP_PATH, loss-by-name mapping, loop FOLDS (ref: train_model.py:135-206).
"""

from __future__ import annotations

import logging
import os
from time import time
from typing import Dict, Optional

from cmrtpu import config as C
from cmrtpu.data.dataset import get_trainings_files
from cmrtpu.models.unet import model_summary
from cmrtpu.pipeline.generator import DataGenerator
from cmrtpu.train.callbacks import get_callbacks
from cmrtpu.train.trainer import Trainer
from cmrtpu.utils.io_utils import console_and_file_logger, ensure_dir


def _per_host_cache(cfg: Dict) -> bool:
    """The per-host sharded-cache decision — delegated to the ONE shared
    resolution in device_cache (DeviceCachedLoop reads the same helper, so
    the loop choice and the resume epoch math cannot drift)."""
    from cmrtpu.train.device_cache import per_host_cache
    return per_host_cache(cfg)


def _picks_device_cache(cfg: Dict, train_gen, mesh) -> bool:
    """The fold's data-loop choice: device-cached whenever the (replicated
    or sharded) deterministic cache fits the per-device HBM budget, packed
    host streaming otherwise. Shared by train_fold and the resume epoch
    math (the streamed loop's STREAM_ECHO multiplies steps per epoch).
    Memoized per generator: the packability scan inside fits_device_cache
    walks the whole (possibly multi-GB) mask cache."""
    from cmrtpu.train.device_cache import cache_shards, fits_device_cache
    n_shards = cache_shards(cfg, mesh)
    key = (str(C.get(cfg, "CACHE_DTYPE", "float32")),
           float(C.get(cfg, "DEVICE_CACHE_LIMIT_GB", 8.0) or 8.0), n_shards,
           _per_host_cache(cfg))
    memo = getattr(train_gen, "_picks_cache_memo", None)
    if memo is not None and memo[0] == key:
        return memo[1]
    if _per_host_cache(cfg):
        # the user opted into per-host residency: rows are loaded lazily, so
        # there is no host cache to scan — admission is the caller's call
        # (an oversized shard fails loudly at upload, never silently)
        result = True
    else:
        result = (getattr(train_gen, "_cache_x", None) is not None
                  and fits_device_cache(cfg, train_gen._cache_x,
                                        train_gen._cache_y,
                                        n_shards=n_shards))
    try:
        train_gen._picks_cache_memo = (key, result)
    except AttributeError:  # façade objects without attribute support
        pass
    return result


def _steps_per_epoch(cfg: Dict, train_gen, mesh) -> int:
    """Gradient steps one epoch advances, mirroring the actual loop choice:
    replicated cache / generator both run floor(n/B); the example-sharded
    cache runs (ceil(n/n_shards)) // (B/n_shards) over its wrap-padded local
    rows; the streamed loop multiplies by STREAM_ECHO. Resume's
    step->epoch derivation must match or the epoch counter drifts."""
    batch = max(1, int(C.get(cfg, "BATCHSIZE", 32) or 1))
    if _picks_device_cache(cfg, train_gen, mesh):
        from cmrtpu.train.device_cache import _gen_examples, cache_shards
        n_shards = cache_shards(cfg, mesh)
        n = _gen_examples(train_gen)
        if n_shards > 1 or bool(C.get(cfg, "CACHE_SHARDED", False)):
            local_n = -(-n // n_shards)  # wrap-padded local rows
            return max(1, local_n // max(1, batch // n_shards))
        return max(1, n // batch)
    echo = max(1, int(C.get(cfg, "STREAM_ECHO", 1) or 1))
    return max(1, len(train_gen)) * echo


def _resume_fold(trainer: Trainer, cfg: Dict, train_gen,
                 callbacks) -> int:
    """Crash/preemption recovery — a capability the reference lacks
    (``initial_epoch=0`` hard-coded, ref: train_model.py:101).

    Restores the fold's full train state (params + optimizer + step, the
    best-only checkpoint ModelCheckpoint wrote) and derives the epoch to
    continue from as ``restored_step // steps_per_epoch``. history.csv is
    truncated to those epochs (rows after the best checkpoint are stale) and
    reloaded into ``trainer.history``; ModelCheckpoint's best is re-primed
    from it so a worse post-resume epoch never overwrites the checkpoint.
    Epochs between the best checkpoint and the crash are retrained;
    plateau/early-stop patience counters restart (the restored optimizer
    state preserves any already-reduced learning rate)."""
    from cmrtpu.train import callbacks as CB

    model_path = C.get(cfg, "MODEL_PATH")
    try:
        restored_step = trainer.restore(model_path)
    except Exception as e:
        logging.warning("RESUME requested but no restorable train state "
                        "under %s (%s); training from scratch", model_path, e)
        return 0
    steps_per_epoch = _steps_per_epoch(cfg, train_gen, trainer.mesh)
    initial_epoch = int(restored_step) // steps_per_epoch
    hist_path = os.path.join(cfg["EXP_PATH"], "history.csv")
    rows = []
    if os.path.isfile(hist_path) and initial_epoch > 0:
        import pandas as pd
        df = pd.read_csv(hist_path)
        df = df[df["epoch"] < initial_epoch]
        df.to_csv(hist_path, index=False)
        rows = df.drop(columns=["epoch"]).to_dict("records")
    trainer.history = rows
    for cb in callbacks:
        if isinstance(cb, CB.HistoryCSV):
            cb.append = True
        if isinstance(cb, CB.ModelCheckpoint):
            # a checkpoint exists on disk: the "never improved" fallback in
            # on_train_end must not overwrite it with a worse final state
            cb._saved = True
            CB.seed_best_from_history(cb, rows)
    logging.info("RESUME: restored step %d from %s -> continuing at epoch %d",
                 restored_step, model_path, initial_epoch)
    return initial_epoch


_FOLD_COMPLETE = "fold_complete.json"


def _fold_complete_path(cfg: Dict) -> str:
    return os.path.join(cfg.get("FOLD_PATH", cfg["EXP_PATH"]), _FOLD_COMPLETE)


def _fold_already_complete(cfg: Dict) -> bool:
    """True when this fold's completion marker exists and the resumed run
    does not ask for MORE epochs than the completed run targeted. A resumed
    CV must only retrain the fold that crashed — re-entering a finished fold
    would retrain it from its best epoch and overwrite its checkpoint,
    history tail and chained predictions. Raising EPOCHS beyond the
    completed target is the explicit train-longer request and re-enters."""
    import json as _json

    path = _fold_complete_path(cfg)
    if not os.path.isfile(path):
        return False
    try:
        with open(path) as fh:
            marker = _json.load(fh)
        target = int(marker.get("epochs_target", 0))
    except (ValueError, OSError):
        return True  # unreadable marker: the fold did finish — stay safe
    return int(C.get(cfg, "EPOCHS", 100) or 100) <= target


def train_fold(config: Dict, in_memory: bool = True) -> Optional[Trainer]:
    """Train one fold. Returns the Trainer — or None when RESUME found the
    fold's completion marker and skipped it (a resumed CV must only retrain
    the fold that crashed, not re-enter finished folds whose best
    checkpoints, histories and chained predictions it would overwrite)."""
    t0 = time()
    fold = C.get(config, "FOLD", 0)
    cfg = C.set_experiment_paths(C.normalise_config(config), fold=fold)

    if C.get(cfg, "RESUME", False) and _fold_already_complete(cfg):
        logging.info("RESUME: fold %s already complete (%s) — skipping",
                     fold, _fold_complete_path(cfg))
        return None

    console_and_file_logger(path=cfg["EXP_PATH"], log_lvl=logging.INFO)
    cfg = C.init_config(cfg, save=True)

    x_train, y_train, x_val, y_val = get_trainings_files(
        data_path=C.get(cfg, "DATA_PATH_SAX"),
        path_to_folds_df=C.get(cfg, "DF_FOLDS"), fold=fold)
    logging.info("SAX train CMR: %d, SAX train masks: %d", len(x_train), len(y_train))
    logging.info("SAX val CMR: %d, SAX val masks: %d", len(x_val), len(y_val))

    if _per_host_cache(cfg):
        # CACHE_PER_HOST: no host ever materializes the full deterministic
        # cache — DeviceCachedLoop pulls each host's shard rows on demand
        # through DataGenerator.fixed_rows
        in_memory = False
    batch_generator = DataGenerator(x_train, y_train, config=cfg,
                                    in_memory=in_memory)
    val_config = dict(cfg)
    val_config["AUGMENT"] = False          # no augmentation on validation data
    val_config["AUGMENT_GRID"] = False
    val_config["HIST_MATCHING"] = False
    validation_generator = DataGenerator(x_val, y_val, config=val_config,
                                         in_memory=in_memory)

    logging.info("Create model")
    trainer = Trainer(cfg)
    summary = model_summary(trainer.model,
                            {"params": trainer.state.params,
                             "batch_stats": trainer.state.batch_stats})
    fold_root = cfg.get("FOLD_PATH", cfg["EXP_PATH"])
    with open(os.path.join(fold_root, "model_summary.txt"), "w") as fh:
        fh.write(summary + "\n")

    # fixed train/val sample batches for the progress-image writer
    sample_batches = None
    if len(batch_generator) and len(validation_generator):
        tx, ty = batch_generator[0]
        vx, vy = validation_generator[0]
        sample_batches = [("train", tx, ty), ("val", vx, vy)]

    fold_cfg = dict(cfg)
    fold_cfg["EXP_PATH"] = fold_root  # per-fold artifacts under f<k>/
    callbacks = get_callbacks(fold_cfg, sample_batches=sample_batches)
    initial_epoch = 0
    if C.get(cfg, "RESUME", False):
        initial_epoch = _resume_fold(trainer, fold_cfg, batch_generator,
                                     callbacks)
    logging.info("start training")
    if _picks_device_cache(cfg, batch_generator, trainer.mesh):
        # device-cached hot loop: dataset resident in HBM (replicated, or
        # example-sharded over the mesh under CACHE_SHARDED — aggregate
        # capacity then scales with the chip count), fused per-step
        # gather+[hist-match]+augment+train
        trainer.fit_cached(batch_generator, val_gen=validation_generator,
                           epochs=C.get(cfg, "EPOCHS", 100),
                           callbacks=callbacks, initial_epoch=initial_epoch)
    else:
        # packed host-streaming fallback: deterministic stage streamed in
        # storage dtypes (bf16/uint8, 4x fewer bytes over the host link),
        # stochastic stage fused into the train step on device
        trainer.fit_streamed(batch_generator, val_gen=validation_generator,
                             epochs=C.get(cfg, "EPOCHS", 100),
                             callbacks=callbacks, initial_epoch=initial_epoch)

    try:
        from cmrtpu.predict.predictor import pred_fold
        pred_cfg = dict(cfg)
        pred_cfg["EXP_PATH"] = fold_root
        pred_fold(pred_cfg)
    except Exception as e:  # chained inference is best-effort (ref :114-129)
        logging.error(e)

    # completion marker: a later RESUME of the CV must not re-enter this
    # fold (retraining from its best epoch would overwrite the finished
    # checkpoint/history/predictions)
    import json as _json
    with open(_fold_complete_path(cfg), "w") as fh:
        _json.dump({"fold": fold, "epochs_run": len(trainer.history),
                    "epochs_target": int(C.get(cfg, "EPOCHS", 100) or 100),
                    "finished_at": time()}, fh)

    logging.info("Fold %s finished after %0.3f sec", fold, time() - t0)
    return trainer


def _latest_run_dir(cfg: Dict) -> Optional[str]:
    """Most recent timestamped run dir under EXPERIMENTS_ROOT/EXPERIMENT
    (the exp/<EXP>/<YYYY-MM-DD_HH_MM>/ layout, ref: train_model.py:166-175),
    or None when no prior run exists."""
    import glob as _glob
    root = os.path.join(C.get(cfg, "EXPERIMENTS_ROOT", "exp/"),
                        str(C.get(cfg, "EXPERIMENT", "")))
    runs = sorted(d for d in _glob.glob(os.path.join(root, "*"))
                  if os.path.isdir(d))
    return runs[-1] if runs else None


def run_experiment(config: Dict, data_path: Optional[str] = None,
                   exp_path: Optional[str] = None) -> str:
    """Loop FOLDS calling train_fold (ref: main, train_model.py:135-206)."""
    cfg = C.normalise_config(config)
    if exp_path is None and C.get(cfg, "RESUME", False):
        # RESUME without an explicit run dir must re-enter the crashed run,
        # not stamp a fresh timestamped dir (where no checkpoint exists and
        # every fold would silently retrain from scratch): prefer the
        # config's own EXP_PATH (a reloaded config/config.json carries it),
        # else the latest run dir of this experiment.
        # A config-carried EXP_PATH is only trusted when it lies under THIS
        # experiment's root: configs copied from a finished run as templates
        # carry the old experiment's path, and re-entering it would train
        # into (and overwrite) another experiment's run dir.
        root = os.path.realpath(
            os.path.join(C.get(cfg, "EXPERIMENTS_ROOT", "exp/"),
                         str(C.get(cfg, "EXPERIMENT", ""))))
        prior = C.get(cfg, "EXP_PATH")
        if prior and os.path.isdir(prior) and \
                not os.path.realpath(prior).startswith(root + os.sep):
            logging.warning(
                "RESUME: ignoring config EXP_PATH %s — it does not belong "
                "to experiment %r (expected under %s); falling back to the "
                "latest run dir", prior, C.get(cfg, "EXPERIMENT", ""), root)
            prior = None
        exp_path = prior if prior and os.path.isdir(prior) \
            else _latest_run_dir(cfg)
        if exp_path:
            logging.info("RESUME: re-entering run dir %s", exp_path)
        else:
            logging.warning("RESUME requested but no prior run dir found "
                            "under EXPERIMENTS_ROOT/EXPERIMENT; starting "
                            "a fresh run")
    cfg["EXP_PATH"] = exp_path or C.timestamped_exp_path(cfg)
    if data_path:
        cfg["DATA_PATH_SAX"] = os.path.join(data_path, "2D")
        cfg["DF_FOLDS"] = os.path.join(data_path, "df_kfold.csv")
        cfg["DATA_PATH_ORIG"] = os.path.join(data_path, "original")
    for f in C.get(cfg, "FOLDS", [0]):
        print(f"starting fold: {f}")
        fold_cfg = dict(cfg)
        fold_cfg["FOLD"] = f
        train_fold(fold_cfg, in_memory=True)
        print(f"training of fold: {f} finished")
    return cfg["EXP_PATH"]
