"""Trainer: the pjit-compiled replacement for keras model.fit.

Orchestrates epochs over host-side batch iterables, compiles one train step
and one eval step per shape over the device mesh, aggregates scalar logs and
drives the callback set (ref hot loop: src/models/train_model.py:105-112).
"""

from __future__ import annotations

import logging
import time
from typing import Callable, Dict, Iterable, List, Optional

import jax
import numpy as np

from cmrtpu import config as C
from cmrtpu.models.unet import init_variables
from cmrtpu.parallel.mesh import create_mesh, shard_batch
from cmrtpu.train import losses as L
from cmrtpu.train import steps as S
from cmrtpu.train.callbacks import Callback
from cmrtpu.train.optimizers import get_optimizer, get_learning_rate, set_learning_rate


class Trainer:
    def __init__(self, config: Dict, model=None, mesh=None,
                 loss_fn: Optional[Callable] = None,
                 metrics: Optional[Dict[str, Callable]] = None,
                 supervision: bool = False):
        self.config = C.normalise_config(config)
        if C.get(self.config, "QUANT_INT8", False):
            raise ValueError(
                "QUANT_INT8 configs are serving-only twins "
                "(cmrtpu/predict/quantize.py): round/clip quantization has "
                "zero gradient, so training one would silently not learn — "
                "train the float config and quantize the result")
        # persistent XLA compilation cache: every fold of a CV run (and every
        # CLI invocation) compiles the same programs from scratch otherwise
        from cmrtpu.utils.xla_cache import ensure_compilation_cache
        ensure_compilation_cache(self.config)
        # dropout-mask PRNG implementation: 'rbg' measured ~1.4x faster than
        # the threefry default for this model family on v5e (PRNG_IMPL knob;
        # set to '' / None to keep jax's default)
        prng_impl = C.get(self.config, "PRNG_IMPL", "rbg")
        if prng_impl:
            jax.config.update("jax_default_prng_impl", prng_impl)
        self.mesh = mesh if mesh is not None else create_mesh(self.config)
        if model is None:
            # MODEL_VARIANT dispatches between the plain dimension-generic
            # U-Net and the 2D-in-3D hybrid family (ref: get_model,
            # src/models/Unets.py:984-998)
            from cmrtpu.models.hybrids import get_model
            model = get_model(self.config, supervision=supervision)
        self.model = model
        self.loss_fn = loss_fn or L.get_loss(self.config)
        self.metrics = metrics if metrics is not None else L.default_metrics(
            C.get(self.config, "MASK_CLASSES"))
        heads = C.get(self.config, "HEADS", ()) or ()
        if (metrics is None and C.get(self.config, "MONITOR_LOCALISATION",
                                      False)):
            # the actual target metric (mm, with the FN upper bound) as a
            # live train/eval metric — monitorable via
            # SAVE_MODEL_FUNCTION='val_loc_mm' / SAVE_MODEL_MODE='min'
            # (cmrtpu/eval/detection.py localisation_metrics)
            if heads or C.ndims(self.config) != 2:
                raise ValueError(
                    "MONITOR_LOCALISATION covers single-head 2D landmark "
                    "configs (the slice-wise detection contract); use the "
                    "offline evaluation suite for heads/3D")
            from cmrtpu.eval.detection import localisation_metrics
            self.metrics = dict(self.metrics,
                                **localisation_metrics(self.config))
        if heads and metrics is None:
            # tensor metrics run on the channel-concatenated head outputs
            concat = L.concat_heads(heads)
            self.metrics = {name: (lambda yt, yp, f=fn: f(yt, concat(yp)))
                            for name, fn in self.metrics.items()}
        # typed key (carries the impl chosen above; robust to later flips)
        self.rng = jax.random.key(C.get(self.config, "SEED", 42))

        self.optimizer = get_optimizer(self.config)
        self.optimizer_name = str(C.get(self.config, "OPTIMIZER", "adam")).lower()
        variables = init_variables(self.model, self.config, self.rng)
        self.ema_decay = S.ema_decay_from_config(self.config)
        self.state = S.create_train_state(self.model, variables,
                                          self.optimizer,
                                          ema=self.ema_decay is not None)
        if jax.process_count() > 1:
            self._globalize_state()
        self._build_steps()
        self.stop_training = False
        self.history: List[Dict[str, float]] = []

    def _globalize_state(self):
        """Multi-controller runs: jit inputs must be process-spanning global
        arrays, not per-process single-device ones — replicate the train
        state and PRNG key over the whole mesh. Valid because every process
        initializes (or restores) identical values from the same SEED /
        checkpoint; each process puts only its addressable replicas
        (parallel/mesh.py put_global)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from cmrtpu.parallel.mesh import put_global

        repl = NamedSharding(self.mesh, P())

        def put(leaf):
            if hasattr(leaf, "dtype") and jax.dtypes.issubdtype(
                    leaf.dtype, jax.dtypes.prng_key):
                data = put_global(
                    np.asarray(jax.random.key_data(leaf)), repl)
                return jax.random.wrap_key_data(
                    data, impl=jax.random.key_impl(leaf))
            return put_global(np.asarray(leaf), repl)

        self.state = jax.tree_util.tree_map(put, self.state)
        self.rng = put(self.rng)

    # -- step construction -------------------------------------------------
    def _build_steps(self):
        self.train_step = S.make_train_step(self.model, self.optimizer,
                                            self.loss_fn, self.metrics,
                                            self.mesh,
                                            ema_decay=self.ema_decay)
        self.eval_step = S.make_eval_step(self.model, self.loss_fn,
                                          self.metrics, self.mesh)
        self.predict_step = S.make_predict_step(self.model, self.mesh)

    # -- lr plumbing (inject_hyperparams leaf) -----------------------------
    def get_lr(self) -> float:
        return get_learning_rate(self.state.opt_state)

    def set_lr(self, lr: float) -> None:
        self.state = self.state.replace(
            opt_state=set_learning_rate(self.state.opt_state, lr))

    def switch_optimizer(self, name: str) -> None:
        """Re-initialise the optimizer keeping params (OptimizerChanger path,
        ref: src/utils/KerasCallbacks.py:245-306)."""
        cfg = dict(self.config)
        cfg["OPTIMIZER"] = name
        self.optimizer = get_optimizer(cfg)
        self.optimizer_name = str(name).lower()
        self.state = self.state.replace(opt_state=self.optimizer.init(self.state.params))
        self._build_steps()

    # -- checkpoint / resume -------------------------------------------------
    def restore_weights(self, model_path: str) -> None:
        """Load weights-only model.npz — or a reference keras model.h5 —
        (inference parity with the reference's rebuild-then-load_weights
        flow, ref: predict_model.py:75-76)."""
        from cmrtpu.train.checkpoint import load_weights_for_model
        params, batch_stats = load_weights_for_model(model_path, self.config,
                                                     self.model)
        # with EMA on, re-seed the shadow from the restored weights — keeping
        # the init-copy shadow would blend random init into early evals/saves
        ema = None if self.state.ema_params is None else \
            jax.tree_util.tree_map(jax.numpy.copy, params)
        self.state = self.state.replace(params=params, batch_stats=batch_stats,
                                        ema_params=ema)
        if jax.process_count() > 1:
            self._globalize_state()

    def restore(self, ckpt_dir: str) -> int:
        """Full-state resume (params + optimizer + step); returns the restored
        step count. Capability the reference lacks (initial_epoch=0 hard-coded,
        ref: train_model.py:101)."""
        from cmrtpu.train.checkpoint import restore_train_state
        self.state = restore_train_state(ckpt_dir, jax.device_get(self.state))
        if jax.process_count() > 1:
            self._globalize_state()
        return int(self.state.step)

    # -- loops -------------------------------------------------------------
    def _run_epoch(self, data: Iterable, training: bool) -> Dict[str, float]:
        from cmrtpu.parallel.prefetch import prefetch_to_device

        sums: Dict[str, float] = {}
        count = 0
        # PREFETCH_DEPTH is the native knob; QUEUE_SIZE (the reference's keras
        # max_queue_size, ref: train_model.py:111) is honoured as an upper
        # bound for config compatibility
        depth = int(C.get(self.config, "PREFETCH_DEPTH", 2))
        queue_size = C.get(self.config, "QUEUE_SIZE")
        if queue_size:
            depth = min(depth, int(queue_size)) if depth else depth
        batches = prefetch_to_device(iter(data), self.mesh, depth=depth)
        for batch in batches:
            if training:
                self.state, logs = self.train_step(self.state, *batch, self.rng)
            else:
                logs = self.eval_step(self.state, *batch)
            logs = jax.device_get(logs)
            for key, value in logs.items():
                sums[key] = sums.get(key, 0.0) + float(value)
            count += 1
        return {k: v / max(count, 1) for k, v in sums.items()}

    def _fit_loop(self, train_epoch: Callable[[], Dict[str, float]],
                  eval_epoch: Optional[Callable[[], Dict[str, float]]],
                  epochs: Optional[int], callbacks: Optional[List[Callback]],
                  initial_epoch: int,
                  after_epoch: Optional[Callable[[], None]] = None
                  ) -> List[Dict[str, float]]:
        """The ONE epoch/callback/early-stop driver behind fit, fit_cached
        and fit_streamed — the loops differ only in how an epoch runs, and
        the epoch protocol (callback ordering, val_ merging, epoch_time,
        stop_training, crash-durable on_train_end) must not drift between
        the three data paths."""
        epochs = epochs or C.get(self.config, "EPOCHS", 100)
        callbacks = callbacks or []
        self.stop_training = False
        for cb in callbacks:
            cb.on_train_begin(self)
        try:
            for epoch in range(initial_epoch, epochs):
                t0 = time.time()
                for cb in callbacks:
                    cb.on_epoch_begin(self, epoch)
                logs = train_epoch()
                if eval_epoch is not None:
                    logs.update({f"val_{k}": v
                                 for k, v in eval_epoch().items()})
                logs["epoch_time"] = time.time() - t0
                self.history.append(logs)
                for cb in callbacks:
                    cb.on_epoch_end(self, epoch, logs)
                if after_epoch is not None:
                    after_epoch()
                logging.info("epoch %d/%d %s", epoch + 1, epochs,
                             " ".join(f"{k}={v:.4f}"
                                      for k, v in sorted(logs.items())))
                if self.stop_training:
                    break
        finally:
            # runs on KeyboardInterrupt/NaN-raise too: the async checkpoint
            # writer must flush before the process dies or the best (or
            # fallback) checkpoint is lost with it
            self._end_callbacks(callbacks)
        return self.history

    def fit(self, train_data, val_data=None, epochs: Optional[int] = None,
            callbacks: Optional[List[Callback]] = None,
            initial_epoch: int = 0) -> List[Dict[str, float]]:
        return self._fit_loop(
            lambda: self._run_epoch(train_data, training=True),
            (lambda: self._run_epoch(val_data, training=False))
            if val_data is not None else None,
            epochs, callbacks, initial_epoch,
            after_epoch=getattr(train_data, "on_epoch_end", None))

    def _end_callbacks(self, callbacks) -> None:
        """on_train_end for every callback. With an epoch-loop exception in
        flight, callback errors are logged (never mask the original); on the
        clean path a failing on_train_end (e.g. the final checkpoint write)
        must fail the fold loudly — downstream consumers read that file."""
        import sys

        in_flight = sys.exc_info()[0] is not None
        first_error = None
        for cb in callbacks:
            try:
                cb.on_train_end(self)
            except Exception as e:
                logging.error("on_train_end callback failed: %s", e)
                if first_error is None:
                    first_error = e
        if first_error is not None and not in_flight:
            raise first_error

    def fit_cached(self, train_gen, val_gen=None, epochs: Optional[int] = None,
                   callbacks: Optional[List[Callback]] = None,
                   initial_epoch: int = 0) -> List[Dict[str, float]]:
        """Train from HBM-resident data (see cmrtpu/train/device_cache.py):
        the whole deterministic cache is uploaded once and each step fuses
        gather + augment + target synthesis + optimisation — no per-step
        host->device batch uploads. Same callback protocol as ``fit``."""
        from cmrtpu.train.device_cache import DeviceCachedLoop

        # reuse the loop (uploaded cache + compiled fused steps) across calls;
        # key holds strong references so a recycled id() can't alias stale
        # data. Tuple equality (identity per element) — ``is not`` on a
        # freshly built tuple could never hit (same as fit_streamed below)
        cache_key = (train_gen, val_gen)
        if getattr(self, "_cached_loop_key", None) != cache_key:
            self._cached_loop = DeviceCachedLoop(self, train_gen, val_gen)
            self._cached_loop_key = cache_key
        loop = self._cached_loop
        return self._fit_loop(
            loop.run_train_epoch,
            loop.run_eval_epoch if loop.val else None,
            epochs, callbacks, initial_epoch)

    def fit_streamed(self, train_gen, val_gen=None, epochs: Optional[int] = None,
                     callbacks: Optional[List[Callback]] = None,
                     initial_epoch: int = 0) -> List[Dict[str, float]]:
        """Train from packed host-streamed batches (see cmrtpu/train/
        streaming.py): the deterministic stage streams in storage dtypes
        (bf16 images / uint8 masks — 4x fewer bytes over the host link than
        finalized float32), the stochastic stage runs fused inside the train
        step. The fallback for datasets exceeding even the sharded HBM
        cache. Same callback protocol as ``fit``/``fit_cached``."""
        from cmrtpu.train.streaming import StreamedLoop

        stream_key = (train_gen, val_gen)
        # tuple equality (identity per element) — ``is not`` on a freshly
        # built tuple could never hit, rebuilding the loop + recompiling the
        # fused step on every fit_streamed call
        if getattr(self, "_streamed_loop_key", None) != stream_key:
            self._streamed_loop = StreamedLoop(self, train_gen, val_gen)
            self._streamed_loop_key = stream_key
        loop = self._streamed_loop
        return self._fit_loop(
            loop.run_train_epoch,
            loop.run_eval_epoch if val_gen is not None else None,
            epochs, callbacks, initial_epoch)

    @property
    def serving_params(self):
        """Params for inference-time consumers (checkpoints, predict,
        WeightsSaver): the EMA shadow when EMA is on, live params otherwise."""
        return S.inference_params(self.state)

    def predict(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x)
        # pad to a multiple of the data-axis size so the batch shards evenly
        n = x.shape[0]
        n_shards = int(np.prod(list(self.mesh.shape.values()))) if self.mesh else 1
        padded = -(-n // n_shards) * n_shards
        if padded != n:
            x = np.concatenate([x, np.zeros((padded - n, *x.shape[1:]), x.dtype)])
        out = self.predict_step(self.serving_params, self.state.batch_stats, x)
        # multi-head models return a dict of head outputs
        return jax.tree_util.tree_map(lambda a: np.asarray(a)[:n],
                                      jax.device_get(out))

    def evaluate(self, data: Iterable) -> Dict[str, float]:
        return self._run_epoch(data, training=False)
