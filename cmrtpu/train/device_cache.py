"""Device-cached training: the whole dataset lives in HBM, the train step
fuses batch gather + augmentation + target synthesis + optimisation.

Motivation (measured on the target hardware): per-step host->device uploads
of full-resolution batches collapse to 25-50 MB/s when interleaved with
compute (1.2-2.2 s per 51 MB batch), while steps on device-resident data run
at ~107 ms. The deterministic-preprocessed ACDC 2D dataset is only ~2-4 GB —
it fits HBM outright. So instead of streaming batches (the reference's keras
queue model, ref: src/models/train_model.py:105-112), the TPU-native hot loop
is:

    upload once  ->  per step: idxs [B] (bytes)  ->  ONE XLA program:
        gather -> augment (affine/grid/rot90 warps) -> normalise ->
        mask channels / Gaussian heatmaps -> fwd -> loss -> bwd -> adam

Only scalar metrics leave the device. Epoch shuffling stays host-side
(a per-epoch permutation, parity with BaseGenerator.on_epoch_end,
ref: src/data/Generators.py:164).

Multi-chip: the cache is replicated; the per-step index vector is sharded
over the 'data' mesh axis, so the gather output — and everything after it —
is batch-sharded and XLA inserts the usual gradient psum over ICI.
"""

from __future__ import annotations

import logging
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cmrtpu import config as C
from cmrtpu.parallel.mesh import DATA_AXIS
from cmrtpu.pipeline.augment import augment_batch_fn
from cmrtpu.pipeline.generator import finalize_batch
from cmrtpu.train import steps as S


def cache_nbytes(*arrays: np.ndarray) -> int:
    return sum(int(a.nbytes) for a in arrays)


def _packed_nbytes(config: Optional[Dict], x: np.ndarray, y: np.ndarray) -> int:
    """Post-upload storage size: CACHE_DTYPE may halve the image cache and
    small-integer masks pack to uint8 (mirrors upload_cache's casts)."""
    x_bytes = int(x.nbytes)
    if str(C.get(config or {}, "CACHE_DTYPE", "float32")).lower() in (
            "bfloat16", "bf16"):
        x_bytes = x.size * 2
    y_bytes = int(y.nbytes)
    if (np.issubdtype(y.dtype, np.floating)
            and y.size and float(y.min()) >= 0 and float(y.max()) <= 255):
        y_bytes = y.size  # uint8 candidate; exactness checked at upload
    return x_bytes + y_bytes


def fits_device_cache(config: Dict, *arrays: np.ndarray) -> bool:
    """HBM-budget guard: the replicated cache must fit comfortably next to
    params/activations. Bound configurable via DEVICE_CACHE_LIMIT_GB; the
    estimate accounts for CACHE_DTYPE / uint8 mask packing."""
    limit_gb = float(C.get(config, "DEVICE_CACHE_LIMIT_GB", 8.0) or 8.0)
    if len(arrays) == 2:
        total = _packed_nbytes(config, *arrays)
    else:
        total = cache_nbytes(*arrays)
    return total <= limit_gb * (1 << 30)


def upload_cache(x_padded: np.ndarray, y_padded: np.ndarray, mesh: Mesh,
                 config: Optional[Dict] = None):
    """Upload the padded deterministic cache once, replicated over the mesh.

    Storage dtype is a capacity knob: CACHE_DTYPE='bfloat16' halves the image
    cache's HBM footprint (the model computes in bf16 anyway under
    MIXED_PRECISION, so the extra mantissa bits of a float32 cache are mostly
    discarded at the first conv); masks whose values are small non-negative
    integers are packed as uint8 (4x smaller). The fused step casts both back
    to float32 right after the gather, so augmentation interpolation and loss
    math are unchanged.
    """
    x = np.ascontiguousarray(x_padded)
    y = np.ascontiguousarray(y_padded)
    cache_dtype = str(C.get(config or {}, "CACHE_DTYPE", "float32")).lower()
    if cache_dtype in ("bfloat16", "bf16"):
        import ml_dtypes
        x = x.astype(ml_dtypes.bfloat16)
    if (np.issubdtype(y.dtype, np.floating)
            and y.size and float(y.min()) >= 0 and float(y.max()) <= 255):
        y_int = y.astype(np.uint8)
        if np.array_equal(y_int.astype(y.dtype), y):  # exact small ints only
            y = y_int
    repl = NamedSharding(mesh, P())
    return jax.device_put(x, repl), jax.device_put(y, repl)


def make_cached_train_step(model, optimizer, loss_fn: Callable,
                           metrics: Optional[Dict[str, Callable]],
                           config: Dict, mesh: Mesh, augment: bool,
                           masks: bool = True):
    """(state, data_x, data_y, idxs, rng) -> (state, logs), fully fused."""
    metrics = metrics or {}
    cfg = dict(config)
    # hist-matching rides the fused step too (Var.1 of the published
    # experiments, ref: src/data/Generators.py:350-358): ~10% of examples are
    # quantile-matched against a random slice drawn from the resident cache,
    # so the flagship throughput path covers all four experiment variants
    hist_matching = bool(C.get(cfg, "HIST_MATCHING", False)) and augment
    # the reference hardcodes the 10% rate (Generators.py:350); exposed as a
    # knob for tests / ablations
    hist_prob = float(C.get(cfg, "HIST_MATCHING_PROB", 0.1))
    # binned CDF matching (sort-free, fast on TPU); 0 selects the exact
    # sorted-quantile formulation. Default 2048 from a v5e sweep: 998 vs
    # 961 slices/s at 4096, matcher max-error 7e-3 of the intensity range
    # (<< augmentation noise); below 1024 throughput plateaus
    hist_bins = int(C.get(cfg, "HIST_MATCHING_BINS", 2048))

    def step_fn(state: S.TrainState, data_x, data_y, idxs, rng):
        # gather in storage dtype (bf16/uint8 caches move half the bytes),
        # then everything downstream computes in f32 as before
        imgs = jnp.take(data_x, idxs, axis=0).astype(jnp.float32)
        msks = jnp.take(data_y, idxs, axis=0).astype(jnp.float32)
        if hist_matching:
            from cmrtpu.pipeline.histmatch import (match_histograms_binned_jax,
                                                   match_histograms_jax)
            if hist_bins > 0:
                # exclude_zeros: the cache holds pad_and_crop'ed images whose
                # zero borders must not enter the histograms (host parity:
                # match unpadded, then re-pad with zeros)
                match_fn = lambda s, r: match_histograms_binned_jax(
                    s, r, bins=hist_bins, exclude_zeros=True)
            else:
                match_fn = match_histograms_jax
            hm_key = jax.random.fold_in(
                jax.random.fold_in(rng, 0x415), state.step)
            k_gate, k_ref = jax.random.split(hm_key)
            batch = idxs.shape[0]
            # fixed per-batch quota instead of per-example bernoulli: XLA
            # needs static shapes, and matching the whole batch to select
            # ~10% wastes 90% of the (sort-heavy) work — measured 2.7x
            # slower end-to-end. round(prob*B) uniformly-chosen examples
            # preserves the reference's expected fraction (the only thing
            # its unseeded RNG guarantees, ref: Generators.py:350); only the
            # per-batch count variance differs.
            quota = int(round(hist_prob * batch))
            if quota > 0:
                sel = jax.random.permutation(k_gate, batch)[:quota]
                ref_idx = jax.random.randint(k_ref, (quota,), 0,
                                             data_x.shape[0])
                refs = jnp.take(data_x, ref_idx, axis=0).astype(jnp.float32)
                matched = jax.vmap(match_fn)(
                    jnp.take(imgs, sel, axis=0), refs)
                imgs = imgs.at[sel].set(matched)
        if augment:
            # two-level fold with a constant tag: decorrelated from the
            # dropout stream (which is fold_in(rng, step)) for every step
            aug_key = jax.random.fold_in(
                jax.random.fold_in(rng, 0xA06), state.step)
            imgs, msks = augment_batch_fn(aug_key, imgs, msks, cfg)
        x, y = finalize_batch(imgs, msks, cfg, masks=masks)

        dropout_rng = jax.random.fold_in(rng, state.step)

        def compute_loss(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            preds, mutated = model.apply(
                variables, x, train=True, rngs={"dropout": dropout_rng},
                mutable=["batch_stats"])
            return loss_fn(y, preds), (preds, mutated)

        (loss, (preds, mutated)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        import optax
        updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=mutated["batch_stats"],
                                  opt_state=new_opt_state)
        logs = {"loss": loss}
        for name, fn in metrics.items():
            logs[name] = fn(y, preds)
        return new_state, logs

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(step_fn,
                   in_shardings=(repl, repl, repl, data, repl),
                   out_shardings=(repl, repl),
                   donate_argnums=(0,))


def make_cached_eval_step(model, loss_fn: Callable,
                          metrics: Optional[Dict[str, Callable]],
                          config: Dict, mesh: Mesh, masks: bool = True,
                          shard_batch_axis: bool = True):
    """(state, data_x, data_y, idxs) -> logs; no augmentation, no updates.

    ``shard_batch_axis=False`` replicates the index vector instead of
    sharding it over the 'data' axis — every device computes the whole
    (small) batch redundantly. That lifts the batch-divides-mesh constraint
    for partial/remainder batches; for their size the redundancy is free."""
    metrics = metrics or {}
    cfg = dict(config)

    def step_fn(state: S.TrainState, data_x, data_y, idxs):
        imgs = jnp.take(data_x, idxs, axis=0).astype(jnp.float32)
        msks = jnp.take(data_y, idxs, axis=0).astype(jnp.float32)
        x, y = finalize_batch(imgs, msks, cfg, masks=masks)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        preds = model.apply(variables, x, train=False)
        logs = {"loss": loss_fn(y, preds)}
        for name, fn in metrics.items():
            logs[name] = fn(y, preds)
        return logs

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS)) if shard_batch_axis else repl
    return jax.jit(step_fn, in_shardings=(repl, repl, repl, data),
                   out_shardings=repl)


class DeviceCachedLoop:
    """Drives epochs over an HBM-resident dataset for a Trainer.

    Built from DataGenerators (whose in-memory padded caches provide the
    arrays) or from raw padded numpy arrays."""

    def __init__(self, trainer, train_gen, val_gen=None):
        assert getattr(train_gen, "_cache_x", None) is not None, (
            "DeviceCachedLoop needs an in-memory DataGenerator "
            "(CACHE_IN_MEMORY=True)")
        self.trainer = trainer
        cfg = trainer.config
        mesh = trainer.mesh
        self.batch = int(C.get(cfg, "BATCHSIZE", 32) or 0)
        if self.batch <= 0:
            raise ValueError(f"BATCHSIZE must be positive, got {self.batch}")
        self.rng = np.random.default_rng(C.get(cfg, "SEED", 42))

        self.x_train, self.y_train = upload_cache(train_gen._cache_x,
                                                  train_gen._cache_y, mesh,
                                                  config=cfg)
        self.n_train = train_gen._cache_x.shape[0]
        self._augment = bool(C.get(cfg, "AUGMENT", False))
        self._masks = bool(getattr(train_gen, "masks", True))
        self._build_train_step()

        self.val = None
        if val_gen is not None and getattr(val_gen, "_cache_x", None) is not None:
            self.x_val, self.y_val = upload_cache(val_gen._cache_x,
                                                  val_gen._cache_y, mesh,
                                                  config=cfg)
            self.n_val = val_gen._cache_x.shape[0]
            self._val_masks = bool(getattr(val_gen, "masks", True))
            self._eval_step = make_cached_eval_step(
                trainer.model, trainer.loss_fn, trainer.metrics, cfg, mesh,
                masks=self._val_masks)
            self._eval_step_partial = None  # compiled on first remainder use
            self.val = True
        self._idx_sharding = NamedSharding(mesh, P(DATA_AXIS))
        logging.info("device cache: %d train / %s val examples resident in HBM",
                     self.n_train, self.n_val if self.val else "no")

    def _build_train_step(self) -> None:
        t = self.trainer
        self._step_optimizer = t.optimizer
        self._train_step = make_cached_train_step(
            t.model, t.optimizer, t.loss_fn, t.metrics, t.config, t.mesh,
            self._augment, masks=self._masks)

    def _epoch_indices(self, n: int, shuffle: bool) -> np.ndarray:
        idxs = self.rng.permutation(n) if shuffle else np.arange(n)
        n_batches = n // self.batch
        return idxs[:n_batches * self.batch].reshape(n_batches, self.batch)

    def run_train_epoch(self) -> Dict[str, float]:
        t = self.trainer
        if self._step_optimizer is not t.optimizer:
            # optimizer swapped mid-training (OptimizerChanger callback path,
            # ref: src/utils/KerasCallbacks.py:245-306) — the compiled step
            # closes over the old optax transform, so rebuild it before the
            # stale update hits the fresh opt_state
            self._build_train_step()
        batches = self._epoch_indices(self.n_train, shuffle=True)
        if len(batches) == 0:
            raise ValueError(
                f"device-cached epoch is empty: {self.n_train} examples < "
                f"BATCHSIZE {self.batch}")
        step_logs = []
        for idxs in batches:
            idxs_dev = jax.device_put(idxs.astype(np.int32), self._idx_sharding)
            t.state, logs = self._train_step(t.state, self.x_train,
                                             self.y_train, idxs_dev, t.rng)
            step_logs.append(logs)  # device scalars — no transfer yet
        # epoch logs are the mean over all steps (parity with fit()/keras
        # epoch averaging, ref: src/models/train_model.py:105-112 semantics)
        # but still only ONE host sync per epoch: stack+mean on device, then
        # a single device_get of the scalar dict
        mean_logs = jax.tree_util.tree_map(
            lambda *xs: jnp.mean(jnp.stack(xs)), *step_logs)
        return {k: float(v) for k, v in jax.device_get(mean_logs).items()}

    def run_eval_epoch(self) -> Dict[str, float]:
        """Evaluate ALL validation examples. Full batches run through the
        batch-sharded eval program; the remainder (which keras/reference
        floor semantics would silently drop — with n_val < BATCHSIZE that
        means NO val metrics at all) runs through a replicated-index twin
        with no batch-divides-mesh constraint. The epoch value is the exact
        example-weighted mean, still one host sync per epoch."""
        t = self.trainer
        step_logs, weights = [], []
        for idxs in self._epoch_indices(self.n_val, shuffle=False):
            idxs_dev = jax.device_put(idxs.astype(np.int32), self._idx_sharding)
            step_logs.append(self._eval_step(t.state, self.x_val,
                                             self.y_val, idxs_dev))
            weights.append(float(len(idxs)))
        remainder = self.n_val % self.batch
        if remainder:
            if self._eval_step_partial is None:
                self._eval_step_partial = make_cached_eval_step(
                    t.model, t.loss_fn, t.metrics, t.config, t.mesh,
                    masks=self._val_masks, shard_batch_axis=False)
            tail = np.arange(self.n_val - remainder, self.n_val, dtype=np.int32)
            step_logs.append(self._eval_step_partial(
                t.state, self.x_val, self.y_val,
                jax.device_put(tail, NamedSharding(t.mesh, P()))))
            weights.append(float(remainder))
        if not step_logs:
            return {}
        w = jnp.asarray(weights)
        mean_logs = jax.tree_util.tree_map(
            lambda *xs: jnp.sum(jnp.stack(xs) * w) / jnp.sum(w), *step_logs)
        return {k: float(v) for k, v in jax.device_get(mean_logs).items()}
