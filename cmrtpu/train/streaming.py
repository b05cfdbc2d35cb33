"""Packed host-streaming training: the fallback when the dataset exceeds
even the SHARDED HBM cache (cmrtpu/train/device_cache.py).

The reference streams finalized float32 batches through a keras prefetch
queue (ref: src/models/train_model.py:105-112). Measured on the target
hardware, per-step float32 uploads interleaved with compute collapse to
25-50 MB/s — at 600 KB per finalized slice that is the observed ~160
slices/s/chip. This path instead moves the stochastic stage INTO the train
step and streams the deterministic stage's output in packed storage dtypes:

    host:   gather cached rows -> pack (bf16 images, uint8 masks)  [150 KB/slice]
    async:  device_put batch-sharded over the 'data' mesh axis (double
            buffered, cmrtpu/parallel/prefetch.py)
    device: ONE fused XLA program: unpack -> [hist-match] -> augment ->
            normalise/heatmaps -> fwd -> loss -> bwd -> adam

4x fewer bytes over the host link than finalized f32 (x: 4->2 bytes/px and
no separate y channel tensor: the flat uint8 label map expands to channels
on device), so the same interconnect sustains ~4x the slice rate.

Even packed, the path stays LINK-bound: the chip finishes a fused step in
~111 ms while the next batch needs ~370 ms on the wire. STREAM_ECHO=k fills
that bubble with data echoing (Choi et al., arXiv:1907.05550): each uploaded
batch is consumed by k consecutive train steps. Because the stochastic stage
lives INSIDE the step and its RNG folds in ``state.step``, every echo sees a
DIFFERENT augmentation draw (and dropout mask) of the same raw examples —
echoing multiplies gradient-step throughput toward the compute-bound rate at
zero extra link traffic. The trade is sample freshness (k steps between
fresh batches), which the paper and our quality loop both find benign at
k<=4 when augmentation is on; with AUGMENT=False echoes differ only by
dropout/optimizer state, so a warning is logged.

Implementation note: the fused step IS ``make_cached_train_step(...,
cache_sharded=True)`` where the "cache" is the current batch itself and the
per-device gather is the identity over its local rows — one code path for
cached, sharded-cached and streamed training, one compiled program per
shape.
"""

from __future__ import annotations

import logging
from collections import deque
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from cmrtpu import config as C
from cmrtpu.parallel.mesh import DATA_AXIS, shard_batch
from cmrtpu.parallel.prefetch import numpy_prefetch
from cmrtpu.train.device_cache import (make_cached_eval_step,
                                       make_cached_train_step)


class StreamedLoop:
    """Drives epochs over packed host-streamed batches for a Trainer."""

    def __init__(self, trainer, train_gen, val_gen=None):
        self.trainer = trainer
        cfg = trainer.config
        self.mesh = trainer.mesh
        self.train_gen = train_gen
        self.val_gen = val_gen
        self.batch = int(C.get(cfg, "BATCHSIZE", 32) or 0)
        n_shards = int(self.mesh.shape[DATA_AXIS])
        assert self.batch % n_shards == 0, (
            f"BATCHSIZE {self.batch} must be a multiple of the data-mesh "
            f"size {n_shards}")
        local_batch = self.batch // n_shards
        # identity local gather: row r of each device's batch shard.
        # put_global, not device_put: a sharding-destination device_put
        # raises on a multi-controller mesh (parallel/mesh.py put_global)
        from cmrtpu.parallel.mesh import put_global
        self._idxs = put_global(
            np.tile(np.arange(local_batch, dtype=np.int32), n_shards),
            NamedSharding(self.mesh, P(DATA_AXIS)))
        self._augment = bool(C.get(cfg, "AUGMENT", False))
        self._masks = bool(getattr(train_gen, "masks", True))
        self._echo = max(1, int(C.get(cfg, "STREAM_ECHO", 1) or 1))
        if self._echo > 1 and not self._augment:
            logging.warning(
                "STREAM_ECHO=%d with AUGMENT=False: echoed steps repeat the "
                "same finalized batch (only dropout varies) — echoing is "
                "designed to pair with on-device augmentation", self._echo)
        self._build_train_step()
        self._eval_step = None
        depth = int(C.get(cfg, "PREFETCH_DEPTH", 2))
        queue_size = C.get(cfg, "QUEUE_SIZE")
        self._depth = min(depth, int(queue_size)) if queue_size else depth
        logging.info("streamed loop: packed host batches (STREAM_DTYPE=%s, "
                     "uint8 mask packing auto-detected), prefetch depth %d"
                     "%s",
                     C.get(cfg, "STREAM_DTYPE", "bfloat16"), self._depth,
                     f", echo factor {self._echo}" if self._echo > 1 else "")

    def _build_train_step(self) -> None:
        t = self.trainer
        self._step_optimizer = t.optimizer
        if C.get(t.config, "GRAD_ALLREDUCE_DTYPE", None):
            # same routing as DeviceCachedLoop: a config that sets the
            # explicit-collectives knob must not silently change semantics
            # depending on which loop the cache-fit check picks
            from cmrtpu.train.manual_collectives import make_manual_train_step
            self._train_step = make_manual_train_step(
                t.model, t.optimizer, t.loss_fn, t.metrics, t.config, t.mesh,
                self._augment, masks=self._masks, cache_sharded=True)
        else:
            self._train_step = make_cached_train_step(
                t.model, t.optimizer, t.loss_fn, t.metrics, t.config, t.mesh,
                self._augment, masks=self._masks, cache_sharded=True)

    def _batches(self, gen):
        for i in range(len(gen)):
            imgs, msks = gen.raw_batch(i)
            if imgs.shape[0] != self.batch:
                # the fused step's identity-gather index vector is compiled
                # for BATCHSIZE rows; jnp.take's clip mode would otherwise
                # silently drop or duplicate rows on a mismatch
                raise ValueError(
                    f"raw_batch({i}) has {imgs.shape[0]} rows but the "
                    f"streamed step is compiled for BATCHSIZE {self.batch}")
            yield imgs, msks

    def _pipelined(self, gen, consume):
        """Put-ahead pipeline: a numpy-only producer thread prepares packed
        batches; the MAIN thread enqueues batch N+1's transfers before
        dispatching the step on batch N. Two rules this encodes (both
        measured on the target platform — see docs/ARCHITECTURE.md):

          * jax dispatches from background threads serialize pathologically
            against main-thread execution, so the device placement must NOT
            live in the producer (the classic prefetch-thread design runs
            5x SLOWER here);
          * device_put only overlaps a step if enqueued BEFORE the step —
            hence the one-batch put-ahead.

        Per-step logs are NOT fetched synchronously (a device_get after every
        dispatch stalls the main thread for the whole step and defeats the
        overlap); instead a bounded window of in-flight step logs provides
        backpressure — fetching the OLDEST log once the window exceeds the
        prefetch depth blocks exactly until that step has retired, keeping
        at most ``depth`` batches of transfers + compute queued on device.

        Returns accumulated per-key scalar sums and the batch count."""
        sums: Dict[str, float] = {}
        count = 0
        pending = None
        inflight: deque = deque()

        def drain(limit: int) -> None:
            nonlocal count
            while len(inflight) > limit:
                for key, value in jax.device_get(inflight.popleft()).items():
                    sums[key] = sums.get(key, 0.0) + float(value)
                count += 1

        for host_batch in numpy_prefetch(self._batches(gen),
                                         depth=self._depth):
            dev_batch = shard_batch(host_batch, self.mesh)  # async enqueue
            if pending is not None:
                inflight.append(consume(pending))
                drain(self._depth)
            pending = dev_batch
        if pending is not None:
            inflight.append(consume(pending))
        drain(0)
        return sums, count

    def run_train_epoch(self) -> Dict[str, float]:
        t = self.trainer
        if self._step_optimizer is not t.optimizer:
            self._build_train_step()  # optimizer swapped mid-training

        def consume(batch):
            # STREAM_ECHO: k gradient steps per uploaded batch. Each echo's
            # augmentation/dropout RNG folds in state.step, so the k steps
            # see k different stochastic draws of the same raw rows. One
            # on-device mean keeps the log window at one object per batch.
            imgs, msks = batch
            echo_logs = []
            for _ in range(self._echo):
                t.state, logs = self._train_step(t.state, imgs, msks,
                                                 self._idxs, t.rng)
                echo_logs.append(logs)
            if self._echo == 1:
                return echo_logs[0]
            return jax.tree_util.tree_map(
                lambda *xs: jnp.mean(jnp.stack(xs)), *echo_logs)

        sums, count = self._pipelined(self.train_gen, consume)
        if hasattr(self.train_gen, "on_epoch_end"):
            self.train_gen.on_epoch_end()
        return {k: v / max(count, 1) for k, v in sums.items()}

    def run_eval_epoch(self) -> Dict[str, float]:
        t = self.trainer
        if self._eval_step is None:
            self._eval_step = make_cached_eval_step(
                t.model, t.loss_fn, t.metrics, t.config, t.mesh,
                masks=bool(getattr(self.val_gen, "masks", True)),
                cache_sharded=True)

        def consume(batch):
            imgs, msks = batch
            return self._eval_step(t.state, imgs, msks, self._idxs)

        sums, count = self._pipelined(self.val_gen, consume)
        return {k: v / max(count, 1) for k, v in sums.items()}
