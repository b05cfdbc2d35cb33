"""End-to-end training throughput benchmark (flagship RVIP config).

Measures SAX slices/sec through the device-cached training loop — the
framework's real hot path: per step ONE fused XLA program does batch gather
from the HBM-resident dataset, the full augmentation chain (rot90 /
shift-scale-rotate / grid-distortion warps), normalisation + target
synthesis, forward, BCE+Dice loss, backward and the optimizer update
(cmrtpu/train/device_cache.py). Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "slices/sec", "vs_baseline": N}

Baseline: the driver north star is >5000 slices/sec end-to-end on a v5e-8
(BASELINE.md), i.e. 625 slices/sec/chip; vs_baseline scales that target to
the number of chips actually present.

Measured context (one v5e chip, 224x224, depth-4/32-filter U-Net, batch 128
per chip, transpose-conv decoder): bare train step 1202 slices/s; device-
cached loop incl. augmentation ~1090; host-streaming pipeline only ~160
(per-step uploads collapse to 25-50 MB/s on this interconnect — hence the
cache-resident design).
"""

import json
import time

import numpy as np


def main():
    import os
    import threading

    # Backend-init watchdog: a dead TPU tunnel hangs jax.devices() forever
    # (observed: axon backend UNAVAILABLE, enumeration never returns). The
    # driver's bench artifact is better served by an explicit error record
    # than an eternal hang — if the backend is not up within the timeout,
    # emit the JSON line with value 0 and an error field, then exit.
    init_done = threading.Event()
    init_timeout = float(os.environ.get("CMRTPU_BENCH_INIT_TIMEOUT_S", "900"))

    def _watchdog():
        if not init_done.wait(init_timeout):
            print(json.dumps({
                "metric": "SAX slices/sec (end-to-end device-cached train: "
                          "gather+augment+mask-channels+fwd+bwd+adam, "
                          "224x224 2D U-Net)",
                "value": 0.0,
                "unit": "slices/sec",
                "vs_baseline": 0.0,
                "error": "accelerator backend failed to initialize within "
                         f"{init_timeout:.0f}s (TPU tunnel outage?) — no "
                         "measurement was taken; this is an infrastructure "
                         "failure, not a throughput regression",
            }), flush=True)
            os._exit(17)

    threading.Thread(target=_watchdog, daemon=True).start()

    import jax

    from cmrtpu.parallel.mesh import create_mesh
    from cmrtpu.train.device_cache import (make_cached_train_step,
                                           upload_cache)
    from cmrtpu.train.trainer import Trainer

    n_dev = len(jax.devices())
    init_done.set()
    batch = 128 * n_dev  # measured per-chip sweet spot (b32:352 .. b128:1202)
    config = {"DIM": [224, 224], "DEPTH": 4, "FILTERS": 32, "MASK_CLASSES": 2,
              "BATCHSIZE": batch, "MIXED_PRECISION": True,
              "USE_UPSAMPLE": False,  # transpose-conv decoder variant
              "MASK_VALUES": [1, 2], "SCALER": "MinMax",
              "AUGMENT": True, "AUGMENT_PROB": 0.8, "RANDOMROTATE": True,
              "SHIFTSCALEROTATE": True, "GRIDDISTORTION": True,
              "LEARNING_RATE": 1e-4, "SEED": 0}
    mesh = create_mesh()
    trainer = Trainer(config, mesh=mesh)

    # synthetic deterministic-preprocessed cache, resident in HBM
    rng = np.random.default_rng(0)
    n_cache = max(4 * batch, 512)
    x_cache = rng.normal(size=(n_cache, 224, 224)).astype(np.float32)
    y_cache = np.zeros((n_cache, 224, 224), np.float32)
    y_cache[:, 60:64, 60:64] = 1.0
    y_cache[:, 160:164, 160:164] = 2.0
    data_x, data_y = upload_cache(x_cache, y_cache, mesh)

    from jax.sharding import NamedSharding, PartitionSpec as P
    idx_sharding = NamedSharding(mesh, P("data"))

    def measure(cfg_overrides, steps=20, warmup=3):
        """slices/sec of the fused cached step under a config variant."""
        cfg = dict(trainer.config, **cfg_overrides)
        step = make_cached_train_step(trainer.model, trainer.optimizer,
                                      trainer.loss_fn, trainer.metrics,
                                      cfg, mesh, augment=True)

        def one_step(state):
            idxs = jax.device_put(
                rng.integers(0, n_cache, batch).astype(np.int32), idx_sharding)
            return step(state, data_x, data_y, idxs, trainer.rng)

        # warmup / compile. NOTE: sync via device->host transfer of the loss —
        # block_until_ready does not reliably block on tunneled platforms.
        # fresh state copy per variant: the fused step donates its state
        # argument, so reusing trainer.state across variants would hit
        # deleted buffers
        state = jax.device_put(jax.device_get(trainer.state))
        for _ in range(warmup):
            state, logs = one_step(state)
        float(np.asarray(jax.device_get(logs["loss"])))
        t0 = time.perf_counter()
        for _ in range(steps):
            state, logs = one_step(state)
        float(np.asarray(jax.device_get(logs["loss"])))
        return steps * batch / (time.perf_counter() - t0)

    def measure_sharded(steps=10, warmup=3):
        """slices/sec of the CACHE_SHARDED fused step (example-sharded HBM
        cache, shard-local gather). On one chip this is the same math with
        shard_map plumbing; on a pod it is the capacity-scaling path."""
        from cmrtpu.train.device_cache import (make_cached_train_step,
                                               upload_cache_sharded)
        cfg = dict(trainer.config, CACHE_SHARDED=True)
        dx, dy, n_padded = upload_cache_sharded(x_cache, y_cache, mesh,
                                                config=cfg)
        local_n = n_padded // n_dev
        local_b = batch // n_dev
        step = make_cached_train_step(trainer.model, trainer.optimizer,
                                      trainer.loss_fn, trainer.metrics,
                                      cfg, mesh, augment=True,
                                      cache_sharded=True)
        state = jax.device_put(jax.device_get(trainer.state))
        def one(state):
            local = rng.integers(0, local_n, (n_dev, local_b)).astype(np.int32)
            idxs = jax.device_put(local.reshape(-1), idx_sharding)
            return step(state, dx, dy, idxs, trainer.rng)
        for _ in range(warmup):
            state, logs = one(state)
        float(np.asarray(jax.device_get(logs["loss"])))
        t0 = time.perf_counter()
        for _ in range(steps):
            state, logs = one(state)
        float(np.asarray(jax.device_get(logs["loss"])))
        return steps * batch / (time.perf_counter() - t0)

    def measure_streaming(steps=20, warmup=3, echo=1):
        """slices/sec of the PACKED host-streaming path, measured through
        the REAL production loop (cmrtpu/train/streaming.py StreamedLoop):
        bf16/uint8 batches from a numpy-only producer thread, device
        placement put-ahead on the main thread, stochastic stage fused into
        the train step, bounded in-flight log window. This is the fallback
        for datasets beyond the sharded HBM cache — tracked so regressions
        on the host link are visible to the driver.

        ``echo`` (STREAM_ECHO): k fused train steps per uploaded batch, each
        with a fresh augmentation draw — fills the link-bound bubble with
        gradient work, so reported slices/s counts steps*batch*echo trained
        slices."""
        import ml_dtypes
        from cmrtpu.train.streaming import StreamedLoop
        x_pack = np.ascontiguousarray(x_cache.astype(ml_dtypes.bfloat16))
        y_pack = np.ascontiguousarray(y_cache.astype(np.uint8))

        class _PackedGen:
            """Minimal generator contract StreamedLoop consumes: len() +
            raw_batch() yielding packed (bf16, uint8) pairs."""
            masks = True

            def __init__(self, n_batches):
                self.n_batches = n_batches
                self.host_rng = np.random.default_rng(7)

            def __len__(self):
                return self.n_batches

            def raw_batch(self, _):
                sel = self.host_rng.integers(0, n_cache, batch)
                return x_pack[sel], y_pack[sel]

        stream_trainer = Trainer(dict(trainer.config, STREAM_ECHO=echo),
                                 mesh=mesh)
        loop = StreamedLoop(stream_trainer, _PackedGen(warmup))
        logs = loop.run_train_epoch()  # compile epoch
        assert np.isfinite(logs["loss"])
        # one full-length untimed epoch: the first post-compile epoch still
        # pays one-off host costs (packed-array page faults, transfer-stream
        # establishment) — measured ~120 vs ~320 slices/s steady state
        loop.train_gen = _PackedGen(steps)
        loop.run_train_epoch()
        loop.train_gen = _PackedGen(steps)
        t0 = time.perf_counter()
        loop.run_train_epoch()  # run_train_epoch drains all step logs
        return steps * batch * echo / (time.perf_counter() - t0)

    # flagship: the published Base experiment (augment, no smoothing)
    slices_per_sec = measure({})

    def safe(fn, *a, **kw):
        """A broken variant measurement must not cost the driver the
        headline metric — record the error string instead."""
        try:
            return round(fn(*a, **kw), 1)
        except Exception as e:  # pragma: no cover - hardware-path failures
            return f"error: {type(e).__name__}: {e}"

    # published variants riding the same fused step: Var.1 (hist-matching,
    # ref: Generators.py:350-358), Var.2/Var.3 (Gaussian sigma=2/4 GT
    # heatmaps, ref: Generators.py:385-391)
    variants = {
        "hist_matching (Var.1)": safe(measure, {"HIST_MATCHING": True},
                                      steps=10),
        "gaus_sigma2 (Var.2)": safe(measure, {"GAUS": True, "SIGMA": 2},
                                    steps=10),
        "gaus_sigma4 (Var.3)": safe(measure, {"GAUS": True, "SIGMA": 4},
                                    steps=10),
        "cache_sharded": safe(measure_sharded),
        "host_streaming_packed": safe(measure_streaming),
        # STREAM_ECHO=4: data echoing fills the link-bound path's bubble with
        # extra gradient steps (fresh augmentation per echo) — trained
        # slices/s, not uploaded slices/s
        "host_streaming_echo4": safe(measure_streaming, steps=10, echo=4),
    }

    baseline = 5000.0 * n_dev / 8.0  # v5e-8 north star scaled to chip count
    print(json.dumps({
        "metric": "SAX slices/sec (end-to-end device-cached train: gather+"
                  "augment+mask-channels+fwd+bwd+adam, 224x224 2D U-Net)",
        "value": round(slices_per_sec, 1),
        "unit": "slices/sec",
        "vs_baseline": round(slices_per_sec / baseline, 3),
        "variants_slices_per_sec": variants,
    }))


if __name__ == "__main__":
    main()
