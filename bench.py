"""End-to-end training throughput benchmark (flagship RVIP config).

Measures SAX slices/sec through the device-cached training loop — the
framework's real hot path: per step ONE fused XLA program does batch gather
from the HBM-resident dataset, the full augmentation chain (rot90 /
shift-scale-rotate / grid-distortion warps), normalisation + target
synthesis, forward, BCE+Dice loss, backward and the optimizer update
(cmrtpu/train/device_cache.py). Prints the record as a JSON line

    {"metric": ..., "value": N, "unit": "slices/sec", "vs_baseline": N}

immediately after the flagship measurement and again after every variant
row — the driver reads the tail and the LAST line wins, so an external
kill at any point still leaves the latest complete ledger on stdout.

Baseline: the driver north star is >5000 slices/sec end-to-end on a v5e-8
(BASELINE.md), i.e. 625 slices/sec/chip; vs_baseline scales that target to
the number of chips actually present.

Measured context (one v5e chip, 224x224, depth-4/32-filter U-Net, batch 128
per chip, transpose-conv decoder): bare train step 1202 slices/s; device-
cached loop incl. augmentation ~1151; naive host-streaming only ~160 with
the packed put-ahead loop reaching ~350 and STREAM_ECHO=4 ~940 trained
slices/s (per-step uploads collapse to 25-60 MB/s on this interconnect —
hence the cache-resident design).
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
    # partial-result ledger the deadline watchdog can flush: the TPU tunnel
    # has been observed to wedge MID-RUN (main thread parked on a futex, the
    # conn-read thread blocked in tcp_recvmsg) — a hang inside one variant
    # must not cost the driver the rows already measured
    partial = {"value": 0.0, "vs_baseline": 0.0,
               "variants_slices_per_sec": {},
               # host-streaming rows swing +-50% run-to-run on the tunneled
               # link (round-4 finding): they are measured median-of-3 with
               # the spread recorded here, plus a raw link-bandwidth row so
               # tunnel variance is attributable to the link, not the code
               "streaming_minmax_slices_per_sec": {},
               "host_link_MBps": None}

    def _emit(error=None):
        """Print the full record as ONE JSON line. Called after the flagship
        measurement and again after EVERY variant row: the driver reads the
        tail and the last line wins, so an external SIGKILL at any point
        still leaves the most recent complete ledger on stdout (round-3
        lesson: a single end-of-run print lost the whole round to rc=124)."""
        record = {
            "metric": "SAX slices/sec (end-to-end device-cached train: "
                      "gather+augment+mask-channels+fwd+bwd+adam, "
                      "224x224 2D U-Net)",
            "value": partial["value"],
            "unit": "slices/sec",
            "vs_baseline": partial["vs_baseline"],
            "variants_slices_per_sec": partial["variants_slices_per_sec"],
            "streaming_minmax_slices_per_sec":
                partial["streaming_minmax_slices_per_sec"],
            "host_link_MBps": partial["host_link_MBps"],
        }
        if error:
            record["error"] = error
        if os.environ.get("CMRTPU_BENCH_SMOKE", "") not in ("", "0"):
            record["smoke"] = True  # structural drive, not a measurement
        print(json.dumps(record), flush=True)

    def _init_watchdog():
        if not init_done.wait(init_timeout):
            _emit("accelerator backend failed to initialize within "
                  f"{init_timeout:.0f}s (TPU tunnel outage?) — no "
                  "measurement was taken; this is an infrastructure "
                  "failure, not a throughput regression")
            os._exit(17)

    threading.Thread(target=_init_watchdog, daemon=True).start()

    deadline_s = float(os.environ.get("CMRTPU_BENCH_DEADLINE_S", "1200"))
    done = threading.Event()

    def _deadline_watchdog():
        if not done.wait(deadline_s):
            _emit(f"benchmark exceeded the {deadline_s:.0f}s deadline "
                  "(mid-run TPU tunnel wedge?) — reporting the rows "
                  "measured so far; missing variants are an infrastructure "
                  "failure, not regressions")
            os._exit(18)

    threading.Thread(target=_deadline_watchdog, daemon=True).start()

    import jax

    from cmrtpu.parallel.mesh import create_mesh
    from cmrtpu.train.device_cache import (make_cached_train_step,
                                           upload_cache)
    from cmrtpu.train.trainer import Trainer

    n_dev = len(jax.devices())
    init_done.set()
    # CMRTPU_BENCH_SMOKE=1: tiny shapes/steps so the full bench structure
    # (every variant row, the partial ledger, both watchdogs) can be driven
    # off-TPU in minutes; numbers are meaningless and the JSON is stamped
    # "smoke" so the record cannot be mistaken for a measurement
    smoke = os.environ.get("CMRTPU_BENCH_SMOKE", "") not in ("", "0")
    hw = 64 if smoke else 224
    batch = (8 if smoke else 128) * n_dev  # measured per-chip sweet spot
    def st(n):  # per-variant timed-step count (tiny in smoke mode)
        return 2 if smoke else n
    config = {"DIM": [hw, hw], "DEPTH": 4, "FILTERS": 32, "MASK_CLASSES": 2,
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
    n_cache = max(4 * batch, 64 if smoke else 512)
    x_cache = rng.normal(size=(n_cache, hw, hw)).astype(np.float32)
    y_cache = np.zeros((n_cache, hw, hw), np.float32)
    a, b = int(hw * 0.27), int(hw * 0.71)  # 60/160 at 224
    y_cache[:, a:a + 4, a:a + 4] = 1.0
    y_cache[:, b:b + 4, b:b + 4] = 2.0
    data_x, data_y = upload_cache(x_cache, y_cache, mesh)

    from jax.sharding import NamedSharding, PartitionSpec as P
    idx_sharding = NamedSharding(mesh, P("data"))

    def measure(cfg_overrides, steps=st(20), warmup=st(3)):
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

    def measure_sharded(steps=st(10), warmup=st(3)):
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

    def measure_streaming(steps=st(20), warmup=st(3), echo=1,
                          dtype="bfloat16"):
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
        from cmrtpu.train.streaming import StreamedLoop
        if dtype == "uint8":
            # per-example affine quantization: 2x fewer image bytes than
            # bf16 on the link-bound path (transparent through the
            # affine-invariant scalers — see quantize_images_uint8)
            from cmrtpu.train.device_cache import quantize_images_uint8
            x_pack = quantize_images_uint8(x_cache)
        else:
            import ml_dtypes
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
        # median-of-3: single-shot streaming rows swung 176-353 slices/s on
        # identical code in round 4 (tunneled-link noise) — one epoch is not
        # a measurement on this path
        rates = []
        for _ in range(3):
            loop.train_gen = _PackedGen(steps)
            t0 = time.perf_counter()
            loop.run_train_epoch()  # run_train_epoch drains all step logs
            rates.append(steps * batch * echo / (time.perf_counter() - t0))
        return (float(np.median(rates)),
                (round(min(rates), 1), round(max(rates), 1)))

    def measure_cine(steps=st(10), warmup=st(3), m_pool=(1, 2, 2),
                     extra=None):
        """slices/sec of the 2D+t cine config (BASELINE config 3): a 3D
        U-Net over temporal SAX stacks (len(DIM)==3, t-preserving pooling
        M_POOL=[1,2,2]) through the same fused cached step — the
        augmentation draw broadcasts across t (ReplayCompose parity).
        Reported in SLICES (volumes x frames) for comparability.

        ``m_pool=[2,2,2]`` is the measured +34% production setting (pool t
        too, decoder restores it — quality-neutral in the cine demo A/B,
        tools/probe3d.py + IMPLEMENTATION_STATUS.md round 4)."""
        t_frames = 4 if smoke else 8
        vol_batch = (2 if smoke else 16) * n_dev  # 16 vols/chip = 128 slices
        cfg = {"DIM": [t_frames, hw, hw], "F_SIZE": [3, 3, 3],
               "M_POOL": list(m_pool), "DEPTH": 4, "FILTERS": 32,
               "MASK_CLASSES": 2, "MASK_VALUES": [1, 2],
               "BATCHSIZE": vol_batch, "MIXED_PRECISION": True,
               "USE_UPSAMPLE": False, "SCALER": "MinMax",
               "AUGMENT": True, "AUGMENT_PROB": 0.8, "RANDOMROTATE": True,
               "SHIFTSCALEROTATE": True, "GRIDDISTORTION": True,
               "LEARNING_RATE": 1e-4, "SEED": 0}
        cfg.update(extra or {})
        cine_trainer = Trainer(cfg, mesh=mesh)
        n_vols = max(2 * vol_batch, 64)
        xv = rng.normal(size=(n_vols, t_frames, hw, hw)).astype(np.float32)
        yv = np.zeros((n_vols, t_frames, hw, hw), np.float32)
        yv[:, :, a:a + 4, a:a + 4] = 1.0
        yv[:, :, b:b + 4, b:b + 4] = 2.0
        dx, dy = upload_cache(xv, yv, mesh)
        step = make_cached_train_step(cine_trainer.model,
                                      cine_trainer.optimizer,
                                      cine_trainer.loss_fn,
                                      cine_trainer.metrics,
                                      cfg, mesh, augment=True)
        state = jax.device_put(jax.device_get(cine_trainer.state))

        def one(state):
            idxs = jax.device_put(
                rng.integers(0, n_vols, vol_batch).astype(np.int32),
                idx_sharding)
            return step(state, dx, dy, idxs, cine_trainer.rng)

        for _ in range(warmup):
            state, logs = one(state)
        float(np.asarray(jax.device_get(logs["loss"])))
        t0 = time.perf_counter()
        for _ in range(steps):
            state, logs = one(state)
        float(np.asarray(jax.device_get(logs["loss"])))
        return steps * vol_batch * t_frames / (time.perf_counter() - t0)

    def measure_serving(steps=st(20), warmup=st(3)):
        """slices/sec of the serving path: the jitted inference forward
        (train=False, BN in inference mode) on a device-resident batch —
        what a deployed predictor sustains per chip (the export artifact
        runs the same program, cmrtpu/predict/export.py)."""
        serve_batch = (16 if smoke else 256) * n_dev  # serving sweet spot
        x = jax.device_put(
            rng.normal(size=(serve_batch, hw, hw, 1)).astype(np.float32),
            NamedSharding(mesh, P("data")))
        variables = {"params": trainer.state.params,
                     "batch_stats": trainer.state.batch_stats}
        # sync on a scalar probe, not the whole output — pulling the full
        # prediction tensor through the tunneled link (~50 MB/s) would
        # dominate the measurement
        fwd = jax.jit(lambda v, x: trainer.model.apply(v, x, train=False))
        for _ in range(warmup):
            preds = fwd(variables, x)
        float(jax.device_get(preds[0, 0, 0, 0]))
        t0 = time.perf_counter()
        for _ in range(steps):
            preds = fwd(variables, x)
        float(jax.device_get(preds[0, 0, 0, 0]))
        return steps * serve_batch / (time.perf_counter() - t0)

    def measure_serving_int8(steps=st(20), warmup=st(3)):
        """slices/sec of the int8 post-training-quantized serving twin
        (cmrtpu/predict/quantize.py): per-channel int8 conv kernels +
        calibrated per-tensor activation scales, int32 MXU accumulation.
        Measured 1.13x the bf16 forward on one v5e chip (7169 vs 6323
        slices/s) with 4x smaller weights."""
        from cmrtpu.models.hybrids import get_model
        from cmrtpu.predict.quantize import quantize_model
        serve_batch = (16 if smoke else 256) * n_dev
        x_np = rng.normal(size=(serve_batch, hw, hw, 1)).astype(np.float32)
        x = jax.device_put(x_np, NamedSharding(mesh, P("data")))
        qcfg, qvars = quantize_model(
            config, {"params": trainer.state.params,
                     "batch_stats": trainer.state.batch_stats},
            [x_np[:16]])
        qmodel = get_model(qcfg)
        qvars = jax.device_put(qvars)
        fwd = jax.jit(lambda v, xx: qmodel.apply(v, xx, train=False))
        for _ in range(warmup):
            preds = fwd(qvars, x)
        float(jax.device_get(preds[0, 0, 0, 0]))
        t0 = time.perf_counter()
        for _ in range(steps):
            preds = fwd(qvars, x)
        float(jax.device_get(preds[0, 0, 0, 0]))
        return steps * serve_batch / (time.perf_counter() - t0)

    def measure_serving_tta(steps=st(10), warmup=st(3)):
        """slices/sec of the rot90-TTA serving forward (cmrtpu/predict/
        tta.py): four rotations + inverse-rotate + average in ONE jitted
        program — the measured ~5x volume-CoM quality lever costs ~4x
        forward FLOPs; this row tracks what a TTA deployment sustains."""
        from cmrtpu.predict.tta import tta_rot90_forward
        serve_batch = (16 if smoke else 128) * n_dev
        x = jax.device_put(
            rng.normal(size=(serve_batch, hw, hw, 1)).astype(np.float32),
            NamedSharding(mesh, P("data")))
        variables = {"params": trainer.state.params,
                     "batch_stats": trainer.state.batch_stats}
        fwd = jax.jit(tta_rot90_forward(
            lambda v, xx: trainer.model.apply(v, xx, train=False),
            (hw, hw)))
        for _ in range(warmup):
            preds = fwd(variables, x)
        float(jax.device_get(preds[0, 0, 0, 0]))
        t0 = time.perf_counter()
        for _ in range(steps):
            preds = fwd(variables, x)
        float(jax.device_get(preds[0, 0, 0, 0]))
        return steps * serve_batch / (time.perf_counter() - t0)

    def measure_serving_ensemble(members=4, steps=st(10), warmup=st(3)):
        """slices/sec of the CV-ensemble serving path (BASELINE config 5):
        K fold checkpoints stacked on a leading member axis, ONE vmapped
        forward computing the average member probability per batch
        (cmrtpu/predict/ensemble.py — what `cmrtpu.cli.serve -ensemble`
        deploys)."""
        import jax.numpy as jnp
        serve_batch = (8 if smoke else 128) * n_dev
        x = jax.device_put(
            rng.normal(size=(serve_batch, hw, hw, 1)).astype(np.float32),
            NamedSharding(mesh, P("data")))
        stack = jax.tree_util.tree_map(
            lambda a: jnp.stack([a] * members),
            {"params": trainer.state.params,
             "batch_stats": trainer.state.batch_stats})

        def member_forward(variables, xx):
            return trainer.model.apply(variables, xx, train=False)

        fwd = jax.jit(lambda v, xx: jax.tree_util.tree_map(
            lambda a: jnp.mean(a, axis=0),
            jax.vmap(member_forward, in_axes=(0, None))(v, xx)))
        for _ in range(warmup):
            preds = fwd(stack, x)
        float(jax.device_get(preds[0, 0, 0, 0]))
        t0 = time.perf_counter()
        for _ in range(steps):
            preds = fwd(stack, x)
        float(jax.device_get(preds[0, 0, 0, 0]))
        return steps * serve_batch / (time.perf_counter() - t0)

    baseline = 5000.0 * n_dev / 8.0  # v5e-8 north star scaled to chip count
    t_start = time.perf_counter()
    # reserve headroom before the internal deadline: a variant started after
    # this point risks being half-measured when the watchdog fires
    soft_budget_s = max(60.0, deadline_s - 180.0)

    # flagship: the published Base experiment (augment, no smoothing).
    # Headline ships IMMEDIATELY — every later row only improves the record.
    slices_per_sec = measure({})
    partial["value"] = round(slices_per_sec, 1)
    partial["vs_baseline"] = round(slices_per_sec / baseline, 3)
    _emit()

    def safe(name, fn, *a, **kw):
        """A broken variant measurement must not cost the driver the
        headline metric — record the error string instead. The full record
        is re-emitted after every row (last line wins), so an external kill
        mid-variant still reports everything measured before it. Variants
        started after the soft budget are skipped with a reason — better an
        honest skip than a row the deadline watchdog truncates."""
        elapsed = time.perf_counter() - t_start
        if elapsed > soft_budget_s:
            partial["variants_slices_per_sec"][name] = (
                f"skipped: {elapsed:.0f}s elapsed exceeds the "
                f"{soft_budget_s:.0f}s variant budget "
                f"(deadline {deadline_s:.0f}s)")
            _emit()
            return
        try:
            result = fn(*a, **kw)
            if isinstance(result, tuple):  # (median, (min, max)) spread rows
                result, spread = result
                partial["streaming_minmax_slices_per_sec"][name] = list(spread)
            result = round(result, 1)
        except Exception as e:  # pragma: no cover - hardware-path failures
            result = f"error: {type(e).__name__}: {e}"
        partial["variants_slices_per_sec"][name] = result
        _emit()

    # published variants riding the same fused step: Var.1 (hist-matching,
    # ref: Generators.py:350-358), Var.2/Var.3 (Gaussian sigma=2/4 GT
    # heatmaps, ref: Generators.py:385-391)
    safe("hist_matching (Var.1)", measure, {"HIST_MATCHING": True},
         steps=st(10))
    safe("gaus_sigma2 (Var.2)", measure, {"GAUS": True, "SIGMA": 2},
         steps=st(10))
    safe("gaus_sigma4 (Var.3)", measure, {"GAUS": True, "SIGMA": 4},
         steps=st(10))
    safe("cache_sharded", measure_sharded)
    # serving: jitted inference forward per chip (deployment rate) — high
    # importance, measured before the long tail of experimental arms
    safe("serving_forward", measure_serving)

    def measure_gn(steps=st(10), warmup=st(3)):
        """slices/sec of the GROUP_NORM=16 arm — the measured best quality
        lever (halves landmark error vs the BN matched control at equal
        cost; seed-robust at 300 epochs, RESULTS.md round 5) and the
        full_cv_demo default since round 5. Needs its own Trainer:
        GroupNorm changes the MODEL, so a config override through the
        shared `measure` closure would silently keep BatchNorm."""
        cfg = dict(trainer.config, GROUP_NORM=16)
        gn_trainer = Trainer(cfg, mesh=mesh)
        step = make_cached_train_step(gn_trainer.model, gn_trainer.optimizer,
                                      gn_trainer.loss_fn, gn_trainer.metrics,
                                      cfg, mesh, augment=True)
        state = jax.device_put(jax.device_get(gn_trainer.state))

        def one(state):
            idxs = jax.device_put(
                rng.integers(0, n_cache, batch).astype(np.int32), idx_sharding)
            return step(state, data_x, data_y, idxs, gn_trainer.rng)

        for _ in range(warmup):
            state, logs = one(state)
        float(np.asarray(jax.device_get(logs["loss"])))
        t0 = time.perf_counter()
        for _ in range(steps):
            state, logs = one(state)
        float(np.asarray(jax.device_get(logs["loss"])))
        return steps * batch / (time.perf_counter() - t0)

    def measure_host_link(size_mb=64, reps=5):
        """Raw host->device bandwidth (MB/s): median timed device_put of a
        fixed buffer. Pure link probe, no compute — when the streaming rows
        move but this row moves with them, the cause is tunnel weather, not
        a code regression."""
        buf = np.empty((size_mb * 1024 * 1024 // 4,), np.float32)
        buf[:] = 1.0
        sharding = NamedSharding(mesh, P())
        jax.device_get(jax.device_put(buf[:1024], sharding))  # warm path
        rates = []
        for _ in range(reps):
            t0 = time.perf_counter()
            arr = jax.device_put(buf, sharding)
            arr.block_until_ready()
            float(jax.device_get(arr[0]))  # tunnel-reliable sync
            rates.append(size_mb / (time.perf_counter() - t0))
        return float(np.median(rates))

    # GROUP_NORM=16: the round-4/5 quality winner, regression-tracked
    safe("group_norm16", measure_gn)
    # BASELINE config 3: 2D+t cine volume batching through a 3D U-Net
    # (t-preserving pooling), slices = volumes x frames
    safe("cine_2dt (config 3)", measure_cine)
    # the pool-t setting (now with per-level clamping: t=8 at DEPTH=4 pools
    # 8->4->2->1->1, the deepest level t-preserving — the r4 number included
    # a silently zero-size bottleneck, see models/unet.py effective_pools)
    safe("cine_2dt_poolt", measure_cine, m_pool=(2, 2, 2))
    # SliceDistributed2D hybrid (MODEL_VARIANT='wrapper'): folds t into the
    # batch and rides the 2D step — the architecture alternative for cine
    # (ref: create_3d_wrapper_for_2d_unet, src/models/Unets.py:347-404)
    safe("cine_hybrid_wrapper", measure_cine,
         extra={"MODEL_VARIANT": "wrapper"})
    # (the ws_normfree row was dropped in round 5: WEIGHT_STANDARDISATION is
    # a CLOSED dead-end — collapses at flagship scale — and now requires an
    # explicit WS_I_UNDERSTAND ack; tracking its throughput in the ledger
    # implied a live production option)
    # int8 PTQ serving twin (cmrtpu.cli.export --int8)
    safe("serving_forward_int8", measure_serving_int8)
    # rot90-TTA serving forward (TTA: true — the measured quality lever)
    safe("serving_forward_tta", measure_serving_tta)
    # BASELINE config 5: 4-member vmapped CV-ensemble serving
    safe("serving_ensemble4", measure_serving_ensemble)
    # raw link probe first: attributes any streaming-row movement
    try:
        partial["host_link_MBps"] = round(
            measure_host_link(8 if smoke else 64), 1)
    except Exception as e:  # pragma: no cover
        partial["host_link_MBps"] = f"error: {type(e).__name__}: {e}"
    _emit()
    safe("host_streaming_packed", measure_streaming)
    # STREAM_DTYPE='uint8': quantized images halve the link bytes again
    safe("host_streaming_uint8", measure_streaming, steps=st(10),
         dtype="uint8")
    # STREAM_ECHO=4: data echoing fills the link-bound path's bubble with
    # extra gradient steps (fresh augmentation per echo) — trained
    # slices/s, not uploaded slices/s
    safe("host_streaming_echo4", measure_streaming, steps=st(10), echo=4)

    done.set()
    _emit()


if __name__ == "__main__":
    main()
