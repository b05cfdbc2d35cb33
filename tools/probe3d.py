"""Optimization ladder for the cine/3D fused train step (BASELINE config 3).

Round-3 verdict: the 2D step got a full probe discipline (roofline, remat,
pooling, batch sweeps — IMPLEMENTATION_STATUS.md) but the 3D/cine step
shipped at 274 slices/s/chip with none. This tool runs the same ladder for
the 3D step: XLA cost-analysis roofline + a variant sweep through the REAL
fused cached step (gather + broadcast augmentation + heatmap + fwd + bwd +
adam, cmrtpu/train/device_cache.py).

Usage:  python tools/probe3d.py [--steps 10] [--frames 8] [--hw 224]

Prints one JSON line per row so partial runs still report (same lesson as
bench.py); a markdown summary table at the end.
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--hw", type=int, default=224)
    ap.add_argument("--vols", type=int, default=16,
                    help="volumes per chip in the base row")
    ap.add_argument("--peak-tflops", type=float, default=197.0)
    ap.add_argument("--peak-gbps", type=float, default=819.0)
    ap.add_argument("--only", default="",
                    help="comma-separated row names to run (default: all)")
    args = ap.parse_args()

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cmrtpu.parallel.mesh import create_mesh
    from cmrtpu.train.device_cache import make_cached_train_step, upload_cache
    from cmrtpu.train.trainer import Trainer

    n_dev = len(jax.devices())
    mesh = create_mesh()
    idx_sharding = NamedSharding(mesh, P("data"))
    rng = np.random.default_rng(0)
    t, hw = args.frames, args.hw
    a, b = int(hw * 0.27), int(hw * 0.71)

    base_cfg = {"DIM": [t, hw, hw], "F_SIZE": [3, 3, 3], "M_POOL": [1, 2, 2],
                "DEPTH": 4, "FILTERS": 32, "MASK_CLASSES": 2,
                "MASK_VALUES": [1, 2], "MIXED_PRECISION": True,
                "USE_UPSAMPLE": False, "SCALER": "MinMax",
                "AUGMENT": True, "AUGMENT_PROB": 0.8, "RANDOMROTATE": True,
                "SHIFTSCALEROTATE": True, "GRIDDISTORTION": True,
                "LEARNING_RATE": 1e-4, "SEED": 0}

    caches = {}  # n_vols -> (dx, dy, n)

    def get_cache(n_vols):
        if n_vols not in caches:
            n = max(2 * n_vols, 48)
            xv = rng.normal(size=(n, t, hw, hw)).astype(np.float32)
            yv = np.zeros((n, t, hw, hw), np.float32)
            yv[:, :, a:a + 4, a:a + 4] = 1.0
            yv[:, :, b:b + 4, b:b + 4] = 2.0
            caches[n_vols] = (*upload_cache(xv, yv, mesh), n)
        return caches[n_vols]

    results = {}

    def probe(name, overrides, vols=None):
        if args.only and name not in args.only.split(","):
            return
        n_vols = (vols or args.vols) * n_dev
        cfg = dict(base_cfg, BATCHSIZE=n_vols, **overrides)
        row = {"row": name, "vols_per_chip": vols or args.vols}
        try:
            trainer = Trainer(cfg, mesh=mesh)
            dx, dy, n_cache = get_cache(n_vols)
            step = make_cached_train_step(trainer.model, trainer.optimizer,
                                          trainer.loss_fn, trainer.metrics,
                                          cfg, mesh, augment=True)
            state = jax.device_put(jax.device_get(trainer.state))

            def one(state):
                idxs = jax.device_put(
                    rng.integers(0, n_cache, n_vols).astype(np.int32),
                    idx_sharding)
                return step(state, dx, dy, idxs, trainer.rng)

            t0 = time.perf_counter()
            for _ in range(args.warmup):
                state, logs = one(state)
            float(np.asarray(jax.device_get(logs["loss"])))
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(args.steps):
                state, logs = one(state)
            float(np.asarray(jax.device_get(logs["loss"])))
            dt = time.perf_counter() - t0
            row["slices_per_sec"] = round(args.steps * n_vols * t / dt, 1)
            row["step_ms"] = round(1000 * dt / args.steps, 1)
            row["compile_s"] = round(compile_s, 1)
        except Exception as e:  # OOM rows are data, not failures
            row["error"] = f"{type(e).__name__}: {str(e)[:200]}"
        results[name] = row
        print(json.dumps(row), flush=True)

    def roofline(name, overrides, vols=None):
        """XLA cost analysis of the fused step for a variant. Failures are
        rows, not aborts — a variant that fails to compile (round-4 lesson:
        the first 2p1d formulation OOM'd at compile) must not cost the
        ladder's remaining rows."""
        if args.only and name not in args.only.split(","):
            return
        row = {"row": f"roofline:{name}"}
        try:
            n_vols = (vols or args.vols) * n_dev
            cfg = dict(base_cfg, BATCHSIZE=n_vols, **overrides)
            trainer = Trainer(cfg, mesh=mesh)
            dx, dy, n_cache = get_cache(n_vols)
            step = make_cached_train_step(trainer.model, trainer.optimizer,
                                          trainer.loss_fn, trainer.metrics,
                                          cfg, mesh, augment=True)
            idxs = jax.device_put(
                rng.integers(0, n_cache, n_vols).astype(np.int32),
                idx_sharding)
            lowered = jax.jit(step, donate_argnums=(0,)).lower(
                trainer.state, dx, dy, idxs, trainer.rng)
            cost = lowered.compile().cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            flops = cost.get("flops", 0.0)
            bytes_ = cost.get("bytes accessed", 0.0)
            row["tflop_per_step"] = round(flops / 1e12, 2)
            row["gb_per_step"] = round(bytes_ / 1e9, 2)
            meas = results.get(name, {}).get("step_ms")
            if meas:
                step_s = meas / 1000.0
                row["achieved_tflops"] = round(flops / 1e12 / step_s, 1)
                row["achieved_gbps"] = round(bytes_ / 1e9 / step_s, 1)
                row["mxu_util"] = round(
                    flops / 1e12 / step_s / args.peak_tflops, 3)
                row["hbm_util"] = round(
                    bytes_ / 1e9 / step_s / args.peak_gbps, 3)
        except Exception as e:
            row["error"] = f"{type(e).__name__}: {str(e)[:200]}"
        print(json.dumps(row), flush=True)
        results[f"roofline:{name}"] = row

    # --- the ladder -------------------------------------------------------
    probe("base", {})
    roofline("base", {})
    probe("upsample_decoder", {"USE_UPSAMPLE": True})
    probe("remat1", {"REMAT": 1})
    probe("remat2", {"REMAT": 2})
    probe("remat_full", {"REMAT": True})
    probe("bn_bf16", {"BN_BF16": True})
    probe("2p1d", {"MODEL_VARIANT": "unet_2p1d"})
    roofline("2p1d", {"MODEL_VARIANT": "unet_2p1d"})
    probe("2p1d_bn_bf16", {"MODEL_VARIANT": "unet_2p1d", "BN_BF16": True})
    probe("2p1d_remat1", {"MODEL_VARIANT": "unet_2p1d", "REMAT": 1})
    probe("pool_t", {"M_POOL": [2, 2, 2]})  # t-pooling variant (smaller
    # decoder volumes; changes model family — context row only)
    # --- layout ladder (round-5 verdict #5): the cine roofline showed 22%
    # MXU / 52% HBM with NDHWC lane padding inflating traffic ~4x at 32
    # channels (TPU lane dim = 128). Rows that FILL the lane dim:
    # wider-shallower trunks (FILTERS=64/128 with depth rebalanced so
    # capacity stays comparable) and the full z-fold — the
    # SliceDistributed2D wrapper, whose convs are all 2D with t folded into
    # batch (the layout the MXU actually wants). Model-changing rows:
    # quality must be re-qualified before adopting any of them.
    probe("f64_d3", {"FILTERS": 64, "DEPTH": 3})
    roofline("f64_d3", {"FILTERS": 64, "DEPTH": 3})
    probe("f64_d4", {"FILTERS": 64, "DEPTH": 4})
    probe("f128_d2", {"FILTERS": 128, "DEPTH": 2})
    roofline("f128_d2", {"FILTERS": 128, "DEPTH": 2})
    probe("fsize_133", {"F_SIZE": [1, 3, 3]})  # 2D receptive field in the
    # 3D layout: isolates how much of the cost is the temporal kernel taps
    probe("wrapper", {"MODEL_VARIANT": "wrapper"})
    roofline("wrapper", {"MODEL_VARIANT": "wrapper"})
    probe("wrapper_b32", {"MODEL_VARIANT": "wrapper"}, vols=32)
    probe("b8", {}, vols=8)
    probe("b24", {}, vols=24)
    probe("b32", {}, vols=32)
    probe("2p1d_b8", {"MODEL_VARIANT": "unet_2p1d"}, vols=8)
    probe("2p1d_b24", {"MODEL_VARIANT": "unet_2p1d"}, vols=24)
    probe("2p1d_b32", {"MODEL_VARIANT": "unet_2p1d"}, vols=32)

    print("\n| row | slices/s | step ms | note |")
    print("|---|---|---|---|")
    for name, row in results.items():
        if name.startswith("roofline:"):
            continue
        note = row.get("error", "")
        print(f"| {name} | {row.get('slices_per_sec', '-')} | "
              f"{row.get('step_ms', '-')} | {note} |")


if __name__ == "__main__":
    main()
