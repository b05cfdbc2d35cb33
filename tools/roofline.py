"""Roofline check for the fused device-cached train step.

Compiles the flagship step, reads XLA's cost analysis (FLOPs + bytes
accessed), measures the steady-state step time on the attached device, and
prints utilization against the hardware's peaks — the "how far from
speed-of-light" number that guides kernel work (SURVEY.md §7: perf is
first-class; the equivalent measurement does not exist in the reference,
which publishes no throughput numbers at all).

Usage:  python tools/roofline.py [--batch 128] [--steps 20]

Peaks default to TPU v5e (197 TFLOP/s bf16, 819 GB/s HBM); override with
--peak-tflops / --peak-gbps for other chips.
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--peak-tflops", type=float, default=197.0,
                    help="bf16 peak, TFLOP/s per chip (v5e default)")
    ap.add_argument("--peak-gbps", type=float, default=819.0,
                    help="HBM bandwidth peak, GB/s per chip (v5e default)")
    ap.add_argument("--ws", action="store_true",
                    help="roofline the WEIGHT_STANDARDISATION arm "
                         "(normalization-free scaled-WS convs)")
    args = ap.parse_args()

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cmrtpu.parallel.mesh import create_mesh
    from cmrtpu.train.device_cache import make_cached_train_step, upload_cache
    from cmrtpu.train.trainer import Trainer

    n_dev = len(jax.devices())
    batch = args.batch * n_dev
    config = {"DIM": [224, 224], "DEPTH": 4, "FILTERS": 32, "MASK_CLASSES": 2,
              "BATCHSIZE": batch, "MIXED_PRECISION": True,
              "USE_UPSAMPLE": False, "MASK_VALUES": [1, 2], "SCALER": "MinMax",
              "AUGMENT": True, "AUGMENT_PROB": 0.8, "RANDOMROTATE": True,
              "SHIFTSCALEROTATE": True, "GRIDDISTORTION": True,
              "LEARNING_RATE": 1e-4, "SEED": 0,
              "WEIGHT_STANDARDISATION": args.ws, "WS_I_UNDERSTAND": args.ws,
              "BATCH_NORMALISATION": not args.ws}
    mesh = create_mesh()
    trainer = Trainer(config, mesh=mesh)

    rng = np.random.default_rng(0)
    n_cache = max(4 * batch, 512)
    x_cache = rng.normal(size=(n_cache, 224, 224)).astype(np.float32)
    y_cache = np.zeros((n_cache, 224, 224), np.float32)
    y_cache[:, 60:64, 60:64] = 1.0
    y_cache[:, 160:164, 160:164] = 2.0
    data_x, data_y = upload_cache(x_cache, y_cache, mesh, config=config)
    idx_sharding = NamedSharding(mesh, P("data"))

    step = make_cached_train_step(trainer.model, trainer.optimizer,
                                  trainer.loss_fn, trainer.metrics,
                                  trainer.config, mesh, augment=True)
    idxs = jax.device_put(rng.integers(0, n_cache, batch).astype(np.int32),
                          idx_sharding)

    lowered = step.lower(trainer.state, data_x, data_y, idxs, trainer.rng)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", 0.0))
    bytes_accessed = float(cost.get("bytes accessed", 0.0))

    # measured steady-state step time (donated state -> fresh copy)
    state = jax.device_put(jax.device_get(trainer.state))
    for _ in range(3):
        state, logs = step(state, data_x, data_y, idxs, trainer.rng)
    float(np.asarray(jax.device_get(logs["loss"])))
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, logs = step(state, data_x, data_y, idxs, trainer.rng)
    float(np.asarray(jax.device_get(logs["loss"])))
    dt = (time.perf_counter() - t0) / args.steps

    tflops_s = flops / dt / 1e12 / n_dev
    gbps = bytes_accessed / dt / 1e9 / n_dev
    print(f"devices: {n_dev}  global batch: {batch}")
    print(f"step time: {dt*1e3:.1f} ms   throughput: {batch/dt:.0f} slices/s")
    print(f"XLA cost analysis: {flops/1e9:.1f} GFLOP, "
          f"{bytes_accessed/1e9:.2f} GB accessed per step")
    print(f"achieved: {tflops_s:.1f} TFLOP/s/chip "
          f"({100*tflops_s/args.peak_tflops:.0f}% of {args.peak_tflops:.0f} peak)   "
          f"{gbps:.0f} GB/s/chip "
          f"({100*gbps/args.peak_gbps:.0f}% of {args.peak_gbps:.0f} peak)")
    bound = "HBM-bandwidth" if gbps / args.peak_gbps > tflops_s / args.peak_tflops \
        else "compute (MXU)"
    print(f"dominant bound: {bound}")


if __name__ == "__main__":
    main()
