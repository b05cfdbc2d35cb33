"""One-off throughput probe of the flagship 2D fused train step under
arbitrary config overrides — the quick-ladder twin of tools/probe3d.py.

Usage:
  python tools/probe2d.py --set GROUP_NORM=16 --set BATCH_NORMALISATION=false
  python tools/probe2d.py --set WEIGHT_STANDARDISATION=true --set LOGIT_SOFTCAP=15.0

Prints one JSON line: {"overrides": ..., "slices_per_sec": ..., "base": ...}
(--base also measures the unmodified flagship step for a same-session
delta — the tunneled chip varies a few % run-to-run, so same-session
comparisons beat cross-run ones).
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=15)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--base", action="store_true",
                    help="also measure the unmodified step this session")
    ap.add_argument("--set", action="append", default=[],
                    metavar="KEY=VALUE")
    args = ap.parse_args()

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cmrtpu import config as C
    from cmrtpu.parallel.mesh import create_mesh
    from cmrtpu.train.device_cache import make_cached_train_step, upload_cache
    from cmrtpu.train.trainer import Trainer

    n_dev = len(jax.devices())
    batch = args.batch * n_dev
    base_cfg = {"DIM": [224, 224], "DEPTH": 4, "FILTERS": 32,
                "MASK_CLASSES": 2, "BATCHSIZE": batch,
                "MIXED_PRECISION": True, "USE_UPSAMPLE": False,
                "MASK_VALUES": [1, 2], "SCALER": "MinMax",
                "AUGMENT": True, "AUGMENT_PROB": 0.8, "RANDOMROTATE": True,
                "SHIFTSCALEROTATE": True, "GRIDDISTORTION": True,
                "LEARNING_RATE": 1e-4, "SEED": 0}
    overrides = C.parse_override_pairs(args.set)
    mesh = create_mesh()
    idx_sharding = NamedSharding(mesh, P("data"))
    rng = np.random.default_rng(0)
    n_cache = max(4 * batch, 512)
    x_cache = rng.normal(size=(n_cache, 224, 224)).astype(np.float32)
    y_cache = np.zeros((n_cache, 224, 224), np.float32)
    y_cache[:, 60:64, 60:64] = 1.0
    y_cache[:, 160:164, 160:164] = 2.0
    dx, dy = upload_cache(x_cache, y_cache, mesh)

    def measure(cfg):
        trainer = Trainer(cfg, mesh=mesh)
        step = make_cached_train_step(trainer.model, trainer.optimizer,
                                      trainer.loss_fn, trainer.metrics,
                                      cfg, mesh, augment=True)
        state = jax.device_put(jax.device_get(trainer.state))

        def one(state):
            idxs = jax.device_put(
                rng.integers(0, n_cache, batch).astype(np.int32),
                idx_sharding)
            return step(state, dx, dy, idxs, trainer.rng)

        for _ in range(args.warmup):
            state, logs = one(state)
        float(np.asarray(jax.device_get(logs["loss"])))
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, logs = one(state)
        float(np.asarray(jax.device_get(logs["loss"])))
        return round(args.steps * batch / (time.perf_counter() - t0), 1)

    row = {"overrides": overrides,
           "slices_per_sec": measure(dict(base_cfg, **overrides))}
    if args.base:
        row["base_slices_per_sec"] = measure(dict(base_cfg))
        row["speedup"] = round(
            row["slices_per_sec"] / row["base_slices_per_sec"], 3)
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
