import json
import time

import numpy as np


def bench(tag, make_step, state, batches, iters=20):
    import jax
    step = make_step
    # warmup/compile
    s = state
    for _ in range(3):
        s, logs = step(s, *batches)
    float(np.asarray(jax.device_get(logs["loss"])))
    t0 = time.perf_counter()
    for _ in range(iters):
        s, logs = step(s, *batches)
    float(np.asarray(jax.device_get(logs["loss"])))
    dt = time.perf_counter() - t0
    n = batches[0].shape[0]
    print(json.dumps({"tag": tag, "slices_per_sec": round(iters * n / dt, 1),
                      "ms_per_step": round(1000 * dt / iters, 2)}), flush=True)


def run(batch, prng_impl=None, tag=""):
    import jax
    if prng_impl:
        jax.config.update("jax_default_prng_impl", prng_impl)
    from cmrtpu.parallel.mesh import create_mesh, shard_batch
    from cmrtpu.train.trainer import Trainer

    config = {"DIM": [224, 224], "DEPTH": 4, "FILTERS": 32, "MASK_CLASSES": 2,
              "BATCHSIZE": batch, "MIXED_PRECISION": True,
              "LEARNING_RATE": 1e-4, "SEED": 0}
    mesh = create_mesh()
    trainer = Trainer(config, mesh=mesh)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(batch, 224, 224, 1)).astype(np.float32)
    y = (rng.random(size=(batch, 224, 224, 2)) > 0.98).astype(np.float32)
    db = shard_batch((x, y), mesh)
    bench(tag or f"b{batch}{'-' + prng_impl if prng_impl else ''}",
          lambda s, xx, yy: trainer.train_step(s, xx, yy, trainer.rng),
          trainer.state, db)


if __name__ == "__main__":
    import sys
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode == "b32":
        run(32)
    elif mode == "b64":
        run(64)
    elif mode == "b128":
        run(128)
    elif mode == "rbg64":
        run(64, prng_impl="rbg")
    elif mode == "rbg128":
        run(128, prng_impl="rbg")
    elif mode == "rbg64":
        run(64, prng_impl="rbg")
    elif mode == "nodrop64":
        run_nodrop(64)

def run_nodrop(batch):
    import jax
    from cmrtpu.parallel.mesh import create_mesh, shard_batch
    from cmrtpu.train.trainer import Trainer
    config = {"DIM": [224, 224], "DEPTH": 4, "FILTERS": 32, "MASK_CLASSES": 2,
              "BATCHSIZE": batch, "MIXED_PRECISION": True, "DROPOUT_MIN": 0.0,
              "DROPOUT_MAX": 0.0, "LEARNING_RATE": 1e-4, "SEED": 0}
    mesh = create_mesh()
    trainer = Trainer(config, mesh=mesh)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(batch, 224, 224, 1)).astype(np.float32)
    y = (rng.random(size=(batch, 224, 224, 2)) > 0.98).astype(np.float32)
    db = shard_batch((x, y), mesh)
    bench(f"nodrop{batch}",
          lambda s, xx, yy: trainer.train_step(s, xx, yy, trainer.rng),
          trainer.state, db)
