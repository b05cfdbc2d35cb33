import json
import sys
import time

import numpy as np


def run(batch, use_upsample=True, tag=""):
    import jax
    jax.config.update("jax_default_prng_impl", "rbg")
    from cmrtpu.parallel.mesh import create_mesh, shard_batch
    from cmrtpu.train.trainer import Trainer

    config = {"DIM": [224, 224], "DEPTH": 4, "FILTERS": 32, "MASK_CLASSES": 2,
              "BATCHSIZE": batch, "MIXED_PRECISION": True,
              "USE_UPSAMPLE": use_upsample,
              "LEARNING_RATE": 1e-4, "SEED": 0}
    mesh = create_mesh()
    trainer = Trainer(config, mesh=mesh)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(batch, 224, 224, 1)).astype(np.float32)
    y = (rng.random(size=(batch, 224, 224, 2)) > 0.98).astype(np.float32)
    db = shard_batch((x, y), mesh)
    s = trainer.state
    for _ in range(3):
        s, logs = trainer.train_step(s, *db, trainer.rng)
    float(np.asarray(jax.device_get(logs["loss"])))
    t0 = time.perf_counter()
    for _ in range(20):
        s, logs = trainer.train_step(s, *db, trainer.rng)
    float(np.asarray(jax.device_get(logs["loss"])))
    dt = time.perf_counter() - t0
    print(json.dumps({"tag": tag, "slices_per_sec": round(20 * batch / dt, 1),
                      "ms": round(dt / 20 * 1000, 2)}), flush=True)


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "transpose128":
        run(128, use_upsample=False, tag="b128-rbg-transpose")
    elif mode == "b192":
        run(192, use_upsample=True, tag="b192-rbg")
    elif mode == "b160":
        run(160, use_upsample=True, tag="b160-rbg")
