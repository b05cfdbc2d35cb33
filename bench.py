"""End-to-end training throughput benchmark (flagship RVIP config).

Measures SAX slices/sec through the full pjit train step — device-side
preprocessing included once the fused pipeline lands — on whatever devices
are available, and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "slices/sec", "vs_baseline": N}

Baseline: the driver north star is >5000 slices/sec end-to-end on a v5e-8
(BASELINE.md), i.e. 625 slices/sec/chip; vs_baseline scales that target to
the number of chips actually present.
"""

import json
import time

import numpy as np


def main():
    import jax

    from cmrtpu.parallel.mesh import create_mesh, shard_batch
    from cmrtpu.train.trainer import Trainer

    n_dev = len(jax.devices())
    # per-chip batch 128 is the measured throughput sweet spot on v5e
    # (b32: 352, b64: 415, b128+rbg: 996, b256+rbg: 953 slices/s/chip).
    # USE_UPSAMPLE=False selects the transpose-conv decoder — one of the
    # reference's two decoder variants (ref: src/models/KerasLayers.py:
    # 551-649 up_sample switch) — which does ~4x fewer decoder FLOPs than
    # upsample+conv: 996 -> 1201 slices/s/chip measured.
    batch = 128 * n_dev
    config = {"DIM": [224, 224], "DEPTH": 4, "FILTERS": 32, "MASK_CLASSES": 2,
              "BATCHSIZE": batch, "MIXED_PRECISION": True,
              "USE_UPSAMPLE": False,
              "LEARNING_RATE": 1e-4, "SEED": 0}
    mesh = create_mesh()
    trainer = Trainer(config, mesh=mesh)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(batch, 224, 224, 1)).astype(np.float32)
    y = (rng.random(size=(batch, 224, 224, 2)) > 0.98).astype(np.float32)
    device_batch = shard_batch((x, y), mesh)

    # warmup / compile. NOTE: sync via device->host transfer of the loss —
    # block_until_ready does not reliably block on tunneled platforms.
    for _ in range(3):
        trainer.state, logs = trainer.train_step(trainer.state, *device_batch,
                                                 trainer.rng)
    float(np.asarray(jax.device_get(logs["loss"])))

    steps = 20
    t0 = time.perf_counter()
    for _ in range(steps):
        trainer.state, logs = trainer.train_step(trainer.state, *device_batch,
                                                 trainer.rng)
    float(np.asarray(jax.device_get(logs["loss"])))
    elapsed = time.perf_counter() - t0

    slices_per_sec = steps * batch / elapsed
    baseline = 5000.0 * n_dev / 8.0  # v5e-8 north star scaled to chip count
    print(json.dumps({
        "metric": "SAX slices/sec (end-to-end train step, 224x224 2D U-Net)",
        "value": round(slices_per_sec, 1),
        "unit": "slices/sec",
        "vs_baseline": round(slices_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
