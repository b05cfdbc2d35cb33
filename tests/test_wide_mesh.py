"""Wider-than-conftest mesh validation: the sharded-cache training loop on a
16-virtual-device mesh, in a subprocess (the suite's own mesh is pinned to 8
devices by conftest).

Guards the n_devices-generic paths the 8-device suite cannot distinguish
from hardcoded-8 behavior: wrap-padding an example count not divisible by
the shard count, per-shard epoch permutations, the eval coverage plan's
remainder twin, and uint8 quantized storage — all at local_batch=2.
"""

import os
import subprocess
import sys

WORKER = r"""
import os
import numpy as np
os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=16 "
                           + os.environ.get("CMRTPU_EXTRA_XLA", ""))
import jax
jax.config.update("jax_platforms", "cpu")
assert jax.device_count() == 16, jax.device_count()

from cmrtpu.train.trainer import Trainer

CFG = {"DIM": [16, 16], "DEPTH": 1, "FILTERS": 2, "MASK_CLASSES": 2,
       "MASK_VALUES": [1, 2], "BATCHSIZE": 32, "MIXED_PRECISION": False,
       "LEARNING_RATE": 1e-3, "SEED": 3, "AUGMENT": True,
       "AUGMENT_PROB": 0.8, "RANDOMROTATE": True,
       "CACHE_SHARDED": True, "CACHE_DTYPE": "uint8", "SCALER": "MinMax"}


class _ArrGen:
    masks = True

    def __init__(self, n, seed):
        rng = np.random.default_rng(seed)
        self._cache_x = rng.normal(size=(n, 16, 16)).astype(np.float32)
        y = np.zeros((n, 16, 16), np.float32)
        y[:, 4:6, 4:6] = 1.0
        y[:, 10:12, 10:12] = 2.0
        self._cache_y = y


trainer = Trainer(CFG)
# 70 examples over 16 shards: wrap-padded to 80 (10 duplicate rows spread
# over shards); val 37 exercises the coverage plan's replicated tail twin
hist = trainer.fit_cached(_ArrGen(70, 0), val_gen=_ArrGen(37, 1), epochs=3)
assert len(hist) == 3
for row in hist:
    assert np.isfinite(row["loss"]), row
    assert "val_loss" in row and np.isfinite(row["val_loss"]), row
assert hist[-1]["loss"] < hist[0]["loss"] * 1.5  # sanity, not convergence
print("wide-mesh ok", flush=True)
"""


def test_sharded_uint8_cache_on_16_device_mesh():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # the worker pins its own 16-device flag
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(__file__))]
        + env.get("PYTHONPATH", "").split(os.pathsep))
    out = subprocess.run([sys.executable, "-c", WORKER], env=env,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "wide-mesh ok" in out.stdout
