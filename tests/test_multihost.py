"""Multi-host bootstrap smoke test: a real 2-process jax.distributed CPU
rendezvous through ``initialize_distributed`` (cmrtpu/parallel/mesh.py), with
a cross-process collective to prove the Gloo backend actually connects.

This is the capability the reference lacks entirely (SURVEY.md §2.2 elastic
row: no multi-node bootstrap code); single-host remains a no-op
(tests/test_trainer.py covers that branch).
"""

import os
import socket
import subprocess
import sys

import numpy as np

WORKER = r"""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
from cmrtpu.parallel.mesh import initialize_distributed
ok = initialize_distributed()
assert ok, "initialize_distributed returned False despite coordinator env"
import jax.numpy as jnp
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2, jax.device_count()
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
mesh = Mesh(jax.devices(), ("data",))
local = jnp.array([float(jax.process_index() + 1)])
arr = jax.make_array_from_single_device_arrays(
    (2,), NamedSharding(mesh, P("data")),
    [jax.device_put(local, jax.local_devices()[0])])
total = jax.jit(lambda a: jnp.sum(a),
                out_shardings=NamedSharding(mesh, P()))(arr)
assert float(total) == 3.0, float(total)  # psum of 1 + 2 across processes
print("proc %d ok" % jax.process_index(), flush=True)
"""


CACHE_WORKER = r"""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from cmrtpu.parallel.mesh import initialize_distributed
assert initialize_distributed()
assert jax.process_count() == 2 and jax.device_count() == 4, (
    jax.process_count(), jax.device_count())
from cmrtpu.parallel.mesh import create_mesh
from cmrtpu.train.device_cache import DeviceCachedLoop, _owned_data_blocks
from cmrtpu.train.trainer import Trainer

cfg = {"DIM": [16, 16], "BATCHSIZE": 4, "MASK_VALUES": [1, 2],
       "MASK_CLASSES": 2, "DEPTH": 1, "FILTERS": 2, "SEED": 0,
       "LEARNING_RATE": 1e-3, "MIXED_PRECISION": False, "AUGMENT": False,
       "CACHE_SHARDED": True}  # CACHE_PER_HOST auto-on: process_count > 1

rng = np.random.default_rng(0)  # same data on every process, loaded lazily
def make(n):
    x = rng.normal(size=(n, 16, 16)).astype(np.float32)
    y = np.zeros((n, 16, 16), np.float32)
    y[:, 4:7, 5:8] = 1.0
    y[:, 10:13, 9:12] = 2.0
    return x, y

class LazyGen:
    masks = True
    def __init__(self, n):
        self._x, self._y = make(n)
        self.images = list(range(n))
        self._cache_x = self._cache_y = None
        self.requested = []
    def fixed_rows(self, ids):
        ids = np.asarray(ids, int)
        self.requested.append(ids)
        return self._x[ids], self._y[ids]

train, val = LazyGen(10), LazyGen(6)
mesh = create_mesh(cfg)
trainer = Trainer(cfg, mesh=mesh)
loop = DeviceCachedLoop(trainer, train, val)
assert loop.per_host and loop.n_shards == 4

# locality: the TRAIN loader only ever saw this process's block rows (the
# replicated eval tail may legitimately pull any val row on every process)
local_blocks = sorted(set(_owned_data_blocks(mesh).values()))
local_n = loop._n_train_padded // loop.n_shards
allowed = set()
for d in local_blocks:
    allowed.update((np.arange(d * local_n, (d + 1) * local_n) % 10).tolist())
seen = set(np.concatenate(train.requested).tolist())
assert seen <= allowed, (sorted(seen), sorted(allowed))
assert len(train.requested) == len(local_blocks)  # one load per local block

losses = []
for _ in range(2):
    logs = loop.run_train_epoch()
    losses.append(logs["loss"])
elogs = loop.run_eval_epoch()
assert np.isfinite(losses).all() and np.isfinite(elogs["loss"])
print("proc %d loss %.10f val %.10f" % (
    jax.process_index(), losses[-1], elogs["loss"]), flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_rendezvous_and_collective(tmp_path):
    port = _free_port()
    env_base = dict(os.environ)
    env_base.pop("XLA_FLAGS", None)  # one device per process, no fake mesh
    env_base.update(JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
                    JAX_NUM_PROCESSES="2",
                    PYTHONPATH=os.pathsep.join(
                        [os.path.dirname(os.path.dirname(__file__))]
                        + env_base.get("PYTHONPATH", "").split(os.pathsep)))
    procs = []
    for pid in range(2):
        env = dict(env_base, JAX_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen([sys.executable, "-c", WORKER], env=env,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=180)
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append(out)
    assert any("proc 0 ok" in o for o in outs)
    assert any("proc 1 ok" in o for o in outs)


def test_two_process_per_host_sharded_cache():
    """Multi-controller cached training: 2 processes x 2 virtual devices,
    CACHE_PER_HOST auto-on — each process materializes ONLY its devices'
    example rows (locality asserted in-worker), the 4-shard global cache
    assembles, and two fused train epochs + a full eval epoch produce
    identical losses on both processes."""
    port = _free_port()
    env_base = dict(os.environ)
    flags = env_base.get("XLA_FLAGS", "")
    flags = " ".join(f for f in flags.split()
                     if "xla_force_host_platform_device_count" not in f)
    env_base.update(
        JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
        JAX_NUM_PROCESSES="2",
        XLA_FLAGS=(flags + " --xla_force_host_platform_device_count=2"
                   " --xla_backend_optimization_level=0").strip(),
        PYTHONPATH=os.pathsep.join(
            [os.path.dirname(os.path.dirname(__file__))]
            + env_base.get("PYTHONPATH", "").split(os.pathsep)))
    procs = []
    for pid in range(2):
        env = dict(env_base, JAX_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen([sys.executable, "-c", CACHE_WORKER],
                                      env=env, stdout=subprocess.PIPE,
                                      stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)
    # both processes ran the same SPMD program: loss lines differ only in
    # the process index
    lines = sorted(o.strip().splitlines()[-1] for o in outs)
    assert lines[0].startswith("proc 0 loss ")
    assert lines[1].startswith("proc 1 loss ")
    assert lines[0].split("loss")[1] == lines[1].split("loss")[1], lines
