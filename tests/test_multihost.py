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
