"""Mesh construction and batch sharding — data parallelism the XLA way.

The reference distributes via ``tf.distribute.MirroredStrategy`` with NCCL
all-reduce (ref: src/models/Unets.py:70-75, SURVEY.md §2.2). Here the whole
train step is pjit-compiled over a ``jax.sharding.Mesh``: the batch axis is
sharded over the 'data' mesh axis, parameters/optimizer state are fully
replicated, and XLA inserts the gradient all-reduce as ICI collectives.
A 'model' mesh axis is reserved for future tensor-parallel configs.

The slice/time axes of 3D and 2D+t volumes can also ride the 'data' axis
(SURVEY.md §2.2 SP row): the 2D U-Net is embarrassingly parallel across
slices, so sharding [B*Z, H, W, C] batches is pure data layout — no
cross-slice communication exists in the model.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Multi-host bootstrap (jax.distributed) for pod-slice training.

    The reference never scales past one host (SURVEY.md §2.2 elastic row);
    this is the TPU-native extension point: on multi-host deployments call
    once before creating the mesh — explicit args or the standard
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars.
    Single-host (no coordinator configured) is a no-op returning False, so
    every entry point can call this unconditionally."""
    import os

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if not coordinator_address:
        return False
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", 1))
    if process_id is None:  # explicit 0 must not fall through to the env var
        process_id = int(os.environ.get("JAX_PROCESS_ID", 0))
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=int(num_processes),
                               process_id=int(process_id))
    return True


def create_mesh(config: Optional[Dict] = None,
                devices: Optional[Sequence] = None) -> Mesh:
    """1D data mesh over all (or given) devices; MESH_SHAPE=(d, m) enables a
    2D data x model mesh.

    When BATCHSIZE does not divide the device count, the data axis shrinks to
    the largest divisor of BATCHSIZE (small-batch debugging parity; a sharded
    batch axis must divide the mesh).
    """
    devices = list(devices) if devices is not None else jax.devices()
    shape = (config or {}).get("MESH_SHAPE") or None
    if shape:
        shape = tuple(int(s) for s in shape)
        assert int(np.prod(shape)) == len(devices), (
            f"MESH_SHAPE {shape} != #devices {len(devices)}")
        dev = np.asarray(devices).reshape(shape)
        return Mesh(dev, (DATA_AXIS, MODEL_AXIS)[:len(shape)])
    batch = int((config or {}).get("BATCHSIZE") or 0)
    n = len(devices)
    if batch:
        while n > 1 and batch % n:
            n -= 1
    if n < len(devices):
        import logging
        logging.warning(
            "create_mesh: BATCHSIZE %d does not divide the %d available "
            "devices — training on %d device(s), %d idle. Pick a BATCHSIZE "
            "divisible by the device count to use the full slice.",
            batch, len(devices), n, len(devices) - n)
    return Mesh(np.asarray(devices[:n]), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.shape[DATA_AXIS]
    assert global_batch % n == 0, (
        f"BATCHSIZE {global_batch} must divide the data-mesh size {n}")
    return global_batch // n


def put_global(x, sharding: NamedSharding):
    """Place a host array onto a NamedSharding via per-addressable-device
    puts + ``make_array_from_single_device_arrays``.

    Two reasons this is THE put for host data, over a plain
    sharding-destination ``device_put``:

    * perf — measured on the target platform, the sharding-destination path
      transfers at ~25 MB/s while plain per-device puts sustain ~1 GB/s (a
      40-60x difference that used to be misattributed to the interconnect);
    * multi-controller correctness — ``device_put`` raises when the sharding
      spans devices of other processes, while this assembles the global
      array from each process's addressable shards. Every process must pass
      a host array with the same GLOBAL shape holding (at least) the rows
      its own devices own; callers that materialize only local rows use
      ``device_cache.upload_cache_sharded_per_host``.
    """
    x = np.asarray(x)
    idx_map = sharding.addressable_devices_indices_map(x.shape)
    shards = [jax.device_put(x[idx], d) for d, idx in idx_map.items()]
    return jax.make_array_from_single_device_arrays(x.shape, sharding, shards)


def shard_batch(batch, mesh: Mesh):
    """Place a host batch onto the mesh, split along the leading axis.

    Host numpy arrays go through ``put_global`` (per-device puts — see its
    docstring for why). Device-resident inputs (or shapes that don't split
    evenly) keep the sharding-destination path."""
    sharding = batch_sharding(mesh)
    n_data = mesh.shape[DATA_AXIS]

    def put(x):
        if isinstance(x, np.ndarray) and x.ndim and x.shape[0] % n_data == 0:
            # the sharding's own device->index map keeps this correct on 2D
            # (data x model) meshes too: model-axis replicas receive the same
            # contiguous axis-0 slice, one plain put per device
            return put_global(x, sharding)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)
