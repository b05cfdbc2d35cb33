"""Async host->device prefetch pipeline."""

import time

import numpy as np
import pytest

from cmrtpu.parallel.mesh import create_mesh
from cmrtpu.parallel.prefetch import prefetch_to_device


def _batches(n, delay=0.0):
    for i in range(n):
        if delay:
            time.sleep(delay)
        yield (np.full((4, 8, 8, 1), i, np.float32),
               np.zeros((4, 8, 8, 2), np.float32))


def test_prefetch_yields_all_batches_in_order():
    mesh = create_mesh({"BATCHSIZE": 4})
    out = list(prefetch_to_device(_batches(5), mesh, depth=2))
    assert len(out) == 5
    for i, (x, y) in enumerate(out):
        assert float(np.asarray(x)[0, 0, 0, 0]) == i


def test_prefetch_depth_zero_is_sync():
    mesh = create_mesh({"BATCHSIZE": 4})
    out = list(prefetch_to_device(_batches(3), mesh, depth=0))
    assert len(out) == 3


def test_prefetch_propagates_producer_error():
    def bad():
        yield (np.zeros((4, 2, 2, 1), np.float32), np.zeros((4, 2, 2, 1), np.float32))
        raise RuntimeError("decode failed")

    mesh = create_mesh({"BATCHSIZE": 4})
    gen = prefetch_to_device(bad(), mesh, depth=2)
    next(gen)
    with pytest.raises(RuntimeError, match="decode failed"):
        list(gen)


def test_prefetch_early_consumer_exit():
    mesh = create_mesh({"BATCHSIZE": 4})
    gen = prefetch_to_device(_batches(100, delay=0.001), mesh, depth=2)
    next(gen)
    gen.close()  # no deadlock / leaked thread blocking exit
