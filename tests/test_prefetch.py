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


def test_early_consumer_exit_stops_producer():
    """Abandoning the iterator mid-epoch (early stopping, an exception) must
    stop the producer instead of preprocessing the rest of the epoch into a
    drained queue."""
    import time
    from cmrtpu.parallel.prefetch import prefetch_to_device

    produced = []

    def slow_batches():
        for i in range(50):
            produced.append(i)
            yield (i,)

    it = prefetch_to_device(slow_batches(), mesh=None, depth=2)
    next(it)
    it.close()  # generator finaliser runs the cleanup path
    time.sleep(0.3)
    assert len(produced) < 10, f"producer ran on: {len(produced)} batches"


def test_sentinel_delivered_when_queue_full():
    """Producer finishing with a FULL queue must still deliver the sentinel —
    a dropped sentinel deadlocks the consumer's blocking get (regression:
    the early-exit stop flag briefly made the final put non-blocking)."""
    import time
    from cmrtpu.parallel.prefetch import prefetch_to_device

    # 5 instant batches against depth=2: the producer finishes while the
    # queue is full if the consumer is slower
    out = []
    for item in prefetch_to_device(iter([(i,) for i in range(5)]),
                                   mesh=None, depth=2):
        time.sleep(0.05)
        out.append(item[0])
    assert out == [0, 1, 2, 3, 4]


# ---------------------------------------------------------------------------
# numpy_prefetch: host-only background prefetch (no jax in the producer —
# jax dispatches from threads serialize against main-thread execution on
# the target platform; see cmrtpu/train/streaming.py)
# ---------------------------------------------------------------------------

def test_numpy_prefetch_order_and_content():
    from cmrtpu.parallel.prefetch import numpy_prefetch

    out = list(numpy_prefetch(iter(range(7)), depth=2))
    assert out == list(range(7))
    assert list(numpy_prefetch(iter([]), depth=2)) == []
    assert list(numpy_prefetch(iter(range(3)), depth=0)) == [0, 1, 2]


def test_numpy_prefetch_propagates_producer_exception():
    from cmrtpu.parallel.prefetch import numpy_prefetch

    def bad():
        yield 1
        yield 2
        raise RuntimeError("decode failed")

    got = []
    with pytest.raises(RuntimeError, match="decode failed"):
        for item in numpy_prefetch(bad(), depth=2):
            got.append(item)
    assert got == [1, 2]


def test_numpy_prefetch_consumer_early_exit_stops_producer():
    from cmrtpu.parallel.prefetch import numpy_prefetch

    produced = []

    def slow():
        for i in range(100):
            produced.append(i)
            yield i

    it = numpy_prefetch(slow(), depth=2)
    for item in it:
        if item == 3:
            break
    it.close()
    time.sleep(0.2)
    # producer stopped shortly after the consumer left (bounded by depth)
    assert len(produced) < 100
