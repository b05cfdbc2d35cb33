"""Async host -> HBM prefetch pipeline.

The reference overlaps host preprocessing with device compute through keras'
prefetch queue (``max_queue_size=QUEUE_SIZE``, ref: src/models/
train_model.py:105-112) fed by a per-batch thread pool. The TPU-native
equivalent: a small background thread drives the (host-side) batch iterable
and eagerly ``device_put``s each batch with the mesh's batch sharding, so
the transfer of batch N+1 overlaps the train step on batch N (``device_put``
is async — it returns as soon as the transfer is enqueued).

``PREFETCH_DEPTH`` (config) bounds the queue: depth 2 = classic double
buffering.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional

from jax.sharding import Mesh

from cmrtpu.parallel.mesh import shard_batch

_SENTINEL = object()


def numpy_prefetch(data: Iterable, depth: int = 2) -> Iterator:
    """Background-thread prefetch for HOST work only (decode / gather /
    packing) — the producer must make NO jax calls. On the tunneled target
    platform, jax dispatches from non-main threads serialize pathologically
    against the main thread's step execution (measured 5x slowdown), so the
    device placement stays on the consumer thread (see
    cmrtpu/train/streaming.py's put-ahead loop). Exceptions propagate to
    the consumer; sentinel delivery is deadlock-safe like
    prefetch_to_device."""
    if depth <= 0:
        yield from data
        return

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    err: list = []
    stop = threading.Event()

    def producer():
        try:
            for batch in data:
                if stop.is_set():
                    return
                while not stop.is_set():
                    try:
                        q.put(batch, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # noqa: BLE001 - propagate to consumer
            err.append(e)
        finally:
            while True:
                try:
                    q.put(_SENTINEL, timeout=0.1)
                    break
                except queue.Full:
                    if stop.is_set():
                        break

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            yield item
        if err:
            raise err[0]
    finally:
        stop.set()
        while thread.is_alive():
            try:
                q.get_nowait()
            except queue.Empty:
                break
        thread.join(timeout=5)


def prefetch_to_device(data: Iterable, mesh: Optional[Mesh],
                       depth: int = 2) -> Iterator:
    """Iterate ``data``, yielding device-resident (sharded) batches, with up
    to ``depth`` batches in flight ahead of the consumer.

    Exceptions in the producer thread are re-raised at the consumer."""
    if depth <= 0:
        for batch in data:
            yield shard_batch(batch, mesh) if mesh is not None else batch
        return

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    err: list = []
    stop = threading.Event()

    def producer():
        try:
            for batch in data:
                if stop.is_set():  # consumer left mid-epoch (early stop,
                    return         # exception): don't preprocess the rest
                out = shard_batch(batch, mesh) if mesh is not None else batch
                while not stop.is_set():
                    try:
                        q.put(out, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # noqa: BLE001 - propagate to consumer
            err.append(e)
        finally:
            # the sentinel MUST reach a live consumer (a lost sentinel
            # deadlocks its q.get()); only a stopped consumer may drop it
            while True:
                try:
                    q.put(_SENTINEL, timeout=0.1)
                    break
                except queue.Full:
                    if stop.is_set():
                        break

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            yield item
        if err:
            raise err[0]
    finally:
        # unblock + stop the producer if the consumer stops early
        stop.set()
        while thread.is_alive():
            try:
                q.get_nowait()
            except queue.Empty:
                break
        thread.join(timeout=5)
