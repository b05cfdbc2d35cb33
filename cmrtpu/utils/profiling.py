"""Structured tracing / profiling.

The reference only has ad-hoc time() deltas logged at DEBUG (per-image
preprocess, per-fold duration; ref: src/data/Generators.py:217-223,
src/models/train_model.py:131) and explicitly disables the TB profiler
(profile_batch=0, src/utils/KerasCallbacks.py:78). The rebuild makes both
first-class (SURVEY.md §5):

  * ``StageTimer`` — named wall-clock stages with count/total/mean/max,
    dumpable as a dict or logged table; thread-safe.
  * ``trace`` — context manager around ``jax.profiler`` emitting a
    TensorBoard-viewable XPlane trace for the wrapped region.
  * ``annotate`` — ``jax.profiler.TraceAnnotation`` wrapper so host-side
    stages show up inside device traces.
"""

from __future__ import annotations

import contextlib
import logging
import threading
import time
from typing import Dict, Iterator, Optional


class StageTimer:
    """Accumulates wall-clock stats per named stage.

    >>> timer = StageTimer()
    >>> with timer.stage("decode"):
    ...     ...
    >>> timer.summary()["decode"]["count"]
    1
    """

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._stats: Dict[str, Dict[str, float]] = {}

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                s = self._stats.setdefault(
                    name, {"count": 0, "total_s": 0.0, "max_s": 0.0})
                s["count"] += 1
                s["total_s"] += dt
                s["max_s"] = max(s["max_s"], dt)

    def summary(self) -> Dict[str, Dict[str, float]]:
        with self._lock:
            out = {}
            for name, s in self._stats.items():
                out[name] = dict(s, mean_s=s["total_s"] / max(1, s["count"]))
            return out

    def log(self, level: int = logging.INFO) -> None:
        for name, s in sorted(self.summary().items()):
            logging.log(level, "stage %-24s n=%-6d total=%8.3fs mean=%8.4fs "
                        "max=%8.4fs", name, s["count"], s["total_s"],
                        s["mean_s"], s["max_s"])

    def reset(self) -> None:
        with self._lock:
            self._stats.clear()


# a process-wide default timer the pipeline stages report into
GLOBAL_TIMER = StageTimer()


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True) -> Iterator[None]:
    """jax.profiler trace of the wrapped region, viewable in TensorBoard's
    profile plugin (the capability the reference turned off)."""
    if not enabled:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named host annotation inside device traces (no-op if profiler off)."""
    try:
        import jax
        with jax.profiler.TraceAnnotation(name):
            yield
    except Exception:  # profiler unavailable on this backend
        yield
