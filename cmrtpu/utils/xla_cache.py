"""Persistent XLA compilation cache, on by default.

The CV workflow compiles the same fused train/eval/predict programs once per
fold (every fold constructs fresh jit closures, so the in-process jit cache
never hits across folds) and once per process for every CLI invocation. On
the tunneled TPU a cold compile of the flagship step costs minutes — with the
persistent cache, fold 1..k and every re-run deserialize the executable
instead. Keyed by content hash (program + flags + backend), so it is safe to
share across configs; irrelevant entries are simply never hit.

Knobs (flat config keys, reference-style): ``COMPILATION_CACHE_DIR`` overrides
the location, empty string / ``False`` disables. Default:
``~/.cache/cmrtpu/xla``.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

_DEFAULT_DIR = os.path.join("~", ".cache", "cmrtpu", "xla")
_enabled_dir: Optional[str] = None


def ensure_compilation_cache(config: Optional[Dict] = None) -> Optional[str]:
    """Idempotently point jax at a persistent compilation-cache directory.

    Returns the active cache dir, or None when disabled (explicitly, or
    because jax refused the setting)."""
    global _enabled_dir
    from cmrtpu import config as C

    raw = C.get(config or {}, "COMPILATION_CACHE_DIR", _DEFAULT_DIR)
    if not raw:  # '' / None / False -> disabled
        return None
    path = os.path.abspath(os.path.expanduser(str(raw)))
    if _enabled_dir == path:
        return _enabled_dir
    try:
        os.makedirs(path, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", path)
        # cache anything that took >1s to compile (the fused steps take
        # tens of seconds to minutes; trivial programs stay uncached)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled_dir = path
        logging.debug("persistent XLA compilation cache at %s", path)
    except Exception as e:  # pragma: no cover - jax without the knob
        logging.debug("compilation cache unavailable: %s", e)
        return None
    return _enabled_dir
