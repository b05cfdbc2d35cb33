"""Persistent XLA compilation cache, on by default.

The CV workflow compiles the same fused train/eval/predict programs once per
fold (every fold constructs fresh jit closures, so the in-process jit cache
never hits across folds) and once per process for every CLI invocation. On
the tunneled TPU a cold compile of the flagship step costs minutes — with the
persistent cache, fold 1..k and every re-run deserialize the executable
instead. Keyed by content hash (program + flags + backend), so it is safe to
share across configs; irrelevant entries are simply never hit.

Knobs (flat config keys, reference-style): ``COMPILATION_CACHE_DIR`` overrides
the location, empty string / ``False`` disables; the environment variable
``CMRTPU_COMPILATION_CACHE_DIR`` overrides both (set it to '' to disable
without touching configs). Default: ``~/.cache/cmrtpu/xla``.

Known cosmetic quirk: XLA:CPU AOT entries record tuning hints
(``prefer-no-gather``/``-scatter``) as machine features; on reload the AOT
loader logs an E-line feature-mismatch warning even on the same machine.
Execution is unaffected (jax keys cache entries by platform + compiler
version); the warning is upstream noise, not corruption.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

_DEFAULT_DIR = os.path.join("~", ".cache", "cmrtpu", "xla")


def ensure_compilation_cache(config: Optional[Dict] = None) -> Optional[str]:
    """Idempotently point jax at a persistent compilation-cache directory.

    Returns the active cache dir, or None when disabled (explicitly via
    ``COMPILATION_CACHE_DIR: ''``, or because jax refused the setting).
    Reads/writes the live jax config rather than a module flag, so an
    explicit disable really unsets a cache an earlier Trainer enabled."""
    from cmrtpu import config as C

    env = os.environ.get("CMRTPU_COMPILATION_CACHE_DIR")
    raw = env if env is not None else C.get(config or {},
                                            "COMPILATION_CACHE_DIR",
                                            _DEFAULT_DIR)
    try:
        import jax

        current = getattr(jax.config, "jax_compilation_cache_dir", None)
        if not raw:  # '' / None / False -> disabled, even if enabled earlier
            if current:
                jax.config.update("jax_compilation_cache_dir", None)
            return None
        path = os.path.abspath(os.path.expanduser(str(raw)))
        if current == path:
            return path
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache anything that took >1s to compile (the fused steps take
        # tens of seconds to minutes; trivial programs stay uncached)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        logging.debug("persistent XLA compilation cache at %s", path)
        return path
    except Exception as e:  # pragma: no cover - jax without the knob
        logging.debug("compilation cache unavailable: %s", e)
        return None
