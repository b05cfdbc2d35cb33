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
without touching configs). Default: an environment-scoped
``~/.cache/cmrtpu/xla-<platform>-<hash>`` (see ``_default_dir``) on
accelerator backends; on the ``cpu`` backend the default is OFF (XLA:CPU AOT
reuse is host-CPU-feature-sensitive — see ``ensure_compilation_cache``) and
requires explicit opt-in.

Why the default is environment-scoped rather than one shared directory:
XLA:CPU AOT entries stamp the compile machine's features (including tuning
pseudo-features like ``prefer-no-gather``); loading entries produced under a
DIFFERENT XLA_FLAGS environment trips the loader's feature-mismatch path —
observed outcomes ranged from E-line warnings to a silent execution hang.
Homogeneous directories (same platform, jax version, flags) reload cleanly.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

def _host_fingerprint() -> str:
    """Host CPU identity: micro-architecture + the full ISA feature set.

    XLA:CPU AOT entries are compiled FOR the compile host's CPU features;
    the loader only warns ("could lead to execution errors such as SIGILL")
    when a cached entry's features don't match the executing host. A cache
    dir shared between two hosts with different feature sets is therefore a
    SIGILL lottery — the fingerprint keys the dir by the exact axis the
    loader checks. On Linux the feature flags come from /proc/cpuinfo; other
    platforms degrade to machine/processor identity (coarser, still safe —
    a coarser key can only split caches, never wrongly share them)."""
    import platform as _platform

    parts = [_platform.machine(), _platform.processor() or ""]
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):  # x86 / arm
                    parts.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
                if line.startswith("model name"):
                    parts.append(line.split(":", 1)[1].strip())
    except OSError:
        pass
    return "|".join(parts)


def _default_dir(host_fingerprint: Optional[str] = None) -> str:
    """Environment-scoped default location.

    One flat directory shared by every flag combination proved unsafe in
    practice: XLA:CPU AOT entries compiled under one XLA_FLAGS set (e.g.
    full optimization) were served to processes running under another
    (tests pin --xla_backend_optimization_level=0), tripping the loader's
    machine-feature mismatch — observed outcomes ranged from E-line warnings
    to a silent execution hang. Scoping the directory by platform + jax
    version + an XLA_FLAGS hash + the host-CPU fingerprint guarantees only
    like-for-like entries share a cache (the fingerprint closes the last
    crack: one shared filesystem, two driver hosts with different CPU
    feature sets)."""
    import hashlib

    import jax

    try:
        platform = jax.default_backend()
    except Exception:
        platform = "unknown"
    if host_fingerprint is None:
        host_fingerprint = _host_fingerprint()
    tag = hashlib.sha256(
        f"{jax.__version__}|{platform}|{os.environ.get('XLA_FLAGS', '')}"
        f"|{host_fingerprint}".encode()).hexdigest()[:12]
    return os.path.join("~", ".cache", "cmrtpu", f"xla-{platform}-{tag}")


def ensure_compilation_cache(config: Optional[Dict] = None) -> Optional[str]:
    """Idempotently point jax at a persistent compilation-cache directory.

    Returns the active cache dir, or None when disabled (explicitly via
    ``COMPILATION_CACHE_DIR: ''``, or because jax refused the setting).
    Reads/writes the live jax config rather than a module flag, so an
    explicit disable really unsets a cache an earlier Trainer enabled."""
    from cmrtpu import config as C

    env = os.environ.get("CMRTPU_COMPILATION_CACHE_DIR")
    if env is not None:
        raw = env
    else:
        raw = C.get(config or {}, "COMPILATION_CACHE_DIR", "__default__")
        if raw == "__default__":
            # XLA:CPU persists AOT executables stamped with tuning
            # pseudo-features (+prefer-no-gather etc.) that are never in the
            # host feature list, so every reload trips the loader's
            # machine-feature mismatch path — warnings at best, a SIGILL /
            # silent hang at worst on a host whose features really differ.
            # Default OFF on cpu; same-host setups that want the speedup
            # (e.g. the test suite) opt in explicitly via the env var or
            # COMPILATION_CACHE_DIR.
            try:
                import jax
                if jax.default_backend() == "cpu":
                    logging.debug("persistent compilation cache disabled by "
                                  "default on cpu (AOT reuse is host-CPU-"
                                  "feature-sensitive); set "
                                  "CMRTPU_COMPILATION_CACHE_DIR to opt in")
                    return None
            except Exception:
                pass
            raw = _default_dir()
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
