"""Structural smoke test for the driver bench artifact (bench.py).

Round-3 failure mode: the driver killed bench.py before its single
end-of-run print, so BENCH_r03.json recorded ``parsed=null`` — a whole
round of perf data lost. The contract now is that bench.py prints the full
JSON record immediately after the flagship measurement and again after
every variant row (the driver reads the tail; last line wins).

This test drives ``CMRTPU_BENCH_SMOKE=1 python bench.py`` on the CPU
backend and SIGKILLs the process as soon as the FIRST record line appears —
exactly the external-kill scenario — then asserts that line is parseable
JSON with every key the driver needs. No cooperative shutdown is given a
chance to run, so a pass here means an arbitrary later kill cannot lose
the headline either.
"""

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# generous wall cap: one cold fused-step compile on an opt-level-0 CPU
# backend; the shared compilation cache (conftest) makes reruns fast
FIRST_LINE_TIMEOUT_S = 600


def test_bench_headline_survives_sigkill_after_first_row():
    env = dict(os.environ)
    env["CMRTPU_BENCH_SMOKE"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    for needed in ("--xla_force_host_platform_device_count=8",
                   "--xla_backend_optimization_level=0"):
        if needed.split("=")[0] not in flags:
            flags = (flags + " " + needed).strip()
    env["XLA_FLAGS"] = flags

    proc = subprocess.Popen(
        [sys.executable, str(REPO / "bench.py")],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True)
    first_line = None
    deadline = time.monotonic() + FIRST_LINE_TIMEOUT_S
    try:
        while time.monotonic() < deadline:
            line = proc.stdout.readline()
            if not line:  # EOF: process exited before any record line
                break
            if line.lstrip().startswith("{"):
                first_line = line
                break
    finally:
        if proc.poll() is None:
            # the external-kill scenario: no cleanup, no atexit, no flush
            proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=60)
        proc.stdout.close()

    assert first_line is not None, (
        "bench.py produced no JSON record line before the "
        f"{FIRST_LINE_TIMEOUT_S}s cap — the headline-first contract "
        "(emit immediately after the flagship measurement) is broken")
    record = json.loads(first_line)
    for key in ("metric", "value", "unit", "vs_baseline",
                "variants_slices_per_sec"):
        assert key in record, f"driver key {key!r} missing: {record}"
    assert record["unit"] == "slices/sec"
    assert isinstance(record["value"], (int, float))
    assert record["value"] > 0, "flagship measurement missing from headline"
    assert record.get("smoke") is True, (
        "smoke-mode records must be stamped so they can never be mistaken "
        "for a real measurement")
