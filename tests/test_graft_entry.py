"""Driver-contract regression tests for __graft_entry__.py:

* ``entry()`` returns a jittable flagship forward + example args;
* ``dryrun_multichip(n)`` runs inline when enough devices exist (the test
  env forces 8 virtual CPU devices) and self-provisions a subprocess with a
  bigger virtual mesh when they don't — the exact path the driver exercises
  on a single-chip host.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as G


def test_entry_forward_compiles():
    import jax
    fn, args = G.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 224, 224, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_inline_on_virtual_mesh(capsys):
    # conftest forces 8 CPU devices -> 4 is satisfiable inline
    G.dryrun_multichip(4)
    assert "dryrun_multichip(4): ok" in capsys.readouterr().out


def test_dryrun_self_provisions_when_devices_scarce(capsys, monkeypatch):
    # 16 > the 8 forced devices -> must re-exec with a 16-device virtual
    # mesh. Smoke stage set: this test pins the SUBPROCESS MECHANISM; the
    # full 16-stage body already runs in the inline test above (and for the
    # driver), and running it twice cost the suite ~4 min.
    monkeypatch.setenv("CMRTPU_DRYRUN_SMOKE", "1")
    G.dryrun_multichip(16)
    assert "dryrun_multichip(16): ok" in capsys.readouterr().out
