"""Driver entry points: single-chip compile check + 8-device dry run."""
import sys
import os

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    z, mean, var = out
    assert np.isfinite(float(z))
    assert np.all(np.isfinite(np.asarray(mean)))
    assert np.all(np.asarray(var) > 0)


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)
