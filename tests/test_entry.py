"""Driver entry points compile and run on the CPU mesh."""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HAVE_REF = os.path.isdir("/root/reference")
pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference data not mounted")


def test_entry_compiles_and_steps():
    import __graft_entry__ as g

    fn, args = g.entry()
    state, loss = jax.jit(fn)(*args)
    jax.block_until_ready(state)
    assert np.isfinite(float(loss))
    # epoch advanced
    assert int(state.epoch) == 1


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts internally


def test_dryrun_multichip_odd():
    import __graft_entry__ as g

    g.dryrun_multichip(4)
