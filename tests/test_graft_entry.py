"""Driver contract: entry() must jit-compile single-chip; dryrun_multichip
must build a real mesh and execute one full training step on 8 virtual
devices."""

import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __graft_entry__ as ge  # noqa: E402


def test_entry_forward_jits():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    out = np.asarray(out)
    assert out.ndim == 1 and np.isfinite(out).all()


def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)


def test_dryrun_multichip_odd():
    ge.dryrun_multichip(3)
