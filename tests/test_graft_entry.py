"""Driver-entry regression: `entry()` must jit-compile and run, and
`dryrun_multichip(8)` must compile+execute the sharded training step on the
8-virtual-device CPU mesh (conftest.py) — the exact contract the round
driver checks."""

import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    filtered, pts, nrms, valid = out
    assert filtered.shape == args[0].shape
    assert pts.shape[-1] == 3 and nrms.shape == pts.shape
    assert np.isfinite(np.asarray(pts)[np.asarray(valid, bool)]).all()


def test_dryrun_multichip_8():
    assert len(jax.devices()) >= 8
    graft.dryrun_multichip(8)
