"""Driver contract checks: entry() compiles and runs; dryrun_multichip
works on the virtual CPU mesh."""

import sys
import os

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as ge  # noqa: E402


def test_entry_compiles():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    uniq, n_kept, n_cut = out
    assert int(n_kept) > 0


@pytest.mark.parametrize("n", [2, 8])
def test_dryrun_multichip(n):
    ge.dryrun_multichip(n)
