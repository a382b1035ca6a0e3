"""Driver-contract regression test: entry() must stay jittable and
dryrun_multichip must run on a virtual device mesh."""
import sys

import jax
import pytest


def test_entry_compiles():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape[0] == 4


def test_dryrun_multichip():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
