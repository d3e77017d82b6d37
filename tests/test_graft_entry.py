"""Driver-contract tests: entry() compiles, dryrun_multichip runs on the
8-device virtual CPU mesh."""

import jax
import pytest


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    compiled = jax.jit(fn).lower(*args).compile()
    assert compiled is not None


@pytest.mark.parametrize("n", [2, 8])
def test_dryrun_multichip(n):
    import __graft_entry__ as ge

    ge.dryrun_multichip(n)
