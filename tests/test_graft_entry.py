"""Driver entry points must keep working (compile-checked by the driver)."""

import jax
import numpy as np
import pytest


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles_eval_shape():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    # abstract evaluation only — full xception compile is exercised by the
    # driver on real hardware
    out = jax.eval_shape(fn, *args)
    assert out.shape == (1, 512, 512, 5)
