"""Keep the driver entry points green: single-chip forward signature and the
multi-chip dry run on the virtual 8-device CPU mesh."""

import numpy as np
import pytest


def test_entry_signature():
    import __graft_entry__ as g

    fn, (params, x) = g.entry()
    assert x.shape == (8, 512, 512, 3)
    assert "params" in params


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts finite loss internally
