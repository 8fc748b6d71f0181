"""Driver entry points: regression tests on the faked CPU mesh."""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")


@pytest.mark.slow
class TestGraftEntry:
    def test_entry_traces(self):
        """entry() must be jittable; we abstract-trace instead of running the
        full-size volume on CPU."""
        from __graft_entry__ import entry

        fn, args = entry()
        shape = jax.eval_shape(fn, *args)
        assert shape.shape == (4, 2)
        assert shape.dtype == np.float32

    def test_dryrun_multichip_8(self, mesh8):
        from __graft_entry__ import dryrun_multichip

        dryrun_multichip(8)

    def test_dryrun_multichip_2(self, mesh8):
        from __graft_entry__ import dryrun_multichip

        dryrun_multichip(2)
