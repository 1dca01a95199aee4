"""Driver entry points (__graft_entry__) stay jittable and mesh-runnable."""

import numpy as np


def test_entry_jits():
    import jax

    import __graft_entry__ as g
    fn, args = g.entry()
    out = np.asarray(jax.jit(fn)(*args))
    assert out.shape[0] >= 8
    assert np.isfinite(out).all()


def test_dryrun_multichip_small():
    import __graft_entry__ as g
    g.dryrun_multichip(2)
