"""Multi-chip (8 virtual CPU devices) sharded batch == single device."""
import numpy as np

import __graft_entry__ as graft
from ksw2_tpu.ops.batch_xla import extz_batch_scores
from ksw2_tpu.parallel.mesh import make_mesh, sharded_extz_scores


def test_entry_compiles_and_runs():
    import jax

    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert np.asarray(out["score"]).shape == (args[0].shape[0],)


def test_dryrun_multichip():
    graft.dryrun_multichip(8)


def test_sharded_equals_unsharded():
    args = graft._example_batch(B=16, Lq=128, Lt=128, seed=3)
    spec = graft._spec(Lq=128, Lt=128)
    o1 = sharded_extz_scores(make_mesh(8), spec, *args)
    o2 = extz_batch_scores(spec, *args)
    for k in o2:
        assert np.array_equal(np.asarray(o1[k]), np.asarray(o2[k])), k
