"""Phase-chain state carry: pairs long enough to span multiple phases.

The phased score-only engines chain several pallas_calls with aliased
state planes; the approx (-g) variant additionally ferries its H0-walk
scalars between phases in a VMEM plane (SMEM in/out aliasing is not
honored on hardware — caught on a real chip in round 2).  600-base pairs
produce ~1199 diagonals = at least two phases, so these interpret-mode
tests pin the carry logic; tests/tpu_validate.py covers the on-chip run.
"""
import numpy as np
import pytest

from ksw2_tpu.core.flags import Flag
from ksw2_tpu.core.matrix import simple_mat
from ksw2_tpu.spec import diagdiff
from ksw2_tpu.ops.extz import extz2_device


def _pair(seed, L=600, div=0.10):
    rng = np.random.default_rng(seed)
    q = rng.integers(0, 4, size=L).astype(np.int32)
    t = np.where(rng.random(L) < div,
                 rng.integers(0, 4, size=L), q).astype(np.int32)
    return q, t


@pytest.mark.parametrize("zdrop", [-1, 150])
def test_multiphase_approx_walk_carry(zdrop):
    q, t = _pair(31)
    mat = simple_mat(5, 2, -4)
    fl = Flag.SCORE_ONLY | Flag.APPROX_MAX | Flag.APPROX_DROP
    ez, _ = extz2_device(q, t, 5, mat, 4, 2, zdrop=zdrop, flag=fl,
                         interpret=True)
    ezs, _ = diagdiff.extz2(q, t, 5, mat, 4, 2, zdrop=zdrop, flag=fl)
    for f in ("max", "max_t", "max_q", "score", "zdropped"):
        assert getattr(ez, f) == getattr(ezs, f), (zdrop, f)


def test_multiphase_exact_static_windows():
    q, t = _pair(32)
    mat = simple_mat(5, 2, -4)
    ez, _ = extz2_device(q, t, 5, mat, 4, 2, flag=Flag.SCORE_ONLY,
                         interpret=True)
    ezs, _ = diagdiff.extz2(q, t, 5, mat, 4, 2, flag=Flag.SCORE_ONLY)
    for f in ("max", "max_t", "max_q", "mqe", "mqe_t", "mte", "mte_q",
              "score"):
        assert getattr(ez, f) == getattr(ezs, f), f
