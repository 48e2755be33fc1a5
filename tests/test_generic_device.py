"""GENERIC_SC on the single-pair device kernels (interpret-mode parity).

Round-1 fell back to the NumPy spec for generic scoring matrices on the
single-pair route; the kernels now take m pre-biased query-symbol profile
planes (the same device-side trick the batched engines use,
ksw2_extz2_sse.c:141-144 semantics: fill exactly [st0, en0], no sc_N
wildcard replacement).
"""
import numpy as np
import pytest

from ksw2_tpu.core.flags import Flag
from ksw2_tpu.spec import diagdiff


def _generic_mat(rng, m=5):
    mat = rng.integers(-5, 4, size=(m, m)).astype(np.int8)
    np.fill_diagonal(mat, rng.integers(1, 4, size=m))
    return mat.reshape(-1)


@pytest.mark.parametrize("family", ["extz", "extd", "exts"])
@pytest.mark.parametrize("score_only", [True, False])
def test_generic_sc_device(family, score_only):
    rng = np.random.default_rng(hash((family, score_only)) % 2**32)
    m = 5
    mat = _generic_mat(rng, m)
    lq, lt = int(rng.integers(50, 160)), int(rng.integers(50, 160))
    q = rng.integers(0, m, size=lq).astype(np.int32)
    t = rng.integers(0, m, size=lt).astype(np.int32)
    fl = Flag.GENERIC_SC | (Flag.SCORE_ONLY if score_only else Flag.NONE)

    if family == "extz":
        from ksw2_tpu.ops.extz import extz2_device
        w = int(rng.integers(20, 120))
        ez, _ = extz2_device(q, t, m, mat, 4, 2, w=w, flag=fl,
                             interpret=True)
        ezs, _ = diagdiff.extz2(q, t, m, mat, 4, 2, w=w, flag=fl)
    elif family == "extd":
        from ksw2_tpu.ops.extd import extd2_device
        ez, _ = extd2_device(q, t, m, mat, 4, 2, 13, 1, flag=fl,
                             interpret=True)
        ezs, _ = diagdiff.extd2(q, t, m, mat, 4, 2, 13, 1, flag=fl)
    else:
        from ksw2_tpu.ops.exts import exts2_device
        ez, _ = exts2_device(q, t, m, mat, 4, 2, 24, 9, flag=fl,
                             interpret=True)
        ezs, _ = diagdiff.exts2(q, t, m, mat, 4, 2, 24, 9, flag=fl)

    for f in ("max", "max_t", "max_q", "mqe", "mqe_t", "mte", "mte_q",
              "score", "zdropped", "cigar"):
        assert getattr(ez, f) == getattr(ezs, f), (f, getattr(ez, f),
                                                   getattr(ezs, f))


def test_generic_sc_device_zdrop_approx():
    """Generic matrix through the monolithic approx and zdrop paths."""
    from ksw2_tpu.ops.extz import extz2_device

    rng = np.random.default_rng(77)
    m = 5
    mat = _generic_mat(rng, m)
    q = rng.integers(0, m, size=150).astype(np.int32)
    t = np.concatenate([q[:70], rng.integers(0, m, size=90)]).astype(np.int32)
    for fl, z in ((Flag.SCORE_ONLY | Flag.GENERIC_SC, 60),
                  (Flag.SCORE_ONLY | Flag.GENERIC_SC | Flag.APPROX_MAX
                   | Flag.APPROX_DROP, 60)):
        ez, _ = extz2_device(q, t, m, mat, 4, 2, zdrop=z, flag=fl,
                             interpret=True)
        ezs, _ = diagdiff.extz2(q, t, m, mat, 4, 2, zdrop=z, flag=fl)
        for f in ("max", "max_t", "max_q", "score", "zdropped"):
            assert getattr(ez, f) == getattr(ezs, f), (int(fl), f)
