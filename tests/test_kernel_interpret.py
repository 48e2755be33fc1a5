"""Pallas wavefront kernel (interpret mode) vs the spec engine.

Interpret mode runs the exact kernel program on CPU; the real-TPU runs are
validated in the verify workflow (same comparisons on hardware).
"""
import numpy as np
import pytest

import refcmp
from ksw2_tpu.core.flags import Flag
from ksw2_tpu.core.matrix import encode_dna, simple_mat
from ksw2_tpu.ops.extz import extz2_device
from ksw2_tpu.spec import diagdiff

CASES = []
_rng = np.random.default_rng(77)
for _i in range(10):
    _tlen = int(_rng.integers(10, 90))
    _t, _q = refcmp.random_pair(_rng, _tlen, divergence=0.25, indel=0.1,
                                with_n=bool(_rng.integers(0, 2)))
    CASES.append((_t, _q,
                  int(_rng.choice([-1, 5, 16])),
                  int(_rng.choice([-1, 20])),
                  int(_rng.integers(0, 2)) * int(Flag.RIGHT)
                  | int(_rng.integers(0, 2)) * int(Flag.SCORE_ONLY)
                  | int(_rng.integers(0, 2)) * int(Flag.APPROX_MAX | Flag.APPROX_DROP)))


@pytest.mark.parametrize("idx", range(len(CASES)))
def test_kernel_interpret_matches_spec(idx):
    t, q, w, z, flag = CASES[idx]
    mat = simple_mat(5, 2, 4)
    qs, ts = encode_dna(q), encode_dna(t)
    want, _ = diagdiff.extz2(qs, ts, 5, mat, 4, 2, w=w, zdrop=z, flag=flag)
    got, _ = extz2_device(qs, ts, 5, mat, 4, 2, w=w, zdrop=z, flag=flag,
                          interpret=True)
    assert got.tsv_fields() == want.tsv_fields()
