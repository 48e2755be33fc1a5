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


EXTF_CASES = []
_rngf = np.random.default_rng(55)
for _i in range(6):
    _tlen = int(_rngf.integers(10, 90))
    _t, _q = refcmp.random_pair(_rngf, _tlen, divergence=0.3, indel=0.1)
    EXTF_CASES.append((_t, _q, int(_rngf.choice([-1, 8, 24])),
                       int(_rngf.choice([-1, 30]))))


@pytest.mark.parametrize("idx", range(len(EXTF_CASES)))
def test_extf_kernel_interpret_matches_spec(idx):
    from ksw2_tpu.ops.extf import extf2_device
    t, q, w, xd = EXTF_CASES[idx]
    qs, ts = encode_dna(q), encode_dna(t)
    want = diagdiff.extf2(qs, ts, 2, -4, 2, w=w, xdrop=xd)
    got = extf2_device(qs, ts, 2, -4, 2, w=w, xdrop=xd, interpret=True)
    assert got.tsv_fields() == want.tsv_fields()


EXTS_CASES = []
_rngs = np.random.default_rng(66)
for _i in range(6):
    _tlen = int(_rngs.integers(10, 90))
    _t, _q = refcmp.random_pair(_rngs, _tlen, divergence=0.25, indel=0.1,
                                with_n=bool(_rngs.integers(0, 2)))
    _fl = int(Flag.SPLICE_FOR)
    _fl |= int(_rngs.integers(0, 2)) * int(Flag.SCORE_ONLY)
    _fl |= int(_rngs.integers(0, 2)) * int(Flag.SPLICE_FLANK)
    _fl |= int(_rngs.integers(0, 2)) * int(Flag.APPROX_MAX | Flag.APPROX_DROP)
    EXTS_CASES.append((_t, _q, int(_rngs.choice([-1, 25])), _fl))


@pytest.mark.parametrize("idx", range(len(EXTS_CASES)))
def test_exts_kernel_interpret_matches_spec(idx):
    from ksw2_tpu.ops.exts import exts2_device
    t, q, z, fl = EXTS_CASES[idx]
    mat = simple_mat(5, 1, -2)
    qs, ts = encode_dna(q), encode_dna(t)
    want, _ = diagdiff.exts2(qs, ts, 5, mat, 2, 1, 32, 4, zdrop=z,
                             junc_bonus=0, flag=fl)
    got, _ = exts2_device(qs, ts, 5, mat, 2, 1, 32, 4, zdrop=z,
                          junc_bonus=0, flag=fl, interpret=True)
    assert got.tsv_fields() == want.tsv_fields()


GG2_CASES = []
_rngg = np.random.default_rng(88)
for _i in range(6):
    _tlen = int(_rngg.integers(10, 90))
    _t, _q = refcmp.random_pair(_rngg, _tlen, divergence=0.3, indel=0.12,
                                with_n=bool(_rngg.integers(0, 2)))
    GG2_CASES.append((_t, _q, int(_rngg.choice([-1, 5, 16]))))


@pytest.mark.parametrize("idx", range(len(GG2_CASES)))
def test_gg2_kernel_interpret_matches_spec(idx):
    from ksw2_tpu.ops.gg2 import gg2_device
    t, q, w = GG2_CASES[idx]
    mat = simple_mat(5, 2, 4)
    qs, ts = encode_dna(q), encode_dna(t)
    ws, wc, _ = diagdiff.gg2_sse(qs, ts, 5, mat, 4, 2, w=w)
    gs, gc, _ = gg2_device(qs, ts, 5, mat, 4, 2, w=w, interpret=True)
    assert (gs, gc) == (ws, wc)
