"""Strips kernel direction-byte emission vs the byte-exact spec.

First milestone of the strips-CIGAR kernel (round-5): prm.cig=1 makes
the one-piece kernel emit the reference's per-cell direction bytes into
the skewed step store; decoding d8[i + j//128, p*S + j//128, j%128]
must equal spec/strips_cigar's (tlen, qlen) matrix, whose walk is
byte-validated against the reference.
"""
import numpy as np
import pytest

import refcmp
from ksw2_tpu.core.flags import Flag
from ksw2_tpu.core.matrix import encode_dna, simple_mat
from ksw2_tpu.ops.wavefront_strips import strips_cigar_forward
from ksw2_tpu.spec.strips_cigar import strips_forward_cigar

MAT = simple_mat(5, 2, -4)


def _decode(d8, p, S, qlen, tlen):
    got = np.zeros((tlen, qlen), np.uint8)
    for j0 in range(0, qlen, 128):
        s = j0 // 128
        w = min(128, qlen - j0)
        for i in range(tlen):
            got[i, j0:j0 + w] = d8[i + s, p * S + s, :w]
    return got


@pytest.mark.parametrize("right", [False, True])
def test_bytes_match_spec(right):
    rng = np.random.default_rng(123)
    pairs = []
    for L in (220, 300, 150):
        t, qy = refcmp.random_pair(rng, L, divergence=0.25, indel=0.12,
                                   with_n=True)
        pairs.append((encode_dna(qy), encode_dna(t)))
    B = len(pairs)
    Lq = max(len(q) for q, t in pairs)
    Lt = max(len(t) for q, t in pairs)
    Q = np.zeros((B, Lq), np.int32)
    T = np.zeros((B, Lt), np.int32)
    ql = np.zeros(B, np.int32)
    tl = np.zeros(B, np.int32)
    for i, (qv, tv) in enumerate(pairs):
        Q[i, :len(qv)] = qv
        T[i, :len(tv)] = tv
        ql[i], tl[i] = len(qv), len(tv)
    flag = Flag.RIGHT if right else Flag.NONE
    rec, d8, (S, Bp) = strips_cigar_forward(Q, T, ql, tl, 5, MAT, 4, 2,
                                            zdrop=100, flag=flag,
                                            interpret=True)
    d8 = np.asarray(d8)
    for p, (qv, tv) in enumerate(pairs):
        _, dmat = strips_forward_cigar(qv, tv, 5, MAT, 4, 2, right=right)
        got = _decode(d8, p, S, len(qv), len(tv))
        assert (got == dmat).all(), (p, right)


def test_two_piece_rejected():
    from ksw2_tpu.core.flags import Flag
    from ksw2_tpu.ops.wavefront_strips import StripParams, \
        build_strips_call

    prm = StripParams(n_rows=8, s=1, tv=32, t_pad=128, t_real=32, m=5,
                      q=4, e=2, mat0=2, sc_mis=-4, sc_N=-2, zdrop=-1,
                      flag=int(Flag.NONE), two=1, q2=13, e2=1, cig=1)
    with pytest.raises(ValueError):
        build_strips_call(prm, interpret=True)
