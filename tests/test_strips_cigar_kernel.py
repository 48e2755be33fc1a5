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


@pytest.mark.parametrize("right", [False, True])
def test_two_piece_bytes_match_spec(right):
    """Two-piece 7-bit bytes (ksw2_extd2_sse.c:191-322): the kernel's
    third F chain (opened from the full clamped Hn) must reproduce the
    DP's own F so the 0x10 bit and the F argmax code are exact."""
    from ksw2_tpu.spec.strips_cigar import strips_forward_cigar_extd

    rng = np.random.default_rng(321)
    pairs = []
    for L in (210, 290, 140):
        t, qy = refcmp.random_pair(rng, L, divergence=0.3, indel=0.15,
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
    rec, d8, (S, Bp) = strips_cigar_forward(
        Q, T, ql, tl, 5, MAT, 4, 2, zdrop=100, flag=flag,
        interpret=True, two=True, q2=13, e2=1)
    d8 = np.asarray(d8)
    for p, (qv, tv) in enumerate(pairs):
        _, dmat = strips_forward_cigar_extd(qv, tv, 5, MAT, 4, 2, 13, 1,
                                            right=right)
        got = _decode(d8, p, S, len(qv), len(tv))
        assert (got == dmat).all(), (p, right)
