"""Strips-CIGAR executable spec vs the byte-validated diagdiff engine.

Round-5 kernel groundwork: row-major per-cell direction bytes (pure
functions of local absolute H/E/F values, incl. the chain-F == DP-F
identity) walked by ksw_backtrack(is_rot=0) must reproduce the
reference's CIGARs byte-exactly — left and right alignment, Z-drop
start cells, boundary rows/columns.
"""
import numpy as np
import pytest

import refcmp
from ksw2_tpu.core.flags import Flag
from ksw2_tpu.core.matrix import encode_dna, simple_mat
from ksw2_tpu.spec import diagdiff
from ksw2_tpu.spec.strips_cigar import strips_extz_cigar

MAT = simple_mat(5, 2, -4)


@pytest.mark.parametrize("zdrop,right", [(-1, False), (100, False),
                                         (30, True), (-1, True)])
def test_cigar_matches_diagdiff(zdrop, right):
    rng = np.random.default_rng(400 + zdrop + right)
    flag = Flag.RIGHT if right else Flag.NONE
    for _ in range(10):
        tlen = int(rng.integers(2, 280))
        t, qy = refcmp.random_pair(
            rng, tlen, divergence=float(rng.uniform(0, .4)),
            indel=float(rng.uniform(0, .25)),
            with_n=bool(rng.integers(0, 2)))
        qs, ts = encode_dna(qy), encode_dna(t)
        ez, _ = diagdiff.extz2(qs, ts, 5, MAT, 4, 2, w=-1, zdrop=zdrop,
                               flag=flag)
        got, cig = strips_extz_cigar(qs, ts, 5, MAT, 4, 2, zdrop=zdrop,
                                     flag=flag)
        assert cig == ez.cigar
        assert (got["score"], got["max"], got["max_t"], got["max_q"]) == \
            (ez.score, ez.max, ez.max_t, ez.max_q)


def test_gap_costs_and_edges():
    rng = np.random.default_rng(9)
    for q_, e_ in [(6, 1), (2, 2)]:
        for qlen_, tlen_ in [(1, 50), (50, 1), (130, 129), (256, 255)]:
            qs = rng.integers(0, 5, qlen_).astype(np.int8)
            ts = rng.integers(0, 5, tlen_).astype(np.int8)
            L = min(qlen_, tlen_)
            ts[:L] = np.where(rng.random(L) < 0.2, ts[:L], qs[:L])
            ez, _ = diagdiff.extz2(qs, ts, 5, MAT, q_, e_, w=-1, zdrop=60)
            got, cig = strips_extz_cigar(qs, ts, 5, MAT, q_, e_, zdrop=60)
            assert cig == ez.cigar and got["score"] == ez.score


@pytest.mark.parametrize("prm", [(4, 2, 13, 1), (13, 1, 4, 2),
                                 (6, 2, 24, 1)])
def test_extd_cigar_matches_diagdiff(prm):
    from ksw2_tpu.spec.strips_cigar import strips_extd_cigar

    rng = np.random.default_rng(sum(prm) * 3)
    for trial in range(8):
        tlen = int(rng.integers(2, 220))
        t, qy = refcmp.random_pair(
            rng, tlen, divergence=float(rng.uniform(0, .4)),
            indel=float(rng.uniform(0, .25)),
            with_n=bool(rng.integers(0, 2)))
        qs, ts = encode_dna(qy), encode_dna(t)
        zdrop = [-1, 30, 100][trial % 3]
        right = bool(trial % 2)
        flag = Flag.RIGHT if right else Flag.NONE
        ez, _ = diagdiff.extd2(qs, ts, 5, MAT, *prm, w=-1, zdrop=zdrop,
                               flag=flag)
        got, cig = strips_extd_cigar(qs, ts, 5, MAT, *prm, zdrop=zdrop,
                                     flag=flag)
        assert cig == ez.cigar, (prm, trial)
        assert (got["score"], got["max"]) == (ez.score, ez.max)


@pytest.mark.parametrize("fl,jb", [
    (Flag.SPLICE_FOR, 0),
    (Flag.SPLICE_FOR | Flag.SPLICE_FLANK, 0),
    (Flag.SPLICE_REV, 0),
    (Flag.SPLICE_FOR, 5),
])
def test_exts_cigar_matches_diagdiff(fl, jb):
    from ksw2_tpu.spec.strips_cigar import strips_exts_cigar

    smat = simple_mat(5, 1, -2)
    rng = np.random.default_rng(int(fl) + jb)
    for trial in range(8):
        tlen = int(rng.integers(5, 200))
        t, qy = refcmp.random_pair(
            rng, tlen, divergence=float(rng.uniform(0, .35)),
            indel=float(rng.uniform(0, .2)),
            with_n=bool(rng.integers(0, 2)))
        qs, ts = encode_dna(qy), encode_dna(t)
        zdrop = [-1, 40, 150][trial % 3]
        junc = None
        if jb:
            junc = rng.integers(0, 16, len(ts)).astype(np.uint8)
        flag = fl | (Flag.RIGHT if trial % 2 else Flag.NONE)
        ez, _ = diagdiff.exts2(qs, ts, 5, smat, 2, 1, 32, 4, zdrop=zdrop,
                               junc_bonus=jb, flag=flag, junc=junc)
        got, cig = strips_exts_cigar(qs, ts, 5, smat, 2, 1, 32, 4,
                                     zdrop=zdrop, junc_bonus=jb,
                                     flag=flag, junc=junc)
        assert cig == ez.cigar, (fl, jb, trial)
        assert (got["score"], got["max"]) == (ez.score, ez.max)
