"""Non-power-of-two sublane packing (P = 3,5,6,7).

The batched engines pack one pair per P consecutive sublane rows; P used
to be restricted to {1,2,4,8}.  The group reductions (ops/group_reduce)
are exact for any P, which packs up to 1.6x more pairs per launch for
intermediate target lengths / band widths.  These tests pin parity of the
odd-P layouts against the spec engines.
"""
import numpy as np
import pytest

import refcmp
from ksw2_tpu.core.flags import Flag
from ksw2_tpu.core.matrix import encode_dna, simple_mat
from ksw2_tpu.spec import diagdiff


def _mk(rng, B, tlen, lmax):
    pairs = []
    for _ in range(B):
        t, q = refcmp.random_pair(rng, tlen, divergence=0.2, indel=0.08)
        pairs.append((encode_dna(q)[:lmax], encode_dna(t)[:lmax]))
    Lq = max(len(q) for q, t in pairs)
    Lt = max(len(t) for q, t in pairs)
    Q = np.zeros((B, Lq), np.int32)
    T = np.zeros((B, Lt), np.int32)
    qlen = np.zeros(B, np.int32)
    tlen_ = np.zeros(B, np.int32)
    for i, (q, t) in enumerate(pairs):
        Q[i, : len(q)] = q
        T[i, : len(t)] = t
        qlen[i], tlen_[i] = len(q), len(t)
    return pairs, Q, T, qlen, tlen_


@pytest.mark.parametrize("tlen,P", [(300, 3), (580, 5), (830, 7)])
def test_batch_extz_odd_p(tlen, P):
    from ksw2_tpu.ops.batch_pallas import extz_batch_align
    rng = np.random.default_rng(tlen)
    pairs, Q, T, qlen, tlen_ = _mk(rng, 4, tlen, P * 128)
    assert (T.shape[1] + 127) // 128 == P
    mat = simple_mat(5, 2, 4)
    ezs = extz_batch_align(Q, T, qlen, tlen_, 5, mat, 4, 2, zdrop=100,
                           interpret=True)
    for i, (q, t) in enumerate(pairs):
        want, _ = diagdiff.extz2(q, t, 5, mat, 4, 2, zdrop=100)
        assert ezs[i].tsv_fields() == want.tsv_fields(), i


@pytest.mark.parametrize("tlen,P,flag", [
    (300, 3, Flag.SCORE_ONLY),
    (580, 5, Flag.SCORE_ONLY | Flag.APPROX_MAX | Flag.APPROX_DROP),
])
def test_batch_extz_scores_odd_p(tlen, P, flag):
    """Score-only engine: approx path exercises the exact odd-P group sum."""
    from ksw2_tpu.ops.batch_pallas import extz_batch_device
    rng = np.random.default_rng(tlen + 1)
    pairs, Q, T, qlen, tlen_ = _mk(rng, 4, tlen, P * 128)
    assert (T.shape[1] + 127) // 128 == P
    mat = simple_mat(5, 2, 4)
    out = extz_batch_device(Q, T, qlen, tlen_, 5, mat, 4, 2, zdrop=100,
                            flag=flag, interpret=True)
    for i, (q, t) in enumerate(pairs):
        want, _ = diagdiff.extz2(q, t, 5, mat, 4, 2, zdrop=100, flag=flag)
        got = [int(out[k][i]) for k in ("score", "max", "max_t", "max_q",
                                        "mqe", "mte")]
        assert got == [want.score, want.max, want.max_t, want.max_q,
                       want.mqe, want.mte], i


def test_batch_extd_odd_p():
    from ksw2_tpu.ops.batch_pallas import extd_batch_align
    rng = np.random.default_rng(7)
    pairs, Q, T, qlen, tlen_ = _mk(rng, 4, 300, 3 * 128)
    mat = simple_mat(5, 2, 4)
    ezs = extd_batch_align(Q, T, qlen, tlen_, 5, mat, 4, 2, 13, 1,
                           zdrop=100, interpret=True)
    for i, (q, t) in enumerate(pairs):
        want, _ = diagdiff.extd2(q, t, 5, mat, 4, 2, 13, 1, zdrop=100)
        assert ezs[i].tsv_fields() == want.tsv_fields(), i


@pytest.mark.parametrize("w,P", [(250, 3), (550, 5)])
def test_band_extz_odd_p(w, P):
    """Band engines at odd P: w in (128(P-1)-64, 128P-64] picks P rows."""
    from ksw2_tpu.ops.band_batch import (_pick_p, extz_band_batch_align,
                                         extz_band_batch_device)
    assert _pick_p(w) == P
    rng = np.random.default_rng(w)
    pairs, Q, T, qlen, tlen_ = _mk(rng, 4, 700, 720)
    mat = simple_mat(5, 2, 4)
    wv = np.full(4, w, np.int32)
    ezs = extz_band_batch_align(Q, T, qlen, tlen_, 5, mat, 4, 2, wv,
                                zdrop=100, interpret=True)
    out = extz_band_batch_device(
        Q, T, qlen, tlen_, 5, mat, 4, 2, wv, zdrop=100,
        flag=Flag.SCORE_ONLY | Flag.APPROX_MAX | Flag.APPROX_DROP,
        interpret=True)
    for i, (q, t) in enumerate(pairs):
        want, _ = diagdiff.extz2(q, t, 5, mat, 4, 2, w=w, zdrop=100)
        assert ezs[i].tsv_fields() == want.tsv_fields(), i
        wanta, _ = diagdiff.extz2(
            q, t, 5, mat, 4, 2, w=w, zdrop=100,
            flag=Flag.SCORE_ONLY | Flag.APPROX_MAX | Flag.APPROX_DROP)
        got = [int(out[k][i]) for k in ("score", "max", "max_t", "max_q")]
        assert got == [wanta.score, wanta.max, wanta.max_t, wanta.max_q], i


def test_band_extd_odd_p():
    from ksw2_tpu.ops.band_batch import extd_band_batch_align
    rng = np.random.default_rng(11)
    pairs, Q, T, qlen, tlen_ = _mk(rng, 4, 700, 720)
    mat = simple_mat(5, 2, 4)
    wv = np.full(4, 250, np.int32)
    ezs = extd_band_batch_align(Q, T, qlen, tlen_, 5, mat, 4, 2, 13, 1, wv,
                                zdrop=100, interpret=True)
    for i, (q, t) in enumerate(pairs):
        want, _ = diagdiff.extd2(q, t, 5, mat, 4, 2, 13, 1, w=250, zdrop=100)
        assert ezs[i].tsv_fields() == want.tsv_fields(), i


@pytest.mark.parametrize("tlen,P", [(1200, 10), (1500, 12)])
def test_batch_extz_high_p(tlen, P):
    """P in 9..12: targets beyond 1024 ride the batched engines (the
    13-bit argmax key holds through 5*12*128+2 = 7682 < 8192)."""
    from ksw2_tpu.ops.batch_pallas import extz_batch_align
    rng = np.random.default_rng(tlen)
    pairs, Q, T, qlen, tlen_ = _mk(rng, 3, tlen, P * 128)
    assert (T.shape[1] + 127) // 128 == P
    mat = simple_mat(5, 2, 4)
    ezs = extz_batch_align(Q, T, qlen, tlen_, 5, mat, 4, 2, zdrop=150,
                           interpret=True)
    for i, (q, t) in enumerate(pairs):
        want, _ = diagdiff.extz2(q, t, 5, mat, 4, 2, zdrop=150)
        assert ezs[i].tsv_fields() == want.tsv_fields(), i


def test_band_extz_high_p():
    """Band cap beyond 960: w=1000 picks P=9 (w <= 128P - 64)."""
    from ksw2_tpu.ops.band_batch import _pick_p, extz_band_batch_device
    assert _pick_p(1000) == 9 and _pick_p(1400) == 12
    rng = np.random.default_rng(5)
    pairs, Q, T, qlen, tlen_ = _mk(rng, 3, 1600, 1700)
    mat = simple_mat(5, 2, 4)
    wv = np.full(3, 1000, np.int32)
    out = extz_band_batch_device(Q, T, qlen, tlen_, 5, mat, 4, 2, wv,
                                 zdrop=150, flag=Flag.SCORE_ONLY,
                                 interpret=True)
    for i, (q, t) in enumerate(pairs):
        want, _ = diagdiff.extz2(q, t, 5, mat, 4, 2, w=1000, zdrop=150,
                                 flag=Flag.SCORE_ONLY)
        got = [int(out[k][i]) for k in ("score", "max", "max_t", "max_q",
                                        "mqe", "mte")]
        assert got == [want.score, want.max, want.max_t, want.max_q,
                       want.mqe, want.mte], i


@pytest.mark.parametrize("flag", [
    Flag.SCORE_ONLY,
    Flag.SCORE_ONLY | Flag.APPROX_MAX | Flag.APPROX_DROP,
    Flag.NONE,                                  # CIGAR mode
])
def test_batch_exts_odd_p(flag):
    """Spliced engine at P=5: the any-P group reductions (incl. the approx
    walk's packed psum) and the splice profiles at odd packing."""
    from ksw2_tpu.ops.batch_pallas import exts_batch_align
    rng = np.random.default_rng(55)
    pairs, Q, T, qlen, tlen_ = _mk(rng, 4, 580, 5 * 128)
    assert (T.shape[1] + 127) // 128 == 5
    mat = simple_mat(5, 1, 2)
    ezs = exts_batch_align(Q, T, qlen, tlen_, 5, mat, 2, 1, 32, 9,
                           zdrop=100, flag=flag | Flag.SPLICE_FOR,
                           interpret=True)
    for i, (q, t) in enumerate(pairs):
        want, _ = diagdiff.exts2(q, t, 5, mat, 2, 1, 32, 9, zdrop=100,
                                 flag=flag | Flag.SPLICE_FOR)
        assert ezs[i].tsv_fields() == want.tsv_fields(), i
        if not (flag & Flag.SCORE_ONLY):
            assert ezs[i].cigar == want.cigar, i


@pytest.mark.parametrize("tlen,P", [(1600, 13), (2980, 24)])
def test_batch_extz_scores_p_beyond_12(tlen, P):
    """P in 13..24 (targets to 3072): the packed Z-drop key scales KB with
    P and clamps deep-negative H to the widest representable value, so the
    score range check moves to the host wrapper."""
    from ksw2_tpu.ops.batch_pallas import extz_batch_device
    rng = np.random.default_rng(tlen)
    pairs, Q, T, qlen, tlen_ = _mk(rng, 2, tlen, P * 128)
    assert (T.shape[1] + 127) // 128 == P
    mat = simple_mat(5, 2, 4)
    out = extz_batch_device(Q, T, qlen, tlen_, 5, mat, 4, 2, zdrop=150,
                            flag=Flag.SCORE_ONLY, interpret=True)
    for i, (q, t) in enumerate(pairs):
        want, _ = diagdiff.extz2(q, t, 5, mat, 4, 2, zdrop=150,
                                 flag=Flag.SCORE_ONLY)
        got = [int(out[k][i]) for k in ("score", "max", "max_t", "max_q",
                                        "mqe", "mte", "zdropped")]
        assert got == [want.score, want.max, want.max_t, want.max_q,
                       want.mqe, want.mte, int(want.zdropped)], i


def test_batch_extz_p_beyond_12_range_guard():
    """Scores too large for the packed argmax at high P raise cleanly."""
    from ksw2_tpu.ops.batch_pallas import extz_batch_records
    mat = simple_mat(5, 120, 4)      # mat_max * tlen ~ 350k >> 2^31/KB
    Q = np.zeros((2, 3000), np.int32)
    T = np.zeros((2, 3000), np.int32)
    L = np.full(2, 3000, np.int32)
    with pytest.raises(ValueError):
        extz_batch_records(Q, T, L, L, 5, mat, 4, 2, zdrop=100,
                           flag=Flag.SCORE_ONLY, interpret=True)


def test_batch_extd_scores_p_beyond_12():
    """Two-piece engine at P=14 (targets past 1536)."""
    from ksw2_tpu.ops.batch_pallas import extd_batch_device
    rng = np.random.default_rng(77)
    pairs, Q, T, qlen, tlen_ = _mk(rng, 2, 1750, 14 * 128)
    assert (T.shape[1] + 127) // 128 == 14
    mat = simple_mat(5, 2, 4)
    out = extd_batch_device(Q, T, qlen, tlen_, 5, mat, 4, 2, 13, 1,
                            zdrop=150, flag=Flag.SCORE_ONLY, interpret=True)
    for i, (q, t) in enumerate(pairs):
        want, _ = diagdiff.extd2(q, t, 5, mat, 4, 2, 13, 1, zdrop=150,
                                 flag=Flag.SCORE_ONLY)
        got = [int(out[k][i]) for k in ("score", "max", "max_t", "max_q",
                                        "mqe", "mte", "zdropped")]
        assert got == [want.score, want.max, want.max_t, want.max_q,
                       want.mqe, want.mte, int(want.zdropped)], i
