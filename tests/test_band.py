"""Band-relative batched engine (long banded pairs) vs the spec engine."""
import numpy as np
import pytest

import refcmp
from ksw2_tpu.core.flags import Flag
from ksw2_tpu.core.matrix import encode_dna, simple_mat
from ksw2_tpu.ops.band_batch import extz_band_batch_device
from ksw2_tpu.spec import diagdiff

MAT = simple_mat(5, 2, 4)


def _run_and_compare(pairs, wv, zdrop):
    B = len(pairs)
    Lq = max(len(q) for q, t in pairs)
    Lt = max(len(t) for q, t in pairs)
    Q = np.zeros((B, Lq), np.int32)
    T = np.zeros((B, Lt), np.int32)
    qlen = np.array([len(q) for q, t in pairs], np.int32)
    tlen = np.array([len(t) for q, t in pairs], np.int32)
    for i, (q, t) in enumerate(pairs):
        Q[i, : len(q)] = q
        T[i, : len(t)] = t
    out = extz_band_batch_device(Q, T, qlen, tlen, 5, MAT, 4, 2, wv,
                                 zdrop=zdrop, flag=Flag.SCORE_ONLY,
                                 interpret=True)
    for i, (q, t) in enumerate(pairs):
        want, _ = diagdiff.extz2(q, t, 5, MAT, 4, 2, w=int(wv[i]),
                                 zdrop=zdrop, flag=Flag.SCORE_ONLY)
        got = {k: int(out[k][i]) for k in out}
        exp = dict(score=want.score, max=want.max, max_t=want.max_t,
                   max_q=want.max_q, mqe=want.mqe, mqe_t=want.mqe_t,
                   mte=want.mte, mte_q=want.mte_q,
                   zdropped=int(want.zdropped))
        assert got == exp, (i, int(wv[i]), got, exp)


def _mk(rng, B, tlo, thi, div, ind, asym=0, with_n=False):
    pairs = []
    for _ in range(B):
        tl = int(rng.integers(tlo, thi))
        t, q = refcmp.random_pair(rng, tl, divergence=div, indel=ind,
                                  with_n=with_n)
        if asym:
            q = q[:max(10, len(q) - int(rng.integers(0, asym)))]
        pairs.append((encode_dna(q), encode_dna(t)))
    return pairs


@pytest.mark.parametrize("zdrop", [-1, 100])
def test_band_matches_spec(zdrop):
    rng = np.random.default_rng(5 + zdrop)
    pairs = _mk(rng, 5, 150, 450, 0.12, 0.08)
    wv = rng.integers(10, 64, len(pairs)).astype(np.int32)
    _run_and_compare(pairs, wv, zdrop)


@pytest.mark.parametrize("wlo,whi,tlo,thi", [
    (70, 192, 300, 700),     # P = 2
    (200, 448, 500, 900),    # P = 4
])
def test_band_multirow(wlo, whi, tlo, thi):
    rng = np.random.default_rng(whi)
    pairs = _mk(rng, 3, tlo, thi, 0.12, 0.06)
    wv = rng.integers(wlo, whi, len(pairs)).astype(np.int32)
    _run_and_compare(pairs, wv, 100)


def test_band_drops_divergent():
    rng = np.random.default_rng(14)
    pairs = _mk(rng, 5, 250, 550, 0.35, 0.15)
    wv = rng.integers(10, 120, len(pairs)).astype(np.int32)
    _run_and_compare(pairs, wv, 25)


def test_band_asymmetric_band_empty():
    rng = np.random.default_rng(15)
    pairs = _mk(rng, 5, 250, 550, 0.2, 0.1, asym=180)
    wv = rng.integers(10, 120, len(pairs)).astype(np.int32)
    _run_and_compare(pairs, wv, 30)


def test_band_tiny_pairs_and_n():
    rng = np.random.default_rng(17)
    pairs = _mk(rng, 6, 20, 200, 0.25, 0.12, with_n=True)
    wv = rng.integers(1, 40, len(pairs)).astype(np.int32)
    _run_and_compare(pairs, wv, 40)


def _run_and_compare_extd(pairs, wv, zdrop, costs=(4, 2, 13, 1)):
    from ksw2_tpu.ops.band_batch import extd_band_batch_device
    q_, e_, q2_, e2_ = costs
    B = len(pairs)
    Lq = max(len(q) for q, t in pairs)
    Lt = max(len(t) for q, t in pairs)
    Q = np.zeros((B, Lq), np.int32)
    T = np.zeros((B, Lt), np.int32)
    qlen = np.array([len(q) for q, t in pairs], np.int32)
    tlen = np.array([len(t) for q, t in pairs], np.int32)
    for i, (q, t) in enumerate(pairs):
        Q[i, : len(q)] = q
        T[i, : len(t)] = t
    out = extd_band_batch_device(Q, T, qlen, tlen, 5, MAT, q_, e_, q2_, e2_,
                                 wv, zdrop=zdrop, flag=Flag.SCORE_ONLY,
                                 interpret=True)
    for i, (q, t) in enumerate(pairs):
        want, _ = diagdiff.extd2(q, t, 5, MAT, q_, e_, q2_, e2_,
                                 w=int(wv[i]), zdrop=zdrop,
                                 flag=Flag.SCORE_ONLY)
        got = {k: int(out[k][i]) for k in out}
        exp = dict(score=want.score, max=want.max, max_t=want.max_t,
                   max_q=want.max_q, mqe=want.mqe, mqe_t=want.mqe_t,
                   mte=want.mte, mte_q=want.mte_q,
                   zdropped=int(want.zdropped))
        assert got == exp, (i, int(wv[i]), got, exp)


@pytest.mark.parametrize("zdrop", [-1, 100])
def test_band_extd_matches_spec(zdrop):
    rng = np.random.default_rng(21 + zdrop)
    pairs = _mk(rng, 4, 150, 500, 0.12, 0.08)
    wv = rng.integers(10, 64, len(pairs)).astype(np.int32)
    _run_and_compare_extd(pairs, wv, zdrop)


def test_band_extd_multirow_drops():
    rng = np.random.default_rng(25)
    pairs = _mk(rng, 3, 300, 800, 0.3, 0.12)
    wv = rng.integers(70, 192, len(pairs)).astype(np.int32)
    _run_and_compare_extd(pairs, wv, 30)


def test_band_extd_pre_swap_costs():
    # q+e > q2+e2 exercises the reference's canonicalization swap and the
    # pre-swap H seed quirk (ksw2_extd2_sse.c:68/78)
    rng = np.random.default_rng(28)
    pairs = _mk(rng, 3, 150, 450, 0.2, 0.1)
    wv = rng.integers(10, 100, len(pairs)).astype(np.int32)
    _run_and_compare_extd(pairs, wv, 60, costs=(13, 1, 4, 2))


@pytest.mark.parametrize("zdrop,flag", [
    (-1, Flag.SCORE_ONLY | Flag.APPROX_MAX),
    (-1, Flag.SCORE_ONLY | Flag.APPROX_MAX | Flag.APPROX_DROP),
    (40, Flag.SCORE_ONLY | Flag.APPROX_MAX | Flag.APPROX_DROP),
])
def test_band_approx_matches_spec(zdrop, flag):
    rng = np.random.default_rng(41 + zdrop)
    pairs = _mk(rng, 4, 150, 500, 0.2, 0.1)
    wv = rng.integers(10, 64, len(pairs)).astype(np.int32)
    B = len(pairs)
    Lq = max(len(q) for q, t in pairs)
    Lt = max(len(t) for q, t in pairs)
    Q = np.zeros((B, Lq), np.int32)
    T = np.zeros((B, Lt), np.int32)
    qlen = np.array([len(q) for q, t in pairs], np.int32)
    tlen = np.array([len(t) for q, t in pairs], np.int32)
    for i, (q, t) in enumerate(pairs):
        Q[i, : len(q)] = q
        T[i, : len(t)] = t
    out = extz_band_batch_device(Q, T, qlen, tlen, 5, MAT, 4, 2, wv,
                                 zdrop=zdrop, flag=flag, interpret=True)
    from ksw2_tpu.ops.band_batch import extd_band_batch_device
    outd = extd_band_batch_device(Q, T, qlen, tlen, 5, MAT, 4, 2, 13, 1, wv,
                                  zdrop=zdrop, flag=flag, interpret=True)
    for i, (q, t) in enumerate(pairs):
        want, _ = diagdiff.extz2(q, t, 5, MAT, 4, 2, w=int(wv[i]),
                                 zdrop=zdrop, flag=flag)
        wantd, _ = diagdiff.extd2(q, t, 5, MAT, 4, 2, 13, 1, w=int(wv[i]),
                                  zdrop=zdrop, flag=flag)
        for o, wz in ((out, want), (outd, wantd)):
            got = [int(o[k][i]) for k in ("score", "max", "max_t", "max_q")]
            assert got == [wz.score, wz.max, wz.max_t, wz.max_q], (i, got)
            assert bool(o["zdropped"][i]) == wz.zdropped, i


@pytest.mark.parametrize("flag", [
    Flag.SCORE_ONLY,
    Flag.SCORE_ONLY | Flag.APPROX_MAX | Flag.APPROX_DROP,
])
def test_band_via_scheduler(flag):
    from ksw2_tpu.batch.scheduler import AlignJob, align_batch
    rng = np.random.default_rng(31)
    pairs = _mk(rng, 3, 560, 800, 0.15, 0.08)
    jobs = [AlignJob(q, t, w=int(rng.integers(20, 120)))
            for q, t in pairs]
    ezs = align_batch(jobs, 5, MAT, 4, 2, q2=13, e2=1, zdrop=100, flag=flag)
    for job, ez in zip(jobs, ezs):
        want, _ = diagdiff.extd2(job.query, job.target, 5, MAT, 4, 2, 13, 1,
                                 w=job.w, zdrop=100, flag=flag)
        assert ez.tsv_fields() == want.tsv_fields()


@pytest.mark.parametrize("zdrop,flag", [
    (-1, Flag.NONE), (60, Flag.NONE), (60, Flag.RIGHT),
    (60, Flag.APPROX_MAX | Flag.APPROX_DROP),
])
def test_band_cigar_matches_spec(zdrop, flag):
    """Band-relative CIGAR planes + native backtrack with store_off=org."""
    from ksw2_tpu.ops.band_batch import extz_band_batch_align
    rng = np.random.default_rng(51 + zdrop)
    pairs = _mk(rng, 4, 150, 450, 0.15, 0.08)
    wv = rng.integers(10, 64, len(pairs)).astype(np.int32)
    B = len(pairs)
    Lq = max(len(q) for q, t in pairs)
    Lt = max(len(t) for q, t in pairs)
    Q = np.zeros((B, Lq), np.int32)
    T = np.zeros((B, Lt), np.int32)
    qlen = np.array([len(q) for q, t in pairs], np.int32)
    tlen = np.array([len(t) for q, t in pairs], np.int32)
    for i, (q, t) in enumerate(pairs):
        Q[i, : len(q)] = q
        T[i, : len(t)] = t
    ezs = extz_band_batch_align(Q, T, qlen, tlen, 5, MAT, 4, 2, wv,
                                zdrop=zdrop, flag=flag, interpret=True)
    for i, (q, t) in enumerate(pairs):
        want, _ = diagdiff.extz2(q, t, 5, MAT, 4, 2, w=int(wv[i]),
                                 zdrop=zdrop, flag=flag)
        assert ezs[i].tsv_fields() == want.tsv_fields(), i


@pytest.mark.parametrize("flag", [Flag.NONE, Flag.EQX])
def test_band_extd_cigar_matches_spec(flag):
    from ksw2_tpu.ops.band_batch import extd_band_batch_align
    rng = np.random.default_rng(77)
    pairs = _mk(rng, 3, 200, 600, 0.2, 0.1)
    wv = rng.integers(30, 180, len(pairs)).astype(np.int32)
    B = len(pairs)
    Lq = max(len(q) for q, t in pairs)
    Lt = max(len(t) for q, t in pairs)
    Q = np.zeros((B, Lq), np.int32)
    T = np.zeros((B, Lt), np.int32)
    qlen = np.array([len(q) for q, t in pairs], np.int32)
    tlen = np.array([len(t) for q, t in pairs], np.int32)
    for i, (q, t) in enumerate(pairs):
        Q[i, : len(q)] = q
        T[i, : len(t)] = t
    ezs = extd_band_batch_align(Q, T, qlen, tlen, 5, MAT, 4, 2, 13, 1, wv,
                                zdrop=60, flag=flag, interpret=True)
    for i, (q, t) in enumerate(pairs):
        want, _ = diagdiff.extd2(q, t, 5, MAT, 4, 2, 13, 1, w=int(wv[i]),
                                 zdrop=60, flag=flag)
        assert ezs[i].tsv_fields() == want.tsv_fields(), i


def test_band_cigar_via_scheduler():
    from ksw2_tpu.batch.scheduler import AlignJob, align_batch
    rng = np.random.default_rng(33)
    pairs = _mk(rng, 3, 560, 800, 0.15, 0.08)
    jobs = [AlignJob(q, t, w=int(rng.integers(20, 120)))
            for q, t in pairs]
    for q2e2 in (None, (13, 1)):
        kw = dict(q2=q2e2[0], e2=q2e2[1]) if q2e2 else {}
        ezs = align_batch(jobs, 5, MAT, 4, 2, zdrop=100, **kw)
        for job, ez in zip(jobs, ezs):
            if q2e2:
                want, _ = diagdiff.extd2(job.query, job.target, 5, MAT,
                                         4, 2, 13, 1, w=job.w, zdrop=100)
            else:
                want, _ = diagdiff.extz2(job.query, job.target, 5, MAT,
                                         4, 2, w=job.w, zdrop=100)
            assert ez.tsv_fields() == want.tsv_fields()


GMAT = np.array([[3, -2, -4, -3, 0],
                 [-3, 2, -2, -4, 0],
                 [-4, -2, 4, -1, 0],
                 [-2, -3, -1, 2, 0],
                 [0, 0, 0, 0, 0]], np.int8).reshape(-1)


@pytest.mark.parametrize("zdrop", [-1, 50])
def test_band_generic_sc_matches_spec(zdrop):
    """GENERIC_SC through the band engines (in-kernel matrix gather)."""
    from ksw2_tpu.ops.band_batch import (extd_band_batch_align,
                                         extz_band_batch_align)
    rng = np.random.default_rng(61 + zdrop)
    pairs = _mk(rng, 3, 150, 400, 0.25, 0.12, with_n=True)
    wv = rng.integers(10, 80, len(pairs)).astype(np.int32)
    B = len(pairs)
    Lq = max(len(q) for q, t in pairs)
    Lt = max(len(t) for q, t in pairs)
    Q = np.zeros((B, Lq), np.int32)
    T = np.zeros((B, Lt), np.int32)
    qlen = np.array([len(q) for q, t in pairs], np.int32)
    tlen = np.array([len(t) for q, t in pairs], np.int32)
    for i, (q, t) in enumerate(pairs):
        Q[i, : len(q)] = q
        T[i, : len(t)] = t
    e1 = extz_band_batch_align(Q, T, qlen, tlen, 5, GMAT, 4, 2, wv,
                               zdrop=zdrop, flag=Flag.GENERIC_SC,
                               interpret=True)
    e2 = extd_band_batch_align(Q, T, qlen, tlen, 5, GMAT, 4, 2, 13, 1, wv,
                               zdrop=zdrop, flag=Flag.GENERIC_SC,
                               interpret=True)
    for i, (q, t) in enumerate(pairs):
        w1, _ = diagdiff.extz2(q, t, 5, GMAT, 4, 2, w=int(wv[i]),
                               zdrop=zdrop, flag=Flag.GENERIC_SC)
        w2, _ = diagdiff.extd2(q, t, 5, GMAT, 4, 2, 13, 1, w=int(wv[i]),
                               zdrop=zdrop, flag=Flag.GENERIC_SC)
        assert e1[i].tsv_fields() == w1.tsv_fields(), i
        assert e2[i].tsv_fields() == w2.tsv_fields(), i


def test_band_cigar_walker_trim():
    """Zdropped pairs end their walks far below n_diag: the device walker
    trims dead trailing diagonal blocks (band_batch.device_walk_cigars) and
    the CIGAR must stay byte-identical."""
    from ksw2_tpu.ops.band_batch import extz_band_batch_align
    rng = np.random.default_rng(77)
    t1, q1 = refcmp.random_pair(rng, 3000, divergence=0.1, indel=0.03)
    t2, _ = refcmp.random_pair(rng, 3000, divergence=0.1, indel=0.03)
    q = encode_dna(q1[:1500] + t2[:1500])   # divergent tail: z-drop midway
    t = encode_dna(t1)
    B = 2
    Q = np.zeros((B, len(q)), np.int32)
    T = np.zeros((B, len(t)), np.int32)
    Q[:] = q
    T[:] = t
    qlen = np.full(B, len(q), np.int32)
    tlen = np.full(B, len(t), np.int32)
    wv = np.full(B, 200, np.int32)
    ezs = extz_band_batch_align(Q, T, qlen, tlen, 5, MAT, 4, 2, wv,
                                zdrop=100, interpret=True)
    want, _ = diagdiff.extz2(q, t, 5, MAT, 4, 2, w=200, zdrop=100)
    assert want.zdropped
    for i in range(B):
        assert ezs[i].tsv_fields() == want.tsv_fields(), i
        assert ezs[i].cigar == want.cigar, i
