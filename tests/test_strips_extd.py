"""Two-piece (extd) strips engine: spec vs diagdiff, kernel vs spec.

The strip-tiled two-piece engine must reproduce ``ksw_extd2_sse`` byte
behavior for every eligible workload — including the canonicalization
swap, the pre-swap H-seed quirk, the long_thres/long_diff boundary
columns, and the e2 Z-drop slope.  Kernel runs under the Pallas
interpreter on CPU.
"""
import numpy as np
import pytest

import refcmp
from ksw2_tpu.core.flags import Flag
from ksw2_tpu.core.matrix import encode_dna, simple_mat
from ksw2_tpu.ops.batch_pallas import unpack_records
from ksw2_tpu.ops.wavefront_strips import (strips_extd_eligible,
                                           strips_extd_records)
from ksw2_tpu.spec import diagdiff
from ksw2_tpu.spec.strips_extd import strips_extd

MAT = simple_mat(5, 2, -4)
PARAMS = [(4, 2, 13, 1), (13, 1, 4, 2), (6, 2, 24, 1), (2, 1, 2, 1),
          (5, 3, 9, 2)]


def _want(qs, ts, prm, zdrop, flag=Flag.SCORE_ONLY):
    q_, e_, q2_, e2_ = prm
    ez, _ = diagdiff.extd2(qs, ts, 5, MAT, q_, e_, q2_, e2_, w=-1,
                           zdrop=zdrop, flag=flag)
    return dict(max=ez.max, max_t=ez.max_t, max_q=ez.max_q, mqe=ez.mqe,
                mqe_t=ez.mqe_t, mte=ez.mte, mte_q=ez.mte_q,
                score=ez.score, zdropped=int(ez.zdropped))


@pytest.mark.parametrize("prm", PARAMS)
def test_spec_matches_diagdiff(prm):
    rng = np.random.default_rng(sum(prm))
    for trial in range(12):
        tlen = int(rng.integers(2, 300))
        t, qy = refcmp.random_pair(
            rng, tlen, divergence=float(rng.uniform(0, .4)),
            indel=float(rng.uniform(0, .25)),
            with_n=bool(rng.integers(0, 2)))
        qs, ts = encode_dna(qy), encode_dna(t)
        zdrop = [-1, 30, 100][trial % 3]
        got = strips_extd(qs, ts, 5, MAT, *prm, zdrop=zdrop)
        assert got == _want(qs, ts, prm, zdrop), (prm, zdrop, trial)


def _run_kernel(pairs, prm, zdrop):
    q_, e_, q2_, e2_ = prm
    B = len(pairs)
    Lq = max(len(q) for q, t in pairs)
    Lt = max(len(t) for q, t in pairs)
    Q = np.zeros((B, Lq), np.int32)
    T = np.zeros((B, Lt), np.int32)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    for i, (qv, tv) in enumerate(pairs):
        Q[i, :len(qv)] = qv
        T[i, :len(tv)] = tv
        qlen[i], tlen[i] = len(qv), len(tv)
    w = np.maximum(qlen, tlen)
    assert strips_extd_eligible(qlen, tlen, w, Flag.SCORE_ONLY, 5, MAT,
                                zdrop, q_, e_, q2_, e2_)
    recs = np.concatenate([np.asarray(p) for p in strips_extd_records(
        Q, T, qlen, tlen, 5, MAT, q_, e_, q2_, e2_, zdrop=zdrop,
        flag=Flag.SCORE_ONLY, interpret=True)], axis=0)
    qc, ec = (q_, e_) if q_ + e_ <= q2_ + e2_ else (q2_, e2_)
    return unpack_records(recs, int(np.asarray(MAT).reshape(-1)[1:].min()),
                          qc, ec)


@pytest.mark.parametrize("prm,zdrop", [
    ((4, 2, 13, 1), 100), ((4, 2, 13, 1), -1),
    ((13, 1, 4, 2), 100),                    # swap + pre-swap seed quirk
    ((6, 2, 24, 1), 30),
])
def test_kernel_matches_spec(prm, zdrop):
    rng = np.random.default_rng(17)
    pairs = []
    for _ in range(5):
        tlen = int(rng.integers(2, 420))
        t, qy = refcmp.random_pair(
            rng, tlen, divergence=float(rng.uniform(0, .35)),
            indel=float(rng.uniform(0, .2)),
            with_n=bool(rng.integers(0, 2)))
        pairs.append((encode_dna(qy), encode_dna(t)))
    out = _run_kernel(pairs, prm, zdrop)
    for i, (qs, ts) in enumerate(pairs):
        got = {k: int(out[k][i]) for k in out}
        assert got == _want(qs, ts, prm, zdrop), (i, prm, zdrop)


def test_kernel_multistrip_long():
    # multi-strip + boundary-stream crossings on a ~900 bp pair
    rng = np.random.default_rng(23)
    t, qy = refcmp.random_pair(rng, 900, divergence=0.2, indel=0.15)
    pairs = [(encode_dna(qy), encode_dna(t))]
    for prm in [(4, 2, 13, 1), (13, 1, 4, 2)]:
        out = _run_kernel(pairs, prm, 200)
        got = {k: int(out[k][0]) for k in out}
        assert got == _want(*pairs[0], prm, 200), prm


def test_eligibility_gate():
    ql = np.array([500], np.int32)
    tl = np.array([500], np.int32)
    w = np.maximum(ql, tl)
    ok = strips_extd_eligible(ql, tl, w, Flag.SCORE_ONLY, 5, MAT, 100,
                              4, 2, 13, 1)
    assert ok
    # e < e2 post-swap -> the chain-decoupling lemma fails -> ineligible
    assert not strips_extd_eligible(ql, tl, w, Flag.SCORE_ONLY, 5, MAT,
                                    100, 4, 1, 5, 4)
    # banded -> ineligible
    wn = np.array([10], np.int32)
    assert not strips_extd_eligible(ql, tl, wn, Flag.SCORE_ONLY, 5, MAT,
                                    100, 4, 2, 13, 1)


def test_scheduler2_routes_to_strips():
    from ksw2_tpu.batch.scheduler import AlignJob, align_batch_scores2
    from ksw2_tpu.ops import wavefront_strips as ws

    rng = np.random.default_rng(31)
    jobs, raw = [], []
    for _ in range(8):
        tlen = int(rng.integers(150, 600))
        t, qy = refcmp.random_pair(rng, tlen, divergence=0.15, indel=0.06)
        raw.append((encode_dna(qy), encode_dna(t)))
        jobs.append(AlignJob(raw[-1][0], raw[-1][1]))
    calls = []
    orig = ws.strips_prep

    def spy(*a, **k):
        if k.get("two"):
            calls.append(len(a[0]))
        return orig(*a, **k)

    ws.strips_prep = spy
    try:
        res = align_batch_scores2(jobs, 5, MAT, 4, 2, 13, 1, zdrop=100,
                                  flag=Flag.SCORE_ONLY)
    finally:
        ws.strips_prep = orig
    assert calls, "eligible extd buckets must route to the strips engine"
    for (qs, ts), ez in zip(raw, res):
        want = _want(qs, ts, (4, 2, 13, 1), 100)
        got = dict(max=ez.max, max_t=ez.max_t, max_q=ez.max_q, mqe=ez.mqe,
                   mqe_t=ez.mqe_t, mte=ez.mte, mte_q=ez.mte_q,
                   score=ez.score, zdropped=int(ez.zdropped))
        assert got == want
