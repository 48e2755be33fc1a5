"""Run-based strips walker vs the byte-exact CIGAR spec.

The walker (ops/strips_walker.py) consumes the skewed byte store row by
row; its (ez fields + CIGAR) must equal spec/strips_cigar's
strips_extz_cigar, whose walk is byte-validated against the compiled
reference.  Covers plain global-ish extensions, Z-dropped starts, and
right-aligned ties.
"""
import numpy as np
import pytest

import refcmp
from ksw2_tpu.core.flags import Flag
from ksw2_tpu.core.matrix import encode_dna, simple_mat
from ksw2_tpu.ops.strips_walker import strips_cigar_align
from ksw2_tpu.spec.strips_cigar import strips_extz_cigar

MAT = simple_mat(5, 2, -4)


def _batch(pairs):
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
    return Q, T, ql, tl


@pytest.mark.parametrize("right,zdrop", [(False, 100), (True, 100),
                                         (False, 25)])
def test_walker_matches_spec(right, zdrop):
    rng = np.random.default_rng(7)
    pairs = []
    for L, div, ind in ((220, 0.25, 0.12), (300, 0.1, 0.05),
                        (150, 0.4, 0.2), (260, 0.55, 0.3)):
        t, qy = refcmp.random_pair(rng, L, divergence=div, indel=ind,
                                   with_n=True)
        pairs.append((encode_dna(qy), encode_dna(t)))
    Q, T, ql, tl = _batch(pairs)
    flag = Flag.RIGHT if right else Flag.NONE
    got = strips_cigar_align(Q, T, ql, tl, 5, MAT, 4, 2, zdrop=zdrop,
                             flag=flag, interpret=True)
    for p, (qv, tv) in enumerate(pairs):
        ez, cig = strips_extz_cigar(qv, tv, 5, MAT, 4, 2, zdrop=zdrop,
                                    flag=flag)
        g = got[p]
        assert (g.max, g.zdropped, g.max_t, g.max_q) == \
            (ez["max"], bool(ez["zdropped"]), ez["max_t"], ez["max_q"]), p
        assert (g.mqe, g.mqe_t, g.mte, g.mte_q, g.score) == \
            (ez["mqe"], ez["mqe_t"], ez["mte"], ez["mte_q"], ez["score"]), p
        assert g.cigar == cig, (p, right, zdrop)


def test_fused_batch_matches_per_pair():
    """strips_cigar_batch (one fused execution: forward + device start
    cells + walkers) must equal the per-pair strips_cigar_align."""
    from ksw2_tpu.ops.strips_walker import strips_cigar_batch

    rng = np.random.default_rng(21)
    pairs = []
    for L, div, ind in ((200, 0.2, 0.1), (330, 0.5, 0.25),
                        (120, 0.08, 0.04)):
        t, qy = refcmp.random_pair(rng, L, divergence=div, indel=ind,
                                   with_n=True)
        pairs.append((encode_dna(qy), encode_dna(t)))
    Q, T, ql, tl = _batch(pairs)
    for flag, zdrop in ((Flag.NONE, 30), (Flag.RIGHT, -1)):
        a = strips_cigar_batch(Q, T, ql, tl, 5, MAT, 4, 2, zdrop=zdrop,
                               flag=flag, interpret=True)
        b = strips_cigar_align(Q, T, ql, tl, 5, MAT, 4, 2, zdrop=zdrop,
                               flag=flag, interpret=True)
        for x, y in zip(a, b):
            assert (x.max, x.zdropped, x.max_t, x.max_q, x.mqe, x.mqe_t,
                    x.mte, x.mte_q, x.score, x.cigar) == \
                   (y.max, y.zdropped, y.max_t, y.max_q, y.mqe, y.mqe_t,
                    y.mte, y.mte_q, y.score, y.cigar)


def test_scheduler_routes_big_cigar_bucket_to_strips(monkeypatch):
    """align_batch's non-batchable one-piece CIGAR buckets must ride the
    fused strips path when eligible, with per-pair parity vs the
    single-pair device engine.  EXTZ_ONLY jobs land in that branch at
    any length, which keeps this test interpret-cheap."""
    import ksw2_tpu.ops.strips_walker as sw
    from ksw2_tpu.batch.scheduler import AlignJob, align_batch
    from ksw2_tpu.ops.extz import extz2_device

    calls = []
    real = sw.strips_cigar_fused_call

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(sw, "strips_cigar_fused_call", spy)
    rng = np.random.default_rng(5)
    jobs = []
    for _ in range(8):     # one bucket: the fused-route cost model
        t, qy = refcmp.random_pair(rng, 250, divergence=0.2, indel=0.0,
                                   with_n=False)
        jobs.append(AlignJob(query=encode_dna(qy), target=encode_dna(t)))
    flag = Flag.EXTZ_ONLY
    ezs = align_batch(jobs, 5, MAT, 4, 2, zdrop=100, end_bonus=10,
                      flag=flag)
    assert calls, "strips CIGAR route did not engage"
    for job, g in zip(jobs, ezs):
        ref, _ = extz2_device(job.query, job.target, 5, MAT, 4, 2,
                              w=-1, zdrop=100, end_bonus=10, flag=flag)
        assert (g.max, g.zdropped, g.mqe, g.mqe_t, g.reach_end,
                g.cigar) == (ref.max, ref.zdropped, ref.mqe, ref.mqe_t,
                             ref.reach_end, ref.cigar)


@pytest.mark.parametrize("right,zdrop,costs", [
    (False, 100, (4, 2, 13, 1)),
    (True, 100, (4, 2, 13, 1)),
    (False, 100, (13, 1, 4, 2)),    # canonicalization swap fires
    (False, -1, (6, 2, 10, 2)),     # e == e2
])
def test_two_piece_walker_matches_spec(right, zdrop, costs):
    """The 5-state walker over the 7-bit extd bytes must equal the
    byte-exact spec (spec/strips_cigar.strips_extd_cigar, itself
    validated vs the compiled reference)."""
    from ksw2_tpu.spec.strips_cigar import strips_extd_cigar

    qq, ee, qq2, ee2 = costs
    rng = np.random.default_rng(17)
    pairs = []
    for L, div, ind in ((220, 0.25, 0.12), (300, 0.1, 0.05),
                        (150, 0.4, 0.2)):
        t, qy = refcmp.random_pair(rng, L, divergence=div, indel=ind,
                                   with_n=True)
        pairs.append((encode_dna(qy), encode_dna(t)))
    Q, T, ql, tl = _batch(pairs)
    flag = Flag.RIGHT if right else Flag.NONE
    got = strips_cigar_align(Q, T, ql, tl, 5, MAT, qq, ee, zdrop=zdrop,
                             flag=flag, interpret=True, two=True,
                             q2=qq2, e2=ee2)
    for p, (qv, tv) in enumerate(pairs):
        ez, cig = strips_extd_cigar(qv, tv, 5, MAT, qq, ee, qq2, ee2,
                                    zdrop=zdrop, flag=flag)
        g = got[p]
        assert (g.max, g.zdropped, g.max_t, g.max_q) == \
            (ez["max"], bool(ez["zdropped"]), ez["max_t"], ez["max_q"]), p
        assert (g.mqe, g.mqe_t, g.mte, g.mte_q, g.score) == \
            (ez["mqe"], ez["mqe_t"], ez["mte"], ez["mte_q"],
             ez["score"]), p
        assert g.cigar == cig, (p, right, zdrop, costs)


def test_two_piece_fused_batch_matches_per_pair():
    from ksw2_tpu.ops.strips_walker import strips_cigar_batch

    rng = np.random.default_rng(33)
    pairs = []
    for L, div, ind in ((200, 0.2, 0.1), (330, 0.5, 0.25),
                        (120, 0.08, 0.04)):
        t, qy = refcmp.random_pair(rng, L, divergence=div, indel=ind,
                                   with_n=True)
        pairs.append((encode_dna(qy), encode_dna(t)))
    Q, T, ql, tl = _batch(pairs)
    for flag, zdrop, (qq, ee, qq2, ee2) in (
            (Flag.NONE, 30, (4, 2, 13, 1)),
            (Flag.RIGHT, -1, (13, 1, 4, 2))):
        a = strips_cigar_batch(Q, T, ql, tl, 5, MAT, qq, ee, zdrop=zdrop,
                               flag=flag, interpret=True, two=True,
                               q2=qq2, e2=ee2)
        b = strips_cigar_align(Q, T, ql, tl, 5, MAT, qq, ee, zdrop=zdrop,
                               flag=flag, interpret=True, two=True,
                               q2=qq2, e2=ee2)
        for x, y in zip(a, b):
            assert (x.max, x.zdropped, x.max_t, x.max_q, x.mqe, x.mqe_t,
                    x.mte, x.mte_q, x.score, x.cigar) == \
                   (y.max, y.zdropped, y.max_t, y.max_q, y.mqe, y.mqe_t,
                    y.mte, y.mte_q, y.score, y.cigar)


def test_scheduler_routes_extd_cigar_bucket_to_strips(monkeypatch):
    """align_batch's two-piece non-batchable buckets must ride the fused
    strips path when eligible, with parity vs the single-pair extd
    engine (EXTZ_ONLY keeps it in that branch at any length)."""
    import ksw2_tpu.ops.strips_walker as sw
    from ksw2_tpu.batch.scheduler import AlignJob, align_batch
    from ksw2_tpu.ops.extd import extd2_device

    calls = []
    real = sw.strips_cigar_fused_call

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(sw, "strips_cigar_fused_call", spy)
    rng = np.random.default_rng(5)
    jobs = []
    for _ in range(8):
        t, qy = refcmp.random_pair(rng, 250, divergence=0.2, indel=0.05,
                                   with_n=False)
        jobs.append(AlignJob(query=encode_dna(qy), target=encode_dna(t)))
    ezs = align_batch(jobs, 5, MAT, 4, 2, 13, 1, zdrop=100, end_bonus=10,
                      flag=Flag.EXTZ_ONLY)
    assert calls, "two-piece strips CIGAR route did not engage"
    for job, g in zip(jobs, ezs):
        ref, _ = extd2_device(job.query, job.target, 5, MAT, 4, 2, 13, 1,
                              w=-1, zdrop=100, end_bonus=10,
                              flag=Flag.EXTZ_ONLY)
        assert (g.max, g.zdropped, g.mqe, g.mqe_t, g.reach_end,
                g.cigar) == (ref.max, ref.zdropped, ref.mqe, ref.mqe_t,
                             ref.reach_end, ref.cigar)


@pytest.mark.skipif(not refcmp.have_ref(), reason="reference binary")
def test_two_piece_walker_vs_reference_binary():
    rng = np.random.default_rng(41)
    n_ok = 0
    for k in range(6):
        L = 150 + 37 * k
        t, qy = refcmp.random_pair(rng, L, divergence=0.2, indel=0.08,
                                   with_n=True)
        for (qq, ee, qq2, ee2), z, r in (((4, 2, 13, 1), 100, False),
                                         ((4, 2, 24, 1), -1, True)):
            ref = refcmp.run_ref('extd2_sse', t, qy, q=qq, e=ee, q2=qq2,
                                 e2=ee2, w=-1, z=z, right=r)
            Q = encode_dna(qy)[None, :]
            T = encode_dna(t)[None, :]
            got = strips_cigar_align(
                Q, T, np.array([len(qy)], np.int32),
                np.array([len(t)], np.int32), 5, MAT, qq, ee, zdrop=z,
                flag=Flag.RIGHT if r else Flag.NONE, interpret=True,
                two=True, q2=qq2, e2=ee2)
            assert ref == got[0].tsv_fields(), (k, z, r)
            n_ok += 1
    assert n_ok == 12


def test_degenerate_scoring_declines_fused_route():
    """-min_sc > 2*(q+e) resets ez with NO cigar in the reference and
    every per-pair engine; the fused route must decline eligibility
    instead of walking from the corner (round-4 advisor finding)."""
    from ksw2_tpu.batch.scheduler import AlignJob, align_batch
    from ksw2_tpu.ops.strips_walker import strips_cigar_eligible

    mat = simple_mat(5, 1, -20)
    ql = np.full(8, 250, np.int32)
    tl = np.full(8, 250, np.int32)
    ws = np.full(8, 500, np.int32)
    assert not strips_cigar_eligible(ql, tl, ws, Flag.EXTZ_ONLY, 5, mat,
                                     100, 4, 2)
    rng = np.random.default_rng(3)
    jobs = []
    for _ in range(8):
        t, qy = refcmp.random_pair(rng, 250, divergence=0.2, indel=0.05,
                                   with_n=False)
        jobs.append(AlignJob(query=encode_dna(qy), target=encode_dna(t)))
    ezs = align_batch(jobs, 5, mat, 4, 2, zdrop=100, flag=Flag.EXTZ_ONLY)
    from ksw2_tpu.core.flags import NEG_INF
    for g in ezs:
        assert g.cigar == [] and g.max == 0 and g.score == NEG_INF


def test_rev_cigar_and_generic_through_scheduler():
    """REV_CIGAR (reversed op order) and GENERIC_SC (full matrix) jobs
    through align_batch must match the single-pair device engine on the
    strips route."""
    from ksw2_tpu.batch.scheduler import AlignJob, align_batch
    from ksw2_tpu.ops.extz import extz2_device

    rng = np.random.default_rng(29)
    jobs = []
    for L in (180, 240, 420):
        t, qy = refcmp.random_pair(rng, L, divergence=0.25, indel=0.1,
                                   with_n=True)
        jobs.append(AlignJob(query=encode_dna(qy), target=encode_dna(t)))
    gmat = np.array(MAT, np.int8).copy()
    gmat[1] = -3                      # asymmetric: forces GENERIC_SC
    for flag, mat in ((Flag.REV_CIGAR, MAT),
                      (Flag.GENERIC_SC, gmat),
                      (Flag.REV_CIGAR | Flag.GENERIC_SC, gmat)):
        ezs = align_batch(jobs, 5, mat, 4, 2, zdrop=100, flag=flag)
        for job, g in zip(jobs, ezs):
            ref, _ = extz2_device(job.query, job.target, 5, mat, 4, 2,
                                  w=-1, zdrop=100, flag=flag)
            assert (g.max, g.score, g.cigar) == \
                (ref.max, ref.score, ref.cigar), int(flag)


def test_per_launch_mode_matches_fused(monkeypatch):
    """KSW2T_CIGAR_FUSE=0 (per-launch jits for low-latency hosts) must
    produce identical results to the fused path."""
    import os

    from ksw2_tpu.batch.scheduler import AlignJob, align_batch

    rng = np.random.default_rng(77)
    jobs = []
    for L in (180, 260, 700):
        t, qy = refcmp.random_pair(rng, L, divergence=0.2, indel=0.08,
                                   with_n=True)
        jobs.append(AlignJob(query=encode_dna(qy), target=encode_dna(t)))
    a = align_batch(jobs, 5, MAT, 4, 2, zdrop=100, flag=Flag.NONE)
    monkeypatch.setenv("KSW2T_CIGAR_FUSE", "0")
    b = align_batch(jobs, 5, MAT, 4, 2, zdrop=100, flag=Flag.NONE)
    for x, y in zip(a, b):
        assert (x.max, x.score, x.cigar) == (y.max, y.score, y.cigar)


def test_walker_multi_strip_insertion_run():
    """A long query insertion spanning a strip boundary exercises the
    vectorized in-row run + the strip-crossing carry."""
    rng = np.random.default_rng(11)
    t = rng.integers(0, 4, 300).astype(np.int32)
    # query = target with a 180 bp insertion at position 140
    ins = rng.integers(0, 4, 180).astype(np.int32)
    qy = np.concatenate([t[:140], ins, t[140:]]).astype(np.int32)
    Q, T, ql, tl = _batch([(qy, t)])
    got = strips_cigar_align(Q, T, ql, tl, 5, MAT, 4, 2, zdrop=-1,
                             interpret=True)
    ez, cig = strips_extz_cigar(qy, t, 5, MAT, 4, 2, zdrop=-1)
    assert got[0].cigar == cig
    assert got[0].max == ez["max"]
    # the run really is there: one insertion op of length >= 170
    lens = [(c >> 4) for c in cig if (c & 0xF) == 1]
    assert lens and max(lens) >= 170
