"""Spliced (exts) strips-CIGAR kernel vs the byte-exact spec and the
reference binary.

The strips forward in splice mode carries the intron state as a
VERTICAL plane (donor paid at open, acceptor at close, no per-row
decay), streams donor/acceptor site classes as two extra bit-plane
pairs, emits the reference's exts bytes (codes M,E,F,N; 0x20 intron
continuation; NO per-cell clamp) and the 5-state walker prints N ops
(min_intron = long_thres, ksw2_exts2_sse.c:410).
"""
import numpy as np
import pytest

import refcmp
from ksw2_tpu.core.flags import Flag
from ksw2_tpu.core.matrix import encode_dna, simple_mat
from ksw2_tpu.ops.strips_walker import strips_exts_cigar_batch
from ksw2_tpu.spec.strips_cigar import strips_exts_cigar

MATS = simple_mat(5, 1, -2)


def _pairs():
    rng = np.random.default_rng(99)
    pairs = []
    for k in range(4):
        tt = rng.integers(0, 4, 300 + 13 * k).astype(np.int32)
        tt[100:102] = (2, 3)
        tt[220:222] = (0, 2)
        qq = np.concatenate([tt[20:100], tt[222:290]])
        mut = rng.random(qq.shape) < 0.06
        qq = np.where(mut, (qq + rng.integers(1, 4, qq.shape)) % 4,
                      qq).astype(np.int32)
        pairs.append((qq, tt))
    return pairs


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


@pytest.mark.parametrize("flag", [
    Flag.SPLICE_FOR,
    Flag.SPLICE_FOR | Flag.SPLICE_FLANK,
    Flag.NONE,
    Flag.SPLICE_FOR | Flag.RIGHT,
])
def test_exts_strips_matches_spec(flag):
    pairs = _pairs()
    Q, T, ql, tl = _batch(pairs)
    got = strips_exts_cigar_batch(Q, T, ql, tl, 5, MATS, 2, 1, 32, 9,
                                  zdrop=200, flag=flag, interpret=True)
    for p, (qv, tv) in enumerate(pairs):
        ez, cig = strips_exts_cigar(qv, tv, 5, MATS, 2, 1, 32, 9,
                                    zdrop=200, junc_bonus=0, flag=flag)
        g = got[p]
        assert (g.max, g.zdropped, g.max_t, g.max_q, g.mqe, g.mqe_t,
                g.mte, g.mte_q, g.score) == \
            (ez["max"], bool(ez["zdropped"]), ez["max_t"], ez["max_q"],
             ez["mqe"], ez["mqe_t"], ez["mte"], ez["mte_q"],
             ez["score"]), (p, flag)
        assert g.cigar == cig, (p, flag)


@pytest.mark.skipif(not refcmp.have_ref(), reason="reference binary")
def test_exts_strips_vs_reference_binary():
    rng = np.random.default_rng(7)
    n_ok = 0
    for k in range(4):
        L = 160 + 67 * k
        t, qy = refcmp.random_pair(rng, L, divergence=0.12, indel=0.06,
                                   with_n=True)
        for z, r in ((200, False), (-1, False), (100, True)):
            ref = refcmp.run_ref('exts2_sse', t, qy, z=z, right=r)
            flag = Flag.SPLICE_FOR | (Flag.RIGHT if r else Flag.NONE)
            Q = encode_dna(qy)[None, :]
            T = encode_dna(t)[None, :]
            got = strips_exts_cigar_batch(
                Q, T, np.array([len(qy)], np.int32),
                np.array([len(t)], np.int32), 5, MATS, 2, 1, 32, 4,
                zdrop=z, flag=flag, interpret=True)
            assert ref == got[0].tsv_fields(), (k, z, r)
            n_ok += 1
    assert n_ok == 12


def test_scheduler_routes_splice_to_strips(monkeypatch):
    """align_batch_splice's eligible CIGAR buckets ride the fused
    strips route, with parity vs the single-pair exts engine."""
    import ksw2_tpu.ops.strips_walker as sw
    from ksw2_tpu.batch.scheduler import AlignJob, align_batch_splice
    from ksw2_tpu.ops.exts import exts2_device

    calls = []
    real = sw.strips_cigar_fused_call

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(sw, "strips_cigar_fused_call", spy)
    pairs = _pairs()
    jobs = [AlignJob(query=q, target=t) for q, t in pairs]
    ezs = align_batch_splice(jobs, 5, MATS, 2, 1, 32, 9, zdrop=200,
                             flag=Flag.SPLICE_FOR)
    assert calls, "splice strips route did not engage"
    for job, g in zip(jobs, ezs):
        ref, _ = exts2_device(job.query, job.target, 5, MATS, 2, 1, 32,
                              9, zdrop=200, flag=Flag.SPLICE_FOR)
        assert (g.max, g.zdropped, g.max_t, g.max_q,
                g.cigar) == (ref.max, ref.zdropped, ref.max_t,
                             ref.max_q, ref.cigar)


def test_scheduler_routes_splice_scores_to_strips(monkeypatch):
    """SCORE_ONLY splice buckets ride the fused strips score route, with
    ez-field parity vs the single-pair exts engine."""
    import ksw2_tpu.ops.wavefront_strips as ws
    from ksw2_tpu.batch.scheduler import AlignJob, align_batch_splice
    from ksw2_tpu.ops.exts import exts2_device

    calls = []
    real = ws.strips_fused_call

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(ws, "strips_fused_call", spy)
    pairs = _pairs()
    jobs = [AlignJob(query=q, target=t) for q, t in pairs]
    ezs = align_batch_splice(jobs, 5, MATS, 2, 1, 32, 9, zdrop=200,
                             flag=Flag.SPLICE_FOR | Flag.SCORE_ONLY)
    assert calls, "splice score strips route did not engage"
    for job, g in zip(jobs, ezs):
        ref, _ = exts2_device(job.query, job.target, 5, MATS, 2, 1, 32,
                              9, zdrop=200,
                              flag=Flag.SPLICE_FOR | Flag.SCORE_ONLY)
        assert (g.max, g.max_t, g.max_q, g.mqe, g.mqe_t, g.mte, g.mte_q,
                g.score, g.zdropped) == \
            (ref.max, ref.max_t, ref.max_q, ref.mqe, ref.mqe_t, ref.mte,
             ref.mte_q, ref.score, ref.zdropped)


def test_junc_annotations_decline_strips(monkeypatch):
    """Jobs with junction tracks must NOT ride the strips route (the
    2-bit class stream can't carry junc bonuses)."""
    import ksw2_tpu.ops.strips_walker as sw
    from ksw2_tpu.batch.scheduler import AlignJob, align_batch_splice
    from ksw2_tpu.ops.exts import exts2_device

    calls = []
    real = sw.strips_cigar_fused_call

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(sw, "strips_cigar_fused_call", spy)
    pairs = _pairs()[:2]
    jobs = [AlignJob(query=q, target=t) for q, t in pairs]
    juncs = [np.ones(len(t), np.uint8) for _, t in pairs]
    ezs = align_batch_splice(jobs, 5, MATS, 2, 1, 32, 9, zdrop=200,
                             junc_bonus=5, flag=Flag.SPLICE_FOR,
                             juncs=juncs)
    assert not calls, "junc jobs must stay off the strips route"
    for job, jn, g in zip(jobs, juncs, ezs):
        ref, _ = exts2_device(job.query, job.target, 5, MATS, 2, 1, 32,
                              9, zdrop=200, junc_bonus=5,
                              flag=Flag.SPLICE_FOR, junc=jn)
        assert (g.max, g.cigar) == (ref.max, ref.cigar)
