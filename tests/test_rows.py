"""Row-major batched engine (wavefront_rows) vs the spec engine.

The row engine must reproduce ``ksw_extz2_sse`` byte behavior exactly —
including the per-anti-diagonal Z-drop automaton it replays post-hoc, the
SSE merge-order argmax ties, and the ``mte_q = r - en`` rounding quirk —
for every eligible workload (qlen, tlen <= 128, band never clips).
"""
import numpy as np
import pytest

import refcmp
from ksw2_tpu.core.flags import Flag
from ksw2_tpu.core.matrix import encode_dna, simple_mat
from ksw2_tpu.ops.batch_pallas import unpack_records, FIELD_ORDER
from ksw2_tpu.ops.wavefront_rows import extz_rows_records, rows_eligible
from ksw2_tpu.spec import diagdiff


def _make_batch(seed, B, lo=1, hi=128):
    rng = np.random.default_rng(seed)
    pairs = []
    for _ in range(B):
        tlen = int(rng.integers(lo, hi))
        t, q = refcmp.random_pair(
            rng, tlen, divergence=float(rng.uniform(0, 0.4)),
            indel=float(rng.uniform(0, 0.25)), with_n=bool(rng.integers(0, 2)))
        q = q[:128]
        pairs.append((encode_dna(q), encode_dna(t)))
    Lq = max(len(q) for q, t in pairs)
    Lt = max(len(t) for q, t in pairs)
    Q = np.zeros((B, Lq), np.int32)
    T = np.zeros((B, Lt), np.int32)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    for i, (q, t) in enumerate(pairs):
        Q[i, : len(q)] = q
        T[i, : len(t)] = t
        qlen[i], tlen[i] = len(q), len(t)
    return pairs, Q, T, qlen, tlen


def _run(Q, T, qlen, tlen, mat, q, e, zdrop, flag):
    recs = np.concatenate([np.asarray(p) for p in extz_rows_records(
        Q, T, qlen, tlen, 5, mat, q, e, zdrop=zdrop, flag=flag,
        interpret=True)], axis=0)
    return unpack_records(recs, int(np.asarray(mat)[1:].min()), q, e)


def _check(pairs, out, mat, q, e, zdrop, flag):
    for i, (qs, ts) in enumerate(pairs):
        ez, _ = diagdiff.extz2(qs, ts, 5, mat, q, e, w=-1, zdrop=zdrop,
                               flag=flag)
        got = {k: int(out[k][i]) for k in out}
        want = dict(max=ez.max, max_t=ez.max_t, max_q=ez.max_q, mqe=ez.mqe,
                    mqe_t=ez.mqe_t, mte=ez.mte, mte_q=ez.mte_q,
                    score=ez.score, zdropped=int(ez.zdropped))
        assert got == want, (i, got, want)


@pytest.mark.parametrize("zdrop", [-1, 10, 100])
def test_rows_matches_spec(zdrop):
    B = 10
    pairs, Q, T, qlen, tlen = _make_batch(7 + zdrop, B, lo=1, hi=64)
    mat = simple_mat(5, 2, 4)
    flag = Flag.SCORE_ONLY
    assert rows_eligible(qlen, tlen, np.maximum(qlen, tlen), flag, zdrop,
                         5, mat)
    out = _run(Q, T, qlen, tlen, mat, 4, 2, zdrop, flag)
    _check(pairs, out, mat, 4, 2, zdrop, flag)


def test_rows_tie_breaks_and_drop_heavy():
    # low-complexity sequences force argmax ties every diagonal; a tight
    # zdrop makes most pairs stop mid-matrix, exercising the replayed
    # automaton's stopping diagonal and state cutoffs
    rng = np.random.default_rng(3)
    B = 8
    Q = np.zeros((B, 48), np.int32)
    T = np.zeros((B, 48), np.int32)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    pairs = []
    for i in range(B):
        ql = int(rng.integers(4, 49))
        tl = int(rng.integers(4, 49))
        qs = rng.integers(0, 2, ql)          # {A,C} only: tie city
        head = qs[: min(ql, tl // 2)]
        ts = np.concatenate([head, rng.integers(2, 4, tl - len(head))])[:tl]
        Q[i, :ql] = qs
        T[i, :tl] = ts
        qlen[i], tlen[i] = ql, tl
        pairs.append((qs.astype(np.int8), ts.astype(np.int8)))
    mat = simple_mat(5, 2, 4)
    out = _run(Q, T, qlen, tlen, mat, 4, 2, 8, Flag.SCORE_ONLY)
    _check(pairs, out, mat, 4, 2, 8, Flag.SCORE_ONLY)
    assert out["zdropped"].any()            # the drop path really ran


def test_rows_generic_matrix():
    rng = np.random.default_rng(11)
    mat = np.array([[3, -5, -2, -4, 0],
                    [-5, 3, -4, -2, 0],
                    [-2, -4, 4, -6, 0],
                    [-4, -2, -6, 4, 0],
                    [0, 0, 0, 0, 0]], np.int8).reshape(-1)
    B = 6
    pairs, Q, T, qlen, tlen = _make_batch(13, B, lo=2, hi=50)
    flag = Flag.SCORE_ONLY | Flag.GENERIC_SC
    out = _run(Q, T, qlen, tlen, mat, 5, 3, 40, flag)
    _check(pairs, out, mat, 5, 3, 40, flag)


def test_rows_eligibility_gate():
    mat = simple_mat(5, 2, 4)
    ql = np.array([100], np.int32)
    tl = np.array([100], np.int32)
    ok = np.array([128], np.int32)
    clip = np.array([10], np.int32)
    f = Flag.SCORE_ONLY
    assert rows_eligible(ql, tl, ok, f, 100, 5, mat)
    assert not rows_eligible(ql, tl, clip, f, 100, 5, mat)      # band clips
    assert not rows_eligible(np.array([129], np.int32), tl,
                             np.array([200], np.int32), f, -1, 5, mat)
    assert not rows_eligible(ql, tl, ok, Flag.SCORE_ONLY | Flag.APPROX_MAX,
                             100, 5, mat)
    assert not rows_eligible(ql, tl, ok, Flag.NONE, 100, 5, mat)  # cigar
    assert not rows_eligible(np.array([0], np.int32), tl, ok, f, -1, 5, mat)


def test_tiny_pairs_boundary_regression():
    """1x1/2x2 pairs exercise the r==0 boundary injections.

    Regression for an interpreter-mode miscompile: a scalar jnp.where
    feeding a plane-level select inside the kernels' fori evaluated the
    wrong branch (Mosaic on real TPUs was always correct), so the r==0
    u/v boundary read q instead of 0 and every batch engine scored a 1x1
    mismatch as -8 instead of -4.  The kernels are branch-free at the
    boundaries now; this pins the observable behavior through BOTH short
    engines.
    """
    import ksw2_tpu.ops.wavefront_rows as wr
    from ksw2_tpu.ops.batch_pallas import extz_batch_device

    mat = simple_mat(5, 2, 4)
    cases = [([0], [3]), ([0, 3], [3, 0]), ([0], [0]), ([2], [4]),
             ([0, 1, 2], [3]), ([1], [1, 2, 3])]
    B = len(cases)
    Q = np.zeros((B, 3), np.int32)
    T = np.zeros((B, 3), np.int32)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    for i, (qs, ts) in enumerate(cases):
        Q[i, : len(qs)] = qs
        T[i, : len(ts)] = ts
        qlen[i], tlen[i] = len(qs), len(ts)
    for force_wavefront in (False, True):
        saved = wr.rows_eligible
        if force_wavefront:
            wr.rows_eligible = lambda *a, **k: False
        try:
            out = extz_batch_device(Q, T, qlen, tlen, 5, mat, 4, 2, None,
                                    zdrop=-1, flag=Flag.SCORE_ONLY,
                                    interpret=True)
        finally:
            wr.rows_eligible = saved
        pairs = [(np.asarray(qs, np.int8), np.asarray(ts, np.int8))
                 for qs, ts in cases]
        _check(pairs, out, mat, 4, 2, -1, Flag.SCORE_ONLY)


def test_rows_dispatch_from_batch_records():
    """extz_batch_records routes eligible buckets to the row engine and
    the results stay field-identical to the wavefront engine's."""
    from ksw2_tpu.ops.batch_pallas import extz_batch_device

    B = 12
    pairs, Q, T, qlen, tlen = _make_batch(29, B, lo=1, hi=128)
    mat = simple_mat(5, 2, 4)
    w = np.maximum(qlen, tlen)
    out = extz_batch_device(Q, T, qlen, tlen, 5, mat, 4, 2, w, zdrop=25,
                            flag=Flag.SCORE_ONLY, interpret=True)
    _check(pairs, out, mat, 4, 2, 25, Flag.SCORE_ONLY)
