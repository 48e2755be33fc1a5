"""High-level Aligner API: routing, parity with the underlying engines."""
import numpy as np
import pytest

from ksw2_tpu import Aligner
from ksw2_tpu.core.flags import Flag
from ksw2_tpu.core.matrix import encode_dna, simple_mat
from ksw2_tpu.spec import diagdiff


def _pair(seed, L=90, div=0.15):
    rng = np.random.default_rng(seed)
    q = rng.integers(0, 4, size=L).astype(np.int32)
    t = np.where(rng.random(L) < div,
                 rng.integers(0, 4, size=L), q).astype(np.int32)
    return q, t


def test_extend_one_piece_matches_spec():
    q, t = _pair(1)
    aln = Aligner(a=2, b=4, q=4, e=2, zdrop=100)
    ez = aln.extend(q, t)
    want, _ = diagdiff.extz2(q, t, 5, simple_mat(5, 2, -4), 4, 2,
                             zdrop=100)
    assert (ez.score, ez.max, ez.cigar) == (want.score, want.max,
                                            want.cigar)


def test_extend_two_piece_and_strings():
    q, t = _pair(2)
    aln = Aligner(a=2, b=4, q=4, e=2, q2=13, e2=1)
    qs = "".join("ACGT"[v] for v in q)
    ts = "".join("ACGT"[v] for v in t)
    ez = aln.extend(qs, ts)
    want, _ = diagdiff.extd2(q, t, 5, simple_mat(5, 2, -4), 4, 2, 13, 1)
    assert (ez.score, ez.cigar) == (want.score, want.cigar)


def test_generic_matrix_autodetected():
    rng = np.random.default_rng(3)
    mat = rng.integers(-5, 4, size=(5, 5)).astype(np.int8)
    np.fill_diagonal(mat, 2)
    aln = Aligner(mat=mat, q=4, e=2)
    assert aln.flag & Flag.GENERIC_SC
    aln2 = Aligner(mat=simple_mat(5, 2, -4), q=4, e=2)
    assert not (aln2.flag & Flag.GENERIC_SC)
    q, t = _pair(4, L=60)
    ez = aln.extend(q, t)
    want, _ = diagdiff.extz2(q, t, 5, mat.reshape(-1), 4, 2,
                             flag=Flag.GENERIC_SC)
    assert (ez.score, ez.cigar) == (want.score, want.cigar)


def test_extend_batch_and_global():
    rng = np.random.default_rng(5)
    pairs = [_pair(10 + i, L=int(rng.integers(40, 120))) for i in range(9)]
    aln = Aligner(a=2, b=4, q=4, e=2, zdrop=100, flag=Flag.SCORE_ONLY)
    ezs = aln.extend_batch(pairs)
    assert len(ezs) == 9
    for (q, t), ez in zip(pairs, ezs):
        want, _ = diagdiff.extz2(q, t, 5, simple_mat(5, 2, -4), 4, 2,
                                 zdrop=100, flag=Flag.SCORE_ONLY)
        assert ez.max == want.max and ez.score == want.score

    q, t = pairs[0]
    g = Aligner(a=2, b=4, q=4, e=2).global_align(q, t)
    from ksw2_tpu.spec.diagdiff import gg2_sse
    score, cig, _ = gg2_sse(q, t, 5, simple_mat(5, 2, -4), 4, 2)
    assert (g.score, g.cigar) == (score, cig)


def test_splice_mode():
    rng = np.random.default_rng(6)
    t = rng.integers(0, 4, 200).astype(np.int32)
    t[60:62] = (2, 3)
    t[139:141] = (0, 2)
    q = np.concatenate([t[20:60], t[141:180]]).astype(np.int32)
    aln = Aligner(a=1, b=2, q=2, e=1, q2=32, splice=True, noncan=9,
                  zdrop=200)
    ez = aln.extend(q, t)
    want, _ = diagdiff.exts2(q, t, 5, simple_mat(5, 1, -2), 2, 1, 32, 9,
                             zdrop=200)
    assert (ez.score, ez.cigar) == (want.score, want.cigar)


def test_bad_params_raise():
    with pytest.raises(ValueError):
        Aligner(q2=13)          # two-piece needs both q2 and e2
    with pytest.raises(ValueError):
        Aligner(splice=True)    # splice needs q2


def test_run_fn_guard_raises():
    """run_fn is only valid for one-piece SCORE_ONLY configurations; any
    other combination must fail loudly, never silently return extz-cost
    scores (ADVICE r2: api.py run_fn routing)."""
    pairs = [_pair(30)]
    fake_run = object()
    with pytest.raises(ValueError):   # two-piece cost model
        Aligner(q2=13, e2=1, flag=Flag.SCORE_ONLY).extend_batch(
            pairs, run_fn=fake_run)
    with pytest.raises(ValueError):   # CIGARs requested
        Aligner().extend_batch(pairs, run_fn=fake_run)
    with pytest.raises(ValueError):   # splice cost model
        Aligner(q2=32, splice=True, flag=Flag.SCORE_ONLY).extend_batch(
            pairs, run_fn=fake_run)
    with pytest.raises(ValueError):   # juncs without splice
        Aligner(flag=Flag.SCORE_ONLY).extend_batch(
            pairs, juncs=[np.zeros(90, np.uint8)])


def test_global_align_full_ez_contract():
    """global_align fills every ksw_extz_t field from the global corner
    (the reference gg calls return a bare int, ksw2.h:85-92)."""
    q, t = _pair(7, L=80)
    ez = Aligner(a=2, b=4, q=4, e=2).global_align(q, t)
    assert ez.max == ez.score and ez.mqe == ez.score and ez.mte == ez.score
    assert (ez.max_t, ez.max_q) == (len(t) - 1, len(q) - 1)
    assert (ez.mqe_t, ez.mte_q) == (len(t) - 1, len(q) - 1)
    assert ez.reach_end and not ez.zdropped


def test_extend_batch_juncs_matches_single():
    """Batch splice jobs with junction tracks must score like the
    per-pair extend(junc=...) calls (ADVICE r2: juncs plumbing)."""
    rng = np.random.default_rng(8)
    aln = Aligner(a=1, b=2, q=2, e=1, q2=32, splice=True, noncan=9,
                  junc_bonus=7, zdrop=200)
    pairs, juncs = [], []
    for i in range(5):
        t = rng.integers(0, 4, int(rng.integers(80, 180))).astype(np.int32)
        q = t[10:-10].copy()
        pairs.append((q, t))
        if i % 2 == 0:
            juncs.append(rng.integers(0, 16, len(t)).astype(np.uint8))
        else:
            juncs.append(None)
    ezs = aln.extend_batch(pairs, juncs=juncs)
    for (q, t), jn, ez in zip(pairs, juncs, ezs):
        want = aln.extend(q, t, junc=jn)
        assert (ez.score, ez.max, ez.cigar) == (want.score, want.max,
                                                want.cigar)


def test_extend_batch_mesh_cigars_match_local():
    """Aligner.extend_batch(mesh=...) == the local scheduler, CIGARs incl."""
    import refcmp
    from ksw2_tpu.api import Aligner
    from ksw2_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(23)
    pairs = []
    for _ in range(13):
        tl = int(rng.integers(30, 160))
        t, q = refcmp.random_pair(rng, tl, divergence=0.2, indel=0.1)
        pairs.append((q, t))
    al = Aligner(a=2, b=4, q=4, e=2, zdrop=100)
    sh = al.extend_batch(pairs, mesh=make_mesh(8))
    lo = al.extend_batch(pairs)
    assert len(sh) == len(lo)
    for i, (a_, b_) in enumerate(zip(sh, lo)):
        assert a_.tsv_fields() == b_.tsv_fields(), i
        assert a_.cigar == b_.cigar, i


def test_extend_batch_mesh_guards():
    import pytest
    from ksw2_tpu.api import Aligner
    from ksw2_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    with pytest.raises(ValueError):
        Aligner(a=2, b=4, q=4, e=2, q2=13, e2=1).extend_batch(
            [("ACGT", "ACGT")], mesh=mesh)
    with pytest.raises(ValueError):
        Aligner(a=2, b=4, q=4, e=2).extend_batch(
            [("ACGT", "ACGT")], mesh=mesh, run_fn=lambda *a: None)


def test_extend_batch_async_matches_sync():
    """Aligner.extend_batch_async handles equal the synchronous path,
    for plain, two-piece, and splice configurations."""
    import refcmp
    from ksw2_tpu import Aligner

    rng = np.random.default_rng(61)
    pairs = []
    for L in (150, 300, 520):
        t, q = refcmp.random_pair(rng, L, divergence=0.2, indel=0.08)
        pairs.append((q, t))
    for kw in ({}, {"q2": 13, "e2": 1},
               {"splice": True, "q2": 32, "noncan": 9}):
        al = Aligner(zdrop=100, **kw)
        want = al.extend_batch(pairs)
        hs = [al.extend_batch_async(pairs) for _ in range(2)]
        for h in hs:
            got = h.result()
            for a, b in zip(want, got):
                assert a.tsv_fields() == b.tsv_fields()
                assert a.cigar == b.cigar
