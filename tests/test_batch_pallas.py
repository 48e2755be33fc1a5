"""Batched Pallas engine (one pair per row) vs the spec engine."""
import numpy as np
import pytest

import refcmp
from ksw2_tpu.core.flags import Flag
from ksw2_tpu.core.matrix import encode_dna, simple_mat
from ksw2_tpu.ops.batch_pallas import extz_batch_device
from ksw2_tpu.spec import diagdiff


def _make_batch(seed, B):
    rng = np.random.default_rng(seed)
    pairs = []
    for _ in range(B):
        tlen = int(rng.integers(8, 128))
        t, q = refcmp.random_pair(
            rng, tlen, divergence=float(rng.uniform(0, 0.4)),
            indel=float(rng.uniform(0, 0.2)), with_n=bool(rng.integers(0, 2)))
        pairs.append((encode_dna(q), encode_dna(t)))
    Lq = max(len(q) for q, t in pairs)
    Q = np.zeros((B, Lq), np.int32)
    T = np.zeros((B, 128), np.int32)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    for i, (q, t) in enumerate(pairs):
        Q[i, : len(q)] = q
        T[i, : len(t)] = t
        qlen[i], tlen[i] = len(q), len(t)
    return pairs, Q, T, qlen, tlen


@pytest.mark.parametrize("zdrop", [-1, 25])
@pytest.mark.parametrize("seed", [3, 11])
def test_batch_matches_spec(zdrop, seed):
    B = 12
    pairs, Q, T, qlen, tlen = _make_batch(seed, B)
    mat = simple_mat(5, 2, 4)
    out = extz_batch_device(Q, T, qlen, tlen, 5, mat, 4, 2, zdrop=zdrop,
                            flag=Flag.SCORE_ONLY, interpret=True)
    for i, (q, t) in enumerate(pairs):
        ez, _ = diagdiff.extz2(q, t, 5, mat, 4, 2, w=-1, zdrop=zdrop,
                               flag=Flag.SCORE_ONLY)
        got = {k: int(out[k][i]) for k in out}
        assert got["score"] == ez.score, (i, got, ez.tsv_fields())
        assert (got["max"], got["max_t"], got["max_q"]) == \
            (ez.max, ez.max_t, ez.max_q), i
        assert (got["mqe"], got["mqe_t"]) == (ez.mqe, ez.mqe_t), i
        assert (got["mte"], got["mte_q"]) == (ez.mte, ez.mte_q), i
        assert bool(got["zdropped"]) == ez.zdropped, i


def test_batch_banded_and_mixed_lengths():
    B = 10
    rng = np.random.default_rng(77)
    pairs, Q, T, qlen, tlen = _make_batch(5, B)
    w = rng.integers(4, 40, B).astype(np.int32)
    mat = simple_mat(5, 2, 4)
    out = extz_batch_device(Q, T, qlen, tlen, 5, mat, 4, 2, w=w, zdrop=30,
                            flag=Flag.SCORE_ONLY, interpret=True)
    for i, (q, t) in enumerate(pairs):
        ez, _ = diagdiff.extz2(q, t, 5, mat, 4, 2, w=int(w[i]), zdrop=30,
                               flag=Flag.SCORE_ONLY)
        assert int(out["score"][i]) == ez.score, i
        assert int(out["max"][i]) == ez.max, i
        assert bool(out["zdropped"][i]) == ez.zdropped, i


@pytest.mark.parametrize("zdrop,flag", [(-1, Flag.NONE), (25, Flag.NONE),
                                        (25, Flag.RIGHT)])
def test_batch_align_cigars_match_spec(zdrop, flag):
    B = 10
    pairs, Q, T, qlen, tlen = _make_batch(21, B)
    mat = simple_mat(5, 2, 4)
    from ksw2_tpu.ops.batch_pallas import extz_batch_align
    ezs = extz_batch_align(Q, T, qlen, tlen, 5, mat, 4, 2, zdrop=zdrop,
                           flag=flag, interpret=True)
    for i, (q, t) in enumerate(pairs):
        want, _ = diagdiff.extz2(q, t, 5, mat, 4, 2, w=-1, zdrop=zdrop,
                                 flag=flag)
        assert ezs[i].tsv_fields() == want.tsv_fields(), i


def test_batch_align_tiny_pairs():
    """Small pads (n_diag < 256) must not break the device walker's top_k."""
    rng = np.random.default_rng(5)
    B = 4
    pairs = []
    for _ in range(B):
        t, q = refcmp.random_pair(rng, 50, divergence=0.1, indel=0.05)
        pairs.append((encode_dna(q), encode_dna(t)))
    Q = np.zeros((B, 64), np.int32)
    T = np.zeros((B, 64), np.int32)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    for i, (q, t) in enumerate(pairs):
        Q[i, : len(q)] = q
        T[i, : len(t)] = t
        qlen[i], tlen[i] = len(q), len(t)
    mat = simple_mat(5, 2, 4)
    from ksw2_tpu.ops.batch_pallas import extz_batch_align
    ezs = extz_batch_align(Q, T, qlen, tlen, 5, mat, 4, 2, interpret=True)
    for i, (q, t) in enumerate(pairs):
        want, _ = diagdiff.extz2(q, t, 5, mat, 4, 2)
        assert ezs[i].tsv_fields() == want.tsv_fields(), i


@pytest.mark.parametrize("zdrop", [-1, 25])
def test_extd_batch_scores_match_spec(zdrop):
    B = 10
    pairs, Q, T, qlen, tlen = _make_batch(31, B)
    mat = simple_mat(5, 2, 4)
    from ksw2_tpu.ops.batch_pallas import extd_batch_device
    out = extd_batch_device(Q, T, qlen, tlen, 5, mat, 4, 2, 13, 1,
                            zdrop=zdrop, flag=Flag.SCORE_ONLY, interpret=True)
    for i, (q, t) in enumerate(pairs):
        want, _ = diagdiff.extd2(q, t, 5, mat, 4, 2, 13, 1, w=-1,
                                 zdrop=zdrop, flag=Flag.SCORE_ONLY)
        assert int(out["score"][i]) == want.score, i
        assert int(out["max"][i]) == want.max, i
        assert int(out["mte"][i]) == want.mte, i
        assert bool(out["zdropped"][i]) == want.zdropped, i


@pytest.mark.parametrize("flag", [Flag.NONE, Flag.EQX])
def test_extd_batch_align_cigars_match_spec(flag):
    B = 8
    pairs, Q, T, qlen, tlen = _make_batch(41, B)
    mat = simple_mat(5, 2, 4)
    from ksw2_tpu.ops.batch_pallas import extd_batch_align
    ezs = extd_batch_align(Q, T, qlen, tlen, 5, mat, 4, 2, 13, 1,
                           zdrop=25, flag=flag, interpret=True)
    for i, (q, t) in enumerate(pairs):
        want, _ = diagdiff.extd2(q, t, 5, mat, 4, 2, 13, 1, w=-1,
                                 zdrop=25, flag=flag)
        assert ezs[i].tsv_fields() == want.tsv_fields(), i


@pytest.mark.parametrize("zdrop,flag", [
    (-1, Flag.SCORE_ONLY | Flag.APPROX_MAX),
    (25, Flag.SCORE_ONLY | Flag.APPROX_MAX | Flag.APPROX_DROP),
    (-1, Flag.SCORE_ONLY | Flag.APPROX_MAX | Flag.APPROX_DROP),
])
def test_batch_approx_matches_spec(zdrop, flag):
    B = 10
    pairs, Q, T, qlen, tlen = _make_batch(51, B)
    mat = simple_mat(5, 2, 4)
    out = extz_batch_device(Q, T, qlen, tlen, 5, mat, 4, 2, zdrop=zdrop,
                            flag=flag, interpret=True)
    for i, (q, t) in enumerate(pairs):
        want, _ = diagdiff.extz2(q, t, 5, mat, 4, 2, w=-1, zdrop=zdrop,
                                 flag=flag)
        got = [int(out[k][i]) for k in ("score", "max", "max_t", "max_q",
                                        "mqe", "mte")]
        assert got == [want.score, want.max, want.max_t, want.max_q,
                       want.mqe, want.mte], i
        assert bool(out["zdropped"][i]) == want.zdropped, i


@pytest.mark.parametrize("zdrop,flag", [
    (-1, Flag.SPLICE_FOR),
    (25, Flag.SPLICE_FOR | Flag.SPLICE_FLANK),
    (25, Flag.SPLICE_FOR | Flag.SCORE_ONLY),
])
def test_exts_batch_matches_spec(zdrop, flag):
    B = 8
    pairs, Q, T, qlen, tlen = _make_batch(61, B)
    smat = simple_mat(5, 1, -2)
    from ksw2_tpu.ops.batch_pallas import exts_batch_align
    ezs = exts_batch_align(Q, T, qlen, tlen, 5, smat, 2, 1, 32, 4,
                           zdrop=zdrop, flag=flag, interpret=True)
    for i, (q, t) in enumerate(pairs):
        want, _ = diagdiff.exts2(q, t, 5, smat, 2, 1, 32, 4, zdrop=zdrop,
                                 junc_bonus=0, flag=flag)
        assert ezs[i].tsv_fields() == want.tsv_fields(), i


@pytest.mark.parametrize("Lt,zdrop", [(256, -1), (256, 60), (512, 60)])
def test_multirow_pairs_match_spec(Lt, zdrop):
    """tlen in (128, 512]: P sublane rows per pair."""
    rng = np.random.default_rng(Lt + zdrop)
    B = 6
    pairs = []
    for _ in range(B):
        tlen = int(rng.integers(Lt // 2, Lt))
        t, q = refcmp.random_pair(
            rng, tlen, divergence=float(rng.uniform(0, 0.35)),
            indel=float(rng.uniform(0, 0.2)), with_n=bool(rng.integers(0, 2)))
        pairs.append((encode_dna(q), encode_dna(t)))
    Lq = max(len(q) for q, t in pairs)
    Q = np.zeros((B, Lq), np.int32)
    T = np.zeros((B, Lt), np.int32)
    qlen = np.array([len(q) for q, t in pairs], np.int32)
    tlen = np.array([len(t) for q, t in pairs], np.int32)
    for i, (q, t) in enumerate(pairs):
        Q[i, : len(q)] = q
        T[i, : len(t)] = t
    mat = simple_mat(5, 2, 4)
    out = extz_batch_device(Q, T, qlen, tlen, 5, mat, 4, 2, zdrop=zdrop,
                            flag=Flag.SCORE_ONLY, interpret=True)
    for i, (q, t) in enumerate(pairs):
        want, _ = diagdiff.extz2(q, t, 5, mat, 4, 2, w=-1, zdrop=zdrop,
                                 flag=Flag.SCORE_ONLY)
        got = [int(out[k][i]) for k in ("score", "max", "max_t", "max_q",
                                        "mqe", "mte")]
        assert got == [want.score, want.max, want.max_t, want.max_q,
                       want.mqe, want.mte], i
        assert bool(out["zdropped"][i]) == want.zdropped, i


@pytest.mark.parametrize("Lt", [256, 512])
def test_extd_multirow_pairs_match_spec(Lt):
    rng = np.random.default_rng(Lt)
    B = 6
    pairs = []
    for _ in range(B):
        tlen = int(rng.integers(Lt // 2, Lt))
        t, q = refcmp.random_pair(
            rng, tlen, divergence=float(rng.uniform(0, 0.3)),
            indel=float(rng.uniform(0, 0.15)))
        pairs.append((encode_dna(q), encode_dna(t)))
    Lq = max(len(q) for q, t in pairs)
    Q = np.zeros((B, Lq), np.int32)
    T = np.zeros((B, Lt), np.int32)
    qlen = np.array([len(q) for q, t in pairs], np.int32)
    tlen = np.array([len(t) for q, t in pairs], np.int32)
    for i, (q, t) in enumerate(pairs):
        Q[i, : len(q)] = q
        T[i, : len(t)] = t
    mat = simple_mat(5, 2, 4)
    from ksw2_tpu.ops.batch_pallas import extd_batch_device
    out = extd_batch_device(Q, T, qlen, tlen, 5, mat, 4, 2, 13, 1,
                            zdrop=80, flag=Flag.SCORE_ONLY, interpret=True)
    for i, (q, t) in enumerate(pairs):
        want, _ = diagdiff.extd2(q, t, 5, mat, 4, 2, 13, 1, w=-1, zdrop=80,
                                 flag=Flag.SCORE_ONLY)
        assert int(out["score"][i]) == want.score, i
        assert int(out["max"][i]) == want.max, i
        assert bool(out["zdropped"][i]) == want.zdropped, i


@pytest.mark.parametrize("Lt", [256, 512])
def test_multirow_cigars_match_spec(Lt):
    rng = np.random.default_rng(Lt + 7)
    B = 5
    pairs = []
    for _ in range(B):
        tlen = int(rng.integers(Lt // 2, Lt))
        t, q = refcmp.random_pair(rng, tlen, divergence=0.3, indel=0.15)
        pairs.append((encode_dna(q), encode_dna(t)))
    Lq = max(len(q) for q, t in pairs)
    Q = np.zeros((B, Lq), np.int32)
    T = np.zeros((B, Lt), np.int32)
    qlen = np.array([len(q) for q, t in pairs], np.int32)
    tlen = np.array([len(t) for q, t in pairs], np.int32)
    for i, (q, t) in enumerate(pairs):
        Q[i, : len(q)] = q
        T[i, : len(t)] = t
    mat = simple_mat(5, 2, 4)
    from ksw2_tpu.ops.batch_pallas import extd_batch_align, extz_batch_align
    ez1 = extz_batch_align(Q, T, qlen, tlen, 5, mat, 4, 2, zdrop=80,
                           interpret=True)
    ez2 = extd_batch_align(Q, T, qlen, tlen, 5, mat, 4, 2, 13, 1, zdrop=80,
                           flag=Flag.EQX, interpret=True)
    for i, (q, t) in enumerate(pairs):
        w1, _ = diagdiff.extz2(q, t, 5, mat, 4, 2, w=-1, zdrop=80)
        w2, _ = diagdiff.extd2(q, t, 5, mat, 4, 2, 13, 1, w=-1, zdrop=80,
                               flag=Flag.EQX)
        assert ez1[i].tsv_fields() == w1.tsv_fields(), i
        assert ez2[i].tsv_fields() == w2.tsv_fields(), i


@pytest.mark.parametrize("zdrop,flag", [
    (-1, Flag.SCORE_ONLY | Flag.APPROX_MAX),
    (30, Flag.SCORE_ONLY | Flag.APPROX_MAX | Flag.APPROX_DROP),
    (-1, Flag.SCORE_ONLY | Flag.APPROX_MAX | Flag.APPROX_DROP),
])
def test_extd_batch_approx_matches_spec(zdrop, flag):
    B = 8
    pairs, Q, T, qlen, tlen = _make_batch(71, B)
    mat = simple_mat(5, 2, 4)
    from ksw2_tpu.ops.batch_pallas import extd_batch_device
    out = extd_batch_device(Q, T, qlen, tlen, 5, mat, 4, 2, 13, 1,
                            zdrop=zdrop, flag=flag, interpret=True)
    for i, (q, t) in enumerate(pairs):
        want, _ = diagdiff.extd2(q, t, 5, mat, 4, 2, 13, 1, w=-1,
                                 zdrop=zdrop, flag=flag)
        got = [int(out[k][i]) for k in ("score", "max", "max_t", "max_q",
                                        "mqe", "mte")]
        assert got == [want.score, want.max, want.max_t, want.max_q,
                       want.mqe, want.mte], i
        assert bool(out["zdropped"][i]) == want.zdropped, i


@pytest.mark.parametrize("Lt", [256, 512])
def test_exts_multirow_pairs_match_spec(Lt):
    rng = np.random.default_rng(Lt + 3)
    B = 4
    pairs = []
    for _ in range(B):
        tlen = int(rng.integers(Lt // 2, Lt))
        t, q = refcmp.random_pair(rng, tlen, divergence=0.25, indel=0.12)
        pairs.append((encode_dna(q), encode_dna(t)))
    Lq = max(len(q) for q, t in pairs)
    Q = np.zeros((B, Lq), np.int32)
    T = np.zeros((B, Lt), np.int32)
    qlen = np.array([len(q) for q, t in pairs], np.int32)
    tlen = np.array([len(t) for q, t in pairs], np.int32)
    for i, (q, t) in enumerate(pairs):
        Q[i, : len(q)] = q
        T[i, : len(t)] = t
    smat = simple_mat(5, 1, -2)
    from ksw2_tpu.ops.batch_pallas import exts_batch_align
    ezs = exts_batch_align(Q, T, qlen, tlen, 5, smat, 2, 1, 32, 4, zdrop=60,
                           flag=Flag.SPLICE_FOR, interpret=True)
    for i, (q, t) in enumerate(pairs):
        want, _ = diagdiff.exts2(q, t, 5, smat, 2, 1, 32, 4, zdrop=60,
                                 junc_bonus=0, flag=Flag.SPLICE_FOR)
        assert ezs[i].tsv_fields() == want.tsv_fields(), i


@pytest.mark.parametrize("zdrop,flag", [
    (-1, Flag.SPLICE_FOR | Flag.SCORE_ONLY | Flag.APPROX_MAX),
    (30, Flag.SPLICE_FOR | Flag.SCORE_ONLY | Flag.APPROX_MAX
         | Flag.APPROX_DROP),
    # zdrop < 0 + APPROX_DROP: ksw_apply_zdrop still updates the running
    # max (regression: the max planes must exist without a live zdrop)
    (-1, Flag.SPLICE_FOR | Flag.SCORE_ONLY | Flag.APPROX_MAX
         | Flag.APPROX_DROP),
])
def test_exts_batch_approx_matches_spec(zdrop, flag):
    B = 8
    pairs, Q, T, qlen, tlen = _make_batch(81, B)
    smat = simple_mat(5, 1, -2)
    from ksw2_tpu.ops.batch_pallas import exts_batch_align
    ezs = exts_batch_align(Q, T, qlen, tlen, 5, smat, 2, 1, 32, 4,
                           zdrop=zdrop, flag=flag, interpret=True)
    for i, (q, t) in enumerate(pairs):
        want, _ = diagdiff.exts2(q, t, 5, smat, 2, 1, 32, 4, zdrop=zdrop,
                                 junc_bonus=0, flag=flag)
        assert ezs[i].tsv_fields() == want.tsv_fields(), i


def test_exts_batch_approx_multirow():
    rng = np.random.default_rng(7)
    B = 4
    pairs = []
    for _ in range(B):
        tlen = int(rng.integers(150, 300))
        t, q = refcmp.random_pair(rng, tlen, divergence=0.25, indel=0.12)
        pairs.append((encode_dna(q), encode_dna(t)))
    Lq = max(len(q) for q, t in pairs)
    Q = np.zeros((B, Lq), np.int32)
    T = np.zeros((B, 300), np.int32)
    qlen = np.array([len(q) for q, t in pairs], np.int32)
    tlen = np.array([len(t) for q, t in pairs], np.int32)
    for i, (q, t) in enumerate(pairs):
        Q[i, : len(q)] = q
        T[i, : len(t)] = t
    smat = simple_mat(5, 1, -2)
    flag = (Flag.SPLICE_FOR | Flag.SCORE_ONLY | Flag.APPROX_MAX
            | Flag.APPROX_DROP)
    from ksw2_tpu.ops.batch_pallas import exts_batch_align
    ezs = exts_batch_align(Q, T, qlen, tlen, 5, smat, 2, 1, 32, 4, zdrop=60,
                           flag=flag, interpret=True)
    for i, (q, t) in enumerate(pairs):
        want, _ = diagdiff.exts2(q, t, 5, smat, 2, 1, 32, 4, zdrop=60,
                                 junc_bonus=0, flag=flag)
        assert ezs[i].tsv_fields() == want.tsv_fields(), i


GMAT = np.array([[3, -2, -4, -3, 0],
                 [-3, 2, -2, -4, 0],
                 [-4, -2, 4, -1, 0],
                 [-2, -3, -1, 2, 0],
                 [0, 0, 0, 0, 0]], np.int8).reshape(-1)


@pytest.mark.parametrize("zdrop", [-1, 25])
def test_generic_sc_batches_match_spec(zdrop):
    """KSW_EZ_GENERIC_SC: profile-plane gather in all three batch engines."""
    from ksw2_tpu.ops.batch_pallas import (extd_batch_align,
                                           extd_batch_device,
                                           exts_batch_align,
                                           extz_batch_align)
    B = 6
    pairs, Q, T, qlen, tlen = _make_batch(91 + zdrop, B)
    fs = Flag.SCORE_ONLY | Flag.GENERIC_SC
    out = extz_batch_device(Q, T, qlen, tlen, 5, GMAT, 4, 2, zdrop=zdrop,
                            flag=fs, interpret=True)
    outd = extd_batch_device(Q, T, qlen, tlen, 5, GMAT, 4, 2, 13, 1,
                             zdrop=zdrop, flag=fs, interpret=True)
    ez_z = extz_batch_align(Q, T, qlen, tlen, 5, GMAT, 4, 2, zdrop=zdrop,
                            flag=Flag.GENERIC_SC, interpret=True)
    ez_d = extd_batch_align(Q, T, qlen, tlen, 5, GMAT, 4, 2, 13, 1,
                            zdrop=zdrop, flag=Flag.GENERIC_SC, interpret=True)
    fl = Flag.SPLICE_FOR | Flag.GENERIC_SC
    ez_s = exts_batch_align(Q, T, qlen, tlen, 5, GMAT, 2, 1, 32, 4,
                            zdrop=zdrop, flag=fl, interpret=True)
    for i, (q, t) in enumerate(pairs):
        wz, _ = diagdiff.extz2(q, t, 5, GMAT, 4, 2, w=-1, zdrop=zdrop,
                               flag=fs)
        wd, _ = diagdiff.extd2(q, t, 5, GMAT, 4, 2, 13, 1, w=-1,
                               zdrop=zdrop, flag=fs)
        assert int(out["score"][i]) == wz.score and \
            int(out["max"][i]) == wz.max, i
        assert int(outd["score"][i]) == wd.score and \
            int(outd["max"][i]) == wd.max, i
        wzc, _ = diagdiff.extz2(q, t, 5, GMAT, 4, 2, w=-1, zdrop=zdrop,
                                flag=Flag.GENERIC_SC)
        wdc, _ = diagdiff.extd2(q, t, 5, GMAT, 4, 2, 13, 1, w=-1,
                                zdrop=zdrop, flag=Flag.GENERIC_SC)
        wsc, _ = diagdiff.exts2(q, t, 5, GMAT, 2, 1, 32, 4, zdrop=zdrop,
                                junc_bonus=0, flag=fl)
        assert ez_z[i].tsv_fields() == wzc.tsv_fields(), i
        assert ez_d[i].tsv_fields() == wdc.tsv_fields(), i
        assert ez_s[i].tsv_fields() == wsc.tsv_fields(), i


@pytest.mark.parametrize("xdrop,banded", [(-1, False), (40, False),
                                          (25, True)])
def test_extf_batch_matches_spec(xdrop, banded):
    """Batched linear-gap extf2: H0 walk + X-drop, per-pair bands."""
    from ksw2_tpu.ops.batch_pallas import extf_batch_device
    B = 6
    rng = np.random.default_rng(101 + xdrop)
    pairs, Q, T, qlen, tlen = _make_batch(101 + xdrop, B)
    wv = (rng.integers(8, 60, B).astype(np.int32) if banded else None)
    out = extf_batch_device(Q, T, qlen, tlen, 2, -4, 2, w=wv, xdrop=xdrop,
                            interpret=True)
    for i, (q, t) in enumerate(pairs):
        wi = int(wv[i]) if banded else -1
        want = diagdiff.extf2(q, t, 2, -4, 2, w=wi, xdrop=xdrop)
        got = [int(out[k][i]) for k in ("score", "max", "max_t", "max_q")]
        assert got == [want.score, want.max, want.max_t, want.max_q], i
        assert bool(out["zdropped"][i]) == want.zdropped, i


@pytest.mark.parametrize("banded,with_cigar", [(False, True), (True, True),
                                               (True, False)])
def test_gg2_batch_matches_spec(banded, with_cigar):
    """Batched banded global alignment: scores + byte-identical CIGARs."""
    from ksw2_tpu.ops.batch_pallas import gg2_batch_align
    B = 6
    rng = np.random.default_rng(111 + banded + with_cigar)
    pairs, Q, T, qlen, tlen = _make_batch(111 + banded, B)
    mat = simple_mat(5, 2, 4)
    if banded:
        wv = np.maximum(qlen - tlen + 2,
                        rng.integers(12, 60, B)).astype(np.int32)
    else:
        wv = np.maximum(qlen, tlen).astype(np.int32)
    out = gg2_batch_align(Q, T, qlen, tlen, 5, mat, 4, 2, wv,
                          with_cigar=with_cigar, interpret=True)
    for i, (q, t) in enumerate(pairs):
        ws, wcig, _ = diagdiff.gg2_sse(q, t, 5, mat, 4, 2, w=int(wv[i]))
        score, cig = out[i]
        assert score == ws, (i, score, ws)
        if with_cigar:
            assert cig == wcig, i


def test_p8_multirow_to_1024():
    """tlen in (512, 1024]: P = 8 sublane rows per pair, 13-bit tie key."""
    rng = np.random.default_rng(88)
    B = 3
    pairs = []
    for _ in range(B):
        tlen = int(rng.integers(600, 1000))
        t, q = refcmp.random_pair(rng, tlen, divergence=0.25, indel=0.1)
        pairs.append((encode_dna(q), encode_dna(t)))
    Lq = max(len(q) for q, t in pairs)
    Lt = max(len(t) for q, t in pairs)
    Q = np.zeros((B, Lq), np.int32)
    T = np.zeros((B, Lt), np.int32)
    qlen = np.array([len(q) for q, t in pairs], np.int32)
    tlen = np.array([len(t) for q, t in pairs], np.int32)
    for i, (q, t) in enumerate(pairs):
        Q[i, : len(q)] = q
        T[i, : len(t)] = t
    mat = simple_mat(5, 2, 4)
    out = extz_batch_device(Q, T, qlen, tlen, 5, mat, 4, 2, zdrop=100,
                            flag=Flag.SCORE_ONLY, interpret=True)
    from ksw2_tpu.ops.batch_pallas import extd_batch_align
    ezs = extd_batch_align(Q, T, qlen, tlen, 5, mat, 4, 2, 13, 1,
                           zdrop=100, interpret=True)
    for i, (q, t) in enumerate(pairs):
        wz, _ = diagdiff.extz2(q, t, 5, mat, 4, 2, w=-1, zdrop=100,
                               flag=Flag.SCORE_ONLY)
        wd, _ = diagdiff.extd2(q, t, 5, mat, 4, 2, 13, 1, w=-1, zdrop=100)
        assert int(out["score"][i]) == wz.score and \
            int(out["max"][i]) == wz.max, i
        assert ezs[i].tsv_fields() == wd.tsv_fields(), i


def test_approx_cigar_batches_match_spec():
    """APPROX_MAX|APPROX_DROP with full CIGARs in all three engines."""
    from ksw2_tpu.ops.batch_pallas import (extd_batch_align,
                                           extz_batch_align)
    B = 6
    pairs, Q, T, qlen, tlen = _make_batch(121, B)
    mat = simple_mat(5, 2, 4)
    FAD = Flag.APPROX_MAX | Flag.APPROX_DROP
    e1 = extz_batch_align(Q, T, qlen, tlen, 5, mat, 4, 2, zdrop=30,
                          flag=FAD, interpret=True)
    e2 = extd_batch_align(Q, T, qlen, tlen, 5, mat, 4, 2, 13, 1, zdrop=30,
                          flag=FAD, interpret=True)
    for i, (q, t) in enumerate(pairs):
        w1, _ = diagdiff.extz2(q, t, 5, mat, 4, 2, w=-1, zdrop=30, flag=FAD)
        w2, _ = diagdiff.extd2(q, t, 5, mat, 4, 2, 13, 1, w=-1, zdrop=30,
                               flag=FAD)
        assert e1[i].tsv_fields() == w1.tsv_fields(), i
        assert e2[i].tsv_fields() == w2.tsv_fields(), i


def test_end_bonus_extz_only_paths():
    """EXTZ_ONLY + end_bonus picks the query-end traceback start and sets
    reach_end (ksw2_extz2_sse.c:296-298); pinned across spec, single-pair,
    and batched engines (the reference CLI cannot drive end_bonus, so this
    is spec-anchored)."""
    import refcmp
    from ksw2_tpu.core.flags import Flag
    from ksw2_tpu.core.matrix import encode_dna, simple_mat
    from ksw2_tpu.ops.batch_pallas import extz_batch_align
    from ksw2_tpu.ops.extz import extz2_device
    from ksw2_tpu.spec import diagdiff

    rng = np.random.default_rng(21)
    mat = simple_mat(5, 2, 4)
    B = 6
    pairs = []
    for _ in range(B):
        # short query vs longer target: mqe + bonus can beat max
        t, q = refcmp.random_pair(rng, 220, divergence=0.15, indel=0.05)
        pairs.append((encode_dna(q)[:180], encode_dna(t)[:220]))
    Lq = max(len(q) for q, t in pairs)
    Lt = max(len(t) for q, t in pairs)
    Q = np.zeros((B, Lq), np.int32)
    T = np.zeros((B, Lt), np.int32)
    qlen = np.array([len(q) for q, t in pairs], np.int32)
    tlen = np.array([len(t) for q, t in pairs], np.int32)
    for i, (q, t) in enumerate(pairs):
        Q[i, : len(q)] = q
        T[i, : len(t)] = t
    flag = Flag.EXTZ_ONLY
    bonus = 50
    ezb = extz_batch_align(Q, T, qlen, tlen, 5, mat, 4, 2, zdrop=100,
                           end_bonus=bonus, flag=flag, interpret=True)
    n_reach = 0
    for i, (q, t) in enumerate(pairs):
        want, _ = diagdiff.extz2(q, t, 5, mat, 4, 2, zdrop=100,
                                 end_bonus=bonus, flag=flag)
        got, _ = extz2_device(q, t, 5, mat, 4, 2, zdrop=100,
                              end_bonus=bonus, flag=flag, interpret=True)
        n_reach += int(want.reach_end)
        for ez in (got, ezb[i]):
            assert ez.tsv_fields() == want.tsv_fields(), i
            assert ez.cigar == want.cigar, i
            assert ez.reach_end == want.reach_end, i
    assert n_reach, "cases should exercise the reach_end branch"


def test_rev_cigar_paths():
    """KSW_EZ_REV_CIGAR leaves the CIGAR in walk order (ksw2.h:157-159);
    library-only flag (no CLI switch), pinned across spec, single-pair,
    batched t-coordinate, and band engines."""
    import refcmp
    from ksw2_tpu.core.flags import Flag
    from ksw2_tpu.core.matrix import encode_dna, simple_mat
    from ksw2_tpu.ops.band_batch import extz_band_batch_align
    from ksw2_tpu.ops.batch_pallas import extz_batch_align
    from ksw2_tpu.ops.extz import extz2_device
    from ksw2_tpu.spec import diagdiff

    rng = np.random.default_rng(31)
    mat = simple_mat(5, 2, 4)
    B = 4
    pairs = []
    for _ in range(B):
        t, q = refcmp.random_pair(rng, 300, divergence=0.2, indel=0.08)
        pairs.append((encode_dna(q), encode_dna(t)))
    Lq = max(len(q) for q, t in pairs)
    Lt = max(len(t) for q, t in pairs)
    Q = np.zeros((B, Lq), np.int32)
    T = np.zeros((B, Lt), np.int32)
    qlen = np.array([len(q) for q, t in pairs], np.int32)
    tlen = np.array([len(t) for q, t in pairs], np.int32)
    for i, (q, t) in enumerate(pairs):
        Q[i, : len(q)] = q
        T[i, : len(t)] = t
    wv = np.full(B, 90, np.int32)
    fwd = extz_batch_align(Q, T, qlen, tlen, 5, mat, 4, 2, zdrop=100,
                           interpret=True)
    rev = extz_batch_align(Q, T, qlen, tlen, 5, mat, 4, 2, zdrop=100,
                           flag=Flag.REV_CIGAR, interpret=True)
    bfwd = extz_band_batch_align(Q, T, qlen, tlen, 5, mat, 4, 2, wv,
                                 zdrop=100, interpret=True)
    brev = extz_band_batch_align(Q, T, qlen, tlen, 5, mat, 4, 2, wv,
                                 zdrop=100, flag=Flag.REV_CIGAR,
                                 interpret=True)
    for i, (q, t) in enumerate(pairs):
        want, _ = diagdiff.extz2(q, t, 5, mat, 4, 2, zdrop=100,
                                 flag=Flag.REV_CIGAR)
        gotd, _ = extz2_device(q, t, 5, mat, 4, 2, zdrop=100,
                               flag=Flag.REV_CIGAR, interpret=True)
        assert want.cigar == fwd[i].cigar[::-1] and want.cigar, i
        assert rev[i].cigar == want.cigar, i
        assert gotd.cigar == want.cigar, i
        wantb, _ = diagdiff.extz2(q, t, 5, mat, 4, 2, w=90, zdrop=100,
                                  flag=Flag.REV_CIGAR)
        assert brev[i].cigar == wantb.cigar, i
        assert bfwd[i].cigar == wantb.cigar[::-1], i


def test_splice_profiles_batch_parity():
    """Vectorized donor/acceptor builder == the scalar spec, all flags."""
    import numpy as np
    from ksw2_tpu.core.flags import Flag
    from ksw2_tpu.spec.diagdiff import _splice_profiles
    from ksw2_tpu.ops.batch_pallas import splice_profiles_batch

    rng = np.random.default_rng(42)
    for trial in range(60):
        B = int(rng.integers(1, 5))
        Lt = int(rng.integers(5, 90))
        N = ((Lt + 127) // 128) * 128
        T = rng.integers(0, 4, size=(B, Lt)).astype(np.int64)
        tl = rng.integers(1, Lt + 1, size=B).astype(np.int64)
        noncan = int(rng.integers(0, 40))
        fl = Flag(0)
        if rng.random() < 0.8:
            fl |= Flag.SPLICE_FOR
        if rng.random() < 0.4:
            fl |= Flag.SPLICE_REV
        if rng.random() < 0.5:
            fl |= Flag.SPLICE_FLANK
        if rng.random() < 0.3:
            fl |= Flag.REV_CIGAR
        junc = None
        jb = 0
        if rng.random() < 0.5:
            junc = rng.integers(0, 16, size=(B, Lt)).astype(np.uint8)
            jb = int(rng.integers(0, 20))
        dn, ac = splice_profiles_batch(T, tl, N, noncan, fl, junc, jb)
        for b in range(B):
            dn_s, ac_s = _splice_profiles(
                T[b][:tl[b]].astype(np.int64), int(tl[b]), N, noncan, fl,
                None if junc is None else junc[b][:tl[b]], jb)
            assert (dn[b] == dn_s).all(), (trial, b, "donor")
            assert (ac[b] == ac_s).all(), (trial, b, "acceptor")
