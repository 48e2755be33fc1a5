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
