"""Strip-tiled row-major spec (spec/strips.py) vs the diagdiff spec engine.

Validates the three design elements the Pallas strips kernel depends on:
strip-boundary stream carrying (bH/bF), the per-diagonal packed
(H, merge-key) record streams, and the exact ez-automaton replay
(mte -> mqe -> zdrop order, merge-order ties, ``mte_q = r - en`` quirk).
"""
import numpy as np
import pytest

import refcmp
from ksw2_tpu.core.flags import Flag
from ksw2_tpu.core.matrix import encode_dna, simple_mat
from ksw2_tpu.spec import diagdiff
from ksw2_tpu.spec.strips import strips_extz

MAT = simple_mat(5, 2, -4)


def _ref(qs, ts, q, e, zdrop, flag=Flag.SCORE_ONLY, mat=MAT):
    ez, _ = diagdiff.extz2(qs, ts, 5, mat, q, e, w=-1, zdrop=zdrop,
                           flag=flag)
    return dict(max=ez.max, max_t=ez.max_t, max_q=ez.max_q, mqe=ez.mqe,
                mqe_t=ez.mqe_t, mte=ez.mte, mte_q=ez.mte_q,
                score=ez.score, zdropped=int(ez.zdropped))


@pytest.mark.parametrize("zdrop", [-1, 30, 100])
def test_random_pairs(zdrop):
    rng = np.random.default_rng(100 + zdrop)
    for _ in range(25):
        tlen = int(rng.integers(1, 420))
        t, q = refcmp.random_pair(
            rng, tlen, divergence=float(rng.uniform(0, 0.4)),
            indel=float(rng.uniform(0, 0.25)),
            with_n=bool(rng.integers(0, 2)))
        qs, ts = encode_dna(q), encode_dna(t)
        got = strips_extz(qs, ts, 5, MAT, 4, 2, zdrop=zdrop)
        assert got == _ref(qs, ts, 4, 2, zdrop)


@pytest.mark.parametrize("qlen,tlen", [
    (1, 1), (1, 300), (300, 1), (128, 128), (129, 128), (128, 129),
    (256, 256), (257, 300), (384, 255), (2, 500), (500, 2)])
def test_strip_boundaries(qlen, tlen):
    rng = np.random.default_rng(qlen * 1000 + tlen)
    qs = rng.integers(0, 5, qlen).astype(np.int8)
    ts = rng.integers(0, 5, tlen).astype(np.int8)
    L = min(qlen, tlen)
    ts[:L] = np.where(rng.random(L) < 0.15, ts[:L], qs[:L])
    for zdrop in (-1, 30):
        got = strips_extz(qs, ts, 5, MAT, 4, 2, zdrop=zdrop)
        assert got == _ref(qs, ts, 4, 2, zdrop)


def test_generic_matrix():
    rng = np.random.default_rng(5)
    gm = rng.integers(-5, 4, (5, 5))
    np.fill_diagonal(gm, rng.integers(1, 6, 5))
    gm = gm.astype(np.int8)
    for _ in range(15):
        qlen, tlen = int(rng.integers(1, 300)), int(rng.integers(1, 300))
        qs = rng.integers(0, 5, qlen).astype(np.int8)
        ts = rng.integers(0, 5, tlen).astype(np.int8)
        got = strips_extz(qs, ts, 5, gm, 4, 2, zdrop=100, generic=True)
        want = _ref(qs, ts, 4, 2, 100, flag=Flag.SCORE_ONLY | Flag.GENERIC_SC,
                    mat=gm)
        assert got == want


def test_gap_costs():
    # q+e must satisfy the -min_sc <= 2(q+e) guard (ksw2_extz2_sse.c:78-82)
    # for the forward sweep to be consulted at all; the guard itself is the
    # caller's job (ops/batch_pallas.unpack_records), so (0,1)-style
    # configurations are out of the spec's scope.
    rng = np.random.default_rng(9)
    for q, e in [(4, 2), (6, 1), (1, 1), (2, 2)]:
        for _ in range(8):
            tlen = int(rng.integers(2, 350))
            t, qy = refcmp.random_pair(rng, tlen, divergence=0.2, indel=0.1)
            qs, ts = encode_dna(qy), encode_dna(t)
            got = strips_extz(qs, ts, 5, MAT, q, e, zdrop=60)
            assert got == _ref(qs, ts, q, e, 60)
