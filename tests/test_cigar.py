"""Unit + property tests for the CIGAR codec and result record."""
import numpy as np
import pytest

from ksw2_tpu.core import cigar as C
from ksw2_tpu.core.flags import CigarOp, Flag, NEG_INF
from ksw2_tpu.core.matrix import encode_dna, simple_mat
from ksw2_tpu.core.result import ExtzResult
from ksw2_tpu.spec import diagdiff


def test_push_merges_runs():
    out = []
    C.push(out, CigarOp.MATCH, 3)
    C.push(out, CigarOp.MATCH, 2)
    C.push(out, CigarOp.DEL, 1)
    C.push(out, CigarOp.MATCH, 4)
    assert C.to_string(out) == "5M1D4M"
    assert out[0] == (5 << 4) | 0


def test_string_roundtrip():
    s = "5M2D27M6D7M2D4M3D3M3D2M2D6M"
    assert C.to_string(C.from_string(s)) == s


def test_consumed():
    cig = C.from_string("5M2I3D10N4M")
    t, q = C.consumed(cig)
    assert t == 5 + 3 + 10 + 4
    assert q == 5 + 2 + 4


def test_eqx():
    tgt = encode_dna("ACGTAC")
    qry = encode_dna("ACCTAC")
    cig = C.from_string("6M")
    assert C.to_string(C.to_eqx(cig, qry, tgt)) == "2=1X3="


def test_result_reset():
    ez = ExtzResult(max=5, score=7)
    ez.reset()
    assert ez.max == 0 and ez.score == NEG_INF and ez.max_q == -1


@pytest.mark.parametrize("seed", range(8))
def test_cigar_consistency_properties(seed):
    """score(CIGAR) == reported score; CIGAR consumes exactly qlen/tlen."""
    rng = np.random.default_rng(seed)
    tlen = int(rng.integers(10, 120))
    t = rng.integers(0, 4, size=tlen).astype(np.uint8)
    # mutated copy
    q = t.copy()
    nmut = int(rng.integers(0, max(1, tlen // 5)))
    for _ in range(nmut):
        q[rng.integers(0, len(q))] = rng.integers(0, 4)
    mat = simple_mat(5, 2, 4)
    ez, _ = diagdiff.extz2(q, t, 5, mat, 4, 2, flag=Flag.NONE)
    tc, qc = C.consumed(ez.cigar)
    assert tc == tlen and qc == len(q)
    rescore = C.score_of(ez.cigar, q, t, mat, 5, 4, 2)
    assert rescore == ez.score
