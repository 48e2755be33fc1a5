"""Native C++ runtime vs the Python spec implementations."""
import numpy as np
import pytest

import refcmp
from ksw2_tpu.core import cigar as C
from ksw2_tpu.core.matrix import encode_dna, simple_mat
from ksw2_tpu.core.flags import Flag
from ksw2_tpu.native import bindings as nb
from ksw2_tpu.spec import diagdiff
from ksw2_tpu.spec.backtrack import backtrack as py_backtrack

pytestmark = pytest.mark.skipif(not nb.available(), reason="no native toolchain")


def test_encode_nt4_matches():
    s = "ACGTNacgtnRYKM@#\x00"
    assert np.array_equal(nb.encode_nt4(s), encode_dna(s))


@pytest.mark.parametrize("seed", range(6))
def test_backtrack_matches_spec(seed):
    rng = np.random.default_rng(seed)
    tlen = int(rng.integers(20, 150))
    t, q = refcmp.random_pair(rng, tlen, divergence=0.2, indel=0.1)
    mat = simple_mat(5, 2, 4)
    qs, ts = encode_dna(q), encode_dna(t)
    w = int(rng.choice([-1, 10]))
    ez, tr = diagdiff.extz2(qs, ts, 5, mat, 4, 2, w=w,
                            zdrop=int(rng.choice([-1, 50])))
    if tr is None or ez.max_t < 0:
        return
    i0, j0 = (len(ts) - 1, len(qs) - 1) if not ez.zdropped else (ez.max_t, ez.max_q)
    py = py_backtrack(tr.p, tr.off, tr.off_end, tr.n_col, i0, j0, is_rot=True)
    cc = nb.backtrack(tr.p, tr.off, tr.off_end, tr.n_col, i0, j0, is_rot=True)
    assert py == cc


def test_cigar2eqx_matches():
    t = encode_dna("ACGTACGTAA")
    q = encode_dna("ACCTACGTAA")
    cig = C.from_string("3M1D6M1I")
    # adjust to consume exactly: 3M(3t/3q) 1D(1t) 6M -> t=10, q=9 +1I -> q=10
    assert nb.cigar2eqx(cig, q, t) == C.to_eqx(cig, q, t)


def test_fastx_parse_matches_python_reader(tmp_path):
    p = tmp_path / "x.fa"
    p.write_text(">s1 hello world\nACGT\nacgt\n>s2\nTT\n")
    from ksw2_tpu.io.fasta import read_fastx
    pyrecs = [(r.name, r.comment, r.seq, r.qual) for r in read_fastx(str(p))]
    crecs = nb.fastx_parse(p.read_bytes())
    assert [(a, b, c) for a, b, c, _ in crecs] == [(a, b, c) for a, b, c, _ in pyrecs]
