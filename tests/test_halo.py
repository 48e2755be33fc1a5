"""Target-sharded halo wavefront: ONE alignment split over the mesh.

Parity of ``parallel/halo.py`` (pipelined diagonal blocks, per-round
ppermute of boundary x/v/H columns) against the spec engine on the
8-device CPU mesh.  The broader edge-shape fuzz lives in the verify
harness; these pin the pipeline across asymmetric shapes, bands, and
block sizes that don't divide the diagonal count.
"""
import numpy as np
import pytest

import refcmp
from ksw2_tpu.core.flags import Flag
from ksw2_tpu.core.matrix import encode_dna, simple_mat
from ksw2_tpu.spec import diagdiff


def _fields(ez):
    return (ez.score, ez.max, ez.max_t, ez.max_q, ez.mqe, ez.mqe_t,
            ez.mte, ez.mte_q, ez.zdropped)


@pytest.mark.parametrize("ql,tl,w,K", [
    (700, 740, -1, 256),     # unbanded, blocks divide unevenly
    (900, 30, 40, 64),       # target much shorter than query, banded
    (257, 1300, 75, 128),    # band reaches across shard boundaries
])
def test_halo_matches_spec(ql, tl, w, K):
    from ksw2_tpu.parallel.halo import halo_extz_score
    from ksw2_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(ql + tl)
    q = "".join(rng.choice(list("ACGTN"), ql, p=[.24, .24, .24, .24, .04]))
    t = "".join(rng.choice(list("ACGTN"), tl, p=[.24, .24, .24, .24, .04]))
    qs, ts = encode_dna(q), encode_dna(t)
    mat = simple_mat(5, 2, 4)
    ez = halo_extz_score(make_mesh(8), qs, ts, 5, mat, 4, 2, w=w,
                         block_diagonals=K)
    want, _ = diagdiff.extz2(qs, ts, 5, mat, 4, 2, w=w,
                             flag=Flag.SCORE_ONLY)
    assert _fields(ez) == _fields(want)


def test_halo_rejects_unsupported_modes():
    from ksw2_tpu.parallel.halo import halo_extz_score
    from ksw2_tpu.parallel.mesh import make_mesh

    mat = simple_mat(5, 2, 4)
    qs = encode_dna("ACGTACGT")
    with pytest.raises(ValueError):
        halo_extz_score(make_mesh(8), qs, qs, 5, mat, 4, 2,
                        flag=Flag.SCORE_ONLY | Flag.APPROX_MAX)
    with pytest.raises(ValueError):
        halo_extz_score(make_mesh(8), qs, qs, 5, mat, 4, 2, flag=Flag.NONE)
