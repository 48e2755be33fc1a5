"""Optional third-party comparator: parasail as an independent oracle.

The reference CLI can cross-validate against parasail when compiled with
HAVE_PARASAIL (cli.c:85-126); this is the equivalent hook.  Skipped when
the parasail python bindings are not installed (they are not baked into
this image), exactly like the reference skips without the library.
"""
import sys
import os

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import refcmp  # noqa: E402


@pytest.mark.skipif(not refcmp.have_parasail(),
                    reason="parasail bindings not installed")
def test_gg_scores_match_parasail():
    from ksw2_tpu.core.matrix import encode_dna, simple_mat
    from ksw2_tpu.spec.rowdp import gg

    rng = np.random.default_rng(0)
    mat = simple_mat(5, 2, -4)
    for _ in range(20):
        t, q = refcmp.random_pair(rng, int(rng.integers(20, 150)),
                                  divergence=0.2, indel=0.1)
        want = refcmp.run_parasail_nw(t, q)
        got, _ = gg(encode_dna(q), encode_dna(t), 5, mat, 4, 2)
        assert got == want
