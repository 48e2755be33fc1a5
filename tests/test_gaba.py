"""Optional third-party comparator: gaba as an independent oracle.

The reference CLI cross-validates extension scores against libgaba when
compiled with HAVE_GABA (cli.c:85-107, Makefile:16-21).  This is the
equivalent hook: skipped when no loadable libgaba is present (it is not
baked into this image), exactly like the reference skips without the
gaba/ checkout.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import refcmp  # noqa: E402


@pytest.mark.skipif(not refcmp.have_gaba(),
                    reason="libgaba not available on this machine")
def test_extz_scores_match_gaba():
    """extz global-extension scores vs gaba's adaptive-band trace.

    gaba's xdrop band is an approximation (min(zdrop,120), cli.c:95), so
    like the reference's manual use of the comparator this asserts score
    agreement on well-behaved (low-divergence) pairs only.
    """
    from ksw2_tpu.core.matrix import encode_dna, simple_mat
    from ksw2_tpu.spec.diagdiff import extz2

    rng = np.random.default_rng(0)
    mat = simple_mat(5, 2, -4)
    for _ in range(10):
        t, q = refcmp.random_pair(rng, int(rng.integers(50, 200)),
                                  divergence=0.05, indel=0.02)
        want = refcmp.run_gaba_extension(t, q)
        ez, _ = extz2(encode_dna(q), encode_dna(t), 5, mat, 4, 2,
                      zdrop=100)
        assert ez.score == want
