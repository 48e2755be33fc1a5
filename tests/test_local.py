"""Local alignment (the capability ksw2 declares but lacks) vs the oracle."""
import numpy as np
import pytest

import refcmp
from ksw2_tpu.core.matrix import encode_dna, simple_mat
from ksw2_tpu.ops.batch_local import local_batch_device
from ksw2_tpu.spec.local import local_align


@pytest.mark.parametrize("seed", [1, 9])
def test_local_batch_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    B = 12
    pairs = []
    for _ in range(B):
        tlen = int(rng.integers(8, 128))
        t, q = refcmp.random_pair(
            rng, tlen, divergence=float(rng.uniform(0, 0.5)),
            indel=float(rng.uniform(0, 0.25)), with_n=bool(rng.integers(0, 2)))
        pairs.append((encode_dna(q), encode_dna(t)))
    Lq = max(len(q) for q, t in pairs)
    Q = np.zeros((B, Lq), np.int32)
    T = np.zeros((B, 128), np.int32)
    qlen = np.array([len(q) for q, t in pairs], np.int32)
    tlen = np.array([len(t) for q, t in pairs], np.int32)
    for i, (q, t) in enumerate(pairs):
        Q[i, : len(q)] = q
        T[i, : len(t)] = t
    mat = simple_mat(5, 2, 4)
    out = local_batch_device(Q, T, qlen, tlen, 5, mat, 4, 2, interpret=True)
    for i, (q, t) in enumerate(pairs):
        s, te, qe = local_align(q, t, 5, mat, 4, 2)
        assert (int(out["score"][i]), int(out["te"][i]),
                int(out["qe"][i])) == (s, te, qe), i
