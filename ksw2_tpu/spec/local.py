"""Local alignment (Smith-Waterman, affine gaps): the semantic oracle.

The reference *declares* ``ksw_ll_qinit/ksw_ll_i16`` in its header but does
not implement them (ksw2.h:92-93; README.md: "no local alignment yet") —
they live in minimap2. This framework implements the capability outright:
this NumPy oracle defines the semantics, and the TPU engine in
:mod:`ksw2_tpu.ops.batch_local` is validated against it.

Semantics: H(i,j) = max(0, H(i-1,j-1)+s, E, F); E/F affine with open ``q``
and extend ``e``; the result is the maximum H over the matrix with its end
cell (first occurrence in row-major order on ties).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def local_align(
    query: np.ndarray,
    target: np.ndarray,
    m: int,
    mat: np.ndarray,
    q: int,
    e: int,
) -> Tuple[int, int, int]:
    """Smith-Waterman affine, row DP. Returns (score, te, qe)."""
    mat = np.asarray(mat, dtype=np.int64).reshape(m, m)
    qlen, tlen = len(query), len(target)
    NEG = -(10**9)
    Hrow = np.zeros(qlen + 1, np.int64)
    Erow = np.full(qlen + 1, NEG, np.int64)
    best, bt, bq = 0, -1, -1
    for i in range(tlen):
        row = mat[int(target[i])]
        F = NEG
        Hdiag = 0            # H[i, 0] = 0 (local)
        Hnew = np.zeros(qlen + 1, np.int64)
        for j in range(1, qlen + 1):
            E = max(Hrow[j] - q, Erow[j]) - e
            F = max(Hdiag if False else Hnew[j - 1] - q, F) - e
            h = Hrow[j - 1] + row[int(query[j - 1])]
            h = max(h, E)
            h = max(h, F)
            h = max(h, 0)
            Hnew[j] = h
            Erow[j] = E
            if h > best:
                best, bt, bq = int(h), i, j - 1
        Hrow = Hnew
    return best, bt, bq


__all__ = ["local_align"]
