"""Scoring matrices and nucleotide encoding.

The 2-bit+wildcard DNA encoding and simple match/mismatch matrix builder
mirror the reference CLI (``/root/reference/cli.c:17-48``): A=0 C=1 G=2 T=3,
everything else 4 (wildcard); the last row/column of the matrix is 0 so the
wildcard is score-neutral in the scalar kernels.
"""
from __future__ import annotations

import numpy as np

# ASCII -> nt4 code table (A/a=0, C/c=1, G/g=2, T/t=3, else 4).
SEQ_NT4 = np.full(256, 4, dtype=np.uint8)
for _i, _c in enumerate("ACGT"):
    SEQ_NT4[ord(_c)] = _i
    SEQ_NT4[ord(_c.lower())] = _i


def encode_dna(seq: str | bytes) -> np.ndarray:
    """Encode an ASCII DNA string to nt4 codes (uint8)."""
    if isinstance(seq, str):
        seq = seq.encode()
    return SEQ_NT4[np.frombuffer(seq, dtype=np.uint8)]


def simple_mat(m: int, match: int, mismatch: int) -> np.ndarray:
    """Build an ``m*m`` match/mismatch matrix with a score-0 wildcard row/col.

    ``match`` is forced positive and ``mismatch`` negative, as in the
    reference (cli.c:36-48).  Returned flat (C order), dtype int8.
    """
    a = abs(int(match))
    b = -abs(int(mismatch))
    mat = np.zeros((m, m), dtype=np.int8)
    mat[: m - 1, : m - 1] = b
    np.fill_diagonal(mat[: m - 1, : m - 1], a)
    return mat.reshape(-1)


__all__ = ["SEQ_NT4", "encode_dna", "simple_mat"]
