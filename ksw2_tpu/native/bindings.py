"""ctypes bindings for the native host runtime, with pure-Python fallback.

``get_lib()`` builds (g++) and loads the shared library on first use; every
entry point degrades to the Python spec implementation when the toolchain is
unavailable, so the package works everywhere and runs fast where it can.
"""
from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence

import numpy as np

_lib = None
_tried = False


def get_lib():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        from .build import build

        path = build()
        lib = ctypes.CDLL(path)
        lib.k2t_backtrack.restype = ctypes.c_int64
        lib.k2t_cigar2eqx.restype = ctypes.c_int64
        lib.k2t_fastx_parse.restype = ctypes.c_int64
        lib.k2t_abi_version.restype = ctypes.c_int32
        assert lib.k2t_abi_version() == 1
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return get_lib() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def backtrack(
    p: np.ndarray,
    off: Sequence[int],
    off_end: Optional[Sequence[int]],
    n_col: int,
    i0: int,
    j0: int,
    *,
    is_rot: bool,
    is_rev: bool = False,
    min_intron_len: int = 0,
    store_off: Optional[Sequence[int]] = None,
) -> List[int]:
    """Native traceback; falls back to the Python spec when unavailable."""
    lib = get_lib()
    if lib is None:
        from ..spec.backtrack import backtrack as py_backtrack

        return py_backtrack(p, off, off_end, n_col, i0, j0, is_rot=is_rot,
                            is_rev=is_rev, min_intron_len=min_intron_len,
                            store_off=store_off)
    p = np.ascontiguousarray(p, dtype=np.uint8)
    off = np.ascontiguousarray(off, dtype=np.int32)
    off_end_a = (np.ascontiguousarray(off_end, dtype=np.int32)
                 if off_end is not None else None)
    store_a = (np.ascontiguousarray(store_off, dtype=np.int32)
               if store_off is not None else None)
    cap = int(i0) + int(j0) + 4
    out = np.zeros(cap, np.uint32)
    n = lib.k2t_backtrack(
        _ptr(p), ctypes.c_int64(p.size), _ptr(off),
        _ptr(off_end_a) if off_end_a is not None else None,
        _ptr(store_a) if store_a is not None else None,
        ctypes.c_int32(n_col), ctypes.c_int32(i0), ctypes.c_int32(j0),
        ctypes.c_int32(1 if is_rot else 0), ctypes.c_int32(1 if is_rev else 0),
        ctypes.c_int32(min_intron_len), _ptr(out), ctypes.c_int64(cap))
    if n < 0:
        raise RuntimeError("k2t_backtrack: output capacity exceeded")
    return [int(v) for v in out[:n]]


def cigar2eqx(cigar: Sequence[int], query: np.ndarray,
              target: np.ndarray) -> List[int]:
    lib = get_lib()
    if lib is None:
        from ..core.cigar import to_eqx

        return to_eqx(cigar, query, target)
    cig = np.ascontiguousarray(cigar, dtype=np.uint32)
    q = np.ascontiguousarray(query, dtype=np.uint8)
    t = np.ascontiguousarray(target, dtype=np.uint8)
    cap = int(sum(int(c) >> 4 for c in cigar)) * 2 + 8
    out = np.zeros(cap, np.uint32)
    n = lib.k2t_cigar2eqx(_ptr(cig), ctypes.c_int64(len(cig)), _ptr(q),
                          _ptr(t), _ptr(out), ctypes.c_int64(cap))
    if n < 0:
        raise RuntimeError("k2t_cigar2eqx: capacity exceeded")
    return [int(v) for v in out[:n]]


def encode_nt4(seq: bytes | str) -> np.ndarray:
    lib = get_lib()
    if isinstance(seq, str):
        seq = seq.encode()
    if lib is None:
        from ..core.matrix import encode_dna

        return encode_dna(seq)
    out = np.zeros(len(seq), np.uint8)
    lib.k2t_encode_nt4(ctypes.c_char_p(seq), ctypes.c_int64(len(seq)), _ptr(out))
    return out


def fastx_parse(buf: bytes):
    """Parse a decompressed FASTA/FASTQ buffer; returns list of records.

    Falls back to the Python reader via a temp-free in-memory path.
    """
    lib = get_lib()
    if lib is None:
        return None  # caller falls back to ksw2_tpu.io.fasta
    arr = np.frombuffer(buf, dtype=np.uint8)
    seq_out = np.zeros(len(buf) + 1, np.uint8)
    meta = np.zeros(8 * (buf.count(b">") + buf.count(b"@") + 1), np.int64)
    n = lib.k2t_fastx_parse(_ptr(arr), ctypes.c_int64(len(buf)), _ptr(seq_out),
                            ctypes.c_int64(seq_out.size), _ptr(meta),
                            ctypes.c_int64(meta.size))
    if n < 0:
        raise RuntimeError("k2t_fastx_parse: capacity exceeded")
    recs = []
    bv = memoryview(buf)
    sv = seq_out
    for k in range(int(n)):
        m = meta[8 * k: 8 * k + 8]
        name = bytes(bv[int(m[0]): int(m[0] + m[1])]).decode()
        comment = bytes(bv[int(m[2]): int(m[2] + m[3])]).decode()
        seq = sv[int(m[4]): int(m[4] + m[5])].tobytes().decode()
        qual = sv[int(m[6]): int(m[6] + m[7])].tobytes().decode() if m[7] else None
        recs.append((name, comment, seq, qual))
    return recs


__all__ = ["get_lib", "available", "backtrack", "cigar2eqx", "encode_nt4",
           "fastx_parse"]
