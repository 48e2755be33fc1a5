"""Host-side band bookkeeping shared by the kernels and the traceback.

All quantities are pure functions of (r, qlen, tlen, w) and mirror the
reference's rotated-coordinate band math (ksw2_extz2_sse.c:107-116),
including the 16-lane rounding that is part of observable behavior.
"""
from __future__ import annotations

import numpy as np


def band_bounds(n_diag: int, qlen: int, tlen: int, w: int) -> tuple[np.ndarray, np.ndarray]:
    """True (unrounded) band [st0, en0] per diagonal."""
    r = np.arange(n_diag, dtype=np.int64)
    st0 = np.maximum(0, np.maximum(r - qlen + 1, (r - w + 1) >> 1))
    en0 = np.minimum(tlen - 1, np.minimum(r, (r + w) >> 1))
    return st0, en0


def band_bounds_rounded(
    n_diag: int, qlen: int, tlen: int, w: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(st0, en0, st, en): true and 16-rounded band bounds per diagonal."""
    st0, en0 = band_bounds(n_diag, qlen, tlen, w)
    st = st0 // 16 * 16
    en = (en0 + 16) // 16 * 16 - 1
    return st0, en0, st, en


def storage_offsets(st: np.ndarray) -> np.ndarray:
    """128-aligned storage offset of each stored direction row.

    The TPU kernel copies a 128-aligned window of the t-axis per diagonal, so
    stored byte k of row r is t = off128[r] + k (cf. the reference's off[r]
    which equals the 16-rounded st).
    """
    return st // 128 * 128


def n_col_bytes(qlen: int, tlen: int, w: int) -> int:
    """The reference's stored row width in bytes (n_col_ * 16)."""
    n_col = min(qlen, tlen)
    n_col = (min(n_col, w + 1) + 15) // 16 + 1
    return n_col * 16


def round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pad_rows(B: int, P: int) -> int:
    """Pairs per batched launch, padded for tiling AND compile reuse.

    The row count R = Bp*P must be a multiple of 8 (sublane tiling).  Bp
    is first lifted to a ~25%-granularity ladder (multiples of the next
    power of two over 4) so that *varying* batch sizes land on a handful
    of compiled program shapes instead of one per exact size — the
    compile-cache equivalent of the reference arena's no-per-call-setup
    contract (kalloc.c:41-62).  Padding rows carry zero-length pairs that
    the kernels mask out everywhere.
    """
    B = max(B, 1)

    def rung(step):
        Bp = -(-B // step) * step
        while (Bp * P) % 8:
            Bp += 1
        return Bp

    step = max(1, (1 << (B - 1).bit_length()) // 4)
    # at high P a ladder step is hundreds of dead ROWS (e.g. 8 pairs at
    # P=24 = 192 rows of padding); also offer a step capped to <= ~64
    # padding rows and keep whichever rung wastes less — high-P buckets
    # hold few pairs, so the extra compiled variants are cheap next to
    # the occupancy win (both rungs are deterministic in (B, P), so
    # compile reuse still holds per bucket size)
    return min(rung(step), rung(min(step, max(1, 64 // P))))


__all__ = [
    "band_bounds",
    "band_bounds_rounded",
    "storage_offsets",
    "n_col_bytes",
    "round_up",
    "pad_rows",
]


def stable_kernel_name(tag: str, prm) -> str:
    """Deterministic pallas kernel name for a params variant.

    The default (function __name__ + a process-global uniquifying
    counter) leaks kernel-BUILD order into the serialized program, so
    identical workloads hash to different persistent-cache keys
    depending on what compiled earlier in the process.  A name derived
    from the params tuple is stable across processes and build orders.
    """
    import hashlib
    return tag + "_" + hashlib.md5(repr(prm).encode()).hexdigest()[:10]
