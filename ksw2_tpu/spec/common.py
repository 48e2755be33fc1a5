"""Shared helpers for the spec engines (Z-drop, exact-max scan, C arithmetic)."""
from __future__ import annotations

import numpy as np

from ..core.result import ExtzResult


def c_div(a: int, b: int) -> int:
    """C integer division (truncation toward zero)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def sra1(x: int) -> int:
    """C ``x >> 1`` on int (arithmetic shift = floor division by 2)."""
    return x >> 1  # Python's >> is arithmetic/floor, same as gcc on x86


def apply_zdrop(ez: ExtzResult, is_rot: bool, H: int, a: int, b: int, zdrop: int, e: int) -> bool:
    """Z-drop test, updating the running extension max.

    Mirror of ``ksw_apply_zdrop`` (reference: ksw2.h:191-207): the drop is
    gap-compensated by ``|Δt-Δq|*e`` off the best diagonal.  Returns True when
    extension should stop.
    """
    if is_rot:
        r, t = a, b
    else:
        r, t = a + b, a
    if H > ez.max:
        ez.max = H
        ez.max_t = t
        ez.max_q = r - t
    elif t >= ez.max_t and r - t >= ez.max_q:
        tl = t - ez.max_t
        ql = (r - t) - ez.max_q
        l = tl - ql if tl > ql else ql - tl
        if zdrop >= 0 and ez.max - H > zdrop + l * e:
            ez.zdropped = True
            return True
    return False


def exact_max_scan(
    H: np.ndarray,
    vvals: np.ndarray,
    uvals: np.ndarray,
    st0: int,
    en0: int,
    sub: int,
) -> tuple[int, int]:
    """Per-diagonal 32-bit H row update with the reference's argmax scan.

    Replicates the SSE 4-lane max scan of the workhorse kernels
    (``ksw2_extz2_sse.c:224-261``): the last band element ``en0`` is special
    cased first (from the previous diagonal's ``H[en0-1]``), then the body is
    scanned in blocks of four with *per-lane* running maxima (strict ``>``,
    first occurrence wins per lane), lanes merged in lane order, and a scalar
    tail.  The resulting tie-breaking order for ``max_t`` is observable
    behavior (it feeds the Z-drop diagonal and the traceback start cell), so
    it is reproduced exactly rather than replaced by a plain argmax.

    ``vvals``/``uvals`` are the *new* per-diagonal deltas as int32 (caller
    chooses signedness); ``sub`` is the per-step offset (q+e for the 1-piece
    kernel, 0 for the pre-shifted 2-piece/splice kernels).  Updates ``H`` in
    place over ``[st0, en0]`` and returns ``(max_H, max_t)``.
    """
    if en0 > 0:
        h_en0 = int(H[en0 - 1]) + int(uvals[en0]) - sub
    else:
        h_en0 = int(H[en0]) + int(vvals[en0]) - sub
    max_H, max_t = h_en0, en0
    en1 = st0 + (en0 - st0) // 4 * 4
    if en1 > st0:
        seg = H[st0:en1] + vvals[st0:en1] - sub
        H[st0:en1] = seg
        blocks = seg.reshape(-1, 4)
        lane_max = blocks.max(axis=0)
        lane_arg = blocks.argmax(axis=0)  # first occurrence == running strict >
        for i in range(4):
            if max_H < int(lane_max[i]):
                max_H = int(lane_max[i])
                max_t = st0 + int(lane_arg[i]) * 4 + i
    for t in range(en1, en0):
        H[t] += int(vvals[t]) - sub
        if int(H[t]) > max_H:
            max_H, max_t = int(H[t]), t
    H[en0] = h_en0
    return max_H, max_t


__all__ = ["c_div", "sra1", "apply_zdrop", "exact_max_scan"]
