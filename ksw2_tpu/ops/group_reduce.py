"""Cross-lane / cross-sublane group reductions for the batched kernels.

Every batched wavefront kernel packs one pair per ``P`` consecutive
sublane rows of an ``(R, 128)`` plane, with per-pair scalars held
lane-replicated (an ``(R, 1)`` column would force a ~50x relayout on
Mosaic; see README perf notes).  Reductions therefore run as butterflies:
7 lane steps (roll by 1,2,..,64) then group steps over the ``P`` rows of
each pair.

The group steps use cyclic shifts *within* each P-row group::

    alt[m] = arr[(m - k) mod P]      (m = row % P)

built from two whole-plane rolls and a select.  With doubling shifts
``k = 1, 2, 4, ..`` every element accumulates a cyclic window of
``W = 2^ceil(log2 P)`` rows.  For max/min any ``W >= P`` is correct
(overlap is idempotent), so **any P in 1..128 works, not just powers of
two**.  For sums the ``W - P`` wrapped rows double-count; since
``(m - d) mod P == (m - (d - P)) mod P`` the surplus equals the cyclic
window of size ``W - P`` ending at the same row, which is re-computed
from the lane-reduced input and subtracted (exact for any P).

These run inside Pallas kernels on int32 planes; the sum variant is only
exact while group totals stay in int32 (callers pack <= 24-bit fields).
"""
from __future__ import annotations

import jax.numpy as jnp


def _lane_butterfly(arr, op):
    k = 1
    while k < 128:
        arr = op(arr, jnp.roll(arr, k, axis=1))
        k *= 2
    return arr


def make_group_ops(rows, P: int):
    """Return ``(pmax, pmin, psum)`` reducing over each pair's lanes+rows.

    ``rows`` is the broadcasted sublane iota of the plane; ``P`` is the
    number of consecutive rows per pair (any value >= 1).  Results are
    fully replicated over each pair's lanes and rows.
    """
    resid = rows % P if P > 1 else None

    def cyc(arr, k):
        # group-cyclic shift down by k: out[m] = arr[(m - k) mod P]
        return jnp.where(resid >= k,
                         jnp.roll(arr, k, axis=0),
                         jnp.roll(arr, k - P, axis=0))

    def _group(arr, op):
        k = 1
        while k < P:
            arr = op(arr, cyc(arr, k))
            k *= 2
        return arr

    def pmax(arr):
        return _group(_lane_butterfly(arr, jnp.maximum), jnp.maximum)

    def pmin(arr):
        return _group(_lane_butterfly(arr, jnp.minimum), jnp.minimum)

    def psum(arr):
        arr = _lane_butterfly(arr, jnp.add)
        if P == 1:
            return arr
        base = arr
        W = 1 << (P - 1).bit_length()
        k = 1
        while k < W:
            arr = arr + cyc(arr, k)
            k *= 2
        E = W - P                      # wrapped (double-counted) rows
        if E:                          # E <= P - 1 (and <= 3 for P <= 8)
            extra = base               # cyclic window of size E ending at m
            for d in range(1, E):
                extra = extra + cyc(base, d)
            arr = arr - extra
        return arr

    return pmax, pmin, psum


__all__ = ["make_group_ops"]
