"""Pallas TPU wavefront kernel: one-piece affine extension (extz2 semantics).

TPU-first redesign of the reference's anti-diagonal difference DP
(``ksw2_extz2_sse.c``): the 16-lane SSE loop becomes a full-band VPU sweep
over ``(R, 128)`` delta arrays resident in VMEM, with the diagonal loop
running *inside* the kernel (a grid step processes a chunk of diagonals and
streams that chunk's direction-byte rows to HBM).  Byte parity with the
reference is preserved: band bounds are rounded to 16 lanes exactly as the
SSE code does (ksw2_extz2_sse.c:116), stores outside the rounded band are
masked off (so "garbage lane" values evolve identically), and the exact-max
path reproduces the 4-lane argmax merge order of the reference's SSE scan
(ksw2_extz2_sse.c:224-261) via key encoding.

Representation: every int8 delta is carried as its *unsigned* byte value
(0..255) in an int32 lane.  Under this canon each SSE byte op is 1-2 cheap
vector ops: ``add/sub_epi8 -> (a±b)&255``, ``max/min_epu8 -> max/min``,
``cmpgt_epi8(a,b) -> (a^128)>(b^128)``.  The score profile is stored with
the ``+2(q+e)`` shift (ksw2_extz2_sse.c:150) and the sign-bias XOR already
folded in, so the inner loop's ``z`` chain costs three ops.

Exact-max tracking comes in two flavours:

* ``zdrop >= 0`` needs the running maximum *per diagonal* (the Z-drop test
  consults it every step), so the kernel reduces the band each diagonal,
  mirroring the SSE H scan.
* ``zdrop < 0`` defers everything: per-lane arrays ``HM`` (running max of
  H[t]) and ``RD`` (first diagonal where HM[t] attained its final value)
  are maintained with three vector ops, and a single finalization at the
  last grid step reconstructs the exact (max, max_t, max_q) triple the
  sequential reference would produce, including its tie-breaks: earliest
  diagonal wins (strict ``>`` updates), the ``H[en0]`` boundary cell wins
  ties inside a diagonal, then the SSE 4-lane merge order.

Layout: the t axis (target index) is flattened into rows of 128 lanes;
``shift by one in t`` = lane roll + a row-shifted fixup of lane 0 (three
vector ops), mirroring the SSE byte-shift carry chain at 8x the width.

Scalar per-diagonal state (running max, Z-drop, approx-H0 walk, band memo)
lives in SMEM; early termination is a flag that turns remaining diagonals
into no-ops (the grid itself cannot early-exit).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.flags import NEG_INF, Flag

# SMEM scalar-state slots
MAX, MAXT, MAXQ, MQE, MQET, MTE, MTEQ, SCORE, ZDROP, FIN, H0, LASTH0T, \
    LASTST, LASTEN, STOPR = range(15)
NSTATE = 16

_INT_MIN = -(2 ** 31) + 1
_BIGKEY = 2 ** 30
I32 = jnp.int32


def _lane_iota():
    return jax.lax.broadcasted_iota(I32, (1, 128), 1)


def _w8(x):
    """Wrap an int32 vector/scalar to the canonical int8 value (C wrap).

    Legacy signed-canonical helper kept for the extd kernel; the extz kernel
    itself now carries unsigned byte values (see module docstring).
    """
    return ((x + 128) & 255) - 128


def _shift_t(arr, first_fix):
    """out[t] = arr[t-1] over a flattened (R,128) t-axis; out[0]=first_fix.

    Equivalent of the SSE slli/srli carry chain (ksw2_extz2_sse.c:28-35).
    Standalone variant (recomputes its masks); the extz kernel uses a
    closure with hoisted masks instead.
    """
    rolled = jnp.roll(arr, 1, axis=1)
    carried = jnp.roll(rolled, 1, axis=0)
    lane0 = jax.lax.broadcasted_iota(I32, arr.shape, 1) == 0
    out = jnp.where(lane0, carried, rolled)
    row0 = jax.lax.broadcasted_iota(I32, arr.shape, 0) == 0
    return jnp.where(lane0 & row0, first_fix, out)


def _ld(ref, t):
    """Dynamic scalar load from an (R,128) ref at flat index t, as int32.

    Mosaic only allows dynamic slicing on the sublane dim, so the row is
    sliced dynamically and the lane is selected with a masked reduce.
    """
    row = ref[pl.ds(t // 128, 1), :].astype(I32)
    return jnp.max(jnp.where(_lane_iota() == t % 128, row, _INT_MIN))


def _st(ref, t, val):
    """Dynamic scalar store into an (R,128) ref at flat index t."""
    idx = pl.ds(t // 128, 1)
    row = ref[idx, :]
    ref[idx, :] = jnp.where(_lane_iota() == t % 128, val, row)


def _ld_u8(ref, t):
    """Load a signed-canonical int8 scalar as its uint8 value (int32).

    Legacy helper for the extd kernel (extz stores unsigned bytes already).
    """
    return _ld(ref, t) & 0xFF


def _st_if(ref, t, val, cond):
    """Masked dynamic scalar store: ref[t] = val when cond (scalar bool)."""
    idx = pl.ds(t // 128, 1)
    row = ref[idx, :]
    ref[idx, :] = jnp.where((_lane_iota() == t % 128) & cond, val, row)


class ExtzParams(NamedTuple):
    qlen: int
    tlen: int
    m: int
    sc_mch: int
    sc_mis: int
    sc_N: int
    q: int
    e: int
    w: int          # resolved (>=0)
    zdrop: int
    flag: int
    chunk: int      # diagonals per grid step
    n_diag: int
    n_rows: int     # R of the (R,128) state arrays
    p_rows: int     # rows of the stored traceback window (cigar mode)


def _static_en0(r, qlen, tlen, w):
    """Python-time band end for diagonal r (mirrors the in-kernel formula)."""
    del qlen
    return min(tlen - 1, min(r, (r + w) >> 1))


def _static_stop(qlen, tlen, w, n_diag):
    """First diagonal whose band is empty, else n_diag (closed form).

    The band bounds are pure functions of r, so the reference's data-
    dependent "empty band => stop" break (ksw2_extz2_sse.c:111-114) is a
    compile-time constant; the deferred-max kernel sizes its grid by it.
    """
    import numpy as np
    r = np.arange(max(n_diag, 1), dtype=np.int64)
    st0 = np.maximum(0, np.maximum(r - qlen + 1, (r - w + 1) >> 1))
    en0 = np.minimum(tlen - 1, np.minimum(r, (r + w) >> 1))
    bad = np.nonzero(st0 > en0)[0]
    return int(bad[0]) if len(bad) else n_diag


def _merge_key(tvec, st0, en0):
    """SSE 4-lane merge-order key: smaller key = earlier in the scan.

    The reference scans the band as int32x4 vectors and merges the four
    lane-classes in order (ksw2_extz2_sse.c:224-261); lanes past the last
    full vector are visited after the vector scan.
    """
    en1 = st0 + (en0 - st0) // 4 * 4
    cls = (tvec - st0) & 3
    return jnp.where(tvec < en1, cls * (1 << 26) + tvec, (1 << 28) + tvec)


def _extz_kernel_body(prm: ExtzParams, with_cigar: bool, refs):
    flag = Flag(prm.flag)
    approx = bool(flag & Flag.APPROX_MAX)
    right = bool(flag & Flag.RIGHT)
    # Deferred (per-lane) max tracking is valid whenever the running max is
    # never consulted mid-run: exact mode with Z-drop disabled.
    perlane = (not approx) and prm.zdrop < 0

    generic = bool(flag & Flag.GENERIC_SC)
    refs = list(refs)
    query_ref, target_ref = refs[:2]
    rest = refs[2:]
    prof_ref = rest.pop(0) if generic else None
    res_ref = rest.pop(0)
    p_ref = rest.pop(0) if with_cigar else None
    u, v, x, y, s, Q = rest[:6]
    rest = rest[6:]
    dscr = rest.pop(0) if with_cigar else None
    H = rest.pop(0)
    if perlane:
        HM, RD, MQ = rest.pop(0), rest.pop(0), rest.pop(0)
    else:
        HM = RD = MQ = None
    tn, ez = rest

    qlen, tlen, w = prm.qlen, prm.tlen, prm.w
    qe = prm.q + prm.e
    R = prm.n_rows
    shape = (R, 128)
    n_steps = pl.num_programs(0)

    # score-profile constants: +2(q+e) shift and sign bias pre-folded
    sb_mch = ((prm.sc_mch + 2 * qe) & 255) ^ 128
    sb_mis = ((prm.sc_mis + 2 * qe) & 255) ^ 128
    sb_N = ((prm.sc_N + 2 * qe) & 255) ^ 128
    clamp = (prm.sc_mch + 2 * qe) & 255

    step = pl.program_id(0)
    # loop-invariant index planes (hoisted out of the diagonal loop)
    tvec = (jax.lax.broadcasted_iota(I32, shape, 0) * 128
            + jax.lax.broadcasted_iota(I32, shape, 1))
    lane0 = jax.lax.broadcasted_iota(I32, shape, 1) == 0
    row0 = jax.lax.broadcasted_iota(I32, shape, 0) == 0
    mask00 = lane0 & row0

    def _shift_t(arr, first_fix):
        """out[t] = arr[t-1] over the flattened (R,128) t-axis.

        Equivalent of the SSE slli/srli carry chain (ksw2_extz2_sse.c:28-35).
        """
        rolled = jnp.roll(arr, 1, axis=1)        # lane l-1 -> l (lane 0 wrong)
        carried = jnp.roll(rolled, 1, axis=0)    # [r,0] now holds arr[r-1,127]
        out = jnp.where(lane0, carried, rolled)
        return jnp.where(mask00, first_fix, out)

    @pl.when(step == 0)
    def _init():
        zero = jnp.zeros(shape, I32)
        u[...] = zero
        v[...] = zero
        x[...] = zero
        y[...] = zero
        # never-filled s lanes must read as raw byte 0, i.e. the biased
        # encoding of a zero score: bias(0) = ((0 + 2(q+e)) & 255) ^ 128
        s[...] = jnp.full(shape, ((2 * qe) & 255) ^ 128, I32)
        Q[...] = zero
        tn[...] = (target_ref[...] == prm.m - 1).astype(I32)
        if not approx:
            H[...] = jnp.full(shape, NEG_INF, I32)
        if perlane:
            HM[...] = jnp.full(shape, NEG_INF, I32)
            RD[...] = zero
            MQ[...] = jnp.full(shape, NEG_INF, I32)
        for k in (MAXT, MAXQ, MQET, MTEQ):
            ez[k] = -1
        for k in (MQE, MTE, SCORE):
            ez[k] = NEG_INF
        for k in (MAX, ZDROP, FIN, H0, LASTH0T):
            ez[k] = 0
        ez[LASTST] = -1
        ez[LASTEN] = -1
        ez[STOPR] = prm.n_diag

    def _zdrop_update(Hval, rr, tt, e_comp):
        better = Hval > ez[MAX]
        mt, mq = ez[MAXT], ez[MAXQ]
        tl = tt - mt
        ql = (rr - tt) - mq
        l = jnp.abs(tl - ql)
        trigger = (
            jnp.logical_not(better) & (tt >= mt) & (rr - tt >= mq)
            & (prm.zdrop >= 0) & (ez[MAX] - Hval > prm.zdrop + l * e_comp)
        )
        ez[MAX] = jnp.where(better, Hval, ez[MAX])
        ez[MAXT] = jnp.where(better, tt, mt)
        ez[MAXQ] = jnp.where(better, rr - tt, mq)

        @pl.when(trigger)
        def _():
            ez[ZDROP] = 1
            ez[FIN] = 1
            ez[STOPR] = rr

    def _h_boundary(r, st0, en0, en):
        """Maintain the H column values shared by both exact variants.

        Returns (h_last, Hnew, scan_mask): the boundary cell value written at
        en0 plus the vectorized in-band H update (applied by the caller).
        """
        h_en0 = jnp.where(
            en0 > 0,
            _ld(H, jnp.maximum(en0 - 1, 0)) + _ld(u, en0) - qe,
            _ld(H, en0) + _ld(v, en0) - qe,
        )
        is0 = r == 0
        h0val = _ld(v, 0) - 2 * qe
        scan_mask = (tvec >= st0) & (tvec < en0) & jnp.logical_not(is0)
        Hnew = H[...] + v[...] - qe
        H[...] = jnp.where(scan_mask, Hnew, H[...])
        h_last = jnp.where(is0, h0val, h_en0)
        _st(H, en0, h_last)

        @pl.when((en0 == tlen - 1) & (h_last > ez[MTE]))
        def _():
            ez[MTE] = h_last
            ez[MTEQ] = r - en

        h_st0 = _ld(H, st0)

        @pl.when((r - st0 == qlen - 1) & (h_st0 > ez[MQE]))
        def _():
            ez[MQE] = h_st0
            ez[MQET] = st0

        return h_last, Hnew, scan_mask

    def _exact_update(r, st0, en0, en):
        """Per-diagonal exact max scan (needed when Z-drop is live)."""
        h_last, Hnew, scan_mask = _h_boundary(r, st0, en0, en)
        is0 = r == 0
        M_body = jnp.max(jnp.where(scan_mask, Hnew, _INT_MIN))
        M = jnp.maximum(M_body, h_last)
        keym = jnp.where(scan_mask & (Hnew == M),
                         _merge_key(tvec, st0, en0), _BIGKEY)
        kmin = jnp.min(keym)
        max_t = jnp.where(h_last == M, en0, kmin & ((1 << 26) - 1))
        max_t = jnp.where(is0, 0, max_t)
        _zdrop_update(M, r, max_t, prm.e)

        @pl.when((r == qlen + tlen - 2) & (en0 == tlen - 1)
                 & (ez[FIN] == 0))
        def _():
            ez[SCORE] = h_last

    def _perlane_update(r, st0, en0):
        """Deferred max with a fully vectorized H column: no lane extracts.

        The reference's scalar boundary chain ``H[en0] = H[en0-1] + u[en0]
        - qe`` (ksw2_extz2_sse.c:252-256) is the same difference identity as
        the in-band update, applied along the *other* axis — so it can be
        computed for every lane at once as ``shift_t(H) + u - qe`` and
        selected at the single boundary lane.  mte is exactly HM/RD at lane
        tlen-1; mqe samples each lane at its unique last-row diagonal.
        """
        Hold = H[...]
        Hv = Hold + v[...] - qe
        Hs = _shift_t(Hold, NEG_INF) + u[...] - qe
        is0 = r == 0
        scan_mask = (tvec >= st0) & (tvec < en0) & jnp.logical_not(is0)
        h_en0_vec = jnp.where(en0 > 0, Hs, Hv)
        h_en0_vec = jnp.where(is0, v[...] - 2 * qe, h_en0_vec)
        en0m = tvec == en0
        Hnew = jnp.where(en0m, h_en0_vec, jnp.where(scan_mask, Hv, Hold))
        H[...] = Hnew
        better = (en0m | scan_mask) & (Hnew > HM[...])
        HM[...] = jnp.where(better, Hnew, HM[...])
        RD[...] = jnp.where(better, r, RD[...])
        # mqe: H[st0] on the one diagonal where lane st0 sits on the last
        # query row (r - st0 == qlen-1); each lane is sampled at most once
        MQ[...] = jnp.where(
            ((r - st0) == (qlen - 1)) & (tvec == st0), Hnew, MQ[...])

    def _perlane_finalize(r_stop):
        """Reconstruct ez exactly as the sequential scan would have."""
        V = jnp.max(HM[...])

        @pl.when(V > 0)
        def _():
            cand = HM[...] == V
            rstar = jnp.min(jnp.where(cand, RD[...], prm.n_diag + 1))
            st0 = jnp.maximum(
                0, jnp.maximum(rstar - qlen + 1, (rstar - w + 1) >> 1))
            en0 = jnp.minimum(tlen - 1, jnp.minimum(rstar, (rstar + w) >> 1))
            first = cand & (RD[...] == rstar)
            # the H[en0] boundary cell wins in-diagonal ties; then merge order
            en0_hit = (_ld(HM, en0) == V) & (_ld(RD, en0) == rstar)
            keym = jnp.where(first, _merge_key(tvec, st0, en0), _BIGKEY)
            kmin = jnp.min(keym)
            max_t = jnp.where(en0_hit | (rstar == 0),
                              jnp.where(rstar == 0, 0, en0),
                              kmin & ((1 << 26) - 1))
            ez[MAX] = V
            ez[MAXT] = max_t
            ez[MAXQ] = rstar - max_t

        mq = jnp.max(MQ[...])

        @pl.when(mq > NEG_INF)
        def _():
            ez[MQE] = mq
            ez[MQET] = jnp.min(jnp.where(MQ[...] == mq, tvec, _BIGKEY))

        hmte = _ld(HM, tlen - 1)
        rdte = _ld(RD, tlen - 1)
        en_const = ((tlen - 1 + 16) // 16) * 16 - 1

        @pl.when(hmte > NEG_INF)
        def _():
            ez[MTE] = hmte
            ez[MTEQ] = rdte - en_const

        if r_stop < prm.n_diag:       # static: band went empty (zdropped)
            ez[ZDROP] = 1
            ez[STOPR] = r_stop
        score_ok = r_stop == prm.n_diag and _static_en0(
            prm.n_diag - 1, qlen, tlen, w) == tlen - 1
        if score_ok:
            ez[SCORE] = _ld(H, tlen - 1)

    def _approx_update(r, st0, en0):
        lt = ez[LASTH0T]
        c1 = (lt >= st0) & (lt <= en0)
        c2 = (lt + 1 >= st0) & (lt + 1 <= en0)
        lt1 = jnp.minimum(lt + 1, prm.n_rows * 128 - 1)
        d0 = _ld(v, lt) - qe
        d1 = _ld(u, lt1) - qe
        both = c1 & c2
        newH0 = jnp.where(
            both,
            ez[H0] + jnp.maximum(d0, d1),
            jnp.where(c1, ez[H0] + d0, ez[H0] + d1),
        )
        newlt = jnp.where(both, jnp.where(d0 > d1, lt, lt + 1),
                          jnp.where(c1, lt, lt + 1))
        is0 = r == 0
        h00 = _ld(v, 0) - 2 * qe
        ez[H0] = jnp.where(is0, h00, newH0)
        ez[LASTH0T] = jnp.where(is0, 0, newlt)
        if flag & Flag.APPROX_DROP:
            @pl.when(jnp.logical_not(is0))
            def _():
                _zdrop_update(ez[H0], r, ez[LASTH0T], prm.e)

        @pl.when((r == qlen + tlen - 2) & (en0 == tlen - 1)
                 & (ez[FIN] == 0))
        def _():
            ez[SCORE] = ez[H0]

    def _sweep(r, rr, st0, en0, st, en, need_ov):
        """One diagonal of the difference recurrence (stores u/v/x/y [+d])."""
        ov_v = jnp.where(st == 0, ((r > 0).astype(I32) * prm.q), 0)
        # first-column boundary (u[r]=q, y[r]=0 when en>=r) is folded
        # into the recurrence reads: lane r is always rewritten by
        # the masked store below, so the preset never persists.
        col_mask = (en >= r) & (tvec == r)
        ut = jnp.where(col_mask, ((r > 0).astype(I32) * prm.q), u[...])
        yt = jnp.where(col_mask, 0, y[...])

        # reversed-query window: shift right, inject query[r] at t=0
        qv = _ld(query_ref, jnp.minimum(r, qlen - 1))
        Qn = _shift_t(Q[...], qv)
        Q[...] = Qn

        if generic:
            # KSW_EZ_GENERIC_SC: m pre-biased query-symbol profile planes
            # (prof_c[t] = mat[target[t]*m + c]); the reference fills
            # exactly [st0, en0] here, not 16-byte blocks
            # (ksw2_extz2_sse.c:141-144)
            sval = prof_ref[pl.ds(0, R), :]
            for c in range(1, prm.m):
                sval = jnp.where(Qn == c, prof_ref[pl.ds(c * R, R), :],
                                 sval)
            smask = (tvec >= st0) & (tvec <= en0)
        else:
            # score profile over [st0, fill_hi] (16-block store extent),
            # stored with the +2(q+e) shift and sign bias pre-applied
            fill_hi = st0 + ((en0 - st0) // 16) * 16 + 15
            eq = target_ref[...] == Qn
            nm = (tn[...] != 0) | (Qn == prm.m - 1)
            sval = jnp.where(eq, sb_mch, sb_mis)
            sval = jnp.where(nm, sb_N, sval)
            smask = (tvec >= st0) & (tvec <= fill_hi)
        s[...] = jnp.where(smask, sval, s[...])

        # core difference recurrence on unsigned byte values
        ovm = (tvec == st) & need_ov
        xs = jnp.where(ovm, 0, _shift_t(x[...], 0))
        vs = jnp.where(ovm, ov_v, _shift_t(v[...], ov_v))
        a = (xs + vs) & 255
        b = (yt + ut) & 255
        ab = a ^ 128                       # sign-biased view of a
        if with_cigar:
            if not right:
                d = jnp.where(ab > s[...], 1, 0)
            else:
                d = jnp.where(s[...] > ab, 0, 1)
        zb = jnp.maximum(s[...], ab)       # signed epi8 max (biased)
        if with_cigar:
            bb = b ^ 128
            if not right:
                d = jnp.where(bb > zb, 2, d)
            else:
                d = jnp.where(zb > bb, d, 2)
        z = zb ^ 128
        z = jnp.maximum(z, b)              # max_epu8
        z = jnp.minimum(z, clamp)          # min_epu8 vs constant
        unew = (z - vs) & 255
        vnew = (z - ut) & 255
        z2 = z - prm.q                     # consumers re-mask mod 256
        an = (a - z2) & 255
        bn = (b - z2) & 255
        anb = an ^ 128
        bnb = bn ^ 128
        if with_cigar:
            if not right:
                ta, tb = anb > 128, bnb > 128
            else:
                ta, tb = jnp.logical_not(anb < 128), \
            jnp.logical_not(bnb < 128)
            d = d | jnp.where(ta, 0x08, 0)
            d = d | jnp.where(tb, 0x10, 0)
        bmask = (tvec >= st) & (tvec <= en)
        u[...] = jnp.where(bmask, unew, u[...])
        v[...] = jnp.where(bmask, vnew, v[...])
        x[...] = jnp.where(bmask, jnp.where(anb > 128, an, 0), x[...])
        y[...] = jnp.where(bmask, jnp.where(bnb > 128, bn, 0), y[...])

        if with_cigar:
            if prm.p_rows >= R:
                # full-rows mode (unbanded/square: the stored window
                # already spans every row) — static store at true row
                # positions, store_off == 0, no per-diagonal dynamic
                # relayout of the direction plane
                p_ref[pl.ds(rr, 1), pl.ds(0, R)] = d.astype(jnp.int8)[None]
            else:
                dscr[pl.ds(0, R)] = d
                row0_ = st // 128
                p_ref[pl.ds(rr, 1)] = (
                dscr[pl.ds(row0_, prm.p_rows), :].astype(jnp.int8)[None]
                )


    def diag_body(rr, _):
        """zdrop / approx variants: sequential scalar state in SMEM."""
        r = step * prm.chunk + rr

        @pl.when((r < prm.n_diag) & (ez[FIN] == 0))
        def _():
            st0 = jnp.maximum(0, jnp.maximum(r - qlen + 1, (r - w + 1) >> 1))
            en0 = jnp.minimum(tlen - 1, jnp.minimum(r, (r + w) >> 1))

            @pl.when(st0 > en0)
            def _band_empty():
                ez[ZDROP] = 1
                ez[FIN] = 1
                ez[STOPR] = r

            @pl.when(st0 <= en0)
            def _main():
                st = st0 // 16 * 16
                en = (en0 + 16) // 16 * 16 - 1
                in_range = (st - 1 >= ez[LASTST]) & (st - 1 <= ez[LASTEN])
                need_ov = (st == 0) | jnp.logical_not(in_range)
                _sweep(r, rr, st0, en0, st, en, need_ov)
                if approx:
                    _approx_update(r, st0, en0)
                else:
                    _exact_update(r, st0, en0, en)
                ez[LASTST] = st
                ez[LASTEN] = en

    def diag_body_perlane(r_stop, rr, _):
        """Deferred-max variant: no per-diagonal SMEM state or lane
        extracts; the previous band and the stop diagonal are closed-form
        functions of r, so the only scalar work is index arithmetic."""
        r = step * prm.chunk + rr

        @pl.when(r < r_stop)
        def _():
            st0 = jnp.maximum(0, jnp.maximum(r - qlen + 1, (r - w + 1) >> 1))
            en0 = jnp.minimum(tlen - 1, jnp.minimum(r, (r + w) >> 1))
            st = st0 // 16 * 16
            en = (en0 + 16) // 16 * 16 - 1
            r1 = r - 1
            st0p = jnp.maximum(
                0, jnp.maximum(r1 - qlen + 1, (r1 - w + 1) >> 1))
            en0p = jnp.minimum(tlen - 1, jnp.minimum(r1, (r1 + w) >> 1))
            stp = st0p // 16 * 16
            enp = (en0p + 16) // 16 * 16 - 1
            in_range = (r > 0) & (st - 1 >= stp) & (st - 1 <= enp)
            need_ov = (st == 0) | jnp.logical_not(in_range)
            _sweep(r, rr, st0, en0, st, en, need_ov)
            _perlane_update(r, st0, en0)

    if perlane:
        r_stop = _static_stop(qlen, tlen, w, prm.n_diag)
        jax.lax.fori_loop(
            0, prm.chunk, functools.partial(diag_body_perlane, r_stop), None)

        @pl.when(step == n_steps - 1)
        def _():
            _perlane_finalize(r_stop)
    else:
        jax.lax.fori_loop(0, prm.chunk, diag_body, None)
    for k in range(NSTATE):
        res_ref[k] = ez[k] if k < 15 else 0


def build_extz_call(prm: ExtzParams, with_cigar: bool, interpret: bool = False):
    R = prm.n_rows
    shape = (R, 128)
    scratch = [
        pltpu.VMEM(shape, jnp.int32),   # u
        pltpu.VMEM(shape, jnp.int32),   # v
        pltpu.VMEM(shape, jnp.int32),   # x
        pltpu.VMEM(shape, jnp.int32),   # y
        pltpu.VMEM(shape, jnp.int32),   # s
        pltpu.VMEM(shape, jnp.int32),   # Q
    ]
    flag = Flag(prm.flag)
    perlane = not (flag & Flag.APPROX_MAX) and prm.zdrop < 0
    if with_cigar:
        scratch.append(pltpu.VMEM((R + prm.p_rows, 128), jnp.int32))  # dscr
    scratch.append(pltpu.VMEM(shape, jnp.int32))  # H (unused in approx mode)
    if perlane:
        scratch += [
            pltpu.VMEM(shape, jnp.int32),  # HM (per-lane running max)
            pltpu.VMEM(shape, jnp.int32),  # RD (first-attainment diagonal)
            pltpu.VMEM(shape, jnp.int32),  # MQ (query-end row samples)
        ]
    scratch += [
        pltpu.VMEM(shape, jnp.int32),  # tn (target wildcard mask)
        pltpu.SMEM((NSTATE,), jnp.int32),  # ez scalars
    ]
    # deferred-max grids stop at the (static) first empty-band diagonal
    n_live = (_static_stop(prm.qlen, prm.tlen, prm.w, prm.n_diag)
              if perlane else prm.n_diag)
    n_steps = (n_live + prm.chunk - 1) // prm.chunk
    grid = (n_steps,)
    kernel = functools.partial(_extz_kernel_body, prm, with_cigar)

    def wrap(*refs):
        kernel(refs)

    from .bands import stable_kernel_name as _skn
    try:
        wrap.__name__ = _skn('wavefront', prm)
    except NameError:
        pass
    out_shape = [jax.ShapeDtypeStruct((NSTATE,), jnp.int32)]
    out_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    import os as _os
    _pdt = jnp.int32 if _os.environ.get("KSW2_CG") == "4" else jnp.int8
    if with_cigar:
        out_shape.append(jax.ShapeDtypeStruct(
            (n_steps * prm.chunk, prm.p_rows, 128), _pdt))
        out_specs.append(pl.BlockSpec(
            (prm.chunk, prm.p_rows, 128), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM))

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # query (Rq,128) int32
        pl.BlockSpec(memory_space=pltpu.VMEM),  # target (R,128) int32
    ]
    if flag & Flag.GENERIC_SC:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # profiles
    call = pl.pallas_call(
        wrap,
        grid=grid,
        in_specs=in_specs,
        out_shape=out_shape,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )
    return call


# ---------------------------------------------------------------------------
# Phased score-only kernel: static row windows
#
# Per-diagonal work in the monolithic kernel is proportional to the FULL
# (R,128) state arrays even though a diagonal only touches its band rows.
# The active row window [row_lo(r), row_hi(r)] is a pure function of r, so
# the diagonal range splits into statically-known phases of bounded window
# height; each phase is its own pallas_call specialized to that height, with
# the delta state flowing between launches through aliased HBM buffers.  On
# an unbanded square pair this halves the average vector work (triangle
# phases); on banded runs (minimap2's production shape) the window is the
# band, independent of sequence length.
# ---------------------------------------------------------------------------

def _window_rows(qlen, tlen, w, n_diag, R):
    """Per-diagonal [row_lo, row_hi] of the rounded band, as numpy arrays."""
    import numpy as np
    r = np.arange(max(n_diag, 1), dtype=np.int64)
    st0 = np.maximum(0, np.maximum(r - qlen + 1, (r - w + 1) >> 1))
    en0 = np.minimum(tlen - 1, np.minimum(r, (r + w) >> 1))
    st = st0 // 16 * 16
    en = (en0 + 16) // 16 * 16 - 1
    row_lo = np.maximum(0, (st - 1) // 128)       # shift reads lane st-1
    row_hi = np.minimum(en // 128, R - 1)
    return row_lo, row_hi


def window_phases(qlen, tlen, w, n_diag, R, quant=32, min_len=1024):
    """Split [0, r_stop) into phases with STATIC row windows.

    Returns (phases, r_stop); phases = [(r_lo, r_hi, row_base, Wstat)].
    One compile-time window [row_base, row_base + Wstat) covers every
    diagonal's rounded band inside the phase, so every plane slice in the
    phase body is static — per-diagonal dynamic sublane offsets force
    relayout copies on Mosaic that cost more than the saved rows (measured
    ~5-10x per-lane vs the static batch kernels).  The band drifts only
    ``min_len/256`` rows per greedy segment, so the static span stays
    within one ``quant`` of the tight per-diagonal window.
    """
    import numpy as np
    r_stop = _static_stop(qlen, tlen, w, n_diag)
    row_lo, row_hi = _window_rows(qlen, tlen, w, n_diag, R)
    phases = []
    i = 0
    while i < r_stop:
        j = min(i + min_len, r_stop)
        lo = int(row_lo[i:j].min()) & -8          # sublane-tile aligned
        hi = int(row_hi[i:j].max())
        span = min(R, -(-(hi - lo + 1) // quant) * quant)
        while j < r_stop:                          # grow while span holds
            j2 = min(j + min_len, r_stop)
            lo2 = min(lo, int(row_lo[j:j2].min()) & -8)
            hi2 = max(hi, int(row_hi[j:j2].max()))
            span2 = min(R, -(-(hi2 - lo2 + 1) // quant) * quant)
            if span2 > span:
                break
            lo, hi, j = lo2, hi2, j2
        lo = max(0, min(lo, R - span))
        phases.append((i, j, lo, span))
        i = j
    if not phases:
        phases = [(0, max(r_stop, 1), 0, min(R, quant))]
    return phases, r_stop


# walk-state slots for the approx (-g) phase chain: carried between
# phases in an aliased (8,128) VMEM plane (row 0, lanes WH0..WSTOP —
# SMEM in/out aliasing is not honored on hardware), and mirrored into
# SMEM ez scratch slots inside each phase (ksw2_extz2_sse.c:270-286)
WH0, WLT, WMAX, WMAXT, WMAXQ, WSTOP = range(6)
NWALK = 8


def _extz_phase_body(prm: ExtzParams, r_lo, r_hi, row_base, Wcap,
                     is_last, approx, refs):
    """One phase of the score-only deferred-max kernel (windowed rows).

    ``approx`` builds the APPROX_MAX variant: no H/HM/RD/MQ planes at all
    (the reference's approx branch skips the int32 H row); instead the O(1)
    H0 walk runs per diagonal with one packed plane-reduce, and its scalar
    state (H0, t0, running max triple, drop flag) flows between phases in
    the ``wk`` SMEM vector.  APPROX_DROP's running-max update runs whenever
    the flag is set; the drop itself needs ``zdrop >= 0``.
    """
    refs = list(refs)
    qsmem_ref, target_ref = refs[:2]
    NP = 6 if approx else 10
    k = 2 + NP + (1 if approx else 0)          # inputs alias the outputs
    if is_last:
        res_ref = refs[k]
        k += 1
    else:
        res_ref = None
    if approx:
        u, v, x, y, s, Q = refs[k:k + 6]
        wk = refs[k + 6]
        H = HM = RD = MQ = None
        ez = refs[k + 7]
    else:
        u, v, x, y, s, Q, H, HM, RD, MQ = refs[k:k + 10]
        wk = None
        ez = refs[k + 10]
    withad = approx and bool(Flag(prm.flag) & Flag.APPROX_DROP)
    withdrop = withad and prm.zdrop >= 0

    qlen, tlen, w = prm.qlen, prm.tlen, prm.w
    qe = prm.q + prm.e
    R = prm.n_rows
    sb_mch = ((prm.sc_mch + 2 * qe) & 255) ^ 128
    sb_mis = ((prm.sc_mis + 2 * qe) & 255) ^ 128
    sb_N = ((prm.sc_N + 2 * qe) & 255) ^ 128
    clamp = (prm.sc_mch + 2 * qe) & 255

    step = pl.program_id(0)
    wshape = (Wcap, 128)
    tvw_base = (jax.lax.broadcasted_iota(I32, wshape, 0) * 128
                + jax.lax.broadcasted_iota(I32, wshape, 1))
    lane0_w = jax.lax.broadcasted_iota(I32, wshape, 1) == 0

    # static phase facts: st==0 (the t=0 injection) only while st0 < 16,
    # and the first-column preset only while r <= en (~ tlen + 15)
    st_min_phase = min(
        max(0, max(rr_ - qlen + 1, (rr_ - w + 1) >> 1)) // 16 * 16
        for rr_ in (r_lo, r_hi - 1))
    may_fix = st_min_phase == 0
    may_col = r_lo <= tlen + 15

    def shiftw(arr, first_fix, fixm):
        rolled = jnp.roll(arr, 1, axis=1)
        carried = jnp.roll(rolled, 1, axis=0)
        out = jnp.where(lane0_w, carried, rolled)
        if fixm is None:
            return out
        return jnp.where(fixm, first_fix, out)

    if approx:
        # phase-entry: mirror the carried walk plane into SMEM scratch
        # slots (per-diagonal scalar state must live in SMEM; the plane
        # only ferries it between the aliased phase launches)
        @pl.when(step == 0)
        def _walk_load():
            ez[H0] = _ld(wk, WH0)
            ez[LASTH0T] = _ld(wk, WLT)
            ez[MAX] = _ld(wk, WMAX)
            ez[MAXT] = _ld(wk, WMAXT)
            ez[MAXQ] = _ld(wk, WMAXQ)
            ez[FIN] = _ld(wk, WSTOP)

    def diag(rr, _):
        r = r_lo + step * prm.chunk + rr
        go = r < r_hi
        if withdrop:
            go = go & (ez[FIN] == 0)       # Z-dropped: remaining diagonals
                                           # are no-ops (reference breaks)

        @pl.when(go)
        def _():
            st0 = jnp.maximum(0, jnp.maximum(r - qlen + 1, (r - w + 1) >> 1))
            en0 = jnp.minimum(tlen - 1, jnp.minimum(r, (r + w) >> 1))
            st = st0 // 16 * 16
            en = (en0 + 16) // 16 * 16 - 1
            r1 = r - 1
            st0p = jnp.maximum(
                0, jnp.maximum(r1 - qlen + 1, (r1 - w + 1) >> 1))
            en0p = jnp.minimum(tlen - 1, jnp.minimum(r1, (r1 + w) >> 1))
            in_range = ((r > 0) & (st - 1 >= st0p // 16 * 16)
                        & (st - 1 <= (en0p + 16) // 16 * 16 - 1))
            need_ov = (st == 0) | jnp.logical_not(in_range)
            ov_v = jnp.where(st == 0, ((r > 0).astype(I32) * prm.q), 0)

            # static window: the phase's row span is compile-time
            # constant, so every plane slice below is static (dynamic
            # sublane offsets force Mosaic relayout copies)
            win = slice(row_base, row_base + Wcap)
            tvw = tvw_base + row_base * 128
            # flat t==0 (shift injection); None when this phase's bands
            # never touch t==0 (st_min_phase > 0, monotone in r)
            fixm = (tvw == 0) if may_fix else None

            uc, vc, xc, yc = u[win, :], v[win, :], x[win, :], y[win, :]
            Qc, Tc = Q[win, :], target_ref[win, :]

            if may_col:
                col_mask = (en >= r) & (tvw == r)
                ut = jnp.where(col_mask, ((r > 0).astype(I32) * prm.q), uc)
                yt = jnp.where(col_mask, 0, yc)
            else:
                ut, yt = uc, yc

            qv = qsmem_ref[jnp.minimum(r, qlen - 1)]
            Qn = shiftw(Qc, qv, fixm)
            Q[win, :] = Qn

            fill_hi = st0 + ((en0 - st0) // 16) * 16 + 15
            eq = Tc == Qn
            nm = (Tc == prm.m - 1) | (Qn == prm.m - 1)
            sval = jnp.where(eq, sb_mch, sb_mis)
            sval = jnp.where(nm, sb_N, sval)
            smask = (tvw >= st0) & (tvw <= fill_hi)
            sn = jnp.where(smask, sval, s[win, :])
            s[win, :] = sn

            ovm = (tvw == st) & need_ov
            xs = jnp.where(ovm, 0, shiftw(xc, 0, fixm))
            vs = jnp.where(ovm, ov_v, shiftw(vc, ov_v, fixm))
            a = (xs + vs) & 255
            b = (yt + ut) & 255
            zb = jnp.maximum(sn, a ^ 128)
            z = zb ^ 128
            z = jnp.maximum(z, b)
            z = jnp.minimum(z, clamp)
            unew = (z - vs) & 255
            vnew = (z - ut) & 255
            z2 = z - prm.q
            an = (a - z2) & 255
            bn = (b - z2) & 255
            bmask = (tvw >= st) & (tvw <= en)
            un = jnp.where(bmask, unew, uc)
            vn = jnp.where(bmask, vnew, vc)
            u[win, :] = un
            v[win, :] = vn
            x[win, :] = jnp.where(bmask, jnp.where((an ^ 128) > 128, an, 0), xc)
            y[win, :] = jnp.where(bmask, jnp.where((bn ^ 128) > 128, bn, 0), yc)

            if not approx:
                Hc = H[win, :]
                Hv = Hc + vn - qe
                Hs = shiftw(Hc, NEG_INF, fixm) + un - qe
                is0 = r == 0
                scan_mask = ((tvw >= st0) & (tvw < en0)
                             & jnp.logical_not(is0))
                h_en0_vec = jnp.where(en0 > 0, Hs, Hv)
                h_en0_vec = jnp.where(is0, vn - 2 * qe, h_en0_vec)
                en0m = tvw == en0
                Hn = jnp.where(en0m, h_en0_vec,
                               jnp.where(scan_mask, Hv, Hc))
                H[win, :] = Hn
                HMc = HM[win, :]
                better = Hn > HMc              # H[t] <= HM[t] invariant
                HM[win, :] = jnp.where(better, Hn, HMc)
                RD[win, :] = jnp.where(better, r, RD[win, :])
                MQ[win, :] = jnp.where(
                    ((r - st0) == (qlen - 1)) & (tvw == st0), Hn,
                    MQ[win, :])
            else:
                # O(1) H0 walk (ksw2_extz2_sse.c:270-286): the tracked
                # cell moves t0 -> t0/t0+1 by comparing the two byte
                # deltas.  At most three disjoint lanes contribute, so one
                # packed sum-reduce recovers all fields (< 2^24).
                is0 = r == 0
                lt = ez[LASTH0T]
                c1 = (lt >= st0) & (lt <= en0)
                c2 = (lt + 1 >= st0) & (lt + 1 <= en0)
                ltn = jnp.minimum(lt + 1, R * 128 - 1)
                sel = (jnp.where(tvw == lt, vn, 0) * 256
                       + jnp.where(tvw == ltn, un, 0)
                       + jnp.where(tvw == 0, vn, 0) * 65536)
                Mb = jnp.sum(sel)
                d0 = ((Mb >> 8) & 255) - qe
                d1 = (Mb & 255) - qe
                both = c1 & c2
                h0c = ez[H0]
                newH0 = jnp.where(
                    both, h0c + jnp.maximum(d0, d1),
                    jnp.where(c1, h0c + d0, h0c + d1))
                newlt = jnp.where(both, jnp.where(d0 > d1, lt, lt + 1),
                                  jnp.where(c1, lt, lt + 1))
                h00 = (Mb >> 16) - 2 * qe
                M0 = jnp.where(is0, h00, newH0)
                t0_ = jnp.where(is0, 0, newlt)
                ez[H0] = M0
                ez[LASTH0T] = t0_
                # ksw_apply_zdrop on the walk value — only under
                # APPROX_DROP (max updates whenever the flag is set; the
                # drop itself additionally needs zdrop >= 0)
                if withad:
                    nis0 = jnp.logical_not(is0)
                    betterz = nis0 & (M0 > ez[MAX])
                    if withdrop:
                        l = jnp.abs((t0_ - ez[MAXT])
                                    - ((r - t0_) - ez[MAXQ]))
                        trig = (nis0 & jnp.logical_not(M0 > ez[MAX])
                                & (t0_ >= ez[MAXT])
                                & (r - t0_ >= ez[MAXQ])
                                & (ez[MAX] - M0 > prm.zdrop + l * prm.e))
                        ez[FIN] = jnp.where(trig, 1 + r, ez[FIN])
                    ez[MAX] = jnp.where(betterz, M0, ez[MAX])
                    ez[MAXT] = jnp.where(betterz, t0_, ez[MAXT])
                    ez[MAXQ] = jnp.where(betterz, r - t0_, ez[MAXQ])

    jax.lax.fori_loop(0, prm.chunk, diag, None)

    if approx:
        r_stop = r_hi

        @pl.when(step == pl.num_programs(0) - 1)
        def _walk_store():
            # ferry the walk scalars to the aliased output plane for the
            # next phase (row 0, lanes WH0..WSTOP)
            lanes8 = jax.lax.broadcasted_iota(I32, (8, 128), 1)
            rows8 = jax.lax.broadcasted_iota(I32, (8, 128), 0)
            plane = jnp.zeros((8, 128), I32)
            for idx, slot in ((WH0, H0), (WLT, LASTH0T), (WMAX, MAX),
                              (WMAXT, MAXT), (WMAXQ, MAXQ), (WSTOP, FIN)):
                plane = jnp.where((rows8 == 0) & (lanes8 == idx),
                                  ez[slot], plane)
            wk[...] = plane
            if is_last:
                # assemble the result record from the walk scalars
                w_h0 = ez[H0]
                w_max = ez[MAX]
                w_maxt = ez[MAXT]
                w_maxq = ez[MAXQ]
                w_stop = ez[FIN]
                for kk in (MAXT, MAXQ, MQET, MTEQ):
                    ez[kk] = -1
                for kk in (MQE, MTE):           # approx never sets mqe/mte
                    ez[kk] = NEG_INF
                ez[SCORE] = NEG_INF
                for kk in (MAX, ZDROP, H0, LASTH0T, FIN):
                    ez[kk] = 0
                ez[LASTST] = -1
                ez[LASTEN] = -1
                ez[STOPR] = prm.n_diag
                if withad:
                    ez[MAX] = w_max
                    ez[MAXT] = w_maxt
                    ez[MAXQ] = w_maxq
                dropped = (w_stop > 0) if withdrop else jnp.int32(0) > 0
                # final score = H0 only when the run reached the last
                # diagonal with the corner in-band and did not drop
                score_ok = (r_stop == prm.n_diag and _static_en0(
                    prm.n_diag - 1, qlen, tlen, w) == tlen - 1)
                if score_ok:
                    ez[SCORE] = jnp.where(dropped, NEG_INF, w_h0)
                if r_stop < prm.n_diag:
                    ez[ZDROP] = 1
                    ez[STOPR] = r_stop
                if withdrop:
                    ez[ZDROP] = jnp.maximum(ez[ZDROP],
                                            dropped.astype(I32))
                    ez[STOPR] = jnp.where(dropped, w_stop - 1, ez[STOPR])
                for kk in range(NSTATE):
                    res_ref[kk] = ez[kk] if kk < 15 else 0

    if is_last and not approx:
        tvec = (jax.lax.broadcasted_iota(I32, (R, 128), 0) * 128
                + jax.lax.broadcasted_iota(I32, (R, 128), 1))
        r_stop = r_hi                          # phases end at the stop diag

        @pl.when(step == pl.num_programs(0) - 1)
        def _fin():
            for k in (MAXT, MAXQ, MQET, MTEQ):
                ez[k] = -1
            for k in (MQE, MTE, SCORE):
                ez[k] = NEG_INF
            for k in (MAX, ZDROP, H0, LASTH0T, FIN):
                ez[k] = 0
            ez[LASTST] = -1
            ez[LASTEN] = -1
            ez[STOPR] = prm.n_diag
            V = jnp.max(HM[...])

            @pl.when(V > 0)
            def _():
                cand = HM[...] == V
                rstar = jnp.min(jnp.where(cand, RD[...], prm.n_diag + 1))
                st0 = jnp.maximum(
                    0, jnp.maximum(rstar - qlen + 1, (rstar - w + 1) >> 1))
                en0 = jnp.minimum(
                    tlen - 1, jnp.minimum(rstar, (rstar + w) >> 1))
                first = cand & (RD[...] == rstar)
                en0_hit = (_ld(HM, en0) == V) & (_ld(RD, en0) == rstar)
                keym = jnp.where(first, _merge_key(tvec, st0, en0), _BIGKEY)
                kmin = jnp.min(keym)
                max_t = jnp.where(en0_hit | (rstar == 0),
                                  jnp.where(rstar == 0, 0, en0),
                                  kmin & ((1 << 26) - 1))
                ez[MAX] = V
                ez[MAXT] = max_t
                ez[MAXQ] = rstar - max_t

            mq = jnp.max(MQ[...])

            @pl.when(mq > NEG_INF)
            def _():
                ez[MQE] = mq
                ez[MQET] = jnp.min(jnp.where(MQ[...] == mq, tvec, _BIGKEY))

            hmte = _ld(HM, tlen - 1)
            rdte = _ld(RD, tlen - 1)
            en_const = ((tlen - 1 + 16) // 16) * 16 - 1

            @pl.when(hmte > NEG_INF)
            def _():
                ez[MTE] = hmte
                ez[MTEQ] = rdte - en_const

            if r_stop < prm.n_diag:
                ez[ZDROP] = 1
                ez[STOPR] = r_stop
            score_ok = (r_stop == prm.n_diag and _static_en0(
                prm.n_diag - 1, qlen, tlen, w) == tlen - 1)
            if score_ok:
                ez[SCORE] = _ld(H, tlen - 1)
            for k in range(NSTATE):
                res_ref[k] = ez[k] if k < 15 else 0


def build_extz_phased(prm: ExtzParams, interpret: bool = False,
                      approx: bool = False):
    """Build the phased score-only call: (qpad, tpad) -> res[NSTATE].

    ``approx=False``: the deferred-max configuration (exact max, zdrop < 0,
    SCORE_ONLY).  ``approx=True``: the APPROX_MAX walk variant (any zdrop,
    SCORE_ONLY) — 6 state planes plus a walk-state SMEM vector flowing
    through the phase chain.  Callers dispatch from :func:`extz2_device`.
    """
    R = prm.n_rows
    shape = (R, 128)
    phases, r_stop = window_phases(prm.qlen, prm.tlen, prm.w, prm.n_diag, R)
    NP = 6 if approx else 10
    state_t = [jax.ShapeDtypeStruct(shape, jnp.int32)] * NP
    if approx:
        state_t.append(jax.ShapeDtypeStruct((8, 128), jnp.int32))
    NS = len(state_t)                          # planes (+ walk plane)

    calls = []
    for pi, (p_lo, p_hi, p_base, Wcap) in enumerate(phases):
        is_last = pi == len(phases) - 1
        n_steps = (p_hi - p_lo + prm.chunk - 1) // prm.chunk
        kernel = functools.partial(
            _extz_phase_body, prm, p_lo, p_hi, p_base, Wcap, is_last,
            approx)

        def wrap(*refs, _k=kernel):
            _k(refs)

        from .bands import stable_kernel_name as _skn
        try:
            wrap.__name__ = _skn('wavefront', prm)
        except NameError:
            pass
        out_shape = list(state_t)
        out_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * NS
        scratch = [pltpu.SMEM((NSTATE,), jnp.int32)]
        if is_last:
            out_shape = [jax.ShapeDtypeStruct((NSTATE,), jnp.int32)] \
                + out_shape
            out_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + out_specs
        aliases = {2 + i: (1 if is_last else 0) + i for i in range(NS)}
        in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)]
                    + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + NS))
        calls.append(pl.pallas_call(
            wrap,
            grid=(n_steps,),
            in_specs=in_specs,
            out_shape=out_shape,
            out_specs=out_specs,
            scratch_shapes=scratch,
            input_output_aliases=aliases,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        ))

    qe = prm.q + prm.e
    s_init = ((2 * qe) & 255) ^ 128

    def run(qpad, tpad):
        qflat = qpad.reshape(-1)
        zero = jnp.zeros(shape, jnp.int32)
        state = [zero, zero, zero, zero,
                 jnp.full(shape, s_init, jnp.int32), zero]
        if approx:
            walk0 = jnp.zeros((8, 128), jnp.int32)
            walk0 = walk0.at[0, WMAXT].set(-1).at[0, WMAXQ].set(-1)
            state.append(walk0)
        else:
            ninf = jnp.full(shape, NEG_INF, jnp.int32)
            state = state + [ninf, ninf, zero, ninf]
        for call in calls[:-1]:
            state = list(call(qflat, tpad, *state))
        out = calls[-1](qflat, tpad, *state)
        return out[0]

    return run


__all__ = ["ExtzParams", "build_extz_call", "build_extz_phased",
           "window_phases", "MAX", "MAXT", "MAXQ", "MQE",
           "MQET", "MTE", "MTEQ", "SCORE", "ZDROP", "FIN", "H0", "LASTH0T",
           "STOPR", "NSTATE"]
