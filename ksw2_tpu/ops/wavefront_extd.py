"""Pallas TPU wavefront kernel: two-piece affine extension (extd2 semantics).

Same TPU-first architecture as :mod:`ksw2_tpu.ops.wavefront` (see its module
docstring), specialised to the dual gap cost min{q+k*e, q2+k*e2}
(``ksw2_extd2_sse.c``): six delta arrays (u,v,x,y,x2,y2) with the two-piece
shift convention (x/y/x2/y2 carried *unshifted*, init -q-e / -q2-e2), raw
score start for z, signed byte maxima with a signed clamp at mat[0], the
long_thres/long_diff boundary switch where the two cost lines cross, and the
reference's pre-swap q+e seed for H at r==0 (a replicated upstream quirk).

Representation: extd2's byte ops are *signed* (``max/min/cmpgt_epi8``), so
each int8 delta is carried in its int32 lane as the **biased** byte value
``(x + 128) & 255``.  Under this canon signed max/min/compare are direct
vector ops and add/sub cost a single folded constant:
``badd(a,b) = (a + b - 128) & 255``, ``bsub(a,b) = (a - b + 128) & 255``.

Exact-max tracking mirrors the extz kernel: a per-diagonal band reduction
when Z-drop is live, or deferred per-lane running-max arrays (HM/RD) plus a
single finalization reproducing the sequential scan's tie-breaks when
``zdrop < 0``.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.flags import NEG_INF, Flag
from .wavefront import (I32, NSTATE, _BIGKEY, _INT_MIN, _ld, _st, _st_if,
                        _merge_key, MAX, MAXT, MAXQ, MQE, MQET, MTE, MTEQ,
                        SCORE, ZDROP, FIN, H0, LASTH0T, LASTST, LASTEN, STOPR)

BIAS = 128


def _b(c):
    """Biased byte encoding of a small signed constant."""
    return (int(c) + BIAS) & 255


class ExtdParams(NamedTuple):
    qlen: int
    tlen: int
    m: int
    sc_mch: int
    sc_mis: int
    sc_N: int
    q: int
    e: int
    q2: int
    e2: int
    qe_pre_swap: int      # q+e before canonicalization (reference quirk)
    long_thres: int
    long_diff: int
    w: int
    zdrop: int
    flag: int
    chunk: int
    n_diag: int
    n_rows: int
    p_rows: int


def _extd_kernel_body(prm: ExtdParams, with_cigar: bool, refs):
    flag = Flag(prm.flag)
    approx = bool(flag & Flag.APPROX_MAX)
    right = bool(flag & Flag.RIGHT)
    perlane = (not approx) and prm.zdrop < 0

    generic = bool(flag & Flag.GENERIC_SC)
    refs = list(refs)
    query_ref, target_ref = refs[:2]
    rest = refs[2:]
    prof_ref = rest.pop(0) if generic else None
    res_ref = rest.pop(0)
    p_ref = rest.pop(0) if with_cigar else None
    u, v, x, y, x2, y2, s, Q = rest[:8]
    rest = rest[8:]
    dscr = rest.pop(0) if with_cigar else None
    H = rest.pop(0)
    HM, RD = (rest.pop(0), rest.pop(0)) if perlane else (None, None)
    tn, ez = rest

    qlen, tlen, w = prm.qlen, prm.tlen, prm.w
    qe, qe2 = prm.q + prm.e, prm.q2 + prm.e2
    R = prm.n_rows
    shape = (R, 128)
    n_steps = pl.num_programs(0)

    sb_mch, sb_mis, sb_N = _b(prm.sc_mch), _b(prm.sc_mis), _b(prm.sc_N)

    step = pl.program_id(0)
    tvec = (jax.lax.broadcasted_iota(I32, shape, 0) * 128
            + jax.lax.broadcasted_iota(I32, shape, 1))
    lane0 = jax.lax.broadcasted_iota(I32, shape, 1) == 0
    row0 = jax.lax.broadcasted_iota(I32, shape, 0) == 0
    mask00 = lane0 & row0

    def _shift_t(arr, first_fix):
        rolled = jnp.roll(arr, 1, axis=1)
        carried = jnp.roll(rolled, 1, axis=0)
        out = jnp.where(lane0, carried, rolled)
        return jnp.where(mask00, first_fix, out)

    def _lds(ref, t):
        """Signed int8 scalar from a biased (R,128) ref."""
        return _ld(ref, t) - BIAS

    @pl.when(step == 0)
    def _init():
        u[...] = jnp.full(shape, _b(-qe), I32)
        v[...] = jnp.full(shape, _b(-qe), I32)
        x[...] = jnp.full(shape, _b(-qe), I32)
        y[...] = jnp.full(shape, _b(-qe), I32)
        x2[...] = jnp.full(shape, _b(-qe2), I32)
        y2[...] = jnp.full(shape, _b(-qe2), I32)
        s[...] = jnp.full(shape, _b(0), I32)
        Q[...] = jnp.zeros(shape, I32)
        tn[...] = (target_ref[...] == prm.m - 1).astype(I32)
        if not approx:
            H[...] = jnp.full(shape, NEG_INF, I32)
        if perlane:
            HM[...] = jnp.full(shape, NEG_INF, I32)
            RD[...] = jnp.zeros(shape, I32)
        for k in (MAXT, MAXQ, MQET, MTEQ):
            ez[k] = -1
        for k in (MQE, MTE, SCORE):
            ez[k] = NEG_INF
        for k in (MAX, ZDROP, FIN, H0, LASTH0T):
            ez[k] = 0
        ez[LASTST] = -1
        ez[LASTEN] = -1
        ez[STOPR] = prm.n_diag

    def _ucol(r):
        """u[r]/v1 first-column boundary (long-gap cost switch), biased."""
        # branch-free priority chain (r==0 -> r<lt -> r==lt -> else):
        # a scalar jnp.where feeding a plane-level select mis-evaluates
        # under the Pallas interpreter's fori (Mosaic is fine)
        v = _b(-prm.e2) + (r == prm.long_thres).astype(I32) * (
            ((prm.long_diff + BIAS) & 255) - _b(-prm.e2))
        v = v + (r < prm.long_thres).astype(I32) * (_b(-prm.e) - v)
        return v + (r == 0).astype(I32) * (_b(-qe) - v)

    def _zdrop_update(Hval, rr, tt):
        better = Hval > ez[MAX]
        mt, mq = ez[MAXT], ez[MAXQ]
        l = jnp.abs((tt - mt) - ((rr - tt) - mq))
        trigger = (
            jnp.logical_not(better) & (tt >= mt) & (rr - tt >= mq)
            & (prm.zdrop >= 0) & (ez[MAX] - Hval > prm.zdrop + l * prm.e2)
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
        h_en0 = jnp.where(
            en0 > 0,
            _ld(H, jnp.maximum(en0 - 1, 0)) + _lds(u, en0),
            _ld(H, en0) + _lds(v, en0),
        )
        is0 = r == 0
        h0val = _lds(v, 0) - prm.qe_pre_swap  # pre-swap qe (reference quirk)
        scan_mask = (tvec >= st0) & (tvec < en0) & jnp.logical_not(is0)
        Hnew = H[...] + v[...] - BIAS
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
        h_last, Hnew, scan_mask = _h_boundary(r, st0, en0, en)
        is0 = r == 0
        M_body = jnp.max(jnp.where(scan_mask, Hnew, _INT_MIN))
        M = jnp.maximum(M_body, h_last)
        keym = jnp.where(scan_mask & (Hnew == M),
                         _merge_key(tvec, st0, en0), _BIGKEY)
        kmin = jnp.min(keym)
        max_t = jnp.where(h_last == M, en0, kmin & ((1 << 26) - 1))
        max_t = jnp.where(is0, 0, max_t)
        _zdrop_update(M, r, max_t)

        @pl.when((r == qlen + tlen - 2) & (en0 == tlen - 1)
                 & (ez[FIN] == 0))
        def _():
            ez[SCORE] = h_last

    def _perlane_update(r, st0, en0, en):
        h_last, Hnew, scan_mask = _h_boundary(r, st0, en0, en)
        better = scan_mask & (Hnew > HM[...])
        HM[...] = jnp.where(better, Hnew, HM[...])
        RD[...] = jnp.where(better, r, RD[...])
        up = h_last > _ld(HM, en0)
        _st_if(HM, en0, h_last, up)
        _st_if(RD, en0, r, up)

        @pl.when((r == qlen + tlen - 2) & (en0 == tlen - 1))
        def _():
            ez[SCORE] = h_last

    def _perlane_finalize():
        V = jnp.max(HM[...])

        @pl.when(V > 0)
        def _():
            cand = HM[...] == V
            rstar = jnp.min(jnp.where(cand, RD[...], prm.n_diag + 1))
            st0 = jnp.maximum(
                0, jnp.maximum(rstar - qlen + 1, (rstar - w + 1) >> 1))
            en0 = jnp.minimum(tlen - 1, jnp.minimum(rstar, (rstar + w) >> 1))
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

    def _approx_update(r, st0, en0):
        lt = ez[LASTH0T]
        c1 = (lt >= st0) & (lt <= en0)
        c2 = (lt + 1 >= st0) & (lt + 1 <= en0)
        lt1 = jnp.minimum(lt + 1, prm.n_rows * 128 - 1)
        d0 = _lds(v, lt)
        d1 = _lds(u, lt1)
        both = c1 & c2
        newH0 = jnp.where(both, ez[H0] + jnp.maximum(d0, d1),
                          jnp.where(c1, ez[H0] + d0, ez[H0] + d1))
        newlt = jnp.where(both, jnp.where(d0 > d1, lt, lt + 1),
                          jnp.where(c1, lt, lt + 1))
        is0 = r == 0
        h00 = _lds(v, 0) - prm.qe_pre_swap
        ez[H0] = jnp.where(is0, h00, newH0)
        ez[LASTH0T] = jnp.where(is0, 0, newlt)
        if flag & Flag.APPROX_DROP:
            # unlike extz2, extd2 applies the approx Z-drop at r==0 as well
            # (ksw2_extd2_sse.c:380 sits outside the r>0 branch)
            _zdrop_update(ez[H0], r, ez[LASTH0T])

        @pl.when((r == qlen + tlen - 2) & (en0 == tlen - 1)
                 & (ez[FIN] == 0))
        def _():
            ez[SCORE] = ez[H0]

    def diag_body(rr, _):
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
                # boundary values entering lane st (ksw2_extd2_sse.c:149-159)
                ov_x = _b(-qe)
                ov_x2 = _b(-qe2)
                ov_v = jnp.where(st == 0, _ucol(r), _b(-qe))
                # first-column presets fold into the recurrence reads: lane r
                # is always rewritten by the masked store below.
                col_mask = (en >= r) & (tvec == r)
                ut = jnp.where(col_mask, _ucol(r), u[...])
                yt = jnp.where(col_mask, _b(-qe), y[...])
                y2t = jnp.where(col_mask, _b(-qe2), y2[...])

                qv = _ld(query_ref, jnp.minimum(r, qlen - 1))
                Qn = _shift_t(Q[...], qv)
                Q[...] = Qn

                if generic:
                    # KSW_EZ_GENERIC_SC profile planes; reference fills
                    # exactly [st0, en0] (ksw2_extd2_sse.c:178-184)
                    R_ = prm.n_rows
                    sval = prof_ref[pl.ds(0, R_), :]
                    for c in range(1, prm.m):
                        sval = jnp.where(
                            Qn == c, prof_ref[pl.ds(c * R_, R_), :], sval)
                    smask = (tvec >= st0) & (tvec <= en0)
                else:
                    fill_hi = st0 + ((en0 - st0) // 16) * 16 + 15
                    eq = target_ref[...] == Qn
                    nm = (tn[...] != 0) | (Qn == prm.m - 1)
                    sval = jnp.where(eq, sb_mch, sb_mis)
                    sval = jnp.where(nm, sb_N, sval)
                    smask = (tvec >= st0) & (tvec <= fill_hi)
                s[...] = jnp.where(smask, sval, s[...])

                # core recurrence on biased byte values: signed max/min/cmp
                # are direct; add/sub re-center with a folded constant
                ovm = (tvec == st) & need_ov
                xs = jnp.where(ovm, ov_x, _shift_t(x[...], ov_x))
                x2s = jnp.where(ovm, ov_x2, _shift_t(x2[...], ov_x2))
                vs = jnp.where(ovm, ov_v, _shift_t(v[...], ov_v))
                a = (xs + vs - BIAS) & 255
                b = (yt + ut - BIAS) & 255
                a2 = (x2s + vs - BIAS) & 255
                b2 = (y2t + ut - BIAS) & 255
                z = s[...]
                if with_cigar:
                    d = jnp.zeros(shape, I32)
                    for cand, code in ((a, 1), (b, 2), (a2, 3), (b2, 4)):
                        if not right:
                            d = jnp.where(cand > z, code, d)
                        else:
                            d = jnp.where(z > cand, d, code)
                        z = jnp.maximum(z, cand)
                else:
                    for cand in (a, b, a2, b2):
                        z = jnp.maximum(z, cand)
                z = jnp.minimum(z, sb_mch)     # signed clamp (extd2 variant)
                unew = (z - vs + BIAS) & 255
                vnew = (z - ut + BIAS) & 255
                t1 = z - prm.q                  # biased view, consumers remask
                t2 = z - prm.q2
                an = (a - t1 + BIAS) & 255
                bn = (b - t1 + BIAS) & 255
                a2n = (a2 - t2 + BIAS) & 255
                b2n = (b2 - t2 + BIAS) & 255
                if with_cigar:
                    if not right:
                        ca, cb = an > BIAS, bn > BIAS
                        ca2, cb2 = a2n > BIAS, b2n > BIAS
                    else:
                        ca = jnp.logical_not(an < BIAS)
                        cb = jnp.logical_not(bn < BIAS)
                        ca2 = jnp.logical_not(a2n < BIAS)
                        cb2 = jnp.logical_not(b2n < BIAS)
                    d = d | jnp.where(ca, 0x08, 0) | jnp.where(cb, 0x10, 0)
                    d = d | jnp.where(ca2, 0x20, 0) | jnp.where(cb2, 0x40, 0)
                bmask = (tvec >= st) & (tvec <= en)
                u[...] = jnp.where(bmask, unew, u[...])
                v[...] = jnp.where(bmask, vnew, v[...])
                x[...] = jnp.where(
                    bmask, (jnp.maximum(an, BIAS) - qe) & 255, x[...])
                y[...] = jnp.where(
                    bmask, (jnp.maximum(bn, BIAS) - qe) & 255, y[...])
                x2[...] = jnp.where(
                    bmask, (jnp.maximum(a2n, BIAS) - qe2) & 255, x2[...])
                y2[...] = jnp.where(
                    bmask, (jnp.maximum(b2n, BIAS) - qe2) & 255, y2[...])

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

                if approx:
                    _approx_update(r, st0, en0)
                elif perlane:
                    _perlane_update(r, st0, en0, en)
                else:
                    _exact_update(r, st0, en0, en)

                ez[LASTST] = st
                ez[LASTEN] = en

    jax.lax.fori_loop(0, prm.chunk, diag_body, None)
    if perlane:
        @pl.when(step == n_steps - 1)
        def _():
            _perlane_finalize()
    for k in range(NSTATE):
        res_ref[k] = ez[k] if k < 15 else 0


def build_extd_call(prm: ExtdParams, with_cigar: bool, interpret: bool = False):
    R = prm.n_rows
    shape = (R, 128)
    flag = Flag(prm.flag)
    perlane = not (flag & Flag.APPROX_MAX) and prm.zdrop < 0
    scratch = [pltpu.VMEM(shape, jnp.int32) for _ in range(6)]  # u v x y x2 y2
    scratch += [
        pltpu.VMEM(shape, jnp.int32),   # s
        pltpu.VMEM(shape, jnp.int32),   # Q
    ]
    if with_cigar:
        scratch.append(pltpu.VMEM((R + prm.p_rows, 128), jnp.int32))  # dscr
    scratch.append(pltpu.VMEM(shape, jnp.int32))   # H
    if perlane:
        scratch += [
            pltpu.VMEM(shape, jnp.int32),  # HM
            pltpu.VMEM(shape, jnp.int32),  # RD
        ]
    scratch += [
        pltpu.VMEM(shape, jnp.int32),   # tn
        pltpu.SMEM((NSTATE,), jnp.int32),
    ]
    n_steps = (prm.n_diag + prm.chunk - 1) // prm.chunk
    kernel = functools.partial(_extd_kernel_body, prm, with_cigar)

    def wrap(*refs):
        kernel(refs)

    from .bands import stable_kernel_name as _skn
    try:
        wrap.__name__ = _skn('wavefront_extd', prm)
    except NameError:
        pass
    out_shape = [jax.ShapeDtypeStruct((NSTATE,), jnp.int32)]
    out_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    if with_cigar:
        out_shape.append(jax.ShapeDtypeStruct(
            (n_steps * prm.chunk, prm.p_rows, 128), jnp.int8))
        out_specs.append(pl.BlockSpec(
            (prm.chunk, prm.p_rows, 128), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM))

    return pl.pallas_call(
        wrap,
        grid=(n_steps,),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
            + ([pl.BlockSpec(memory_space=pltpu.VMEM)]
               if Flag(prm.flag) & Flag.GENERIC_SC else [])
        ),
        out_shape=out_shape,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


# ---------------------------------------------------------------------------
# Phased score-only kernel: static row windows (see wavefront.py's phased
# extz kernel for the design rationale; this is the two-piece variant).
# On banded runs — minimap2's production shape for extd2 — the per-diagonal
# work scales with the band, not the target length.
# ---------------------------------------------------------------------------

from .wavefront import (_static_en0, _static_stop, window_phases)


def _extd_phase_body(prm: ExtdParams, r_lo, r_hi, row_base, Wcap,
                     is_last, refs):
    refs = list(refs)
    qsmem_ref, target_ref = refs[:2]
    # refs[2:14] are the aliased state inputs (same buffers as the outputs)
    if is_last:
        res_ref = refs[14]
        u, v, x, y, x2, y2, s, Q, H, HM, RD, MQ = refs[15:27]
        ez = refs[27]
    else:
        res_ref = None
        u, v, x, y, x2, y2, s, Q, H, HM, RD, MQ = refs[14:26]
        ez = refs[26]

    qlen, tlen, w = prm.qlen, prm.tlen, prm.w
    qe, qe2 = prm.q + prm.e, prm.q2 + prm.e2
    R = prm.n_rows
    sb_mch, sb_mis, sb_N = _b(prm.sc_mch), _b(prm.sc_mis), _b(prm.sc_N)

    step = pl.program_id(0)
    wshape = (Wcap, 128)
    tvw_base = (jax.lax.broadcasted_iota(I32, wshape, 0) * 128
                + jax.lax.broadcasted_iota(I32, wshape, 1))
    lane0_w = jax.lax.broadcasted_iota(I32, wshape, 1) == 0

    def shiftw(arr, first_fix, fixm):
        rolled = jnp.roll(arr, 1, axis=1)
        carried = jnp.roll(rolled, 1, axis=0)
        out = jnp.where(lane0_w, carried, rolled)
        return jnp.where(fixm, first_fix, out)

    def _ucol(r):
        # branch-free priority chain (r==0 -> r<lt -> r==lt -> else):
        # a scalar jnp.where feeding a plane-level select mis-evaluates
        # under the Pallas interpreter's fori (Mosaic is fine)
        v = _b(-prm.e2) + (r == prm.long_thres).astype(I32) * (
            ((prm.long_diff + BIAS) & 255) - _b(-prm.e2))
        v = v + (r < prm.long_thres).astype(I32) * (_b(-prm.e) - v)
        return v + (r == 0).astype(I32) * (_b(-qe) - v)

    def diag(rr, _):
        r = r_lo + step * prm.chunk + rr

        @pl.when(r < r_hi)
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
            ov_x = _b(-qe)
            ov_x2 = _b(-qe2)
            ov_v = jnp.where(st == 0, _ucol(r), _b(-qe))

            # static window: the phase's row span is compile-time
            # constant, so every plane slice below is static (dynamic
            # sublane offsets force Mosaic relayout copies)
            win = slice(row_base, row_base + Wcap)
            tvw = tvw_base + row_base * 128
            fixm = tvw == 0

            uc, vc, xc, yc = u[win, :], v[win, :], x[win, :], y[win, :]
            x2c, y2c = x2[win, :], y2[win, :]
            Qc, Tc = Q[win, :], target_ref[win, :]

            col_mask = (en >= r) & (tvw == r)
            ut = jnp.where(col_mask, _ucol(r), uc)
            yt = jnp.where(col_mask, _b(-qe), yc)
            y2t = jnp.where(col_mask, _b(-qe2), y2c)

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
            xs = jnp.where(ovm, ov_x, shiftw(xc, ov_x, fixm))
            x2s = jnp.where(ovm, ov_x2, shiftw(x2c, ov_x2, fixm))
            vs = jnp.where(ovm, ov_v, shiftw(vc, ov_v, fixm))
            a = (xs + vs - BIAS) & 255
            b = (yt + ut - BIAS) & 255
            a2 = (x2s + vs - BIAS) & 255
            b2 = (y2t + ut - BIAS) & 255
            z = sn
            for cand in (a, b, a2, b2):
                z = jnp.maximum(z, cand)
            z = jnp.minimum(z, sb_mch)
            unew = (z - vs + BIAS) & 255
            vnew = (z - ut + BIAS) & 255
            t1 = z - prm.q
            t2 = z - prm.q2
            an = (a - t1 + BIAS) & 255
            bn = (b - t1 + BIAS) & 255
            a2n = (a2 - t2 + BIAS) & 255
            b2n = (b2 - t2 + BIAS) & 255
            bmask = (tvw >= st) & (tvw <= en)
            un = jnp.where(bmask, unew, uc)
            vn = jnp.where(bmask, vnew, vc)
            u[win, :] = un
            v[win, :] = vn
            x[win, :] = jnp.where(
                bmask, (jnp.maximum(an, BIAS) - qe) & 255, xc)
            y[win, :] = jnp.where(
                bmask, (jnp.maximum(bn, BIAS) - qe) & 255, yc)
            x2[win, :] = jnp.where(
                bmask, (jnp.maximum(a2n, BIAS) - qe2) & 255, x2c)
            y2[win, :] = jnp.where(
                bmask, (jnp.maximum(b2n, BIAS) - qe2) & 255, y2c)

            # vectorized H column (extd: no -qe offset, pre-swap qe seed)
            Hc = H[win, :]
            Hv = Hc + vn - BIAS
            Hs = shiftw(Hc, NEG_INF, fixm) + un - BIAS
            is0 = r == 0
            scan_mask = ((tvw >= st0) & (tvw < en0) & jnp.logical_not(is0))
            h_en0_vec = jnp.where(en0 > 0, Hs, Hv)
            h_en0_vec = jnp.where(
                is0, vn - BIAS - prm.qe_pre_swap, h_en0_vec)
            en0m = tvw == en0
            Hn = jnp.where(en0m, h_en0_vec, jnp.where(scan_mask, Hv, Hc))
            H[win, :] = Hn
            HMc = HM[win, :]
            better = Hn > HMc
            HM[win, :] = jnp.where(better, Hn, HMc)
            RD[win, :] = jnp.where(better, r, RD[win, :])
            MQ[win, :] = jnp.where(
                ((r - st0) == (qlen - 1)) & (tvw == st0), Hn, MQ[win, :])

    jax.lax.fori_loop(0, prm.chunk, diag, None)

    if is_last:
        tvec = (jax.lax.broadcasted_iota(I32, (R, 128), 0) * 128
                + jax.lax.broadcasted_iota(I32, (R, 128), 1))
        r_stop = r_hi

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


def build_extd_phased(prm: ExtdParams, interpret: bool = False):
    """Phased score-only extd call: (qflat, tpad) -> res[NSTATE].

    Valid for the deferred-max configuration only (exact max, zdrop < 0,
    SCORE_ONLY); :func:`extd2_device` dispatches here.
    """
    R = prm.n_rows
    shape = (R, 128)
    phases, r_stop = window_phases(prm.qlen, prm.tlen, prm.w, prm.n_diag, R)
    state_t = [jax.ShapeDtypeStruct(shape, jnp.int32)] * 12

    calls = []
    for pi, (p_lo, p_hi, p_base, Wcap) in enumerate(phases):
        is_last = pi == len(phases) - 1
        n_steps = (p_hi - p_lo + prm.chunk - 1) // prm.chunk
        kernel = functools.partial(
            _extd_phase_body, prm, p_lo, p_hi, p_base, Wcap, is_last)

        def wrap(*refs, _k=kernel):
            _k(refs)

        from .bands import stable_kernel_name as _skn
        try:
            wrap.__name__ = _skn('wavefront_extd', prm)
        except NameError:
            pass
        out_shape = list(state_t)
        out_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 12
        scratch = [pltpu.SMEM((NSTATE,), jnp.int32)]
        if is_last:
            out_shape = [jax.ShapeDtypeStruct((NSTATE,), jnp.int32)] \
                + out_shape
            out_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + out_specs
        aliases = {2 + i: (1 if is_last else 0) + i for i in range(12)}
        calls.append(pl.pallas_call(
            wrap,
            grid=(n_steps,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
                    + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 13,
            out_shape=out_shape,
            out_specs=out_specs,
            scratch_shapes=scratch,
            input_output_aliases=aliases,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        ))

    qe, qe2 = prm.q + prm.e, prm.q2 + prm.e2

    def run(qflat, tpad):
        bqe = jnp.full(shape, _b(-qe), jnp.int32)
        bqe2 = jnp.full(shape, _b(-qe2), jnp.int32)
        zero = jnp.zeros(shape, jnp.int32)
        ninf = jnp.full(shape, NEG_INF, jnp.int32)
        state = [bqe, bqe, bqe, bqe, bqe2, bqe2,
                 jnp.full(shape, _b(0), jnp.int32), zero,
                 ninf, ninf, zero, ninf]
        for call in calls[:-1]:
            state = list(call(qflat, tpad, *state))
        out = calls[-1](qflat, tpad, *state)
        return out[0]

    return run


__all__ = ["ExtdParams", "build_extd_call", "build_extd_phased"]
