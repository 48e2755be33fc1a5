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

    refs = list(refs)
    query_ref, target_ref, res_ref = refs[:3]
    rest = refs[3:]
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
        return jnp.where(
            r == 0, _b(-qe),
            jnp.where(r < prm.long_thres, _b(-prm.e),
                      jnp.where(r == prm.long_thres,
                                (prm.long_diff + BIAS) & 255, _b(-prm.e2))))

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

        @pl.when((r == qlen + tlen - 2) & (en0 == tlen - 1))
        def _():
            ez[SCORE] = h_last

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

    def _perlane_update(r, st0, en0, en):
        h_last, Hnew, scan_mask = _h_boundary(r, st0, en0, en)
        better = scan_mask & (Hnew > HM[...])
        HM[...] = jnp.where(better, Hnew, HM[...])
        RD[...] = jnp.where(better, r, RD[...])
        up = h_last > _ld(HM, en0)
        _st_if(HM, en0, h_last, up)
        _st_if(RD, en0, r, up)

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

        @pl.when((r == qlen + tlen - 2) & (en0 == tlen - 1))
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
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


__all__ = ["ExtdParams", "build_extd_call"]
