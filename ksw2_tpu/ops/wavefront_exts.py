"""Pallas TPU wavefront kernel: spliced extension (exts2 semantics).

mRNA-to-genome alignment (``ksw2_exts2_sse.c``): states {H, E, F, E2=intron
on the target side}; x2 exists only on the deletion side (no y2); the E2
transitions are modulated by position-dependent ``donor``/``acceptor``
profiles over the target (ksw2_exts2_sse.c:119-171), precomputed on the host
(see :func:`ksw2_tpu.spec.diagdiff._splice_profiles`) and passed in as
sign-biased (R,128) planes.  No band support — boundaries come from the
matrix shape only (ksw2_exts2_sse.c:179-181).

Same biased-byte representation as :mod:`ksw2_tpu.ops.wavefront_extd`
(exts2's byte ops are signed), same deferred per-lane max machinery when
Z-drop is off.  Note exts2's H recurrences carry no -qe offset (the deltas
are stored unshifted) and Z-drop runs with zero gap compensation
(ksw2_exts2_sse.c:395).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.flags import NEG_INF, Flag
from .wavefront import (I32, NSTATE, _BIGKEY, _ld, _st, _st_if, _merge_key,
                        MAX, MAXT, MAXQ, MQE, MQET, MTE, MTEQ,
                        SCORE, ZDROP, FIN, H0, LASTH0T, LASTST, LASTEN, STOPR)
from .wavefront_extd import BIAS, _b


class ExtsParams(NamedTuple):
    qlen: int
    tlen: int
    m: int
    sc_mch: int
    sc_mis: int
    sc_N: int
    q: int
    e: int
    q2: int
    long_thres: int
    long_diff: int
    zdrop: int
    flag: int
    chunk: int
    n_diag: int
    n_rows: int
    p_rows: int


def _exts_kernel_body(prm: ExtsParams, with_cigar: bool, refs):
    flag = Flag(prm.flag)
    approx = bool(flag & Flag.APPROX_MAX)
    right = bool(flag & Flag.RIGHT)
    perlane = (not approx) and prm.zdrop < 0

    generic = bool(flag & Flag.GENERIC_SC)
    refs = list(refs)
    qsmem_ref, target_ref, don_ref, acc_ref = refs[:4]
    rest = refs[4:]
    prof_ref = rest.pop(0) if generic else None
    res_ref = rest.pop(0)
    p_ref = rest.pop(0) if with_cigar else None
    u, v, x, y, x2, s, Q = rest[:7]
    rest = rest[7:]
    dscr = rest.pop(0) if with_cigar else None
    H = rest.pop(0)
    if perlane:
        HM, RD = rest.pop(0), rest.pop(0)
    else:
        HM = RD = None
    ez = rest[0]

    qlen, tlen = prm.qlen, prm.tlen
    qe = prm.q + prm.e
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
        return _ld(ref, t) - BIAS

    @pl.when(step == 0)
    def _init():
        u[...] = jnp.full(shape, _b(-qe), I32)
        v[...] = jnp.full(shape, _b(-qe), I32)
        x[...] = jnp.full(shape, _b(-qe), I32)
        y[...] = jnp.full(shape, _b(-qe), I32)
        x2[...] = jnp.full(shape, _b(-prm.q2), I32)
        s[...] = jnp.full(shape, _b(0), I32)
        Q[...] = jnp.zeros(shape, I32)
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
        """First-column boundary with the long-gap switch, biased
        (ksw2_exts2_sse.c:191-196; the >long_thres case costs 0)."""
        # branch-free priority chain (r==0 -> r<lt -> r==lt -> else):
        # a scalar jnp.where feeding a plane-level select mis-evaluates
        # under the Pallas interpreter's fori (Mosaic is fine)
        v = _b(0) + (r == prm.long_thres).astype(I32) * (
            ((prm.long_diff + BIAS) & 255) - _b(0))
        v = v + (r < prm.long_thres).astype(I32) * (_b(-prm.e) - v)
        return v + (r == 0).astype(I32) * (_b(-qe) - v)

    def _zdrop_update(Hval, rr, tt):
        better = Hval > ez[MAX]
        mt, mq = ez[MAXT], ez[MAXQ]
        l = jnp.abs((tt - mt) - ((rr - tt) - mq))
        trigger = (
            jnp.logical_not(better) & (tt >= mt) & (rr - tt >= mq)
            & (prm.zdrop >= 0) & (ez[MAX] - Hval > prm.zdrop + l * 0)
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
        h0val = _lds(v, 0) - qe
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
        _INT_MIN = -(2 ** 31) + 1
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
            st0 = jnp.maximum(0, rstar - qlen + 1)
            en0 = jnp.minimum(tlen - 1, rstar)
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
        # mqe/mte/score are maintained per diagonal by _h_boundary

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
        h00 = _lds(v, 0) - qe
        ez[H0] = jnp.where(is0, h00, newH0)
        ez[LASTH0T] = jnp.where(is0, 0, newlt)
        if flag & Flag.APPROX_DROP:
            # like extd2 (and unlike extz2), the approx Z-drop also runs at
            # r==0 (the call sits outside the r>0 branch in the reference)
            _zdrop_update(ez[H0], r, ez[LASTH0T])

        @pl.when((r == qlen + tlen - 2) & (en0 == tlen - 1)
                 & (ez[FIN] == 0))
        def _():
            ez[SCORE] = ez[H0]

    def diag_body(rr, _):
        r = step * prm.chunk + rr

        @pl.when((r < prm.n_diag) & (ez[FIN] == 0))
        def _():
            st0 = jnp.maximum(0, r - qlen + 1)
            en0 = jnp.minimum(tlen - 1, r)
            st = st0 // 16 * 16
            en = (en0 + 16) // 16 * 16 - 1
            in_range = (st - 1 >= ez[LASTST]) & (st - 1 <= ez[LASTEN])
            need_ov = (st == 0) | jnp.logical_not(in_range)
            ov_x = _b(-qe)
            ov_x2 = _b(-prm.q2)
            ov_v = jnp.where(st == 0, _ucol(r), _b(-qe))
            col_mask = (en >= r) & (tvec == r)
            ut = jnp.where(col_mask, _ucol(r), u[...])
            yt = jnp.where(col_mask, _b(-qe), y[...])

            qv = qsmem_ref[jnp.minimum(r, qlen - 1)]
            Qn = _shift_t(Q[...], qv)
            Q[...] = Qn

            if generic:
                # KSW_EZ_GENERIC_SC profile planes; reference fills exactly
                # [st0, en0] (ksw2_exts2_sse.c:214-216)
                R_ = prm.n_rows
                sval = prof_ref[pl.ds(0, R_), :]
                for c in range(1, prm.m):
                    sval = jnp.where(
                        Qn == c, prof_ref[pl.ds(c * R_, R_), :], sval)
                smask = (tvec >= st0) & (tvec <= en0)
            else:
                fill_hi = st0 + ((en0 - st0) // 16) * 16 + 15
                eq = target_ref[...] == Qn
                nm = (target_ref[...] == prm.m - 1) | (Qn == prm.m - 1)
                sval = jnp.where(eq, sb_mch, sb_mis)
                sval = jnp.where(nm, sb_N, sval)
                smask = (tvec >= st0) & (tvec <= fill_hi)
            s[...] = jnp.where(smask, sval, s[...])

            ovm = (tvec == st) & need_ov
            xs = jnp.where(ovm, ov_x, _shift_t(x[...], ov_x))
            x2s = jnp.where(ovm, ov_x2, _shift_t(x2[...], ov_x2))
            vs = jnp.where(ovm, ov_v, _shift_t(v[...], ov_v))
            a = (xs + vs - BIAS) & 255
            b = (yt + ut - BIAS) & 255
            a2 = (x2s + vs - BIAS) & 255
            a2a = (a2 + acc_ref[...] - BIAS) & 255
            z = s[...]
            if with_cigar:
                d = jnp.zeros(shape, I32)
                for cand, code in ((a, 1), (b, 2), (a2a, 3)):
                    if not right:
                        d = jnp.where(cand > z, code, d)
                    else:
                        d = jnp.where(z > cand, d, code)
                    z = jnp.maximum(z, cand)
            else:
                for cand in (a, b, a2a):
                    z = jnp.maximum(z, cand)
            unew = (z - vs + BIAS) & 255
            vnew = (z - ut + BIAS) & 255
            t1 = z - prm.q
            t2 = z - prm.q2
            an = (a - t1 + BIAS) & 255
            bn = (b - t1 + BIAS) & 255
            a2n = (a2 - t2 + BIAS) & 255
            don = don_ref[...]
            if with_cigar:
                if not right:
                    ca, cb, cd = an > BIAS, bn > BIAS, a2n > don
                else:
                    ca = jnp.logical_not(an < BIAS)
                    cb = jnp.logical_not(bn < BIAS)
                    cd = jnp.logical_not(don > a2n)
                d = d | jnp.where(ca, 0x08, 0) | jnp.where(cb, 0x10, 0)
                d = d | jnp.where(cd, 0x20, 0)
            bmask = (tvec >= st) & (tvec <= en)
            u[...] = jnp.where(bmask, unew, u[...])
            v[...] = jnp.where(bmask, vnew, v[...])
            x[...] = jnp.where(
                bmask, (jnp.maximum(an, BIAS) - qe) & 255, x[...])
            y[...] = jnp.where(
                bmask, (jnp.maximum(bn, BIAS) - qe) & 255, y[...])
            x2[...] = jnp.where(
                bmask, (jnp.maximum(a2n, don) - prm.q2) & 255, x2[...])

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


def build_exts_call(prm: ExtsParams, with_cigar: bool, interpret: bool = False):
    R = prm.n_rows
    shape = (R, 128)
    flag = Flag(prm.flag)
    perlane = not (flag & Flag.APPROX_MAX) and prm.zdrop < 0
    scratch = [pltpu.VMEM(shape, jnp.int32) for _ in range(5)]  # u v x y x2
    scratch += [
        pltpu.VMEM(shape, jnp.int32),   # s
        pltpu.VMEM(shape, jnp.int32),   # Q
    ]
    if with_cigar:
        scratch.append(pltpu.VMEM((R + prm.p_rows, 128), jnp.int32))  # dscr
    scratch.append(pltpu.VMEM(shape, jnp.int32))   # H
    if perlane:
        scratch += [pltpu.VMEM(shape, jnp.int32) for _ in range(2)]  # HM RD
    scratch.append(pltpu.SMEM((NSTATE,), jnp.int32))
    n_steps = (prm.n_diag + prm.chunk - 1) // prm.chunk
    kernel = functools.partial(_exts_kernel_body, prm, with_cigar)

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
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.SMEM)]  # query, flat int32
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3  # target/don/acc
            + ([pl.BlockSpec(memory_space=pltpu.VMEM)]     # profiles
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
# Phased score-only kernel: static row windows (exts has no band, so the
# window tracks the matrix-shape triangle; see wavefront.py for rationale).
# ---------------------------------------------------------------------------

from .wavefront import _static_en0, _static_stop, window_phases


def _exts_phase_body(prm: ExtsParams, r_lo, r_hi, row_base, Wcap,
                     is_last, refs):
    refs = list(refs)
    qsmem_ref, target_ref, don_ref, acc_ref = refs[:4]
    # refs[4:15] are the aliased state inputs
    if is_last:
        res_ref = refs[15]
        u, v, x, y, x2, s, Q, H, HM, RD, MQ = refs[16:27]
        ez = refs[27]
    else:
        res_ref = None
        u, v, x, y, x2, s, Q, H, HM, RD, MQ = refs[15:26]
        ez = refs[26]

    qlen, tlen = prm.qlen, prm.tlen
    qe = prm.q + prm.e
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
        v = _b(0) + (r == prm.long_thres).astype(I32) * (
            ((prm.long_diff + BIAS) & 255) - _b(0))
        v = v + (r < prm.long_thres).astype(I32) * (_b(-prm.e) - v)
        return v + (r == 0).astype(I32) * (_b(-qe) - v)

    def diag(rr, _):
        r = r_lo + step * prm.chunk + rr

        @pl.when(r < r_hi)
        def _():
            st0 = jnp.maximum(0, r - qlen + 1)
            en0 = jnp.minimum(tlen - 1, r)
            st = st0 // 16 * 16
            en = (en0 + 16) // 16 * 16 - 1
            need_ov = st == 0          # exts: no band, st moves smoothly
            ov_x = _b(-qe)
            ov_x2 = _b(-prm.q2)
            ov_v = jnp.where(st == 0, _ucol(r), _b(-qe))

            # static window: the phase's row span is compile-time
            # constant, so every plane slice below is static (dynamic
            # sublane offsets force Mosaic relayout copies)
            win = slice(row_base, row_base + Wcap)
            tvw = tvw_base + row_base * 128
            fixm = tvw == 0

            uc, vc, xc, yc = u[win, :], v[win, :], x[win, :], y[win, :]
            x2c = x2[win, :]
            Qc, Tc = Q[win, :], target_ref[win, :]
            acw = acc_ref[win, :]
            dow = don_ref[win, :]

            col_mask = (en >= r) & (tvw == r)
            ut = jnp.where(col_mask, _ucol(r), uc)
            yt = jnp.where(col_mask, _b(-qe), yc)

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
            a2a = (a2 + acw - BIAS) & 255
            z = sn
            for cand in (a, b, a2a):
                z = jnp.maximum(z, cand)
            unew = (z - vs + BIAS) & 255
            vnew = (z - ut + BIAS) & 255
            t1 = z - prm.q
            t2 = z - prm.q2
            an = (a - t1 + BIAS) & 255
            bn = (b - t1 + BIAS) & 255
            a2n = (a2 - t2 + BIAS) & 255
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
                bmask, (jnp.maximum(a2n, dow) - prm.q2) & 255, x2c)

            Hc = H[win, :]
            Hv = Hc + vn - BIAS
            Hs = shiftw(Hc, NEG_INF, fixm) + un - BIAS
            is0 = r == 0
            scan_mask = ((tvw >= st0) & (tvw < en0) & jnp.logical_not(is0))
            h_en0_vec = jnp.where(en0 > 0, Hs, Hv)
            h_en0_vec = jnp.where(is0, vn - BIAS - qe, h_en0_vec)
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
                st0 = jnp.maximum(0, rstar - qlen + 1)
                en0 = jnp.minimum(tlen - 1, rstar)
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

            # exts never goes band-empty: the corner is always reached
            ez[SCORE] = _ld(H, tlen - 1)
            for k in range(NSTATE):
                res_ref[k] = ez[k] if k < 15 else 0


def build_exts_phased(prm: ExtsParams, interpret: bool = False):
    """Phased score-only exts call: (qflat, tpad, donb, accb) -> res."""
    R = prm.n_rows
    shape = (R, 128)
    w_eff = prm.qlen + prm.tlen          # shape-only bounds
    phases, r_stop = window_phases(prm.qlen, prm.tlen, w_eff, prm.n_diag, R)
    state_t = [jax.ShapeDtypeStruct(shape, jnp.int32)] * 11

    calls = []
    for pi, (p_lo, p_hi, p_base, Wcap) in enumerate(phases):
        is_last = pi == len(phases) - 1
        n_steps = (p_hi - p_lo + prm.chunk - 1) // prm.chunk
        kernel = functools.partial(
            _exts_phase_body, prm, p_lo, p_hi, p_base, Wcap, is_last)

        def wrap(*refs, _k=kernel):
            _k(refs)

        out_shape = list(state_t)
        out_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 11
        scratch = [pltpu.SMEM((NSTATE,), jnp.int32)]
        if is_last:
            out_shape = [jax.ShapeDtypeStruct((NSTATE,), jnp.int32)] \
                + out_shape
            out_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + out_specs
        aliases = {4 + i: (1 if is_last else 0) + i for i in range(11)}
        calls.append(pl.pallas_call(
            wrap,
            grid=(n_steps,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
                    + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 14,
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

    def run(qflat, tpad, donb, accb):
        bqe = jnp.full(shape, _b(-qe), jnp.int32)
        zero = jnp.zeros(shape, jnp.int32)
        ninf = jnp.full(shape, NEG_INF, jnp.int32)
        state = [bqe, bqe, bqe, bqe,
                 jnp.full(shape, _b(-prm.q2), jnp.int32),
                 jnp.full(shape, _b(0), jnp.int32), zero,
                 ninf, ninf, zero, ninf]
        for call in calls[:-1]:
            state = list(call(qflat, tpad, donb, accb, *state))
        out = calls[-1](qflat, tpad, donb, accb, *state)
        return out[0]

    return run


__all__ = ["ExtsParams", "build_exts_call", "build_exts_phased"]
