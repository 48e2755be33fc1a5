"""Band-relative batched wavefront, two-piece gap cost (extd2 semantics).

The long-banded-pair engine of :mod:`ksw2_tpu.ops.wavefront_band` (see its
docstring for the coordinate system: shared 16-aligned drifting origin,
jump re-alignment every 32 diagonals, non-shifting capture planes),
specialised to ``ksw2_extd2_sse.c``: six biased-byte delta planes for the
dual gap cost min{q+k*e, q2+k*e2}, the long_thres/long_diff first-column
switch, H recurrences without the -qe offset, the reference's pre-swap q+e
H seed, and Z-drop gap compensation with e2.

This is minimap2's production kernel on its production long-read shape
(10-100 kb pairs, w about 750).  Scores, approx-max (h0p/ltp walk), and
CIGAR mode (direction planes for the batched on-device traceback).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.flags import NEG_INF
from .group_reduce import make_group_ops
from .wavefront_batch import CHUNK, chunk_early_exit
from .wavefront_batch import (F_MAX, F_MAXT, F_MAXQ, F_MQE, F_MQET, F_MTE,
                              F_MTEQ, F_SCORE, F_ZDROP)
from .wavefront_band import _org_of
from .wavefront_extd import BIAS, _b

I32 = jnp.int32
_INT_MIN = -(2 ** 31) + 1
_BIGKEY = 2 ** 30


class BandExtdParams(NamedTuple):
    n_rows: int
    n_diag: int
    m: int
    sc_mch: int
    sc_mis: int
    sc_N: int
    q: int
    e: int
    q2: int
    e2: int
    qe_pre_swap: int
    long_thres: int
    long_diff: int
    w: int           # shared band cap W
    zdrop: int
    flag: int
    chunk: int = CHUNK
    p: int = 1
    matt: tuple = ()     # flattened matrix (GENERIC_SC source)


def _band_extd_kernel_body(prm: BandExtdParams, with_cigar, refs):
    from ..core.flags import Flag
    withz = prm.zdrop >= 0
    approx = bool(prm.flag & int(Flag.APPROX_MAX))
    withad = approx and bool(prm.flag & int(Flag.APPROX_DROP))
    right = bool(prm.flag & int(Flag.RIGHT))
    generic = bool(prm.flag & int(Flag.GENERIC_SC))
    refs = list(refs)
    (qlp_ref, tlp_ref, wp_ref, rlim_ref, tinit_ref, qinj_ref,
     tinj_ref) = refs[:7]
    rest = refs[7:]
    res_ref = rest.pop(0)
    p_ref = rest.pop(0) if with_cigar else None
    (u, v, x, y, x2, y2, s, Q, T, H,
     mxp, mtp, mqp, zdp, MQ, MQR, MT, MTR, SC, pbs) = rest[:20]
    h0p, ltp = (rest[20], rest[21]) if approx else (None, None)
    stopr = rest[-1]             # SMEM early-exit flag (appended last)

    qe, qe2 = prm.q + prm.e, prm.q2 + prm.e2
    R = prm.n_rows
    shape = (R, 128)
    sb_mch, sb_mis, sb_N = _b(prm.sc_mch), _b(prm.sc_mis), _b(prm.sc_N)

    P = prm.p
    W = prm.w
    step = pl.program_id(0)
    lanes = jax.lax.broadcasted_iota(I32, shape, 1)
    rows = jax.lax.broadcasted_iota(I32, shape, 0)
    lane = (rows % P) * 128 + lanes if P > 1 else lanes
    topzone = lane >= P * 128 - 16

    def _shift1(arr):
        rolled = jnp.roll(arr, 1, axis=1)
        if P == 1:
            return rolled
        carried = jnp.roll(rolled, 1, axis=0)
        return jnp.where(lanes == 0, carried, rolled)

    def _shiftl16(arr, fill):
        rolled = pltpu.roll(arr, 112, axis=1)   # left by 16 (mod 128)
        if P > 1:
            nxt = jnp.roll(rolled, -1, axis=0)
            rolled = jnp.where(lanes >= 112, nxt, rolled)
        return jnp.where(topzone, fill, rolled)

    _pmax, _pmin, _psum = make_group_ops(rows, P)

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
        T[...] = tinit_ref[...]
        H[...] = jnp.full(shape, NEG_INF, I32)
        mxp[...] = jnp.zeros(shape, I32)
        mtp[...] = jnp.full(shape, -1, I32)
        mqp[...] = jnp.full(shape, -1, I32)
        zdp[...] = jnp.zeros(shape, I32)
        MQ[...] = jnp.full(shape, NEG_INF, I32)
        MQR[...] = jnp.zeros(shape, I32)
        MT[...] = jnp.full(shape, NEG_INF, I32)
        MTR[...] = jnp.zeros(shape, I32)
        SC[...] = jnp.full(shape, NEG_INF, I32)
        pbs[...] = jnp.zeros(shape, I32)
        if approx:
            h0p[...] = jnp.zeros(shape, I32)
            ltp[...] = jnp.zeros(shape, I32)
        stopr[0] = 0

    qlp = qlp_ref[...]
    tlp = tlp_ref[...]
    wp = wp_ref[...]
    rlim = rlim_ref[...]
    q032 = (W - 1) % 32
    # loop invariants hoisted out of diag_body (see wavefront_band.py)
    tlm1 = tlp - 1
    qlm1 = qlp - 1
    ndc = qlp + tlp - 1
    ndcm1 = ndc - 1
    TV = P * 128
    lane4 = 4 * TV + lane + 1
    lanep1 = lane + 1

    def bounds(r):
        st0 = jnp.maximum(0, jnp.maximum(r + 1 - qlp, (r + 1 - wp) >> 1))
        en0 = jnp.minimum(tlm1, jnp.minimum(r, (r + wp) >> 1))
        return st0, en0, st0 & -16, en0 | 15

    def _ucol(r):
        # branch-free priority chain (r==0 -> r<lt -> r==lt -> else):
        # a scalar jnp.where feeding a plane-level select mis-evaluates
        # under the Pallas interpreter's fori (Mosaic is fine)
        v = _b(-prm.e2) + (r == prm.long_thres).astype(I32) * (
            ((prm.long_diff + BIAS) & 255) - _b(-prm.e2))
        v = v + (r < prm.long_thres).astype(I32) * (_b(-prm.e) - v)
        return v + (r == 0).astype(I32) * (_b(-qe) - v)

    def diag_body(rr, _):
        r = step * prm.chunk + rr
        o_now = _org_of(r, W)
        jump = o_now != _org_of(r - 1, W)
        jb = lane + o_now

        @pl.when(jump)
        def _realign():
            zero = jnp.zeros(shape, I32)
            fqe = jnp.full(shape, _b(-qe), I32)
            fqe2 = jnp.full(shape, _b(-qe2), I32)
            u[...] = _shiftl16(u[...], fqe)
            v[...] = _shiftl16(v[...], fqe)
            x[...] = _shiftl16(x[...], fqe)
            y[...] = _shiftl16(y[...], fqe)
            x2[...] = _shiftl16(x2[...], fqe2)
            y2[...] = _shiftl16(y2[...], fqe2)
            s[...] = _shiftl16(s[...], jnp.full(shape, _b(0), I32))
            Q[...] = _shiftl16(Q[...], zero)
            H[...] = _shiftl16(H[...], jnp.full(shape, NEG_INF, I32))
            slot = ((r % CHUNK) - q032) // 32
            tv = pltpu.roll(tinj_ref[...], 112 - 32 * slot, axis=1)
            T[...] = jnp.where(topzone, tv, _shiftl16(T[...], zero))

        act = r < rlim
        if withz:
            act = act & (zdp[...] == 0)
        st0, en0, stb, enb = bounds(r)
        # prev-stb memo instead of bounds(r-1); see wavefront_band.py
        need_ov = (stb == 0) | (stb == pbs[...])
        pbs[...] = stb
        ucol_r = _ucol(r)
        ov_v = jnp.where(stb == 0, ucol_r, _b(-qe))

        col_mask = act & (enb >= r) & (jb == r)
        ut = jnp.where(col_mask, ucol_r, u[...])
        yt = jnp.where(col_mask, _b(-qe), y[...])
        y2t = jnp.where(col_mask, _b(-qe2), y2[...])

        Tv = T[...]
        tN = Tv == prm.m - 1

        qv = pltpu.roll(qinj_ref[...], -(r % CHUNK), axis=1)
        Qn = jnp.where(lane == 0, qv, _shift1(Q[...]))
        Qn = jnp.where(act, Qn, Q[...])
        Q[...] = Qn

        if generic:
            mm = prm.m * prm.m
            idxp = Tv * prm.m + Qn
            sval = jnp.full(shape, _b(int(prm.matt[0])), I32)
            for kk in range(1, mm):
                sval = jnp.where(idxp == kk, _b(int(prm.matt[kk])), sval)
            smask = act & (jb >= st0) & (jb <= en0)
        else:
            fill_hi = st0 + ((en0 - st0) & -16) + 15
            eq = Tv == Qn
            nm = tN | (Qn == prm.m - 1)
            sval = jnp.where(eq, sb_mch, sb_mis)
            sval = jnp.where(nm, sb_N, sval)
            smask = act & (jb >= st0) & (jb <= fill_hi)
        sn = jnp.where(smask, sval, s[...])
        s[...] = sn

        ovn = (jb == stb) & need_ov
        t0lane = jb == 0
        xs = jnp.where(t0lane, _b(-qe), _shift1(x[...]))
        xs = jnp.where(ovn, _b(-qe), xs)
        x2s = jnp.where(t0lane, _b(-qe2), _shift1(x2[...]))
        x2s = jnp.where(ovn, _b(-qe2), x2s)
        vs = jnp.where(t0lane, ov_v, _shift1(v[...]))
        vs = jnp.where(ovn, ov_v, vs)
        a = (xs + vs - BIAS) & 255
        b = (yt + ut - BIAS) & 255
        a2 = (x2s + vs - BIAS) & 255
        b2 = (y2t + ut - BIAS) & 255
        z = sn
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
        z = jnp.minimum(z, sb_mch)
        unew = (z - vs + BIAS) & 255
        vnew = (z - ut + BIAS) & 255
        t1 = z - prm.q
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
            p_ref[pl.ds(rr, 1)] = d.astype(jnp.int8)[None]
        bmask = act & (jb >= stb) & (jb <= enb)
        un = jnp.where(bmask, unew, u[...])
        vn = jnp.where(bmask, vnew, v[...])
        u[...] = un
        v[...] = vn
        x[...] = jnp.where(
            bmask, (jnp.maximum(an, BIAS) - qe) & 255, x[...])
        y[...] = jnp.where(
            bmask, (jnp.maximum(bn, BIAS) - qe) & 255, y[...])
        x2[...] = jnp.where(
            bmask, (jnp.maximum(a2n, BIAS) - qe2) & 255, x2[...])
        y2[...] = jnp.where(
            bmask, (jnp.maximum(b2n, BIAS) - qe2) & 255, y2[...])

        is0 = r == 0
        if approx:
            # O(1) per-row H0 walk on biased deltas (no -e offset in extd);
            # lt is t-space, selected at band lane lt - org
            lt = ltp[...]
            ltj = lt - o_now
            c1 = (lt >= st0) & (lt <= en0)
            c2 = (lt + 1 >= st0) & (lt + 1 <= en0)
            # fused three-field butterfly SUM (see wavefront_band.py):
            # biased deltas are bytes, disjoint shifts, total < 2^24
            sel = (jnp.where(lane == ltj, vn, 0) * 256
                   + jnp.where(lane == jnp.minimum(ltj + 1, P * 128 - 1),
                               un, 0))
            sel = sel + jnp.where(lane == 0, vn, 0) * 65536
            Mb = _psum(sel)
            d0 = ((Mb >> 8) & 255) - BIAS
            d1 = (Mb & 255) - BIAS
            both = c1 & c2
            newH0 = jnp.where(both, h0p[...] + jnp.maximum(d0, d1),
                              jnp.where(c1, h0p[...] + d0, h0p[...] + d1))
            newlt = jnp.where(both, jnp.where(d0 > d1, lt, lt + 1),
                              jnp.where(c1, lt, lt + 1))
            h00 = (Mb >> 16) - BIAS - prm.qe_pre_swap
            h0p[...] = jnp.where(act, jnp.where(is0, h00, newH0), h0p[...])
            ltp[...] = jnp.where(act, jnp.where(is0, 0, newlt), ltp[...])
            if withad:
                # extd applies the approx Z-drop at r==0 too
                M0 = h0p[...]
                t0_ = ltp[...]
                betterz = act & (M0 > mxp[...])
                if withz:
                    l = jnp.abs((t0_ - mtp[...]) - ((r - t0_) - mqp[...]))
                    trig = (act & jnp.logical_not(M0 > mxp[...])
                            & (t0_ >= mtp[...]) & (r - t0_ >= mqp[...])
                            & (mxp[...] - M0 > prm.zdrop + l * prm.e2))
                    zdp[...] = jnp.where(trig, 1 + r, zdp[...])
                mxp[...] = jnp.where(betterz, M0, mxp[...])
                mtp[...] = jnp.where(betterz, t0_, mtp[...])
                mqp[...] = jnp.where(betterz, r - t0_, mqp[...])
            return

        # vectorized H column (extd: no -qe offset, pre-swap seed)
        Hc = H[...]
        Hv = Hc + vn - BIAS
        Hs = jnp.where(t0lane, NEG_INF, _shift1(Hc)) + un - BIAS
        h_en0_vec = jnp.where(en0 > 0, Hs, Hv)
        h_en0_vec = jnp.where(is0, vn - BIAS - prm.qe_pre_swap, h_en0_vec)
        scan_mask = act & (jb >= st0) & (jb < en0) & jnp.logical_not(is0)
        en0m = act & (jb == en0)
        Hn = jnp.where(en0m, h_en0_vec, jnp.where(scan_mask, Hv, Hc))
        H[...] = Hn

        # per-pair captures (see wavefront_band.py)
        qmask = act & ((r - st0) == qlm1) & (jb == st0)
        bq = qmask & (Hn > MQ[...])
        MQ[...] = jnp.where(bq, Hn, MQ[...])
        MQR[...] = jnp.where(bq, r, MQR[...])
        tmask = en0m & (en0 == tlm1)
        bt = tmask & (Hn > MT[...])
        MT[...] = jnp.where(bt, Hn, MT[...])
        MTR[...] = jnp.where(bt, r, MTR[...])
        cmask = act & (r == ndcm1) & (jb == tlm1)
        SC[...] = jnp.where(cmask, Hn, SC[...])

        # per-diagonal packed argmax + ksw_apply_zdrop (e2 compensation)
        band = scan_mask | en0m
        en1 = st0 + ((en0 - st0) & -4)
        cls = (jb - st0) & 3
        kf = jnp.where(jb < en1, cls * TV + lanep1, lane4)
        kf = jnp.where(en0m, 0, kf)
        hcl = jnp.maximum(Hn, -(1 << 17))
        packedv = jnp.where(band, hcl * 8192 + (8191 - kf), _INT_MIN)
        Cbest = _pmax(packedv)
        M = Cbest >> 13
        kstar = 8191 - (Cbest & 8191)
        # (kstar-1) % TV via two conditional subtractions (cls <= 3; no
        # VPU integer mod — it lowers ~200x slower than ALU ops)
        j1 = kstar - 1
        j1 = jnp.where(j1 >= 2 * TV, j1 - 2 * TV, j1)
        j1 = jnp.where(j1 >= TV, j1 - TV, j1)
        max_j = jnp.where(kstar <= 4 * TV, j1,
                          kstar - 1 - 4 * TV)
        max_t = jnp.where(kstar == 0, en0, max_j + o_now)
        max_t = jnp.where(is0, 0, max_t)
        betterz = act & (M > mxp[...])
        if withz:
            l = jnp.abs((max_t - mtp[...]) - ((r - max_t) - mqp[...]))
            trig = (act & jnp.logical_not(M > mxp[...]) & (max_t >= mtp[...])
                    & (r - max_t >= mqp[...])
                    & (mxp[...] - M > prm.zdrop + l * prm.e2))
            zdp[...] = jnp.where(trig, 1 + r, zdp[...])
        mxp[...] = jnp.where(betterz, M, mxp[...])
        mtp[...] = jnp.where(betterz, max_t, mtp[...])
        mqp[...] = jnp.where(betterz, r - max_t, mqp[...])

    chunk_early_exit(stopr, step, prm.chunk, rlim,
                     zdp if withz else None,
                     lambda: jax.lax.fori_loop(0, prm.chunk, diag_body, None))

    @pl.when(step == pl.num_programs(0) - 1)
    def _emit():
        ndc = qlp + tlp - 1
        dropped = (zdp[...] > 0) if withz else jnp.zeros(shape, jnp.bool_)
        if approx and not withad:
            vmax = jnp.zeros(shape, I32)
            vmaxt = jnp.full(shape, -1, I32)
            vmaxq = jnp.full(shape, -1, I32)
        else:
            vmax = mxp[...]
            vmaxt = mtp[...]
            vmaxq = mqp[...]

        mqe = _pmax(MQ[...])
        rq = _pmin(jnp.where(MQ[...] == mqe, MQR[...], _BIGKEY))
        has_mqe = mqe > NEG_INF
        mqet = jnp.where(has_mqe, rq - qlp + 1, -1)
        mqe = jnp.where(has_mqe, mqe, NEG_INF)

        mte = _pmax(MT[...])
        rt = _pmin(jnp.where(MT[...] == mte, MTR[...], _BIGKEY))
        has_mte = mte > NEG_INF
        en_c = ((tlp + 15) & -16) - 1
        mteq = jnp.where(has_mte, rt - en_c, -1)
        mte = jnp.where(has_mte, mte, NEG_INF)

        fin_en0 = jnp.minimum(tlp - 1,
                              jnp.minimum(ndc - 1, (ndc - 1 + wp) >> 1))
        done = (rlim == ndc) & (fin_en0 == tlp - 1)
        if withz:
            done = done & jnp.logical_not(dropped)
        if approx:
            score = jnp.where(done, h0p[...], NEG_INF)
        else:
            score = jnp.where(done, _pmax(SC[...]), NEG_INF)
        zflag = (rlim < ndc).astype(I32)
        if withz:
            zflag = jnp.maximum(zflag, dropped.astype(I32))

        out = jnp.zeros(shape, I32)
        for fid, val in ((F_MAX, vmax), (F_MAXT, vmaxt), (F_MAXQ, vmaxq),
                         (F_MQE, mqe), (F_MQET, mqet), (F_MTE, mte),
                         (F_MTEQ, mteq), (F_SCORE, score), (F_ZDROP, zflag)):
            out = jnp.where(lane == fid, val, out)
        res_ref[...] = out


def build_band_extd_call(prm: BandExtdParams, with_cigar: bool = False,
                         interpret: bool = False):
    R = prm.n_rows
    shape = (R, 128)
    chunk = prm.chunk
    assert CHUNK % chunk == 0
    assert prm.w <= prm.p * 128 - 64, "band cap too wide for the plane"
    n_steps = (prm.n_diag + chunk - 1) // chunk
    from ..core.flags import Flag as _F
    n_scr = 20 + (2 if prm.flag & int(_F.APPROX_MAX) else 0)
    scratch = [pltpu.VMEM(shape, jnp.int32) for _ in range(n_scr)]
    scratch.append(pltpu.SMEM((1,), jnp.int32))     # early-exit flag
    kernel = functools.partial(_band_extd_kernel_body, prm, with_cigar)

    def wrap(*refs):
        kernel(refs)

    from .bands import stable_kernel_name as _skn
    try:
        wrap.__name__ = _skn('wavefront_band_extd', prm)
    except NameError:
        pass
    out_shape = [jax.ShapeDtypeStruct(shape, jnp.int32)]
    out_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]
    if with_cigar:
        out_shape.append(jax.ShapeDtypeStruct(
            (n_steps * chunk, R, 128), jnp.int8))
        out_specs.append(pl.BlockSpec(
            (chunk, R, 128), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM))

    return pl.pallas_call(
        wrap,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # qlp
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # tlp
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # wp
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # rlim
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # tinit
            pl.BlockSpec((R, CHUNK), lambda i: (0, (i * chunk) // CHUNK),
                         memory_space=pltpu.VMEM),                 # qinj
            pl.BlockSpec((R, 128), lambda i: (0, (i * chunk) // CHUNK),
                         memory_space=pltpu.VMEM),                 # tinj
        ],
        out_shape=out_shape,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


__all__ = ["BandExtdParams", "build_band_extd_call"]
