"""Band-relative batched Pallas wavefront for LONG banded pairs (extz2).

The t-coordinate batch kernels (:mod:`ksw2_tpu.ops.wavefront_batch`) hold a
pair's whole target axis in its lanes, so ``tlen <= P*128``.  Production
long-read extension (minimap2's shape: 10-100 kb pairs, band w of a few
hundred) is the opposite regime: the DP band is narrow but slides along a
huge target.  The single-pair kernels handle it but are latency-bound at
~0.6-1 us per anti-diagonal (sequential dependency chain, see README); a
50 kb pair costs ~100k diagonals regardless of band width.

This kernel batches MANY long banded pairs by storing *band-relative*
positions: lane j of a pair holds target position ``t = org(r) + j`` where
``org`` is a shared, 16-aligned band origin that follows the band's drift::

    org(r) = max(0, (floor2(r)//16 - 1) * 16),  floor2 = max(0, (r-W+1)>>1)

``org`` advances by exactly 16 every 32 diagonals (W = shared band cap).
On those "jump" diagonals every state plane re-aligns with one shift-left-16
(right edge refilled with the reference's init bytes, target chars streamed
from a host-precomputed plane); on all other diagonals the recurrence is
*identical* to the t-coordinate kernel (x/v read at j-1), because the band
bounds are compared in t-space via ``jb = lane + org``.  The 16-lane lag in
``org`` keeps one rounded-block of history left of the band, so the
reference's stale-edge reads at ``st-1`` (ksw2_extz2_sse.c:152-158) still
see the bytes the SSE kernel sees.  Requires ``w <= P*128 - 64`` so the
band plus its 16-byte rounding never reaches the refill zone.

Per-pair mqe/mte/score cannot ride t-anchored planes (they would drift),
so they are captured per diagonal into NON-shifting accumulator planes with
(max H, earliest diagonal) per-lane semantics, reproducing the reference's
strict-``>`` tie-breaks; ``max``/Z-drop use the packed-argmax butterfly of
the t-coordinate kernel with a 13-bit tie key (positions are band-relative,
so P*128 lanes need 5*P*128 + 2 <= 7682 < 8192 key values, P <= 12).

This module is score-only; exact per-diagonal max (ksw_apply_zdrop
semantics with or without a live Z-drop).  Banded batch CIGARs use the
sibling direction-byte engine (:mod:`ksw2_tpu.ops.band_batch`) with the
batched on-device traceback (:mod:`ksw2_tpu.ops.traceback_band`); pairs
too long for the band engines go through the single-pair kernels.
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
from .wavefront_batch import CHUNK, NFIELDS, chunk_early_exit
from .wavefront_batch import (F_MAX, F_MAXT, F_MAXQ, F_MQE, F_MQET, F_MTE,
                              F_MTEQ, F_SCORE, F_ZDROP)

I32 = jnp.int32
_INT_MIN = -(2 ** 31) + 1
_BIGKEY = 2 ** 30


class BandParams(NamedTuple):
    n_rows: int      # R (multiple of 8); R // p pairs
    n_diag: int      # padded diagonal count
    m: int
    sc_mch: int
    sc_mis: int
    sc_N: int
    q: int
    e: int
    w: int           # shared band cap W (per-pair w <= W)
    zdrop: int
    flag: int
    chunk: int = CHUNK
    p: int = 1       # sublane rows per pair (w <= p*128 - 64)
    matt: tuple = ()     # flattened matrix (GENERIC_SC source)


def _org_of(r, w):
    """Shared band origin (16-aligned, lagged one block for edge history)."""
    floor2 = jnp.maximum(0, (r - w + 1) >> 1)
    return jnp.maximum(0, ((floor2 >> 4) - 1) * 16)


def org_schedule(n_diag: int, w: int):
    """Host-side mirror of the in-kernel origin schedule (numpy)."""
    import numpy as np
    r = np.arange(n_diag, dtype=np.int64)
    floor2 = np.maximum(0, (r - w + 1) >> 1)
    return np.maximum(0, ((floor2 >> 4) - 1) * 16).astype(np.int32)


def _band_kernel_body(prm: BandParams, with_cigar, refs):
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
    (u, v, x, y, s, Q, T, H,
     mxp, mtp, mqp, zdp, MQ, MQR, MT, MTR, SC, pbs) = rest[:18]
    h0p, ltp = (rest[18], rest[19]) if approx else (None, None)
    stopr = rest[-1]             # SMEM early-exit flag (appended last)

    qe = prm.q + prm.e
    R = prm.n_rows
    shape = (R, 128)
    sb_mch = ((prm.sc_mch + 2 * qe) & 255) ^ 128
    sb_mis = ((prm.sc_mis + 2 * qe) & 255) ^ 128
    sb_N = ((prm.sc_N + 2 * qe) & 255) ^ 128
    sb_zero = ((2 * qe) & 255) ^ 128
    clamp = (prm.sc_mch + 2 * qe) & 255

    P = prm.p
    W = prm.w
    step = pl.program_id(0)
    lanes = jax.lax.broadcasted_iota(I32, shape, 1)
    rows = jax.lax.broadcasted_iota(I32, shape, 0)
    lane = (rows % P) * 128 + lanes if P > 1 else lanes   # band-relative j
    topzone = lane >= P * 128 - 16                        # jump refill lanes

    def _shift1(arr):
        """out[j] = arr[j-1] within each pair (j==0 garbage, caller fixes)."""
        rolled = jnp.roll(arr, 1, axis=1)
        if P == 1:
            return rolled
        carried = jnp.roll(rolled, 1, axis=0)
        return jnp.where(lanes == 0, carried, rolled)

    def _shiftl16(arr, fill):
        """out[j] = arr[j+16] within each pair; top 16 lanes get ``fill``."""
        rolled = pltpu.roll(arr, 112, axis=1)   # left by 16 (mod 128)
        if P > 1:
            nxt = jnp.roll(rolled, -1, axis=0)
            rolled = jnp.where(lanes >= 112, nxt, rolled)
        return jnp.where(topzone, fill, rolled)

    _pmax, _pmin, _psum = make_group_ops(rows, P)

    @pl.when(step == 0)
    def _init():
        zero = jnp.zeros(shape, I32)
        u[...] = zero
        v[...] = zero
        x[...] = zero
        y[...] = zero
        s[...] = jnp.full(shape, sb_zero, I32)
        Q[...] = zero
        T[...] = tinit_ref[...]      # first P*128 target chars per pair
        H[...] = jnp.full(shape, NEG_INF, I32)
        mxp[...] = zero
        mtp[...] = jnp.full(shape, -1, I32)
        mqp[...] = jnp.full(shape, -1, I32)
        zdp[...] = zero
        MQ[...] = jnp.full(shape, NEG_INF, I32)
        MQR[...] = zero
        MT[...] = jnp.full(shape, NEG_INF, I32)
        MTR[...] = zero
        SC[...] = jnp.full(shape, NEG_INF, I32)
        pbs[...] = zero
        if approx:
            h0p[...] = zero
            ltp[...] = zero
        stopr[0] = 0

    qlp = qlp_ref[...]
    tlp = tlp_ref[...]
    wp = wp_ref[...]
    rlim = rlim_ref[...]
    q032 = (W - 1) % 32              # jump diagonals' residue mod 32
    # loop invariants hoisted out of diag_body (Mosaic does not reliably
    # LICM vector ops out of the fori_loop body)
    tlm1 = tlp - 1
    qlm1 = qlp - 1
    ndc = qlp + tlp - 1
    ndcm1 = ndc - 1
    TV = P * 128
    lane4 = 4 * TV + lane + 1        # packed-argmax key for the en1.. tail
    lanep1 = lane + 1

    def bounds(r):
        # st0 >= 0 so the 16-rounding is a mask; en0 >= 0 so the round-up
        # (en0+16)//16*16-1 is just en0|15
        st0 = jnp.maximum(0, jnp.maximum(r + 1 - qlp, (r + 1 - wp) >> 1))
        en0 = jnp.minimum(tlm1, jnp.minimum(r, (r + wp) >> 1))
        return st0, en0, st0 & -16, en0 | 15

    def diag_body(rr, _):
        r = step * prm.chunk + rr
        o_now = _org_of(r, W)
        jump = o_now != _org_of(r - 1, W)
        jb = lane + o_now            # t-space position of each lane

        # --- jump re-alignment: every state plane shifts left 16 so lane j
        # again holds t = o_now + j; the refill zone gets the reference's
        # init bytes (these t were never written: P*128 >= W + 64)
        @pl.when(jump)
        def _realign():
            zero = jnp.zeros(shape, I32)
            u[...] = _shiftl16(u[...], zero)
            v[...] = _shiftl16(v[...], zero)
            x[...] = _shiftl16(x[...], zero)
            y[...] = _shiftl16(y[...], zero)
            s[...] = _shiftl16(s[...], jnp.full(shape, sb_zero, I32))
            Q[...] = _shiftl16(Q[...], zero)   # never read in the fill range
            H[...] = _shiftl16(H[...], jnp.full(shape, NEG_INF, I32))
            # target chars for the 16 fresh t slots stream from the host
            # plane: 16*slot.. of this step's block, rolled up to lanes 112+
            slot = ((r % CHUNK) - q032) // 32
            tv = pltpu.roll(tinj_ref[...], 112 - 32 * slot, axis=1)
            T[...] = jnp.where(topzone, tv, _shiftl16(T[...], zero))

        act = r < rlim
        if withz:
            act = act & (zdp[...] == 0)
        st0, en0, stb, enb = bounds(r)
        # st0 advances by at most 1 per diagonal, so stb steps by 0 or 16.
        # The stale st-1 edge byte is live exactly when stb just advanced
        # (then stb-1 = prev stb + 15 <= prev enb, inside the previous
        # diagonal's written block range); prev stb is memoised in a
        # scratch plane instead of recomputing bounds(r-1).  At r == 0
        # stb == 0 covers the init case.
        need_ov = (stb == 0) | (stb == pbs[...])
        pbs[...] = stb
        ov_v = jnp.where(stb == 0, ((r > 0).astype(I32) * prm.q), 0)

        col_mask = act & (enb >= r) & (jb == r)
        ucol = ((r > 0).astype(I32) * prm.q)
        ut = jnp.where(col_mask, ucol, u[...])
        yt = jnp.where(col_mask, 0, y[...])

        Tv = T[...]
        tN = Tv == prm.m - 1

        # query injection at the plane's left edge (t == o_now)
        qv = pltpu.roll(qinj_ref[...], -(r % CHUNK), axis=1)
        Qn = jnp.where(lane == 0, qv, _shift1(Q[...]))
        Qn = jnp.where(act, Qn, Q[...])
        Q[...] = Qn

        if generic:
            # in-kernel matrix gather: the score plane would have to shift
            # with T at jumps, so select mat[T*m + Q] directly (the
            # reference's generic path fills exactly [st0, en0])
            mm = prm.m * prm.m
            idxp = Tv * prm.m + Qn
            sval = jnp.full(shape,
                            ((int(prm.matt[0]) + 2 * qe) & 255) ^ 128, I32)
            for kk in range(1, mm):
                sval = jnp.where(
                    idxp == kk,
                    ((int(prm.matt[kk]) + 2 * qe) & 255) ^ 128, sval)
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
        xs = jnp.where(t0lane, 0, _shift1(x[...]))
        xs = jnp.where(ovn, 0, xs)
        vs = jnp.where(t0lane, ov_v, _shift1(v[...]))
        vs = jnp.where(ovn, ov_v, vs)
        a = (xs + vs) & 255
        b = (yt + ut) & 255
        ab = a ^ 128
        if with_cigar:
            if not right:
                d = jnp.where(ab > sn, 1, 0)
            else:
                d = jnp.where(sn > ab, 0, 1)
        zb = jnp.maximum(sn, ab)                  # signed epi8 max (biased)
        if with_cigar:
            bb = b ^ 128
            if not right:
                d = jnp.where(bb > zb, 2, d)
            else:
                d = jnp.where(zb > bb, d, 2)
        z = zb ^ 128
        z = jnp.maximum(z, b)                     # max_epu8
        z = jnp.minimum(z, clamp)                 # min_epu8 vs constant
        unew = (z - vs) & 255
        vnew = (z - ut) & 255
        z2 = z - prm.q
        an = (a - z2) & 255
        bn = (b - z2) & 255
        anb = an ^ 128
        bnb = bn ^ 128
        if with_cigar:
            if not right:
                ta, tb = anb > 128, bnb > 128
            else:
                ta = jnp.logical_not(anb < 128)
                tb = jnp.logical_not(bnb < 128)
            d = d | jnp.where(ta, 0x08, 0) | jnp.where(tb, 0x10, 0)
            p_ref[pl.ds(rr, 1)] = d.astype(jnp.int8)[None]
        bmask = act & (jb >= stb) & (jb <= enb)
        un = jnp.where(bmask, unew, u[...])
        vn = jnp.where(bmask, vnew, v[...])
        u[...] = un
        v[...] = vn
        x[...] = jnp.where(bmask, jnp.where(anb > 128, an, 0), x[...])
        y[...] = jnp.where(bmask, jnp.where(bnb > 128, bn, 0), y[...])

        is0 = r == 0
        if approx:
            # O(1) per-row H0 walk (ksw2_extz2_sse.c:270-286) on the new
            # deltas; lt is a t-space value, selected at band lane lt - org
            lt = ltp[...]
            ltj = lt - o_now
            c1 = (lt >= st0) & (lt <= en0)
            c2 = (lt + 1 >= st0) & (lt + 1 <= en0)
            # one fused reduction instead of three: at most three lanes per
            # pair are nonzero (vn at ltj, un at ltj+1, vn at lane 0 — the
            # last only consumed at r == 0), the deltas are bytes in
            # [0, 255], so packing them at disjoint shifts and butterfly-
            # SUMMING recovers every field exactly (overlapping lanes sum
            # into disjoint bit ranges; total < 2^24)
            sel = (jnp.where(lane == ltj, vn, 0) * 256
                   + jnp.where(lane == jnp.minimum(ltj + 1, P * 128 - 1),
                               un, 0))
            sel = sel + jnp.where(lane == 0, vn, 0) * 65536
            Mb = _psum(sel)
            d0 = ((Mb >> 8) & 255) - qe
            d1 = (Mb & 255) - qe
            both = c1 & c2
            newH0 = jnp.where(both, h0p[...] + jnp.maximum(d0, d1),
                              jnp.where(c1, h0p[...] + d0, h0p[...] + d1))
            newlt = jnp.where(both, jnp.where(d0 > d1, lt, lt + 1),
                              jnp.where(c1, lt, lt + 1))
            h00 = (Mb >> 16) - 2 * qe
            h0p[...] = jnp.where(act, jnp.where(is0, h00, newH0), h0p[...])
            ltp[...] = jnp.where(act, jnp.where(is0, 0, newlt), ltp[...])
            if withad:
                nis0 = act & jnp.logical_not(is0)
                M0 = h0p[...]
                t0_ = ltp[...]
                betterz = nis0 & (M0 > mxp[...])
                if withz:
                    l = jnp.abs((t0_ - mtp[...]) - ((r - t0_) - mqp[...]))
                    trig = (nis0 & jnp.logical_not(M0 > mxp[...])
                            & (t0_ >= mtp[...]) & (r - t0_ >= mqp[...])
                            & (mxp[...] - M0 > prm.zdrop + l * prm.e))
                    zdp[...] = jnp.where(trig, 1 + r, zdp[...])
                mxp[...] = jnp.where(betterz, M0, mxp[...])
                mtp[...] = jnp.where(betterz, t0_, mtp[...])
                mqp[...] = jnp.where(betterz, r - t0_, mqp[...])
            return

        # vectorized H column (identities of the t-coordinate kernel)
        Hc = H[...]
        Hv = Hc + vn - qe
        Hs = jnp.where(t0lane, NEG_INF, _shift1(Hc)) + un - qe
        h_en0_vec = jnp.where(en0 > 0, Hs, Hv)
        h_en0_vec = jnp.where(is0, vn - 2 * qe, h_en0_vec)
        scan_mask = act & (jb >= st0) & (jb < en0) & jnp.logical_not(is0)
        en0m = act & (jb == en0)
        Hn = jnp.where(en0m, h_en0_vec, jnp.where(scan_mask, Hv, Hc))
        H[...] = Hn

        # per-pair captures into NON-shifting planes: per-lane (max H,
        # earliest r); the final merge resolves cross-lane ties by min r,
        # which is exactly the reference's strict-> update order
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

        # per-diagonal packed argmax + ksw_apply_zdrop (max updates always;
        # the drop itself only with a live threshold).  13-bit tie key:
        # positions are band-relative so kf < 5*P*128 + 2 <= 7682 < 8192.
        band = scan_mask | en0m
        en1 = st0 + ((en0 - st0) & -4)
        cls = (jb - st0) & 3
        kf = jnp.where(jb < en1, cls * TV + lanep1, lane4)
        kf = jnp.where(en0m, 0, kf)        # boundary cell wins ties
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
                    & (mxp[...] - M > prm.zdrop + l * prm.e))
            zdp[...] = jnp.where(trig, 1 + r, zdp[...])
        mxp[...] = jnp.where(betterz, M, mxp[...])
        mtp[...] = jnp.where(betterz, max_t, mtp[...])
        mqp[...] = jnp.where(betterz, r - max_t, mqp[...])

    chunk_early_exit(stopr, step, prm.chunk, rlim,
                     zdp if withz else None,
                     lambda: jax.lax.fori_loop(0, prm.chunk, diag_body, None))

    @pl.when(step == pl.num_programs(0) - 1)
    def _emit():
        lane = (rows % P) * 128 + lanes if P > 1 else lanes
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


def build_band_call(prm: BandParams, with_cigar: bool = False,
                    interpret: bool = False):
    R = prm.n_rows
    shape = (R, 128)
    chunk = prm.chunk
    assert CHUNK % chunk == 0
    assert prm.w <= prm.p * 128 - 64, "band cap too wide for the plane"
    n_steps = (prm.n_diag + chunk - 1) // chunk
    from ..core.flags import Flag as _F
    n_scr = 18 + (2 if prm.flag & int(_F.APPROX_MAX) else 0)
    scratch = [pltpu.VMEM(shape, jnp.int32) for _ in range(n_scr)]
    scratch.append(pltpu.SMEM((1,), jnp.int32))     # early-exit flag
    kernel = functools.partial(_band_kernel_body, prm, with_cigar)

    def wrap(*refs):
        kernel(refs)

    from .bands import stable_kernel_name as _skn
    try:
        wrap.__name__ = _skn('wavefront_band', prm)
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


__all__ = ["BandParams", "build_band_call", "org_schedule", "NFIELDS"]
