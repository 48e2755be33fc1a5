"""Batched Pallas TPU wavefront: one pair per sublane row (extz2 semantics).

The production inter-pair engine for short targets (tlen <= 128): each of
the R sublane rows holds one pair's t-axis in its 128 lanes, so the whole
batch advances one anti-diagonal per loop step with *no cross-row carries*
(the SSE byte-shift becomes a pure lane roll).

Layout discipline: every per-pair scalar of the reference (band bounds,
running max, Z-drop state) is carried as a *lane-replicated* (R,128) plane
— the native TPU representation — never as an (R,1) column, because
sublane-scalar -> lane broadcasts are relayout-heavy on the VPU.  Cross-lane
reductions appear only where the semantics force them: per diagonal in the
Z-drop variant (the drop test consults the running max every step), and
once at finalization otherwise (the same deferred per-lane HM/RD max as the
single-pair kernel, vectorized over rows).  Reductions are computed as
log2(128) butterfly steps (max/min with lane rolls) so the result stays
lane-replicated.

Byte parity per pair matches ``ksw_extz2_sse`` exactly (same unsigned-byte
representation, 16-lane band rounding, merge-order argmax, stopping
diagonal).  Score-only; CIGAR batches go through the per-pair kernel.

Query symbols stream in via a host-precomputed injection plane
``qinj[b, r] = query[b, min(r, qlen_b-1)]``, blocked (R,128) per grid step;
the per-diagonal injection is one dynamic lane roll.  Per-pair empty-band
stopping diagonals are closed-form, so the host passes them in as the
``rlim`` plane and the kernel never branches on them.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.flags import NEG_INF, Flag
from .group_reduce import make_group_ops

I32 = jnp.int32
_INT_MIN = -(2 ** 31) + 1
_BIGKEY = 2 ** 30
CHUNK = 128               # diagonals per grid step == qinj block width

# field lanes of the result plane
F_MAX, F_MAXT, F_MAXQ, F_MQE, F_MQET, F_MTE, F_MTEQ, F_SCORE, F_ZDROP = \
    range(9)
NFIELDS = 9


class BatchParams(NamedTuple):
    n_rows: int      # R = number of pairs in the bucket (padded)
    n_diag: int      # max diagonals over the bucket (padded to chunk)
    m: int
    sc_mch: int
    sc_mis: int
    sc_N: int
    q: int
    e: int
    zdrop: int
    flag: int        # RIGHT selects the gap-tie variant in CIGAR mode
    chunk: int = CHUNK   # diagonals per grid step (divides CHUNK)
    p: int = 1           # sublane rows per pair (tlen <= p*128)
    matt: tuple = ()     # flattened matrix (GENERIC_SC profile source)


def _bmax(arr):
    """Butterfly max along lanes; every lane ends up holding the row max."""
    for k in (1, 2, 4, 8, 16, 32, 64):
        arr = jnp.maximum(arr, pltpu.roll(arr, k, axis=1))
    return arr


def _bmin(arr):
    for k in (1, 2, 4, 8, 16, 32, 64):
        arr = jnp.minimum(arr, pltpu.roll(arr, k, axis=1))
    return arr


def _bsum(arr):
    """Butterfly sum along lanes; every lane ends up holding the row sum."""
    for k in (1, 2, 4, 8, 16, 32, 64):
        arr = arr + pltpu.roll(arr, k, axis=1)
    return arr


def chunk_early_exit(stopr, step, chunk, rlim, zdp, run_chunk):
    """Run one grid step's diagonal loop under the sticky SMEM stop flag.

    The reference breaks out of its diagonal loop on Z-drop/X-drop or
    natural end; the grid cannot early-exit, so once no pair can be active
    past the next chunk boundary (``rlim`` passed, and ``zdp`` set when
    given) later steps skip their whole body.  Every in-kernel write is
    act-masked, so outputs are unchanged.  Uses an int max-reduce (the
    form proven to lower on Mosaic, not ``jnp.any``).
    """
    @pl.when(stopr[0] == 0)
    def _chunk():
        run_chunk()
        alive = rlim > (step + 1) * chunk
        if zdp is not None:
            alive = alive & (zdp[...] == 0)
        stopr[0] = 1 - jnp.max(alive.astype(I32))


def _batch_kernel_body(prm: BatchParams, with_cigar, refs):
    approx = bool(prm.flag & int(Flag.APPROX_MAX))
    withz = prm.zdrop >= 0
    # APPROX_DROP updates the running max via ksw_apply_zdrop even when
    # zdrop < 0 (only the drop itself needs zdrop >= 0), so the max planes
    # must exist whenever the flag is set
    withad = approx and bool(prm.flag & int(Flag.APPROX_DROP))
    right = bool(prm.flag & int(Flag.RIGHT))
    generic = bool(prm.flag & int(Flag.GENERIC_SC))
    refs = list(refs)
    qlp_ref, tlp_ref, wp_ref, rlim_ref, target_ref = refs[:5]
    rest = refs[5:]
    prof_ref = rest.pop(0) if generic else None
    qinj_ref, res_ref = rest[:2]
    rest = rest[2:]
    p_ref = rest.pop(0) if with_cigar else None
    u, v, x, y, s, Q, H, HM, RD, MQ, pbs = rest[:11]
    rest = rest[11:]
    if approx:
        h0p, ltp = rest[:2]
        rest = rest[2:]
    else:
        h0p = ltp = None
    if withz or withad:
        mxp, mtp, mqp, zdp = rest[:4]
    else:
        mxp = mtp = mqp = zdp = None
    stopr = refs[-1]             # SMEM early-exit flag (appended last)

    qe = prm.q + prm.e
    R = prm.n_rows
    shape = (R, 128)
    sb_mch = ((prm.sc_mch + 2 * qe) & 255) ^ 128
    sb_mis = ((prm.sc_mis + 2 * qe) & 255) ^ 128
    sb_N = ((prm.sc_N + 2 * qe) & 255) ^ 128
    clamp = (prm.sc_mch + 2 * qe) & 255

    P = prm.p
    step = pl.program_id(0)
    lanes = jax.lax.broadcasted_iota(I32, shape, 1)
    rows = jax.lax.broadcasted_iota(I32, shape, 0)
    # flat target position within the pair (P sublane rows per pair)
    lane = (rows % P) * 128 + lanes if P > 1 else lanes
    lane0 = lane == 0      # pair-origin lanes (t == 0)

    def _shift1(arr):
        """out[t] = arr[t-1] within each pair (lane0 garbage, caller fixes)."""
        rolled = jnp.roll(arr, 1, axis=1)
        if P == 1:
            return rolled
        carried = jnp.roll(rolled, 1, axis=0)
        return jnp.where(lanes == 0, carried, rolled)

    _pmax, _pmin, _psum = make_group_ops(rows, P)

    @pl.when(step == 0)
    def _init():
        zero = jnp.zeros(shape, I32)
        u[...] = zero
        v[...] = zero
        x[...] = zero
        y[...] = zero
        s[...] = jnp.full(shape, ((2 * qe) & 255) ^ 128, I32)
        Q[...] = zero
        H[...] = jnp.full(shape, NEG_INF, I32)
        HM[...] = jnp.full(shape, NEG_INF, I32)
        RD[...] = zero
        MQ[...] = jnp.full(shape, NEG_INF, I32)
        pbs[...] = zero
        if approx:
            h0p[...] = zero
            ltp[...] = zero
        if withz or withad:
            mxp[...] = zero
            mtp[...] = jnp.full(shape, -1, I32)
            mqp[...] = jnp.full(shape, -1, I32)
            zdp[...] = zero
        stopr[0] = 0

    qlp = qlp_ref[...]
    tlp = tlp_ref[...]
    wp = wp_ref[...]
    rlim = rlim_ref[...]
    T = target_ref[...]
    tN = T == prm.m - 1
    # loop invariants hoisted out of diag_body (Mosaic does not reliably
    # LICM vector ops out of the fori_loop body)
    tlm1 = tlp - 1
    qlm1 = qlp - 1
    TV = P * 128
    lane4 = 4 * TV + lane + 1
    lanep1 = lane + 1

    def bounds(r):
        # st0 >= 0 so 16-rounding is a mask; en0 >= 0 so the round-up is |15
        st0 = jnp.maximum(0, jnp.maximum(r + 1 - qlp, (r + 1 - wp) >> 1))
        en0 = jnp.minimum(tlm1, jnp.minimum(r, (r + wp) >> 1))
        return st0, en0, st0 & -16, en0 | 15

    def diag_body(rr, _):
        r = step * prm.chunk + rr
        act = r < rlim
        if withz:
            act = act & (zdp[...] == 0)
        st0, en0, stb, enb = bounds(r)
        # st0 advances by at most 1 per diagonal, so stb steps by 0 or 16;
        # the stale st-1 edge byte is live exactly when stb just advanced.
        # prev stb is memoised in a scratch plane instead of recomputing
        # bounds(r-1); stb == 0 covers r == 0.
        need_ov = (stb == 0) | (stb == pbs[...])
        pbs[...] = stb
        ov_v = jnp.where(stb == 0, ((r > 0).astype(I32) * prm.q), 0)

        col_mask = act & (enb >= r) & (lane == r)
        ucol = ((r > 0).astype(I32) * prm.q)
        ut = jnp.where(col_mask, ucol, u[...])
        yt = jnp.where(col_mask, 0, y[...])

        # query injection: lane (r % CHUNK) of the current qinj block,
        # rolled to lane 0 of each row (pair-origin lanes consume it)
        qv = pltpu.roll(qinj_ref[...], -(r % CHUNK), axis=1)
        Qn = jnp.where(lane0, qv, _shift1(Q[...]))
        Qn = jnp.where(act, Qn, Q[...])
        Q[...] = Qn

        if generic:
            # KSW_EZ_GENERIC_SC: per-query-symbol profile planes
            # (prof_c[t] = mat[target[t]*m + c], pre-biased); the reference
            # fills exactly [st0, en0] here, not 16-byte blocks
            sval = prof_ref[pl.ds(0, R), :]
            for c in range(1, prm.m):
                sval = jnp.where(Qn == c, prof_ref[pl.ds(c * R, R), :],
                                 sval)
            smask = act & (lane >= st0) & (lane <= en0)
        else:
            fill_hi = st0 + ((en0 - st0) & -16) + 15
            eq = T == Qn
            nm = tN | (Qn == prm.m - 1)
            sval = jnp.where(eq, sb_mch, sb_mis)
            sval = jnp.where(nm, sb_N, sval)
            smask = act & (lane >= st0) & (lane <= fill_hi)
        sn = jnp.where(smask, sval, s[...])
        s[...] = sn

        ovn = (lane == stb) & need_ov
        xs = jnp.where(lane0, 0, _shift1(x[...]))
        xs = jnp.where(ovn, 0, xs)
        vs = jnp.where(lane0, ov_v, _shift1(v[...]))
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
        bmask = act & (lane >= stb) & (lane <= enb)
        un = jnp.where(bmask, unew, u[...])
        vn = jnp.where(bmask, vnew, v[...])
        u[...] = un
        v[...] = vn
        x[...] = jnp.where(bmask, jnp.where(anb > 128, an, 0), x[...])
        y[...] = jnp.where(bmask, jnp.where(bnb > 128, bn, 0), y[...])

        # vectorized H column (same identities as the single-pair kernel)
        is0 = r == 0
        Hc = H[...]
        Hv = Hc + vn - qe
        Hs = jnp.where(lane0, NEG_INF, _shift1(Hc)) + un - qe
        h_en0_vec = jnp.where(en0 > 0, Hs, Hv)
        h_en0_vec = jnp.where(is0, vn - 2 * qe, h_en0_vec)
        scan_mask = act & (lane >= st0) & (lane < en0) & jnp.logical_not(is0)
        en0m = act & (lane == en0)
        Hn = jnp.where(en0m, h_en0_vec, jnp.where(scan_mask, Hv, Hc))
        H[...] = Hn
        # deferred per-lane running max (invariant H[t] <= HM[t])
        better = Hn > HM[...]
        HM[...] = jnp.where(better, Hn, HM[...])
        RD[...] = jnp.where(better, r, RD[...])
        # mqe one-shot samples on the last query row
        MQ[...] = jnp.where(
            act & ((r - st0) == qlm1) & (lane == st0), Hn, MQ[...])

        if approx:
            # O(1) per-row H0 walk (ksw2_extz2_sse.c:270-286).  One fused
            # butterfly instead of three: at most three lanes per pair are
            # nonzero (vn at lt, un at lt+1, vn at lane 0 — the last only
            # consumed at r == 0); the deltas are bytes in [0, 255], so
            # packing them at disjoint shifts and butterfly-SUMMING
            # recovers every field exactly (total < 2^24)
            lt = ltp[...]
            c1 = (lt >= st0) & (lt <= en0)
            c2 = (lt + 1 >= st0) & (lt + 1 <= en0)
            sel = (jnp.where(lane == lt, vn, 0) * 256
                   + jnp.where(lane == jnp.minimum(lt + 1, P * 128 - 1),
                               un, 0))
            sel = sel + jnp.where(lane0, vn, 0) * 65536
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

        if withz and not approx:
            # per-diagonal running max + Z-drop test (ksw2.h:191-207).
            # One butterfly: pack (H, tie-key) into a single int32. Scores
            # are bounded by 127*128 here (tlen <= 128), so H*1024 fits;
            # deeply negative H is clamped, which cannot change the drop
            # decision (the margin is already far beyond any zdrop).
            band = scan_mask | en0m
            en1 = st0 + ((en0 - st0) & -4)
            cls = (lane - st0) & 3
            # 5*TV + 2 key values; the packed value H*KB + key must stay
            # inside int32, so the positive H range is (2^31)/KB (the host
            # wrapper guards mat_max * min(qlen, tlen) against it) and the
            # deep-negative side is clamped to the widest representable
            # value — far beyond any zdrop margin, so the clamp can never
            # change a drop decision at representable scores
            KB = 1 << (5 * TV + 1).bit_length()
            KBITS = (5 * TV + 1).bit_length()
            kf = jnp.where(lane < en1, cls * TV + lanep1, lane4)
            kf = jnp.where(en0m, 0, kf)        # boundary cell wins ties
            hcl = jnp.maximum(Hn, -((1 << 31) - 2 * KB) // KB)
            packedv = jnp.where(band, hcl * KB + (KB - 1 - kf), _INT_MIN)
            Cbest = _pmax(packedv)
            # KB is a power of two, so the decode is an arithmetic
            # shift + mask (bit-exact floor-div/mod); vector integer
            # division has no VPU unit and lowers ~200x slower
            M = Cbest >> KBITS
            kstar = KB - 1 - (Cbest & (KB - 1))
            # (kstar-1) % TV via two conditional subtractions (cls <= 3;
            # exact for any TV, incl. odd-P strides; no VPU integer mod)
            j1 = kstar - 1
            j1 = jnp.where(j1 >= 2 * TV, j1 - 2 * TV, j1)
            j1 = jnp.where(j1 >= TV, j1 - TV, j1)
            max_t = jnp.where(kstar == 0, en0,
                              jnp.where(kstar <= 4 * TV, j1,
                                        kstar - 1 - 4 * TV))
            max_t = jnp.where(is0, 0, max_t)
            betterz = act & (M > mxp[...])
            l = jnp.abs((max_t - mtp[...]) - ((r - max_t) - mqp[...]))
            trig = (act & jnp.logical_not(M > mxp[...]) & (max_t >= mtp[...])
                    & (r - max_t >= mqp[...])
                    & (mxp[...] - M > prm.zdrop + l * prm.e))
            mxp[...] = jnp.where(betterz, M, mxp[...])
            mtp[...] = jnp.where(betterz, max_t, mtp[...])
            mqp[...] = jnp.where(betterz, r - max_t, mqp[...])
            zdp[...] = jnp.where(trig, 1 + r, zdp[...])   # 1 + stop diagonal

    chunk_early_exit(stopr, step, prm.chunk, rlim, zdp if withz else None,
                     lambda: jax.lax.fori_loop(0, prm.chunk, diag_body, None))

    @pl.when(step == pl.num_programs(0) - 1)
    def _emit():
        ndc = qlp + tlp - 1
        HMv = HM[...]
        RDv = RD[...]
        if approx:
            dropped = (zdp[...] > 0) if withz else jnp.zeros(shape, jnp.bool_)
            if withz or withad:
                vmax = mxp[...]
                vmaxt = mtp[...]
                vmaxq = mqp[...]
            else:
                vmax = jnp.zeros(shape, I32)
                vmaxt = jnp.full(shape, -1, I32)
                vmaxq = jnp.full(shape, -1, I32)
        elif withz:
            # the Z-drop variant tracked the running max per diagonal;
            # its values are exact for dropped and completed pairs alike
            dropped = zdp[...] > 0
            vmax = mxp[...]
            vmaxt = mtp[...]
            vmaxq = mqp[...]
        else:
            dropped = jnp.zeros(shape, jnp.bool_)
            V = _pmax(HMv)
            cand = HMv == V
            rstar = _pmin(jnp.where(cand, RDv, prm.n_diag + 1))
            st0s = jnp.maximum(0, jnp.maximum(rstar - qlp + 1,
                                              (rstar - wp + 1) >> 1))
            en0s = jnp.minimum(tlp - 1, jnp.minimum(rstar, (rstar + wp) >> 1))
            first = cand & (RDv == rstar)
            en0_hit = _pmax(jnp.where(first & (lane == en0s), 1, 0))
            en1 = st0s + ((en0s - st0s) & -4)
            cls = (lane - st0s) & 3
            key = jnp.where(lane < en1, cls * (1 << 26) + lane,
                            (1 << 28) + lane)
            kmin = _pmin(jnp.where(first, key, _BIGKEY))
            max_t = jnp.where((en0_hit > 0) | (rstar == 0),
                              jnp.where(rstar == 0, 0, en0s),
                              kmin & ((1 << 26) - 1))
            vmax = jnp.where(V > 0, V, 0)
            vmaxt = jnp.where(V > 0, max_t, -1)
            vmaxq = jnp.where(V > 0, rstar - max_t, -1)

        if approx:
            # the reference's approx branch never updates mqe/mte
            # (ksw2_extz2_sse.c:270-286)
            mqe = jnp.full(shape, NEG_INF, I32)
            mqet = jnp.full(shape, -1, I32)
            mte = jnp.full(shape, NEG_INF, I32)
            mteq = jnp.full(shape, -1, I32)
        else:
            mqe = _pmax(MQ[...])
            mqet = _pmin(jnp.where(MQ[...] == mqe, lane, _BIGKEY))
            has_mqe = mqe > NEG_INF
            mqe = jnp.where(has_mqe, mqe, NEG_INF)
            mqet = jnp.where(has_mqe, mqet, -1)

            corner = lane == tlp - 1
            mte = _pmax(jnp.where(corner, HMv, _INT_MIN))
            rdte = _pmax(jnp.where(corner, RDv, _INT_MIN))
            has_mte = mte > NEG_INF
            en_c = ((tlp + 15) & -16) - 1
            mteq = jnp.where(has_mte, rdte - en_c, -1)
            mte = jnp.where(has_mte, mte, NEG_INF)

        # score: corner H if the pair ran to its final diagonal with the
        # corner inside the band
        fin_en0 = jnp.minimum(tlp - 1,
                              jnp.minimum(ndc - 1, (ndc - 1 + wp) >> 1))
        done = (rlim == ndc) & (fin_en0 == tlp - 1)
        if withz:
            done = done & jnp.logical_not(dropped)
        if approx:
            score = jnp.where(done, h0p[...], NEG_INF)
        else:
            hcorner = _pmax(jnp.where(corner, H[...], _INT_MIN))
            score = jnp.where(done, hcorner, NEG_INF)
        zflag = (rlim < ndc).astype(I32)
        if withz:
            zflag = jnp.maximum(zflag, (dropped).astype(I32))

        out = jnp.zeros(shape, I32)
        for fid, val in ((F_MAX, vmax), (F_MAXT, vmaxt), (F_MAXQ, vmaxq),
                         (F_MQE, mqe), (F_MQET, mqet), (F_MTE, mte),
                         (F_MTEQ, mteq), (F_SCORE, score), (F_ZDROP, zflag)):
            out = jnp.where(lane == fid, val, out)
        res_ref[...] = out


def build_batch_call(prm: BatchParams, with_cigar: bool = False,
                     interpret: bool = False):
    R = prm.n_rows
    shape = (R, 128)
    chunk = prm.chunk
    assert CHUNK % chunk == 0
    n_steps = (prm.n_diag + chunk - 1) // chunk
    n_scr = (11 + (2 if prm.flag & int(Flag.APPROX_MAX) else 0)
             + (4 if prm.zdrop >= 0 or (prm.flag & int(Flag.APPROX_MAX)
                           and prm.flag & int(Flag.APPROX_DROP)) else 0))
    scratch = [pltpu.VMEM(shape, jnp.int32) for _ in range(n_scr)]
    scratch.append(pltpu.SMEM((1,), jnp.int32))     # early-exit flag
    kernel = functools.partial(_batch_kernel_body, prm, with_cigar)

    def wrap(*refs):
        kernel(refs)

    from .bands import stable_kernel_name as _skn
    try:
        wrap.__name__ = _skn('wavefront_batch', prm)
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
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5            # planes
            + ([pl.BlockSpec(memory_space=pltpu.VMEM)]             # profiles
               if prm.flag & int(Flag.GENERIC_SC) else [])
            + [pl.BlockSpec((R, CHUNK), lambda i: (0, (i * chunk) // CHUNK),
                            memory_space=pltpu.VMEM)]              # qinj
        ),
        out_shape=out_shape,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


__all__ = ["BatchParams", "build_batch_call", "CHUNK", "NFIELDS",
           "F_MAX", "F_MAXT", "F_MAXQ", "F_MQE", "F_MQET", "F_MTE",
           "F_MTEQ", "F_SCORE", "F_ZDROP"]
