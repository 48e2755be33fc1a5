"""Batched Pallas TPU wavefront, spliced extension (exts2 semantics).

One pair per sublane row (see :mod:`ksw2_tpu.ops.wavefront_batch`),
specialised to the splice model of ``ksw2_exts2_sse.c``: states
{H, E, F, E2=intron}, x2 on the deletion side only, per-pair
donor/acceptor profile planes (host-precomputed, lanes = target
positions), the long_thres/long_diff first-column switch with the
0-cost tail, H recurrences without offsets, and Z-drop with zero gap
compensation.  exts2 has no band: bounds come from the matrix shape.

Score mode and CIGAR mode (codes 1..3, continuation bits
0x08/0x10/0x20; the traceback maps state 3 to N ops above
``min_intron_len``).
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
from .wavefront_batch import CHUNK, chunk_early_exit
from .wavefront_batch import (F_MAX, F_MAXT, F_MAXQ, F_MQE, F_MQET, F_MTE,
                              F_MTEQ, F_SCORE, F_ZDROP)
from .wavefront_extd import BIAS, _b

I32 = jnp.int32
_INT_MIN = -(2 ** 31) + 1


class BatchExtsParams(NamedTuple):
    n_rows: int
    n_diag: int
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
    chunk: int = CHUNK
    p: int = 1           # sublane rows per pair (tlen <= p*128)
    matt: tuple = ()     # flattened matrix (GENERIC_SC profile source)


def _batch_exts_kernel(prm: BatchExtsParams, with_cigar, refs):
    approx = bool(prm.flag & int(Flag.APPROX_MAX))
    withz = prm.zdrop >= 0
    # APPROX_DROP updates the running max via ksw_apply_zdrop even when
    # zdrop < 0 (only the drop itself needs zdrop >= 0), so the max planes
    # must exist whenever the flag is set
    withad = approx and bool(prm.flag & int(Flag.APPROX_DROP))
    right = bool(prm.flag & int(Flag.RIGHT))
    generic = bool(prm.flag & int(Flag.GENERIC_SC))
    refs = list(refs)
    (qlp_ref, tlp_ref, rlim_ref, target_ref, don_ref, acc_ref) = refs[:6]
    rest = refs[6:]
    prof_ref = rest.pop(0) if generic else None
    qinj_ref, res_ref = rest[:2]
    rest = rest[2:]
    p_ref = rest.pop(0) if with_cigar else None
    u, v, x, y, x2, s, Q, H, HM, RD, MQ = rest[:11]
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
    sb_mch, sb_mis, sb_N = _b(prm.sc_mch), _b(prm.sc_mis), _b(prm.sc_N)

    P = prm.p
    step = pl.program_id(0)
    lanes = jax.lax.broadcasted_iota(I32, shape, 1)
    rows = jax.lax.broadcasted_iota(I32, shape, 0)
    lane = (rows % P) * 128 + lanes if P > 1 else lanes
    lane0 = lane == 0

    def _shift1(arr):
        rolled = jnp.roll(arr, 1, axis=1)
        if P == 1:
            return rolled
        carried = jnp.roll(rolled, 1, axis=0)
        return jnp.where(lanes == 0, carried, rolled)

    _pmax, _pmin, _psum = make_group_ops(rows, P)

    @pl.when(step == 0)
    def _init():
        u[...] = jnp.full(shape, _b(-qe), I32)
        v[...] = jnp.full(shape, _b(-qe), I32)
        x[...] = jnp.full(shape, _b(-qe), I32)
        y[...] = jnp.full(shape, _b(-qe), I32)
        x2[...] = jnp.full(shape, _b(-prm.q2), I32)
        s[...] = jnp.full(shape, _b(0), I32)
        Q[...] = jnp.zeros(shape, I32)
        H[...] = jnp.full(shape, NEG_INF, I32)
        HM[...] = jnp.full(shape, NEG_INF, I32)
        RD[...] = jnp.zeros(shape, I32)
        MQ[...] = jnp.full(shape, NEG_INF, I32)
        if approx:
            h0p[...] = jnp.zeros(shape, I32)
            ltp[...] = jnp.zeros(shape, I32)
        if withz or withad:
            mxp[...] = jnp.zeros(shape, I32)
            mtp[...] = jnp.full(shape, -1, I32)
            mqp[...] = jnp.full(shape, -1, I32)
            zdp[...] = jnp.zeros(shape, I32)
        stopr[0] = 0

    qlp = qlp_ref[...]
    tlp = tlp_ref[...]
    rlim = rlim_ref[...]
    T = target_ref[...]
    don = don_ref[...]
    acc = acc_ref[...]
    tN = T == prm.m - 1
    # loop invariants hoisted out of diag_body
    tlm1 = tlp - 1
    qlm1 = qlp - 1
    TV = P * 128
    lane4 = 4 * TV + lane + 1
    lanep1 = lane + 1

    def _ucol(r):
        """First-column switch, biased (exts: tail cost 0)."""
        # branch-free priority chain (r==0 -> r<lt -> r==lt -> else):
        # a scalar jnp.where feeding a plane-level select mis-evaluates
        # under the Pallas interpreter's fori (Mosaic is fine)
        v = _b(0) + (r == prm.long_thres).astype(I32) * (
            ((prm.long_diff + BIAS) & 255) - _b(0))
        v = v + (r < prm.long_thres).astype(I32) * (_b(-prm.e) - v)
        return v + (r == 0).astype(I32) * (_b(-qe) - v)

    def diag_body(rr, _):
        r = step * prm.chunk + rr
        act = r < rlim
        if withz:
            act = act & (zdp[...] == 0)
        st0 = jnp.maximum(0, r + 1 - qlp)
        en0 = jnp.minimum(tlm1, r)
        stb = st0 & -16
        enb = en0 | 15
        # exts has no band; the rounded start only leaves [0,16) when the
        # query is exhausted and never jumps, so the boundary values are
        # only injected at st == 0 (mirrors ksw2_exts2_sse.c:191-196)
        ucol_r = _ucol(r)
        ov_v = jnp.where(stb == 0, ucol_r, _b(-qe))

        col_mask = act & (enb >= r) & (lane == r)
        ut = jnp.where(col_mask, ucol_r, u[...])
        yt = jnp.where(col_mask, _b(-qe), y[...])

        qv = pltpu.roll(qinj_ref[...], -(r % CHUNK), axis=1)
        Qn = jnp.where(lane0, qv, _shift1(Q[...]))
        Qn = jnp.where(act, Qn, Q[...])
        Q[...] = Qn

        if generic:
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

        # no ovn override needed here: exts has no band, so the stale-edge
        # lane (lane == stb, stb == 0) is exactly lane0, which the selects
        # below already fill with the same init bytes (cf. the phased
        # single-pair exts kernel, wavefront_exts.py)
        xs = jnp.where(lane0, _b(-qe), _shift1(x[...]))
        x2s = jnp.where(lane0, _b(-prm.q2), _shift1(x2[...]))
        vs = jnp.where(lane0, ov_v, _shift1(v[...]))
        a = (xs + vs - BIAS) & 255
        b = (yt + ut - BIAS) & 255
        a2 = (x2s + vs - BIAS) & 255
        a2a = (a2 + acc - BIAS) & 255
        z = sn
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
        if with_cigar:
            if not right:
                ca, cb, cd = an > BIAS, bn > BIAS, a2n > don
            else:
                ca = jnp.logical_not(an < BIAS)
                cb = jnp.logical_not(bn < BIAS)
                cd = jnp.logical_not(don > a2n)
            d = d | jnp.where(ca, 0x08, 0) | jnp.where(cb, 0x10, 0)
            d = d | jnp.where(cd, 0x20, 0)
            p_ref[pl.ds(rr, 1)] = d.astype(jnp.int8)[None]
        bmask = act & (lane >= stb) & (lane <= enb)
        un = jnp.where(bmask, unew, u[...])
        vn = jnp.where(bmask, vnew, v[...])
        u[...] = un
        v[...] = vn
        x[...] = jnp.where(
            bmask, (jnp.maximum(an, BIAS) - qe) & 255, x[...])
        y[...] = jnp.where(
            bmask, (jnp.maximum(bn, BIAS) - qe) & 255, y[...])
        x2[...] = jnp.where(
            bmask, (jnp.maximum(a2n, don) - prm.q2) & 255, x2[...])

        # vectorized H column (exts: no offsets; h0 seed = v - qe)
        is0 = r == 0
        Hc = H[...]
        Hv = Hc + vn - BIAS
        Hs = jnp.where(lane0, NEG_INF, _shift1(Hc)) + un - BIAS
        h_en0_vec = jnp.where(en0 > 0, Hs, Hv)
        h_en0_vec = jnp.where(is0, vn - BIAS - qe, h_en0_vec)
        scan_mask = act & (lane >= st0) & (lane < en0) & jnp.logical_not(is0)
        en0m = act & (lane == en0)
        Hn = jnp.where(en0m, h_en0_vec, jnp.where(scan_mask, Hv, Hc))
        H[...] = Hn
        better = Hn > HM[...]
        HM[...] = jnp.where(better, Hn, HM[...])
        RD[...] = jnp.where(better, r, RD[...])
        MQ[...] = jnp.where(
            act & ((r - st0) == qlm1) & (lane == st0), Hn, MQ[...])

        if approx:
            # O(1) per-row H0 walk on biased deltas (ksw2_exts2_sse.c:
            # approx-max branch; raw int8 deltas, no offset)
            # fused three-field butterfly SUM (see wavefront_batch.py)
            lt = ltp[...]
            c1 = (lt >= st0) & (lt <= en0)
            c2 = (lt + 1 >= st0) & (lt + 1 <= en0)
            sel = (jnp.where(lane == lt, vn, 0) * 256
                   + jnp.where(lane == jnp.minimum(lt + 1, P * 128 - 1),
                               un, 0))
            sel = sel + jnp.where(lane0, vn, 0) * 65536
            Mb = _psum(sel)
            d0 = ((Mb >> 8) & 255) - BIAS
            d1 = (Mb & 255) - BIAS
            both = c1 & c2
            newH0 = jnp.where(both, h0p[...] + jnp.maximum(d0, d1),
                              jnp.where(c1, h0p[...] + d0, h0p[...] + d1))
            newlt = jnp.where(both, jnp.where(d0 > d1, lt, lt + 1),
                              jnp.where(c1, lt, lt + 1))
            h00 = (Mb >> 16) - BIAS - qe
            h0p[...] = jnp.where(act, jnp.where(is0, h00, newH0), h0p[...])
            ltp[...] = jnp.where(act, jnp.where(is0, 0, newlt), ltp[...])

        if withad:
            # exts applies the approx Z-drop at r==0 too, with ZERO gap
            # compensation (ksw2_exts2_sse.c:395 passes e=0)
            M0 = h0p[...]
            t0_ = ltp[...]
            betterz = act & (M0 > mxp[...])
            if withz:
                trig = (act & jnp.logical_not(M0 > mxp[...])
                        & (t0_ >= mtp[...]) & (r - t0_ >= mqp[...])
                        & (mxp[...] - M0 > prm.zdrop))
                zdp[...] = jnp.where(trig, 1 + r, zdp[...])
            mxp[...] = jnp.where(betterz, M0, mxp[...])
            mtp[...] = jnp.where(betterz, t0_, mtp[...])
            mqp[...] = jnp.where(betterz, r - t0_, mqp[...])

        if withz and not approx:
            # packed (H, tie-key) single-butterfly argmax; Z-drop with
            # zero gap compensation (ksw2_exts2_sse.c:395)
            band = scan_mask | en0m
            en1 = st0 + ((en0 - st0) & -4)
            cls = (lane - st0) & 3
            # 5*TV + 2 key values; packed H*KB + key must stay in int32
            # (positive range guarded by the host wrapper; the
            # deep-negative clamp is beyond any zdrop margin)
            KB = 1 << (5 * TV + 1).bit_length()
            KBITS = (5 * TV + 1).bit_length()
            kf = jnp.where(lane < en1, cls * TV + lanep1, lane4)
            kf = jnp.where(en0m, 0, kf)
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
            # exts applies Z-drop with ZERO gap compensation (the
            # reference passes e=0 to ksw_apply_zdrop, ksw2_exts2_sse.c)
            trig = (act & jnp.logical_not(M > mxp[...]) & (max_t >= mtp[...])
                    & (r - max_t >= mqp[...])
                    & (mxp[...] - M > prm.zdrop))
            mxp[...] = jnp.where(betterz, M, mxp[...])
            mtp[...] = jnp.where(betterz, max_t, mtp[...])
            mqp[...] = jnp.where(betterz, r - max_t, mqp[...])
            zdp[...] = jnp.where(trig, 1 + r, zdp[...])

    chunk_early_exit(stopr, step, prm.chunk, rlim,
                     zdp if withz else None,
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
            dropped = zdp[...] > 0
            vmax = mxp[...]
            vmaxt = mtp[...]
            vmaxq = mqp[...]
        else:
            dropped = jnp.zeros(shape, jnp.bool_)
            V = _pmax(HMv)
            cand = HMv == V
            rstar = _pmin(jnp.where(cand, RDv, prm.n_diag + 1))
            st0s = jnp.maximum(0, rstar - qlp + 1)
            en0s = jnp.minimum(tlp - 1, rstar)
            first = cand & (RDv == rstar)
            en0_hit = _pmax(jnp.where(first & (lane == en0s), 1, 0))
            en1 = st0s + ((en0s - st0s) & -4)
            cls = (lane - st0s) & 3
            key = jnp.where(lane < en1, cls * (1 << 26) + lane,
                            (1 << 28) + lane)
            kmin = _pmin(jnp.where(first, key, 2 ** 30))
            max_t = jnp.where((en0_hit > 0) | (rstar == 0),
                              jnp.where(rstar == 0, 0, en0s),
                              kmin & ((1 << 26) - 1))
            vmax = jnp.where(V > 0, V, 0)
            vmaxt = jnp.where(V > 0, max_t, -1)
            vmaxq = jnp.where(V > 0, rstar - max_t, -1)

        if approx:
            mqe = jnp.full(shape, NEG_INF, I32)
            mqet = jnp.full(shape, -1, I32)
            mte = jnp.full(shape, NEG_INF, I32)
            mteq = jnp.full(shape, -1, I32)
        else:
            mqe = _pmax(MQ[...])
            mqet = _pmin(jnp.where(MQ[...] == mqe, lane, 2 ** 30))
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

        done = rlim == ndc          # exts never goes band-empty
        if withz or approx:
            done = done & jnp.logical_not(dropped)
        if approx:
            score = jnp.where(done, h0p[...], NEG_INF)
        else:
            corner = lane == tlp - 1
            hcorner = _pmax(jnp.where(corner, H[...], _INT_MIN))
            score = jnp.where(done, hcorner, NEG_INF)
        zflag = (rlim < ndc).astype(I32)
        if withz:
            zflag = jnp.maximum(zflag, dropped.astype(I32))

        out = jnp.zeros(shape, I32)
        for fid, val in ((F_MAX, vmax), (F_MAXT, vmaxt), (F_MAXQ, vmaxq),
                         (F_MQE, mqe), (F_MQET, mqet), (F_MTE, mte),
                         (F_MTEQ, mteq), (F_SCORE, score), (F_ZDROP, zflag)):
            out = jnp.where(lane == fid, val, out)
        res_ref[...] = out


def build_batch_exts_call(prm: BatchExtsParams, with_cigar: bool = False,
                          interpret: bool = False):
    R = prm.n_rows
    shape = (R, 128)
    chunk = prm.chunk
    assert CHUNK % chunk == 0
    n_steps = (prm.n_diag + chunk - 1) // chunk
    approx = bool(prm.flag & int(Flag.APPROX_MAX))
    withad = approx and bool(prm.flag & int(Flag.APPROX_DROP))
    n_scr = (11 + (2 if approx else 0)
             + (4 if prm.zdrop >= 0 or withad else 0))
    scratch = [pltpu.VMEM(shape, jnp.int32) for _ in range(n_scr)]
    scratch.append(pltpu.SMEM((1,), jnp.int32))     # early-exit flag
    kernel = functools.partial(_batch_exts_kernel, prm, with_cigar)

    def wrap(*refs):
        kernel(refs)

    from .bands import stable_kernel_name as _skn
    try:
        wrap.__name__ = _skn('wavefront_batch_exts', prm)
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
            [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6            # planes
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


__all__ = ["BatchExtsParams", "build_batch_exts_call"]
