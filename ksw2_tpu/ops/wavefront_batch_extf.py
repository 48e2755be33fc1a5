"""Batched Pallas TPU wavefront, linear-gap extension (extf2 semantics).

One pair per P sublane rows like :mod:`ksw2_tpu.ops.wavefront_batch`,
specialised to ``ksw2_extf2_sse.c``: only u/v difference planes, the raw
symbol-equality score blend (N matches N, as in the reference), the O(1)
approximate H0 walk, and an X-drop break.  Score-only; ``zdropped`` is set
both on a drop and on a band-empty stop ("not completed",
ksw2_extf2_sse.c:49).
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
from .wavefront_batch import chunk_early_exit
from .wavefront_batch import CHUNK
from .wavefront_batch import (F_MAX, F_MAXT, F_MAXQ, F_MQE, F_MQET, F_MTE,
                              F_MTEQ, F_SCORE, F_ZDROP)

I32 = jnp.int32
_INT_MIN = -(2 ** 31) + 1


class BatchExtfParams(NamedTuple):
    n_rows: int
    n_diag: int
    mch: int
    mis: int         # canonicalized <= 0
    e: int
    xdrop: int
    chunk: int = CHUNK
    p: int = 1


def _batch_extf_kernel(prm: BatchExtfParams, refs):
    (qlp_ref, tlp_ref, wp_ref, rlim_ref, target_ref, qinj_ref, res_ref,
     u, v, s, Q, h0p, ltp, mxp, mtp, mqp, zdp, pbs, stopr) = refs

    e = prm.e
    R = prm.n_rows
    shape = (R, 128)
    sb_mch = ((prm.mch + 2 * e) & 255) ^ 128
    sb_mis = ((prm.mis + 2 * e) & 255) ^ 128

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

    _pmax, _, _psum = make_group_ops(rows, P)

    @pl.when(step == 0)
    def _init():
        zero = jnp.zeros(shape, I32)
        u[...] = zero
        v[...] = zero
        s[...] = jnp.full(shape, ((2 * e) & 255) ^ 128, I32)
        Q[...] = zero
        h0p[...] = zero
        ltp[...] = zero
        mxp[...] = zero
        mtp[...] = jnp.full(shape, -1, I32)
        mqp[...] = jnp.full(shape, -1, I32)
        zdp[...] = zero
        pbs[...] = zero
        stopr[0] = 0

    qlp = qlp_ref[...]
    tlp = tlp_ref[...]
    wp = wp_ref[...]
    rlim = rlim_ref[...]
    T = target_ref[...]
    tlm1 = tlp - 1                     # hoisted loop invariant

    def bounds(r):
        st0 = jnp.maximum(0, jnp.maximum(r + 1 - qlp, (r + 1 - wp) >> 1))
        en0 = jnp.minimum(tlm1, jnp.minimum(r, (r + wp) >> 1))
        return st0, en0, st0 & -16, en0 | 15

    def diag_body(rr, _):
        r = step * prm.chunk + rr
        act = (r < rlim) & (zdp[...] == 0)
        st0, en0, stb, enb = bounds(r)
        # prev-stb memo instead of bounds(r-1); see wavefront_batch.py
        need_ov = (stb == 0) | (stb == pbs[...])
        pbs[...] = stb

        col_mask = act & (enb >= r) & (lane == r)
        ut = jnp.where(col_mask, 0, u[...])

        qv = pltpu.roll(qinj_ref[...], -(r % CHUNK), axis=1)
        Qn = jnp.where(lane0, qv, _shift1(Q[...]))
        Qn = jnp.where(act, Qn, Q[...])
        Q[...] = Qn

        fill_hi = st0 + ((en0 - st0) & -16) + 15
        eq = T == Qn
        sval = jnp.where(eq, sb_mch, sb_mis)
        smask = act & (lane >= st0) & (lane <= fill_hi)
        sn = jnp.where(smask, sval, s[...])
        s[...] = sn

        ovn = (lane == stb) & need_ov
        vs = jnp.where(lane0, 0, _shift1(v[...]))
        vs = jnp.where(ovn, 0, vs)
        zb = jnp.maximum(sn, vs ^ 128)    # signed epi8 max (biased)
        z = zb ^ 128
        z = jnp.maximum(z, ut)            # max_epu8
        unew = (z - vs) & 255
        vnew = (z - ut) & 255
        bmask = act & (lane >= stb) & (lane <= enb)
        un = jnp.where(bmask, unew, u[...])
        vn = jnp.where(bmask, vnew, v[...])
        u[...] = un
        v[...] = vn

        # O(1) H0 walk + per-pair X-drop (ksw2_extf2_sse.c:80-91); fused
        # three-field butterfly SUM (see wavefront_batch.py): deltas are
        # bytes at disjoint shifts, at most three nonzero lanes per pair
        is0 = r == 0
        lt = ltp[...]
        c1 = (lt >= st0) & (lt <= en0)
        c2 = (lt + 1 >= st0) & (lt + 1 <= en0)
        sel = (jnp.where(lane == lt, vn, 0) * 256
               + jnp.where(lane == jnp.minimum(lt + 1, P * 128 - 1), un, 0))
        sel = sel + jnp.where(lane0, vn, 0) * 65536
        Mb = _psum(sel)
        d0 = ((Mb >> 8) & 255) - e
        d1 = (Mb & 255) - e
        both = c1 & c2
        newH0 = jnp.where(both, h0p[...] + jnp.maximum(d0, d1),
                          jnp.where(c1, h0p[...] + d0, h0p[...] + d1))
        newlt = jnp.where(both, jnp.where(d0 > d1, lt, lt + 1),
                          jnp.where(c1, lt, lt + 1))
        h00 = (Mb >> 16) - 2 * e
        h0p[...] = jnp.where(act, jnp.where(is0, h00, newH0), h0p[...])
        ltp[...] = jnp.where(act, jnp.where(is0, 0, newlt), ltp[...])

        nis0 = act & jnp.logical_not(is0)
        M0 = h0p[...]
        better = nis0 & (M0 > mxp[...])
        if prm.xdrop >= 0:
            drop = (nis0 & jnp.logical_not(M0 > mxp[...])
                    & (mxp[...] - M0 > prm.xdrop))
            zdp[...] = jnp.where(drop, 1 + r, zdp[...])
        mxp[...] = jnp.where(better, M0, mxp[...])
        mtp[...] = jnp.where(better, ltp[...], mtp[...])
        mqp[...] = jnp.where(better, r - ltp[...], mqp[...])

    # X-drop always participates here (ksw2_extf2_sse.c:90-91)
    chunk_early_exit(stopr, step, prm.chunk, rlim, zdp,
                     lambda: jax.lax.fori_loop(0, prm.chunk, diag_body, None))

    @pl.when(step == pl.num_programs(0) - 1)
    def _emit():
        ndc = qlp + tlp - 1
        # "not completed": an X-drop OR a band-empty stop before the last
        # diagonal (ksw2_extf2_sse.c:49)
        zflag = jnp.maximum((rlim < ndc).astype(I32),
                            (zdp[...] > 0).astype(I32))
        score = jnp.where(zflag == 0, h0p[...], NEG_INF)
        neg = jnp.full(shape, NEG_INF, I32)
        m1 = jnp.full(shape, -1, I32)
        out = jnp.zeros(shape, I32)
        for fid, val in ((F_MAX, mxp[...]), (F_MAXT, mtp[...]),
                         (F_MAXQ, mqp[...]), (F_MQE, neg), (F_MQET, m1),
                         (F_MTE, neg), (F_MTEQ, m1), (F_SCORE, score),
                         (F_ZDROP, zflag)):
            out = jnp.where(lane == fid, val, out)
        res_ref[...] = out


def build_batch_extf_call(prm: BatchExtfParams, interpret: bool = False):
    R = prm.n_rows
    shape = (R, 128)
    chunk = prm.chunk
    assert CHUNK % chunk == 0
    n_steps = (prm.n_diag + chunk - 1) // chunk
    scratch = [pltpu.VMEM(shape, jnp.int32) for _ in range(11)]
    scratch.append(pltpu.SMEM((1,), jnp.int32))     # early-exit flag
    kernel = functools.partial(_batch_extf_kernel, prm)

    def wrap(*refs):
        kernel(refs)

    from .bands import stable_kernel_name as _skn
    try:
        wrap.__name__ = _skn('wavefront_batch_extf', prm)
    except NameError:
        pass
    return pl.pallas_call(
        wrap,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # qlp
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # tlp
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # wp
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # rlim
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # target
            pl.BlockSpec((R, CHUNK), lambda i: (0, (i * chunk) // CHUNK),
                         memory_space=pltpu.VMEM),                 # qinj
        ],
        out_shape=[jax.ShapeDtypeStruct(shape, jnp.int32)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


__all__ = ["BatchExtfParams", "build_batch_extf_call"]
