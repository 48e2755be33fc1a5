"""Pallas TPU wavefront kernel: linear-gap extension (extf2 semantics).

The cheapest member of the kernel family (``ksw2_extf2_sse.c``): no gap-open
state, only the u/v difference arrays, score-only output with the O(1)
approximate H0 walk and an X-drop break (ksw2_extf2_sse.c:90-91).

Same unsigned-byte representation as :mod:`ksw2_tpu.ops.wavefront`: the
score profile is stored with the ``+2e`` shift and sign bias folded in, so
the inner loop is four vector ops plus the shift.  The query lives in SMEM
(scalar read per diagonal); the X-drop walk keeps its scalar state in SMEM
exactly like the reference keeps it in registers.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.flags import NEG_INF
from .wavefront import (I32, _ld, MAX, MAXT, MAXQ, SCORE, ZDROP, FIN, H0,
                        LASTH0T, LASTST, LASTEN, STOPR, NSTATE)


class ExtfParams(NamedTuple):
    qlen: int
    tlen: int
    mch: int
    mis: int        # already canonicalized to <= 0
    e: int
    w: int
    xdrop: int
    chunk: int
    n_diag: int
    n_rows: int


def _extf_kernel_body(prm: ExtfParams, refs):
    (qsmem_ref, target_ref, res_ref, u, v, s, Q, ez) = refs

    qlen, tlen, w, e = prm.qlen, prm.tlen, prm.w, prm.e
    R = prm.n_rows
    shape = (R, 128)

    sb_mch = ((prm.mch + 2 * e) & 255) ^ 128
    sb_mis = ((prm.mis + 2 * e) & 255) ^ 128

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

    @pl.when(step == 0)
    def _init():
        zero = jnp.zeros(shape, I32)
        u[...] = zero
        v[...] = zero
        # unfilled s lanes read as raw byte 0: bias(0) = ((2e)&255)^128
        s[...] = jnp.full(shape, ((2 * e) & 255) ^ 128, I32)
        Q[...] = zero
        for k in (MAXT, MAXQ):
            ez[k] = -1
        ez[SCORE] = NEG_INF
        for k in (MAX, ZDROP, FIN, H0, LASTH0T):
            ez[k] = 0
        ez[LASTST] = -1
        ez[LASTEN] = -1
        ez[STOPR] = prm.n_diag

    def diag_body(rr, _):
        r = step * prm.chunk + rr

        @pl.when((r < prm.n_diag) & (ez[FIN] == 0))
        def _():
            st0 = jnp.maximum(0, jnp.maximum(r - qlen + 1, (r - w + 1) >> 1))
            en0 = jnp.minimum(tlen - 1, jnp.minimum(r, (r + w) >> 1))

            @pl.when(st0 > en0)
            def _band_empty():
                ez[ZDROP] = 1       # "not completed" (ksw2_extf2_sse.c:49)
                ez[FIN] = 1
                ez[STOPR] = r

            @pl.when(st0 <= en0)
            def _main():
                st = st0 // 16 * 16
                en = (en0 + 16) // 16 * 16 - 1
                in_range = (st - 1 >= ez[LASTST]) & (st - 1 <= ez[LASTEN])
                need_ov = (st == 0) | jnp.logical_not(in_range)
                # first-column preset u[r]=0 folded into the recurrence read
                col_mask = (en >= r) & (tvec == r)
                ut = jnp.where(col_mask, 0, u[...])

                qv = qsmem_ref[jnp.minimum(r, qlen - 1)]
                Qn = _shift_t(Q[...], qv)
                Q[...] = Qn

                fill_hi = st0 + ((en0 - st0) // 16) * 16 + 15
                eq = target_ref[...] == Qn
                sval = jnp.where(eq, sb_mch, sb_mis)
                smask = (tvec >= st0) & (tvec <= fill_hi)
                # stale lanes keep their previous fill (byte parity: garbage
                # lanes inside the rounded band evolve like the SSE code's)
                sn = jnp.where(smask, sval, s[...])
                s[...] = sn

                ovm = (tvec == st) & need_ov
                vs = jnp.where(ovm, 0, _shift_t(v[...], 0))
                zb = jnp.maximum(sn, vs ^ 128)   # signed epi8 max (biased)
                z = zb ^ 128
                z = jnp.maximum(z, ut)           # max_epu8
                unew = (z - vs) & 255
                vnew = (z - ut) & 255
                bmask = (tvec >= st) & (tvec <= en)
                u[...] = jnp.where(bmask, unew, u[...])
                v[...] = jnp.where(bmask, vnew, v[...])

                # O(1) H0 walk + X-drop (ksw2_extf2_sse.c:80-91)
                lt = ez[LASTH0T]
                c1 = (lt >= st0) & (lt <= en0)
                c2 = (lt + 1 >= st0) & (lt + 1 <= en0)
                lt1 = jnp.minimum(lt + 1, R * 128 - 1)
                d0 = _ld(v, lt) - e
                d1 = _ld(u, lt1) - e
                both = c1 & c2
                newH0 = jnp.where(both, ez[H0] + jnp.maximum(d0, d1),
                                  jnp.where(c1, ez[H0] + d0, ez[H0] + d1))
                newlt = jnp.where(both, jnp.where(d0 > d1, lt, lt + 1),
                                  jnp.where(c1, lt, lt + 1))
                is0 = r == 0
                h00 = _ld(v, 0) - 2 * e
                ez[H0] = jnp.where(is0, h00, newH0)
                ez[LASTH0T] = jnp.where(is0, 0, newlt)

                @pl.when(jnp.logical_not(is0))
                def _walk():
                    better = ez[H0] > ez[MAX]
                    drop = (jnp.logical_not(better) & (prm.xdrop >= 0)
                            & (ez[MAX] - ez[H0] > prm.xdrop))
                    ez[MAX] = jnp.where(better, ez[H0], ez[MAX])
                    ez[MAXT] = jnp.where(better, ez[LASTH0T], ez[MAXT])
                    ez[MAXQ] = jnp.where(better, r - ez[LASTH0T], ez[MAXQ])

                    @pl.when(drop)
                    def _():
                        ez[ZDROP] = 1
                        ez[FIN] = 1
                        ez[STOPR] = r

                ez[LASTST] = st
                ez[LASTEN] = en

    jax.lax.fori_loop(0, prm.chunk, diag_body, None)

    @pl.when(step == pl.num_programs(0) - 1)
    def _fin():
        @pl.when(ez[ZDROP] == 0)
        def _():
            ez[SCORE] = ez[H0]
        for k in range(NSTATE):
            res_ref[k] = ez[k] if k < 15 else 0

    @pl.when(step < pl.num_programs(0) - 1)
    def _mid():
        for k in range(NSTATE):
            res_ref[k] = ez[k] if k < 15 else 0


def build_extf_call(prm: ExtfParams, interpret: bool = False):
    R = prm.n_rows
    shape = (R, 128)
    scratch = [
        pltpu.VMEM(shape, jnp.int32),   # u
        pltpu.VMEM(shape, jnp.int32),   # v
        pltpu.VMEM(shape, jnp.int32),   # s
        pltpu.VMEM(shape, jnp.int32),   # Q
        pltpu.SMEM((NSTATE,), jnp.int32),
    ]
    n_steps = (prm.n_diag + prm.chunk - 1) // prm.chunk
    kernel = functools.partial(_extf_kernel_body, prm)

    def wrap(*refs):
        kernel(refs)

    from .bands import stable_kernel_name as _skn
    try:
        wrap.__name__ = _skn('wavefront_extf', prm)
    except NameError:
        pass
    return pl.pallas_call(
        wrap,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # query, flat int32
            pl.BlockSpec(memory_space=pltpu.VMEM),  # target (R,128)
        ],
        out_shape=[jax.ShapeDtypeStruct((NSTATE,), jnp.int32)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


__all__ = ["ExtfParams", "build_extf_call"]
