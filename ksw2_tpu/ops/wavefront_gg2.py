"""Pallas TPU wavefront kernel: banded global alignment (gg2_sse semantics).

``ksw_gg2_sse`` is the SIMD diagonal form of global alignment: the same
difference recurrence as extz2 but always emitting a CIGAR, scoring through
a *generic* matrix gather (no specialized match/mismatch blend,
ksw2_gg2_sse.c:60-66), no unsigned clamp, and the final score reconstructed
by the O(1) H0 walk along the band (ksw2_gg2_sse.c:102-106 in the scalar
twin).  Empty rounded bands do not stop the sweep — the walk still advances
(global alignment must reach the corner).

The matrix gather is implemented as m host-precomputed query-symbol
profiles ``prof_c[t] = mat[target[t]*m + c]`` (sign-biased, +2(q+e)
prefolded) selected per lane by the shifted query plane — m selects
instead of a gather.

The reference has a deterministic quirk: u,v,x,y,s are one contiguous
allocation (ksw2_gg2_sse.c:32-34), and when ``qlen > tlen + w`` the H0 walk
runs past the end of one array into the next.  The spec engine replicates
it (spec/diagdiff.py:_blk_u8); this kernel does too, behind a static flag.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .wavefront import I32, _ld

H0S, LASTH0T, LASTST, LASTEN = range(4)
NSTATE_GG = 4


class Gg2Params(NamedTuple):
    qlen: int
    tlen: int
    m: int
    q: int
    e: int
    w: int
    chunk: int
    n_diag: int
    n_rows: int
    p_rows: int


def _gg2_kernel_body(prm: Gg2Params, refs):
    (qsmem_ref, target_ref, prof_ref, res_ref, p_ref,
     u, v, x, y, s, Q, dscr, ez) = refs

    qlen, tlen, w = prm.qlen, prm.tlen, prm.w
    qe = prm.q + prm.e
    R = prm.n_rows
    shape = (R, 128)
    # the walk can overrun the u/v/x/y/s block only when bands go empty
    overrun = prm.qlen > prm.tlen + prm.w

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
        x[...] = zero
        y[...] = zero
        s[...] = jnp.full(shape, ((2 * qe) & 255) ^ 128, I32)
        Q[...] = zero
        ez[H0S] = 0
        ez[LASTH0T] = 0
        ez[LASTST] = -1
        ez[LASTEN] = -1

    NN = R * 128
    # the reference's contiguous block strides at tlen_*16 bytes per array
    # (ksw2_gg2_sse.c:32-34), not at our padded array size
    NSPEC = ((prm.tlen + 15) // 16) * 16

    def _blk_u8(region0, k):
        """Unsigned byte at flat offset k of the contiguous u,v,x,y,s block
        starting at region ``region0`` (spec/diagdiff.py:_blk_u8).

        Arrays here store unsigned canon (u,v,x,y) or biased+shifted bytes
        (s); the s region must be un-folded back to its raw byte value.
        """
        regions = (u, v, x, y)[region0:]
        kk = k
        val = jnp.zeros((), I32)
        done = jnp.zeros((), jnp.bool_)
        for arr in regions:
            hit = jnp.logical_not(done) & (kk < NSPEC)
            val = jnp.where(hit, _ld(arr, jnp.clip(kk, 0, NN - 1)), val)
            done = done | hit
            kk = jnp.where(done, kk, kk - NSPEC)
        # s region: raw byte = (biased ^ 128) - 2qe mod 256; the reference's
        # trailing bytes (and anything past) read as zero, which equals our
        # bias(0) initialization, so a plain unfolded read suffices
        sraw = (_ld(s, jnp.clip(kk, 0, NN - 1)) ^ 128) - ((2 * qe) & 255)
        sraw = sraw & 255
        hit_s = jnp.logical_not(done) & (kk < NN)
        val = jnp.where(hit_s, sraw, val)
        return val

    def _walk_u8(region0, k):
        if overrun:
            return _blk_u8(region0, k)
        arr = (u, v)[region0]
        return _ld(arr, jnp.clip(k, 0, NN - 1))

    def _h0_walk(r, st0, en0):
        lt = ez[LASTH0T]
        is0 = r == 0
        c1 = (lt >= st0) & (lt <= en0)
        d_in = _walk_u8(1, lt) - qe                   # v[lt]
        d_out = _walk_u8(0, jnp.clip(lt + 1, 0, 5 * NN)) - qe   # u[lt+1]
        h00 = _walk_u8(1, 0) - 2 * qe
        newH0 = jnp.where(c1, ez[H0S] + d_in, ez[H0S] + d_out)
        newlt = jnp.where(c1, lt, lt + 1)
        ez[H0S] = jnp.where(is0, h00, newH0)
        ez[LASTH0T] = jnp.where(is0, 0, newlt)

    def diag_body(rr, _):
        r = step * prm.chunk + rr

        @pl.when(r < prm.n_diag)
        def _():
            st0 = jnp.maximum(0, jnp.maximum(r - qlen + 1, (r - w + 1) >> 1))
            en0 = jnp.minimum(tlen - 1, jnp.minimum(r, (r + w) >> 1))
            st = st0 // 16 * 16
            en = (en0 + 16) // 16 * 16 - 1

            @pl.when(st <= en)
            def _main():
                in_range = (st - 1 >= ez[LASTST]) & (st - 1 <= ez[LASTEN])
                need_ov = (st == 0) | jnp.logical_not(in_range)
                ov_v = jnp.where(st == 0, ((r > 0).astype(I32) * prm.q), 0)
                col_mask = (en >= r) & (tvec == r)
                ut = jnp.where(col_mask, ((r > 0).astype(I32) * prm.q), u[...])
                yt = jnp.where(col_mask, 0, y[...])

                qv = qsmem_ref[jnp.minimum(r, qlen - 1)]
                Qn = _shift_t(Q[...], qv)
                Q[...] = Qn

                # generic matrix gather via m query-symbol profile planes
                sval = prof_ref[pl.ds(0, R), :]
                for c in range(1, prm.m):
                    sval = jnp.where(Qn == c, prof_ref[pl.ds(c * R, R), :],
                                     sval)
                smask = (tvec >= st0) & (tvec <= en0)
                s[...] = jnp.where(smask, sval, s[...])

                ovm = (tvec == st) & need_ov
                xs = jnp.where(ovm, 0, _shift_t(x[...], 0))
                vs = jnp.where(ovm, ov_v, _shift_t(v[...], ov_v))
                a = (xs + vs) & 255
                b = (yt + ut) & 255
                ab = a ^ 128
                d = jnp.where(ab > s[...], 1, 0)
                zb = jnp.maximum(s[...], ab)
                bb = b ^ 128
                d = jnp.where(bb > zb, 2, d)
                z = zb ^ 128
                z = jnp.maximum(z, b)              # max_epu8; no clamp here
                unew = (z - vs) & 255
                vnew = (z - ut) & 255
                z2 = z - prm.q
                an = (a - z2) & 255
                bn = (b - z2) & 255
                anb = an ^ 128
                bnb = bn ^ 128
                d = d | jnp.where(anb > 128, 0x08, 0)
                d = d | jnp.where(bnb > 128, 0x10, 0)
                bmask = (tvec >= st) & (tvec <= en)
                u[...] = jnp.where(bmask, unew, u[...])
                v[...] = jnp.where(bmask, vnew, v[...])
                x[...] = jnp.where(bmask, jnp.where(anb > 128, an, 0), x[...])
                y[...] = jnp.where(bmask, jnp.where(bnb > 128, bn, 0), y[...])

                # gg2's traceback has no upper band clamp (off_end is NULL,
                # ksw2_gg2_sse.c:124), so bytes past the band must be zero
                # exactly like the reference's untouched p row tail
                d = jnp.where(bmask, d, 0)
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
                ez[LASTST] = st
                ez[LASTEN] = en

            @pl.when(st > en)
            def _empty():
                # empty rounded band: the reference skips the vector loop,
                # leaving that diagonal's direction row all-zero — the
                # corner traceback may walk through it
                p_ref[pl.ds(rr, 1)] = jnp.zeros(
                    (1, prm.p_rows, 128), jnp.int8)

            _h0_walk(r, st0, en0)

    jax.lax.fori_loop(0, prm.chunk, diag_body, None)
    res_ref[0] = ez[H0S]
    res_ref[1] = ez[LASTH0T]
    res_ref[2] = 0
    res_ref[3] = 0


def build_gg2_call(prm: Gg2Params, interpret: bool = False):
    R = prm.n_rows
    shape = (R, 128)
    scratch = [pltpu.VMEM(shape, jnp.int32) for _ in range(6)]  # u v x y s Q
    scratch.append(pltpu.VMEM((R + prm.p_rows, 128), jnp.int32))  # dscr
    scratch.append(pltpu.SMEM((NSTATE_GG,), jnp.int32))
    n_steps = (prm.n_diag + prm.chunk - 1) // prm.chunk
    kernel = functools.partial(_gg2_kernel_body, prm)

    def wrap(*refs):
        kernel(refs)

    return pl.pallas_call(
        wrap,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # query, flat int32
            pl.BlockSpec(memory_space=pltpu.VMEM),   # target (R,128)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # profiles (m*R,128)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NSTATE_GG,), jnp.int32),
            jax.ShapeDtypeStruct((n_steps * prm.chunk, prm.p_rows, 128),
                                 jnp.int8),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((prm.chunk, prm.p_rows, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


__all__ = ["Gg2Params", "build_gg2_call"]
