"""Pallas TPU wavefront kernel: one-piece affine extension (extz2 semantics).

TPU-first redesign of the reference's anti-diagonal difference DP
(``ksw2_extz2_sse.c``): the 16-lane SSE loop becomes a full-band VPU sweep
over ``(R, 128)`` delta arrays resident in VMEM, with the diagonal loop
running *inside* the kernel (a grid step processes a chunk of diagonals and
streams that chunk's direction-byte rows to HBM).  Byte parity with the
reference is preserved: band bounds are rounded to 16 lanes exactly as the
SSE code does, stores outside the rounded band are masked off (so "garbage
lane" values evolve identically), int8 *wrap* semantics are emulated (Mosaic
has no int8 vector ALU, so deltas are carried as canonical int8 values in
int32 lanes and wrapped after each add/sub), and the exact-max path
reproduces the 4-lane argmax merge order via key encoding.

Layout: the t axis (target index) is flattened into rows of 128 lanes;
``shift by one in t`` = lane roll + a row-shifted fixup of lane 0 (three
vector ops), mirroring the SSE byte-shift carry chain at 8x the width.

Scalar per-diagonal state (running max, Z-drop, approx-H0 walk, band memo)
lives in SMEM; early termination is a flag that turns remaining diagonals
into no-ops (the grid itself cannot early-exit).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.flags import NEG_INF, Flag

# SMEM scalar-state slots
MAX, MAXT, MAXQ, MQE, MQET, MTE, MTEQ, SCORE, ZDROP, FIN, H0, LASTH0T, \
    LASTST, LASTEN, STOPR = range(15)
NSTATE = 16

_INT_MIN = -(2 ** 31) + 1
_BIGKEY = 2 ** 30
I32 = jnp.int32


def _w8(x):
    """Wrap an int32 vector/scalar to the canonical int8 value (C wrap)."""
    return ((x + 128) & 255) - 128


def _shift_t(arr, first_fix):
    """out[t] = arr[t-1] over the flattened (R,128) t-axis; out[0]=first_fix.

    Equivalent of the SSE slli/srli carry chain (ksw2_extz2_sse.c:28-35).
    """
    rolled = jnp.roll(arr, 1, axis=1)           # lane l-1 -> l (lane 0 wrong)
    carried = jnp.roll(rolled, 1, axis=0)       # [r,0] now holds arr[r-1,127]
    lane0 = jax.lax.broadcasted_iota(I32, arr.shape, 1) == 0
    out = jnp.where(lane0, carried, rolled)
    row0 = jax.lax.broadcasted_iota(I32, arr.shape, 0) == 0
    return jnp.where(lane0 & row0, first_fix, out)


def _umax8(a, b):
    """_mm_max_epu8 on canonical int8 values held in int32 lanes."""
    return jnp.where((a & 255) > (b & 255), a, b)


def _umin8c(a, c):
    """_mm_min_epu8 against a constant byte (canonical int8 result)."""
    cb = c & 0xFF
    cc = cb - 256 if cb > 127 else cb
    return jnp.where((a & 255) < cb, a, cc)


def _lane_iota():
    return jax.lax.broadcasted_iota(I32, (1, 128), 1)


def _ld(ref, t):
    """Dynamic scalar load from an (R,128) ref at flat index t, as int32.

    Mosaic only allows dynamic slicing on the sublane dim, so the row is
    sliced dynamically and the lane is selected with a masked reduce.
    """
    row = ref[pl.ds(t // 128, 1), :].astype(I32)
    return jnp.max(jnp.where(_lane_iota() == t % 128, row, _INT_MIN))


def _st(ref, t, val):
    """Dynamic scalar store into an (R,128) ref at flat index t."""
    idx = pl.ds(t // 128, 1)
    row = ref[idx, :]
    ref[idx, :] = jnp.where(_lane_iota() == t % 128, val, row)


def _ld_u8(ref, t):
    """Load a canonical int8 scalar as its uint8 value (int32)."""
    return _ld(ref, t) & 0xFF


class ExtzParams(NamedTuple):
    qlen: int
    tlen: int
    m: int
    sc_mch: int
    sc_mis: int
    sc_N: int
    q: int
    e: int
    w: int          # resolved (>=0)
    zdrop: int
    flag: int
    chunk: int      # diagonals per grid step
    n_diag: int
    n_rows: int     # R of the (R,128) state arrays
    p_rows: int     # rows of the stored traceback window (cigar mode)


def _extz_kernel_body(prm: ExtzParams, with_cigar: bool, refs):
    if with_cigar:
        (query_ref, target_ref, res_ref, p_ref,
         u, v, x, y, s, Q, dscr, H, tn, ez) = refs
    else:
        (query_ref, target_ref, res_ref,
         u, v, x, y, s, Q, H, tn, ez) = refs
        p_ref = dscr = None

    qlen, tlen, w = prm.qlen, prm.tlen, prm.w
    qe = prm.q + prm.e
    flag = Flag(prm.flag)
    approx = bool(flag & Flag.APPROX_MAX)
    right = bool(flag & Flag.RIGHT)
    R = prm.n_rows
    shape = (R, 128)

    step = pl.program_id(0)
    tvec = (jax.lax.broadcasted_iota(I32, shape, 0) * 128
            + jax.lax.broadcasted_iota(I32, shape, 1))

    @pl.when(step == 0)
    def _init():
        zero = jnp.zeros(shape, I32)
        u[...] = zero
        v[...] = zero
        x[...] = zero
        y[...] = zero
        s[...] = zero
        Q[...] = zero
        tn[...] = (target_ref[...] == prm.m - 1).astype(I32)
        if not approx:
            H[...] = jnp.full(shape, NEG_INF, I32)
        for k in (MAXT, MAXQ, MQET, MTEQ):
            ez[k] = -1
        for k in (MQE, MTE, SCORE):
            ez[k] = NEG_INF
        for k in (MAX, ZDROP, FIN, H0, LASTH0T):
            ez[k] = 0
        ez[LASTST] = -1
        ez[LASTEN] = -1
        ez[STOPR] = prm.n_diag

    def _zdrop_update(Hval, rr, tt, e_comp):
        better = Hval > ez[MAX]
        mt, mq = ez[MAXT], ez[MAXQ]
        tl = tt - mt
        ql = (rr - tt) - mq
        l = jnp.abs(tl - ql)
        trigger = (
            jnp.logical_not(better) & (tt >= mt) & (rr - tt >= mq)
            & (prm.zdrop >= 0) & (ez[MAX] - Hval > prm.zdrop + l * e_comp)
        )
        ez[MAX] = jnp.where(better, Hval, ez[MAX])
        ez[MAXT] = jnp.where(better, tt, mt)
        ez[MAXQ] = jnp.where(better, rr - tt, mq)

        @pl.when(trigger)
        def _():
            ez[ZDROP] = 1
            ez[FIN] = 1
            ez[STOPR] = rr

    def _exact_update(r, st0, en0, en):
        vu = v[...] & 0xFF
        h_en0 = jnp.where(
            en0 > 0,
            _ld(H, jnp.maximum(en0 - 1, 0)) + _ld_u8(u, en0) - qe,
            _ld(H, en0) + _ld_u8(v, en0) - qe,
        )
        is0 = r == 0
        h0val = _ld_u8(v, 0) - 2 * qe
        scan_mask = (tvec >= st0) & (tvec < en0) & jnp.logical_not(is0)
        Hnew = H[...] + vu - qe
        H[...] = jnp.where(scan_mask, Hnew, H[...])
        M_body = jnp.max(jnp.where(scan_mask, Hnew, _INT_MIN))
        h_last = jnp.where(is0, h0val, h_en0)
        M = jnp.maximum(M_body, h_last)
        # argmax with the reference's 4-lane merge order (exact_max_scan spec)
        en1 = st0 + (en0 - st0) // 4 * 4
        cls = (tvec - st0) & 3
        key = jnp.where(tvec < en1, cls * (1 << 26) + tvec, (1 << 28) + tvec)
        keym = jnp.where(scan_mask & (Hnew == M), key, _BIGKEY)
        kmin = jnp.min(keym)
        max_t = jnp.where(h_last == M, en0, kmin & ((1 << 26) - 1))
        max_t = jnp.where(is0, 0, max_t)
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

        _zdrop_update(M, r, max_t, prm.e)

        @pl.when((r == qlen + tlen - 2) & (en0 == tlen - 1))
        def _():
            ez[SCORE] = h_last

    def _approx_update(r, st0, en0):
        lt = ez[LASTH0T]
        c1 = (lt >= st0) & (lt <= en0)
        c2 = (lt + 1 >= st0) & (lt + 1 <= en0)
        lt1 = jnp.minimum(lt + 1, prm.n_rows * 128 - 1)
        d0 = _ld_u8(v, lt) - qe
        d1 = _ld_u8(u, lt1) - qe
        both = c1 & c2
        newH0 = jnp.where(
            both,
            ez[H0] + jnp.maximum(d0, d1),
            jnp.where(c1, ez[H0] + d0, ez[H0] + d1),
        )
        newlt = jnp.where(both, jnp.where(d0 > d1, lt, lt + 1),
                          jnp.where(c1, lt, lt + 1))
        is0 = r == 0
        h00 = _ld_u8(v, 0) - 2 * qe
        ez[H0] = jnp.where(is0, h00, newH0)
        ez[LASTH0T] = jnp.where(is0, 0, newlt)
        if flag & Flag.APPROX_DROP:
            @pl.when(jnp.logical_not(is0))
            def _():
                _zdrop_update(ez[H0], r, ez[LASTH0T], prm.e)

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
                ov_v = jnp.where(st == 0, jnp.where(r > 0, prm.q, 0), 0)
                # first-column boundary presets (u[r]=q, y[r]=0) when en>=r
                col_mask = (en >= r) & (tvec == r)
                u[...] = jnp.where(col_mask, jnp.where(r > 0, prm.q, 0), u[...])
                y[...] = jnp.where(col_mask, 0, y[...])

                # reversed-query window: shift right, inject query[r] at t=0
                qv = _ld(query_ref, jnp.minimum(r, qlen - 1))
                Qn = _shift_t(Q[...], qv)
                Q[...] = Qn

                # score profile over [st0, fill_hi] (16-block store extent)
                fill_hi = st0 + ((en0 - st0) // 16) * 16 + 15
                eq = target_ref[...] == Qn
                nm = (tn[...] != 0) | (Qn == prm.m - 1)
                sval = jnp.where(eq, prm.sc_mch, prm.sc_mis)
                sval = jnp.where(nm, prm.sc_N, sval)
                smask = (tvec >= st0) & (tvec <= fill_hi)
                s[...] = jnp.where(smask, sval, s[...])

                # core difference recurrence (canonical int8 values, wrapped)
                ovm = (tvec == st) & need_ov
                xs = jnp.where(ovm, 0, _shift_t(x[...], 0))
                vs = jnp.where(ovm, ov_v, _shift_t(v[...], ov_v))
                ut = u[...]
                yt = y[...]
                a = _w8(xs + vs)
                b = _w8(yt + ut)
                zz = _w8(s[...] + 2 * qe)
                if with_cigar:
                    if not right:
                        d = jnp.where(a > zz, 1, 0)
                    else:
                        d = jnp.where(zz > a, 0, 1)
                z = jnp.maximum(zz, a)
                if with_cigar:
                    if not right:
                        d = jnp.where(b > z, 2, d)
                    else:
                        d = jnp.where(z > b, d, 2)
                z = _umax8(z, b)
                z = _umin8c(z, prm.sc_mch + 2 * qe)
                unew = _w8(z - vs)
                vnew = _w8(z - ut)
                z2 = _w8(z - prm.q)
                a = _w8(a - z2)
                b = _w8(b - z2)
                if with_cigar:
                    if not right:
                        ta, tb = a > 0, b > 0
                    else:
                        ta, tb = jnp.logical_not(a < 0), jnp.logical_not(b < 0)
                    d = d | jnp.where(ta, 0x08, 0)
                    d = d | jnp.where(tb, 0x10, 0)
                bmask = (tvec >= st) & (tvec <= en)
                u[...] = jnp.where(bmask, unew, u[...])
                v[...] = jnp.where(bmask, vnew, v[...])
                x[...] = jnp.where(bmask, jnp.maximum(a, 0), x[...])
                y[...] = jnp.where(bmask, jnp.maximum(b, 0), y[...])

                if with_cigar:
                    dscr[pl.ds(0, R)] = d
                    row0 = st // 128
                    p_ref[pl.ds(rr, 1)] = (
                        dscr[pl.ds(row0, prm.p_rows), :].astype(jnp.int8)[None]
                    )

                if not approx:
                    _exact_update(r, st0, en0, en)
                else:
                    _approx_update(r, st0, en0)

                ez[LASTST] = st
                ez[LASTEN] = en

    jax.lax.fori_loop(0, prm.chunk, diag_body, None)
    for k in range(NSTATE):
        res_ref[k] = ez[k] if k < 15 else 0


def build_extz_call(prm: ExtzParams, with_cigar: bool, interpret: bool = False):
    R = prm.n_rows
    shape = (R, 128)
    scratch = [
        pltpu.VMEM(shape, jnp.int32),   # u
        pltpu.VMEM(shape, jnp.int32),   # v
        pltpu.VMEM(shape, jnp.int32),   # x
        pltpu.VMEM(shape, jnp.int32),   # y
        pltpu.VMEM(shape, jnp.int32),   # s
        pltpu.VMEM(shape, jnp.int32),   # Q
    ]
    if with_cigar:
        scratch.append(pltpu.VMEM((R + prm.p_rows, 128), jnp.int32))  # dscr
    scratch += [
        pltpu.VMEM(shape, jnp.int32),  # H (unused in approx mode but cheap)
        pltpu.VMEM(shape, jnp.int32),  # tn (target wildcard mask)
        pltpu.SMEM((NSTATE,), jnp.int32),  # ez scalars
    ]
    n_steps = (prm.n_diag + prm.chunk - 1) // prm.chunk
    grid = (n_steps,)
    kernel = functools.partial(_extz_kernel_body, prm, with_cigar)

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

    call = pl.pallas_call(
        wrap,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # query (Rq,128) int32
            pl.BlockSpec(memory_space=pltpu.VMEM),  # target (R,128) int32
        ],
        out_shape=out_shape,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )
    return call


__all__ = ["ExtzParams", "build_extz_call", "MAX", "MAXT", "MAXQ", "MQE",
           "MQET", "MTE", "MTEQ", "SCORE", "ZDROP", "FIN", "H0", "LASTH0T",
           "STOPR", "NSTATE"]
