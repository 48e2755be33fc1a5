"""Batched Pallas TPU wavefront, banded global alignment (gg2_sse).

One pair per P sublane rows like :mod:`ksw2_tpu.ops.wavefront_batch`,
specialised to ``ksw_gg2_sse``: generic matrix gather through per-pair
query-symbol profile planes (gg2 always scores through the matrix,
ksw2_gg2_sse.c:60-66), no unsigned clamp, direction planes on every
diagonal, and the O(1) H0 walk reconstructing the corner score — bands
never stop the sweep (global alignment must reach the corner).

The reference's block-overrun quirk (``qlen > tlen + w`` reads past the
u array, see :mod:`ksw2_tpu.ops.wavefront_gg2`) is NOT replicated here;
the dispatcher routes such pairs to the single-pair kernel.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .wavefront_batch import CHUNK
from .group_reduce import make_group_ops

I32 = jnp.int32
_INT_MIN = -(2 ** 31) + 1


class BatchGg2Params(NamedTuple):
    n_rows: int
    n_diag: int
    m: int
    q: int
    e: int
    chunk: int = CHUNK
    p: int = 1
    matt: tuple = ()     # flattened matrix (profile source)


def _batch_gg2_kernel(prm: BatchGg2Params, with_cigar, refs):
    refs = list(refs)
    (qlp_ref, tlp_ref, wp_ref, target_ref, prof_ref, qinj_ref,
     res_ref) = refs[:7]
    rest = refs[7:]
    p_ref = rest.pop(0) if with_cigar else None
    u, v, x, y, s, Q, h0p, ltp, pbs = rest[:9]

    qe = prm.q + prm.e
    R = prm.n_rows
    shape = (R, 128)

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
        x[...] = zero
        y[...] = zero
        s[...] = jnp.full(shape, ((2 * qe) & 255) ^ 128, I32)
        Q[...] = zero
        h0p[...] = zero
        ltp[...] = zero
        pbs[...] = zero

    qlp = qlp_ref[...]
    tlp = tlp_ref[...]
    wp = wp_ref[...]
    # loop invariants hoisted out of diag_body
    tlm1 = tlp - 1
    ndc = qlp + tlp - 1

    def bounds(r):
        st0 = jnp.maximum(0, jnp.maximum(r + 1 - qlp, (r + 1 - wp) >> 1))
        en0 = jnp.minimum(tlm1, jnp.minimum(r, (r + wp) >> 1))
        return st0, en0, st0 & -16, en0 | 15

    def diag_body(rr, _):
        r = step * prm.chunk + rr
        act = r < ndc
        st0, en0, stb, enb = bounds(r)
        # prev-stb memo instead of bounds(r-1); see wavefront_batch.py
        need_ov = (stb == 0) | (stb == pbs[...])
        pbs[...] = stb
        ov_v = jnp.where(stb == 0, ((r > 0).astype(I32) * prm.q), 0)

        col_mask = act & (enb >= r) & (lane == r)
        ucol = ((r > 0).astype(I32) * prm.q)
        ut = jnp.where(col_mask, ucol, u[...])
        yt = jnp.where(col_mask, 0, y[...])

        qv = pltpu.roll(qinj_ref[...], -(r % CHUNK), axis=1)
        Qn = jnp.where(lane0, qv, _shift1(Q[...]))
        Qn = jnp.where(act, Qn, Q[...])
        Q[...] = Qn

        # generic matrix gather via per-pair profile planes
        sval = prof_ref[pl.ds(0, R), :]
        for c in range(1, prm.m):
            sval = jnp.where(Qn == c, prof_ref[pl.ds(c * R, R), :], sval)
        smask = act & (lane >= st0) & (lane <= en0)
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
            d = jnp.where(ab > sn, 1, 0)
        zb = jnp.maximum(sn, ab)
        if with_cigar:
            bb = b ^ 128
            d = jnp.where(bb > zb, 2, d)
        z = zb ^ 128
        z = jnp.maximum(z, b)              # max_epu8; gg2 has no clamp
        unew = (z - vs) & 255
        vnew = (z - ut) & 255
        z2 = z - prm.q
        an = (a - z2) & 255
        bn = (b - z2) & 255
        anb = an ^ 128
        bnb = bn ^ 128
        if with_cigar:
            d = d | jnp.where(anb > 128, 0x08, 0)
            d = d | jnp.where(bnb > 128, 0x10, 0)
        bmask = act & (lane >= stb) & (lane <= enb)
        u[...] = jnp.where(bmask, unew, u[...])
        v[...] = jnp.where(bmask, vnew, v[...])
        x[...] = jnp.where(bmask, jnp.where(anb > 128, an, 0), x[...])
        y[...] = jnp.where(bmask, jnp.where(bnb > 128, bn, 0), y[...])
        if with_cigar:
            # bytes outside the rounded band must be zero: gg2's traceback
            # has no upper clamp (off_end NULL, ksw2_gg2_sse.c:124)
            d = jnp.where(bmask, d, 0)
            p_ref[pl.ds(rr, 1)] = d.astype(jnp.int8)[None]

        # O(1) H0 walk on the UPDATED planes (in-band -> v[lt], else
        # u[lt+1]; stale reads when the band misses lt are the reference's
        # too).  gg2's walk has no two-candidate branch.
        is0 = r == 0
        lt = ltp[...]
        c1 = (lt >= st0) & (lt <= en0)
        # fused three-field butterfly SUM (see wavefront_batch.py): the
        # clipped selects always hit exactly one lane, deltas are bytes at
        # disjoint shifts, overlapping lanes sum into disjoint bit ranges
        vv, uu = v[...], u[...]
        sel = (jnp.where(lane == jnp.clip(lt, 0, P * 128 - 1), vv, 0) * 256
               + jnp.where(lane == jnp.clip(lt + 1, 0, P * 128 - 1), uu, 0))
        sel = sel + jnp.where(lane0, vv, 0) * 65536
        Mb = _psum(sel)
        d_in = ((Mb >> 8) & 255) - qe
        d_out = (Mb & 255) - qe
        h00 = (Mb >> 16) - 2 * qe
        newH0 = jnp.where(c1, h0p[...] + d_in, h0p[...] + d_out)
        newlt = jnp.where(c1, lt, lt + 1)
        h0p[...] = jnp.where(act, jnp.where(is0, h00, newH0), h0p[...])
        ltp[...] = jnp.where(act, jnp.where(is0, 0, newlt), ltp[...])

    jax.lax.fori_loop(0, prm.chunk, diag_body, None)

    @pl.when(step == pl.num_programs(0) - 1)
    def _emit():
        res_ref[...] = jnp.where(lane == 0, h0p[...], 0)


def build_batch_gg2_call(prm: BatchGg2Params, with_cigar: bool = True,
                         interpret: bool = False):
    R = prm.n_rows
    shape = (R, 128)
    chunk = prm.chunk
    assert CHUNK % chunk == 0
    n_steps = (prm.n_diag + chunk - 1) // chunk
    scratch = [pltpu.VMEM(shape, jnp.int32) for _ in range(9)]
    kernel = functools.partial(_batch_gg2_kernel, prm, with_cigar)

    def wrap(*refs):
        kernel(refs)

    from .bands import stable_kernel_name as _skn
    try:
        wrap.__name__ = _skn('wavefront_batch_gg2', prm)
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
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # target
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # profiles
            pl.BlockSpec((R, CHUNK), lambda i: (0, (i * chunk) // CHUNK),
                         memory_space=pltpu.VMEM),                 # qinj
        ],
        out_shape=out_shape,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


__all__ = ["BatchGg2Params", "build_batch_gg2_call"]
