"""On-device traceback over the streamed direction matrix.

The forward wavefront kernels write ``(n_diag, p_rows, 128)`` direction
bytes to HBM.  Fetching that matrix to the host costs ~(qlen+tlen)*band
bytes of device->host traffic — through this terminal's tunnel it dwarfs
the DP itself (SURVEY.md hard part #1).  This kernel walks the traceback on
the TPU instead, so only the op sequence (~qlen+tlen bytes) leaves the
device.

The walk replays ``ksw_backtrack`` (ksw2.h:129-161) for the anti-diagonal
layout: band-edge force states from the closed-form rounded band, direction
bits 0-2 for the argmax source and 0x08/0x10/0x20 for gap continuations.
The p matrix streams through VMEM in *reverse* grid order (r decreases
monotonically along the walk), one block per grid step; the scalar walk
state (i, j, state, emit count) lives in SMEM.

Host post-processing (``finish_cigar``) run-length encodes the emitted op
codes, applies the leading-gap flush and the intron rule, and reverses.
"""
from __future__ import annotations

import functools
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.cigar import push
from ..core.flags import CigarOp

I32 = jnp.int32


class TbParams(NamedTuple):
    qlen: int
    tlen: int
    w: int
    n_diag: int      # true diagonal count (qlen+tlen-1)
    p_rows: int      # stored rows per diagonal (x128 lanes)
    blk: int         # diagonals per grid step (divides padded p dim 0)
    n_blocks: int
    min_intron: int
    upper_force: int  # 1: clamp to E above the band (0 for gg2, NULL off_end)
    full_rows: int = 0   # direction rows stored at true positions (off==0)


def _tb_kernel(prm: TbParams, refs):
    (start_ref, p_ref, res_ref, ops, st8) = refs
    qlen, tlen, w = prm.qlen, prm.tlen, prm.w
    OPROWS = ops.shape[0]

    step = pl.program_id(0)
    blk_hi = (prm.n_blocks - 1 - step) * prm.blk + prm.blk  # this block: [lo, hi)
    blk_lo = blk_hi - prm.blk
    lane = jax.lax.broadcasted_iota(I32, (1, 128), 1)
    # loop-invariant slab iotas (Mosaic does not reliably LICM these)
    sub32 = jax.lax.broadcasted_iota(I32, (32, 128), 0)
    ln32 = jax.lax.broadcasted_iota(I32, (32, 128), 1)

    I, J, STATE, K, DONE, OVF = range(6)

    @pl.when(step == 0)
    def _init():
        st8[I] = start_ref[0]
        st8[J] = start_ref[1]
        st8[STATE] = 0
        st8[K] = 0
        st8[DONE] = 0
        st8[OVF] = 0

    def emit(op):
        k = st8[K]
        row = ops[pl.ds(k >> 7, 1), :]
        ops[pl.ds(k >> 7, 1), :] = jnp.where(lane == (k & 127), op, row)
        st8[K] = k + 1

    def walk(_, __):
        i, j, state = st8[I], st8[J], st8[STATE]
        r = i + j
        live = ((st8[DONE] == 0) & (i >= 0) & (j >= 0)
                & (r >= blk_lo) & (r < blk_hi))

        @pl.when(live)
        def _():
            st0 = jnp.maximum(0, jnp.maximum(r - qlen + 1, (r - w + 1) >> 1))
            en0 = jnp.minimum(tlen - 1, jnp.minimum(r, (r + w) >> 1))
            st = st0 // 16 * 16
            en = (en0 + 16) // 16 * 16 - 1
            store_off = 0 if prm.full_rows else st // 128 * 128
            if prm.upper_force:
                force = jnp.where(i < st, 2, jnp.where(i > en, 1, -1))
            else:
                force = jnp.where(i < st, 2, -1)
                # a force-less walk above the band reads past the stored
                # row in the reference (flat into the next diagonal);
                # flag it so the caller can replay with exact layout
                st8[OVF] = jnp.where(i > en, 1, st8[OVF])
            idx = i - store_off
            # int8 dim-1 slices must be tile-aligned (32 sublanes); the
            # hint is required because Mosaic cannot prove it statically
            base = pl.multiple_of(
                jnp.minimum((idx >> 7) & ~31, prm.p_rows - 32), 32)
            slab = p_ref[pl.ds(r - blk_lo, 1), pl.ds(base, 32), :][0]
            hit = (sub32 == (idx >> 7) - base) & (ln32 == (idx & 127))
            tmp0 = jnp.max(jnp.where(hit, slab.astype(I32) & 255, 0))
            tmp = jnp.where(force >= 0, 0, tmp0)
            s1 = jnp.where(state == 0, tmp & 7,
                           jnp.where((tmp >> (state + 2)) & 1, state, 0))
            s1 = jnp.where(s1 == 0, tmp & 7, s1)
            s1 = jnp.where(force >= 0, force, s1)
            # op codes: 0=M 1=I 2=D 3=N  (ksw2.h:150-153)
            is_m = s1 == 0
            is_d = (s1 == 1) | ((s1 == 3) & (prm.min_intron <= 0))
            is_n = (s1 == 3) & (prm.min_intron > 0)
            op = jnp.where(is_m, 0, jnp.where(is_d, 2, jnp.where(is_n, 3, 1)))
            emit(op)
            st8[STATE] = s1
            st8[I] = jnp.where(is_m | is_d | is_n, i - 1, i)
            st8[J] = jnp.where(is_m, j - 1, jnp.where(is_d | is_n, j, j - 1))

        @pl.when((st8[I] < 0) | (st8[J] < 0))
        def _fin():
            st8[DONE] = 1

    # r drops by >=1 per emitted op, so blk iterations cross the block
    jax.lax.fori_loop(0, prm.blk, walk, None)

    res_ref[0] = st8[I]
    res_ref[1] = st8[J]
    res_ref[2] = st8[K]
    res_ref[3] = st8[OVF]
    del OPROWS


def build_traceback_call(prm: TbParams, interpret: bool = False):
    oprows = (prm.qlen + prm.tlen + 127) // 128 + 1
    kernel = functools.partial(_tb_kernel, prm)

    def wrap(*refs):
        kernel(refs)

    from .bands import stable_kernel_name as _skn
    try:
        wrap.__name__ = _skn('traceback_device', prm)
    except NameError:
        pass
    return pl.pallas_call(
        wrap,
        grid=(prm.n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # start (i0, j0)
            pl.BlockSpec((prm.blk, prm.p_rows, 128),
                         lambda k: (prm.n_blocks - 1 - k, 0, 0),
                         memory_space=pltpu.VMEM),   # p, reversed blocks
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4,), jnp.int32),        # i, j, count
            jax.ShapeDtypeStruct((oprows, 128), jnp.int32),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.SMEM((6,), jnp.int32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


def finish_cigar(ops_flat: np.ndarray, count: int, i_end: int, j_end: int,
                 min_intron: int, is_rev: bool) -> List[int]:
    """RLE the walk ops + tail flush + reverse (ksw2.h:150-159)."""
    cigar: List[int] = []
    ops = ops_flat[:count]
    if count:
        # run-length encode in walk order (push merges adjacent)
        bounds = np.nonzero(np.diff(ops))[0] + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [count]))
        for s, t in zip(starts, ends):
            push(cigar, int(ops[s]), int(t - s))
    if i_end >= 0:
        push(cigar,
             CigarOp.N_SKIP if (min_intron > 0 and i_end >= min_intron)
             else CigarOp.DEL, i_end + 1)
    if j_end >= 0:
        push(cigar, CigarOp.INS, j_end + 1)
    if not is_rev:
        cigar.reverse()
    return cigar


__all__ = ["TbParams", "build_traceback_call", "finish_cigar"]
