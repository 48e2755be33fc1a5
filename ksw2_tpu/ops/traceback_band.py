"""Batched on-device traceback for the band-relative engines.

The band engines stream ``(n_diag, R, 128)`` direction planes to HBM —
for 64 x 50 kb pairs that is ~6.5 GB, far too much to fetch for a host
backtrack.  This kernel walks ALL pairs' tracebacks on the TPU in one
reverse sweep over the diagonals: at diagonal ``r`` every pair whose walk
currently sits on ``r`` takes exactly one step (each step decreases r by
1 or 2, so a single descending sweep completes every walk).

Layout: the caller transposes the forward kernel's pair-major planes
(row = pair*P + chunk) to CHUNK-MAJOR (row = chunk*Bp + pair) with one
XLA transpose (HBM-bandwidth cost, ~ms).  The walk state (i, j, state)
then lives on minimal ``(Bp, 128)`` planes — one sublane row per pair —
so every per-step vector op touches P times fewer vregs than a
pair-major walker would; the direction byte is picked from the P
``(Bp, 128)`` chunk slices of the diagonal with static selects plus one
lane butterfly.  Per-step cost is near the sequential latency floor.

Output is one op byte per (pair, visited diagonal) — ``(Bp, n_diag)``
int8 as ``(n_diag/128, Bp, 128)`` blocks, 0xFF where not visited — plus
the per-pair walk remainders; the caller run-length encodes on device
(band_batch) and finishes exactly like ``ksw_backtrack``'s tail flush.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .wavefront_band import _org_of

I32 = jnp.int32
BLK = 64          # p-block depth; two walker steps share one ops block


class BandTbParams(NamedTuple):
    n_pairs: int     # Bp, multiple of 8 (one sublane row per pair)
    n_diag: int      # padded to 128
    w: int           # shared band cap (org schedule)
    p: int = 1       # 128-lane band chunks per pair
    min_intron: int = 0   # >0: state 3 emits N ops (splice, ksw2.h:150-153)


def _bor(arr):
    """Lane butterfly OR: replicate the single nonzero lane everywhere."""
    for k in (1, 2, 4, 8, 16, 32, 64):
        arr = arr | pltpu.roll(arr, k, axis=1)
    return arr


def _band_tb_kernel(prm: BandTbParams, refs):
    (qlp_ref, tlp_ref, wp_ref, i0_ref, j0_ref, p_ref,
     res_ref, ops_ref, ip, jp, st, done, acc) = refs

    Bp = prm.n_pairs
    shape = (Bp, 128)
    P = prm.p
    W = prm.w
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)
    blk_hi = (n_steps - step) * BLK       # this block covers [blk_hi-BLK, blk_hi)
    blk_lo = blk_hi - BLK
    first_half = (blk_lo % 128) == 64     # first (upper) visit of an ops block

    lanes = jax.lax.broadcasted_iota(I32, shape, 1)

    @pl.when(step == 0)
    def _init():
        ip[...] = i0_ref[...]
        jp[...] = j0_ref[...]
        st[...] = jnp.zeros(shape, I32)
        done[...] = ((i0_ref[...] < 0) | (j0_ref[...] < 0)).astype(I32)

    qlp = qlp_ref[...]
    tlp = tlp_ref[...]
    wp = wp_ref[...]
    tlm1 = tlp - 1
    qlm1 = qlp - 1

    @pl.when(first_half)
    def _acc_reset():
        acc[...] = jnp.full(shape, 255, I32)

    def walk(k, _):
        rr = BLK - 1 - k                      # descending within the block
        r = blk_lo + rr
        o_now = _org_of(r, W)
        i = ip[...]
        j = jp[...]
        state = st[...]
        active = (done[...] == 0) & (i + j == r)

        st0 = jnp.maximum(0, jnp.maximum(r - qlm1, (r - wp + 1) >> 1))
        en0 = jnp.minimum(tlm1, jnp.minimum(r, (r + wp) >> 1))
        stb = st0 & -16
        enb = en0 | 15
        force = jnp.where(i < stb, 2, jnp.where(i > enb, 1, -1))

        # direction byte at band lane i - org(r): the diagonal's plane is
        # chunk-major, so chunk c of all pairs is the static row slice
        # [c*Bp, (c+1)*Bp) — P selects on (Bp,128) + one butterfly
        pslice = p_ref[pl.ds(rr, 1)][0]
        ib = jnp.clip(i - o_now, 0, P * 128 - 1)
        hi = ib >> 7
        lo = ib & 127
        hit = lanes == lo
        byte = jnp.zeros(shape, I32)
        for c in range(P):
            chunk = jax.lax.slice_in_dim(pslice, c * Bp, (c + 1) * Bp,
                                         axis=0).astype(I32) & 255
            sel = (hi == c) & hit if P > 1 else hit
            byte = jnp.where(sel, chunk, byte)
        byte = _bor(byte)
        tmp = jnp.where(force >= 0, 0, byte)
        # ksw_backtrack state machine (ksw2.h:139-148)
        s1 = jnp.where(state == 0, tmp & 7,
                       jnp.where((tmp >> (state + 2)) & 1, state, 0))
        s1 = jnp.where(s1 == 0, tmp & 7, s1)
        s1 = jnp.where(force >= 0, force, s1)
        is_m = s1 == 0
        is_d = (s1 == 1) | (s1 == 3)          # state 3 moves like a deletion
        op = jnp.where(is_m, 0, jnp.where(is_d, 2, 1))
        if prm.min_intron > 0:                # splice: Ẽ emits N, not D
            op = jnp.where(s1 == 3, 3, op)

        acc[...] = jnp.where(active & (lanes == r % 128), op, acc[...])
        st[...] = jnp.where(active, s1, state)
        ni = jnp.where(is_m | is_d, i - 1, i)
        nj = jnp.where(is_m, j - 1, jnp.where(is_d, j, j - 1))
        ip[...] = jnp.where(active, ni, i)
        jp[...] = jnp.where(active, nj, j)
        done[...] = jnp.maximum(
            done[...], ((ip[...] < 0) | (jp[...] < 0)).astype(I32))

    jax.lax.fori_loop(0, BLK, walk, None)
    ops_ref[...] = acc[...].astype(jnp.int8)[None]

    @pl.when(step == n_steps - 1)
    def _emit():
        out = jnp.where(lanes == 0, ip[...], 0)
        out = jnp.where(lanes == 1, jp[...], out)
        res_ref[...] = out


def build_band_tb_call(prm: BandTbParams, interpret: bool = False):
    Bp = prm.n_pairs
    assert Bp % 8 == 0, "one pair per sublane row: pad pairs to 8"
    shape = (Bp, 128)
    assert prm.n_diag % 128 == 0
    n_steps = prm.n_diag // BLK
    kernel = functools.partial(_band_tb_kernel, prm)

    def wrap(*refs):
        kernel(refs)

    from .bands import stable_kernel_name as _skn
    try:
        wrap.__name__ = _skn('traceback_band', prm)
    except NameError:
        pass
    return pl.pallas_call(
        wrap,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # qlp
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # tlp
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # wp
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # i0
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # j0
            pl.BlockSpec((BLK, prm.p * Bp, 128),
                         lambda k: (n_steps - 1 - k, 0, 0),
                         memory_space=pltpu.VMEM),                 # p reversed
        ],
        out_shape=[
            jax.ShapeDtypeStruct(shape, jnp.int32),
            jax.ShapeDtypeStruct((n_steps * BLK // 128, Bp, 128), jnp.int8),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, 128),
                         lambda k: ((n_steps - 1 - k) // 2, 0, 0),
                         memory_space=pltpu.VMEM),                 # ops blocks
        ],
        scratch_shapes=[pltpu.VMEM(shape, jnp.int32) for _ in range(5)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


def finish_band_cigars(ops8: np.ndarray, iend: np.ndarray, jend: np.ndarray,
                       is_rev: bool, started: np.ndarray):
    """RLE each pair's visited op subsequence + ksw_backtrack tail flush.

    ``ops8``: (n_blocks, Bp, 128) int8 with the op at (r//128, pair,
    r%128) for visited diagonals, 255 elsewhere.
    """
    from .traceback_device import finish_cigar

    n_diag = ops8.shape[0] * 128
    cigars = []
    for b in range(len(started)):
        if not started[b]:
            cigars.append([])
            continue
        colu = ops8[:, b, :].reshape(n_diag).astype(np.uint8)
        vis = np.nonzero(colu != 255)[0]
        ops = colu[vis][::-1].astype(np.int64)     # walk order: descending r
        cigars.append(finish_cigar(ops, len(ops), int(iend[b]),
                                   int(jend[b]), 0, is_rev))
    return cigars


def finish_band_cigars_runs(runs: np.ndarray, cnt: np.ndarray,
                            iend: np.ndarray, jend: np.ndarray,
                            is_rev: bool, started: np.ndarray,
                            min_intron: int = 0):
    """Build CIGARs from device-packed runs (``len<<2 | op``) in walk order.

    Adjacent runs never share an op (the device boundary mask fires only on
    op changes), so the BAM rewrite ``len<<4 | op`` vectorizes; only the
    trailing gap flush (``ksw_backtrack``'s i/j>=0 tail, ksw2.h:155-156)
    can merge, handled by ``push``.
    """
    from ..core.cigar import push
    from ..core.flags import CigarOp

    cigars = []
    for b in range(len(started)):
        if not started[b]:
            cigars.append([])
            continue
        rr = runs[b, :int(cnt[b])].astype(np.int64)
        cigar = (((rr >> 2) << 4) | (rr & 3)).tolist()
        if int(iend[b]) >= 0:
            push(cigar,
                 CigarOp.N_SKIP if (min_intron > 0
                                    and int(iend[b]) >= min_intron)
                 else CigarOp.DEL,
                 int(iend[b]) + 1)
        if int(jend[b]) >= 0:
            push(cigar, CigarOp.INS, int(jend[b]) + 1)
        if not is_rev:
            cigar.reverse()
        cigars.append(cigar)
    return cigars


__all__ = ["BandTbParams", "build_band_tb_call", "finish_band_cigars",
           "finish_band_cigars_runs"]
