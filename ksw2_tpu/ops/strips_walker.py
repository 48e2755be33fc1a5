"""Run-based on-device walker over the strips engine's skewed byte store.

The strips forward (``ops/wavefront_strips.py`` with ``prm.cig=1``)
emits the reference's row-major direction bytes into a SKEWED store:
cell (pair p, target row i, query col j) lives at

    d8[i + j//128, p*S + j//128, j % 128]

i.e. step index ``t = i + j//128`` and plane row ``g = p*S + j//128``.
A per-op walk (one fetch+reduce per CIGAR op, as
``ops/traceback_device.py`` does over the anti-diagonal layout) would
DEGENERATE here: along an in-strip insertion run (up to 127 ops) both
``t`` and ``g`` are constant, so the op-indexed grid stream stalls on
one lane row.  Instead each visit reads ONE ``(t, g)`` lane row and
consumes the whole in-row insertion run vectorized (the stop lane is a
single cross-lane reduce over the per-lane continuation predicate), so
``t`` strictly decreases every visit and total row-visits <= total ops
— the same streaming invariant as the diagonal walker.

Per-visit semantics replay ``ksw_backtrack`` (ksw2.h:129-161, one-piece
codes 0=H 1=E 2=F with 0x08/0x10 continuation bits; the strips store is
effectively unbanded so there are no band-edge force states).  The key
observation making the run vectorizable: with incoming state F the walk
emits an insertion at lane ``x`` iff ``byte[x]`` has 0x10 set OR its
argmax code is 2 (continuation-bit clear resets to state 0, which
re-derives ``d&7`` — code 2 re-enters F) — a pure per-lane predicate.
The first lane <= l where it fails is where the walk leaves the row
with an M or D step (code in {0,1}), which decreases ``i`` hence ``t``.

The walker emits BAM-encoded runs (``len<<4 | op``) instead of single
ops; the host merges adjacent runs and applies the tail flush + reverse
(``finish_runs``), mirroring ``traceback_device.finish_cigar``.
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


class SWParams(NamedTuple):
    n_t: int         # step-axis length of the pair's byte store
    sp: int          # padded strip rows (32-multiple)
    blk: int         # steps per grid block
    n_blocks: int
    r_rows: int      # runs-buffer rows (x128 lanes)


def _walk_kernel(prm: SWParams, refs):
    (start_ref, d8_ref, res_ref, runs, st8) = refs
    step = pl.program_id(0)
    blk_hi = (prm.n_blocks - 1 - step) * prm.blk + prm.blk
    blk_lo = blk_hi - prm.blk
    lane = jax.lax.broadcasted_iota(I32, (1, 128), 1)
    sub = jax.lax.broadcasted_iota(I32, (prm.sp, 128), 0)

    I, J, STATE, K, DONE, OP, LEN = range(7)

    @pl.when(step == 0)
    def _init():
        st8[I] = start_ref[0]
        st8[J] = start_ref[1]
        st8[STATE] = 0
        st8[K] = 0
        st8[DONE] = 0
        st8[OP] = 0
        st8[LEN] = 0

    def flush():
        # write the accumulated (op, len) run; no-op when empty
        @pl.when(st8[LEN] > 0)
        def _():
            k = st8[K]
            row = runs[pl.ds(k >> 7, 1), :]
            runs[pl.ds(k >> 7, 1), :] = jnp.where(
                lane == (k & 127), (st8[LEN] << 4) | st8[OP], row)
            st8[K] = k + 1
            st8[LEN] = 0

    def visit(_, __):
        i, j, state = st8[I], st8[J], st8[STATE]
        strip = j >> 7
        l = j & 127
        t = i + strip
        live = ((st8[DONE] == 0) & (i >= 0) & (j >= 0)
                & (t >= blk_lo) & (t < blk_hi))

        @pl.when(live)
        def _():
            slab = d8_ref[pl.ds(t - blk_lo, 1), :, :][0]        # (SP,128)
            drow = jnp.max(jnp.where(sub == strip,
                                     slab.astype(I32) & 255, 0),
                           axis=0, keepdims=True)               # (1,128)
            d_l = jnp.max(jnp.where(lane == l, drow, 0))
            # ksw_backtrack state machine (no force states: unbanded)
            s1 = jnp.where(state == 0, d_l & 7,
                           jnp.where((d_l >> (state + 2)) & 1, state, 0))
            s1 = jnp.where(s1 == 0, d_l & 7, s1)
            run_mode = s1 == 2
            # in-row insertion run: emit-I predicate per lane (see module
            # docstring); first failing lane <= l ends the run
            pred = (((drow >> 4) & 1) == 1) | ((drow & 7) == 2)
            fail = jnp.logical_not(pred) & (lane <= l)
            xmax = jnp.max(jnp.where(fail, lane, -1))
            n = l - xmax                           # >= 1 when run_mode
            d_x = jnp.max(jnp.where(lane == xmax, drow, 0))
            stop_in_row = run_mode & (xmax >= 0)
            # slot B: the single M/D op — either the run's stop cell
            # (incoming F, bit clear, code in {0,1}) or the non-run op
            b_s = jnp.where(run_mode, d_x & 7, s1)
            emit_b = stop_in_row | jnp.logical_not(run_mode)
            op_b = jnp.where(b_s == 0, 0, 2)       # 0=M, 2=D (one-piece)
            nA = jnp.where(run_mode, n, 0)
            jB = j - nA                            # run's stop column
            st8[I] = jnp.where(emit_b, i - 1, i)
            st8[J] = jnp.where(emit_b,
                               jnp.where(b_s == 0, jB - 1, jB), jB)
            st8[STATE] = jnp.where(emit_b, b_s, 2)
            # run-merged emission: most visits extend the open (op, len)
            # pair in SMEM; the VMEM runs buffer is touched only at run
            # boundaries (this is what makes M-heavy walks ~free of
            # dynamic VMEM read-modify-writes)
            @pl.when(run_mode & (st8[OP] != 1))
            def _fa():
                flush()

            @pl.when(run_mode)
            def _a():
                st8[OP] = 1
                st8[LEN] = st8[LEN] + nA

            @pl.when(emit_b & ((st8[OP] != op_b) | (st8[LEN] == 0)))
            def _fb():
                flush()

            @pl.when(emit_b)
            def _b():
                st8[OP] = op_b
                st8[LEN] = st8[LEN] + 1

        @pl.when(((st8[I] < 0) | (st8[J] < 0)) & (st8[DONE] == 0))
        def _fin():
            flush()
            st8[DONE] = 1

    # t strictly decreases per visit, so blk visits cross the block
    jax.lax.fori_loop(0, prm.blk, visit, None)

    res_ref[0] = st8[I]
    res_ref[1] = st8[J]
    res_ref[2] = st8[K]


def build_strips_walk(prm: SWParams, interpret: bool = False):
    kernel = functools.partial(_walk_kernel, prm)

    def wrap(*refs):
        kernel(refs)

    from .bands import stable_kernel_name
    wrap.__name__ = stable_kernel_name("strips_walk", prm)
    return pl.pallas_call(
        wrap,
        grid=(prm.n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # start (i0, j0)
            pl.BlockSpec((prm.blk, prm.sp, 128),
                         lambda k: (prm.n_blocks - 1 - k, 0, 0),
                         memory_space=pltpu.VMEM),      # reversed blocks
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3,), jnp.int32),      # i, j, k
            jax.ShapeDtypeStruct((prm.r_rows, 128), jnp.int32),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.SMEM((7,), jnp.int32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


@functools.lru_cache(maxsize=64)
def _cached_walk(n_t: int, S: int, blk: int, interpret: bool):
    """Jitted (slice pair p -> pad strips -> walk) over the batch store."""
    sp = -(-S // 32) * 32
    prm = SWParams(n_t=n_t, sp=sp, blk=blk, n_blocks=n_t // blk,
                   r_rows=-(-2 * n_t // 128) + 1)
    call = build_strips_walk(prm, interpret)

    @jax.jit
    def run(d8, p, start):
        d8p = jax.lax.dynamic_slice(
            d8, (0, p * S, 0), (n_t, S, 128))
        d8p = jnp.pad(d8p, ((0, 0), (0, sp - S), (0, 0)))
        return call(start, d8p)

    return run


def strips_walk(d8, S: int, p, i0: int, j0: int,
                interpret: bool = False):
    """Walk pair ``p``'s byte planes from cell (i0, j0); returns the
    fetched ``(i_end, j_end, k, runs_flat)`` for :func:`finish_runs`."""
    n_t = int(d8.shape[0])
    blk = 128 if n_t % 128 == 0 else 32
    if n_t % blk:
        raise ValueError(f"step axis {n_t} not a multiple of {blk}")
    run = _cached_walk(n_t, int(S), blk, interpret)
    res, runs = run(d8, jnp.int32(p),
                    jnp.asarray([i0, j0], np.int32))
    res = np.asarray(res)
    return int(res[0]), int(res[1]), int(res[2]), \
        np.asarray(runs).ravel()


def finish_runs(runs_flat: np.ndarray, count: int, i_end: int, j_end: int,
                min_intron: int, is_rev: bool) -> List[int]:
    """Merge the walk-order runs + tail flush + reverse (ksw2.h:150-159;
    mirrors ``traceback_device.finish_cigar`` for run-based emission)."""
    cigar: List[int] = []
    for v in runs_flat[:count]:
        v = int(v)
        push(cigar, v & 0xF, v >> 4)
    if i_end >= 0:
        push(cigar,
             CigarOp.N_SKIP if (min_intron > 0 and i_end >= min_intron)
             else CigarOp.DEL, i_end + 1)
    if j_end >= 0:
        push(cigar, CigarOp.INS, j_end + 1)
    if not is_rev:
        cigar.reverse()
    return cigar


def strips_cigar_align(query, target, qlen, tlen, m, mat, q, e,
                       zdrop: int = -1, end_bonus: int = 0,
                       flag=None, interpret: bool = False):
    """End-to-end strips CIGAR for a batch: skewed-store forward with
    byte emission, record replay for the ez fields, then the run-based
    device walker per pair from the reference's start cell
    (ksw2_extz2_sse.c:292-301; walk ksw2.h:129-161 with is_rot=0).

    Returns a list of :class:`ExtzResult` with CIGARs.  Callers must
    have checked ``strips_eligible``.
    """
    from ..core.flags import Flag
    from ..core.result import ExtzResult
    from .batch_pallas import unpack_records
    from .wavefront_strips import strips_cigar_forward

    flag = Flag(int(Flag.NONE if flag is None else flag))
    is_rev = bool(flag & Flag.REV_CIGAR)
    mat = np.asarray(mat, dtype=np.int8).reshape(-1)
    rec, d8, (S, Bp) = strips_cigar_forward(
        query, target, qlen, tlen, m, mat, q, e, zdrop=zdrop, flag=flag,
        interpret=interpret)
    fields = unpack_records(np.asarray(rec), int(mat[1:].min()),
                            int(q), int(e))
    B = len(fields["max"])
    out = []
    for p in range(B):
        ez = ExtzResult(
            max=int(fields["max"][p]), max_t=int(fields["max_t"][p]),
            max_q=int(fields["max_q"][p]), mqe=int(fields["mqe"][p]),
            mqe_t=int(fields["mqe_t"][p]), mte=int(fields["mte"][p]),
            mte_q=int(fields["mte_q"][p]), score=int(fields["score"][p]),
            zdropped=bool(fields["zdropped"][p]))
        ql, tl = int(qlen[p]), int(tlen[p])
        if not ez.zdropped and not (flag & Flag.EXTZ_ONLY):
            i0, j0 = tl - 1, ql - 1
        elif not ez.zdropped and (flag & Flag.EXTZ_ONLY) \
                and ez.mqe + end_bonus > ez.max:
            i0, j0 = ez.mqe_t, ql - 1
            ez.reach_end = True
        elif ez.max_t >= 0 and ez.max_q >= 0:
            i0, j0 = ez.max_t, ez.max_q
        else:
            out.append(ez)
            continue
        ie, je, k, runs = strips_walk(d8, S, p, i0, j0,
                                      interpret=interpret)
        ez.cigar = finish_runs(runs, k, ie, je, 0, is_rev)
        out.append(ez)
    return out


RUNS_CAP_ROWS = 17      # fetched runs rows per pair (2176 runs; the walk
                        # buffer itself is uncapped — overflow re-walks)


# Fused-route cost-model constants, overridable for other hardware via
# KSW2T_FUSED_COST="exec_s,fwd_s_per_row,walk_s_per_row,slice_s" (see
# _fused_route_pays; calibrate by timing one fused vs per-pair CIGAR
# bucket on the target rig — bench/exp has the measurement scripts).
import os as _os

_FUSED_COST = tuple(
    float(v) for v in _os.environ.get(
        "KSW2T_FUSED_COST", "0.031,15e-6,1e-6,0.002").split(","))


def _fused_route_pays(B: int, tmax: int) -> bool:
    """Cost model: fused strips-CIGAR (1 execution) vs per-pair fused
    single-pair pipelines (B executions).  Default constants measured on
    the real chip 2026-08-21 with the run-merged walker: per-execution
    round trip ~31 ms, cig-forward ~15 us per target row, in-program
    walker+slice ~(1 us x tmax + 2 ms) per pair (the whale bucket,
    17x3000 bp, measured 137 ms fused vs 645 ms per-pair; 32x250 bp
    EXTZ_ONLY measured 107 ms vs 1046 ms).  Only tiny buckets of very
    long pairs still favor the per-pair path.  Other rigs can override
    via KSW2T_FUSED_COST (results stay correct either way; the gate is
    perf-only routing)."""
    exec_s, fwd_row, walk_row, slice_s = _FUSED_COST
    strips = 0.004 + exec_s + fwd_row * tmax + B * (walk_row * tmax
                                                    + slice_s)
    per_pair = B * exec_s
    return strips < per_pair


def strips_cigar_eligible(qlen, tlen, w, flag, m, mat, zdrop,
                          q, e) -> bool:
    """Eligibility for the fused strips-CIGAR path: the strips score
    conditions (exact mode, effectively unbanded, packed-key range) on
    a one-piece CIGAR workload, AND the cost model favoring one fused
    execution over per-pair pipelines.  EQX stays on the single-pair
    engines (no post-pass here)."""
    from ..core.flags import Flag
    from .wavefront_strips import strips_eligible

    f = int(flag)
    if f & (int(Flag.SCORE_ONLY) | int(Flag.EQX)):
        return False
    # degenerate-scoring guard (ksw2_extz2_sse.c: -min_sc > 2*(q+e)
    # resets ez and attaches NO cigar); the per-pair engines apply it,
    # so the fused route must decline rather than walk from the corner
    if -int(np.asarray(mat).reshape(-1)[1:].min()) > 2 * (int(q) + int(e)):
        return False
    tlen = np.asarray(tlen)
    if not _fused_route_pays(int(tlen.size), int(tlen.max(initial=0))):
        return False
    return strips_eligible(qlen, tlen, w, f | int(Flag.SCORE_ONLY),
                           m, mat, zdrop, q, e)


@functools.lru_cache(maxsize=32)
def _cached_cigar_batch(prm, B: int, end_bonus: int, interpret: bool):
    """ONE jitted program: strips forward (byte emission) -> device
    start cells (ksw2_extz2_sse.c:292-301 rules on the replayed
    records) -> B run-based walkers -> capped runs fetch.  A whole
    CIGAR bucket in a single execution — on a latency-taxed link the
    per-execution round trip (~29 ms here) dominates any per-pair
    dispatch, so fusing is what lets the strips engine reach the
    production CIGAR rows."""
    from ..core.flags import Flag
    from .wavefront_strips import _strips_run_fn

    fwd = _strips_run_fn(prm, interpret)
    S = prm.s
    n_t = prm.t_pad + 128          # d8 step axis: (t_pad//CH + 4) * CH
    sp = -(-S // 32) * 32
    wprm = SWParams(n_t=n_t, sp=sp, blk=128, n_blocks=n_t // 128,
                    r_rows=-(-2 * n_t // 128) + 1)
    walk = build_strips_walk(wprm, interpret)
    cap = min(wprm.r_rows, RUNS_CAP_ROWS)
    extz_only = bool(prm.flag & int(Flag.EXTZ_ONLY))

    def fused(qpk, tpk, ql, tl):
        rec, d8 = fwd(qpk, tpk, ql, tl)
        mx, mt, mq = rec[:, 0], rec[:, 1], rec[:, 2]
        mqe, mqe_t, zd = rec[:, 3], rec[:, 4], rec[:, 8]
        cand_i = jnp.where((mt >= 0) & (mq >= 0), mt, -1)
        cand_j = jnp.where((mt >= 0) & (mq >= 0), mq, -1)
        if extz_only:
            reach = (zd == 0) & (mqe + end_bonus > mx)
            i0 = jnp.where(reach, mqe_t, cand_i)
            j0 = jnp.where(reach, ql - 1, cand_j)
        else:
            i0 = jnp.where(zd == 0, tl - 1, cand_i)
            j0 = jnp.where(zd == 0, ql - 1, cand_j)
        res_all, runs_all = [], []
        for p in range(B):
            d8p = jnp.pad(d8[:, p * S:(p + 1) * S, :],
                          ((0, 0), (0, sp - S), (0, 0)))
            start = jnp.stack([i0[p], j0[p]]).astype(jnp.int32)
            res, runs = walk(start, d8p)
            res_all.append(res)
            runs_all.append(runs[:cap])
        return rec, jnp.stack(res_all), jnp.stack(runs_all)

    return jax.jit(fused), cap * 128


def strips_cigar_batch(query, target, qlen, tlen, m, mat, q, e,
                       zdrop: int = -1, end_bonus: int = 0,
                       flag=None, interpret: bool = False):
    """Batched strips CIGARs in ONE execution (forward + start cells +
    walkers fused; see :func:`_cached_cigar_batch`).  Same results as
    :func:`strips_cigar_align`; single-launch batches only."""
    from ..core.flags import Flag
    from ..core.result import ExtzResult
    from .batch_pallas import unpack_records
    from .packio import pack_bases
    from .wavefront_strips import (StripParams, _plan_rows, _strips_plan,
                                   round_up)

    flag = Flag(int(Flag.NONE if flag is None else flag))
    is_rev = bool(flag & Flag.REV_CIGAR)
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    B, Lq = query.shape
    qlen = np.asarray(qlen, np.int32)
    tlen = np.asarray(tlen, np.int32)
    mat = np.asarray(mat, dtype=np.int8).reshape(-1)
    S0, tlenp, BMAX = _strips_plan(B, Lq, qlen, tlen)
    if B > BMAX:          # chunk oversized batches into fused launches
        out = []
        for i0 in range(0, B, BMAX):
            out.extend(strips_cigar_batch(
                query[i0:i0 + BMAX], target[i0:i0 + BMAX],
                qlen[i0:i0 + BMAX], tlen[i0:i0 + BMAX], m, mat, q, e,
                zdrop=zdrop, end_bonus=end_bonus, flag=flag,
                interpret=interpret))
        return out
    sc_N = -e if int(mat[m * m - 1]) == 0 else int(mat[m * m - 1])
    S, Bp = _plan_rows(B, S0, tlenp)
    t_real = tlenp + S - 1
    t_pad = round_up(t_real + 1, 128)
    generic = bool(flag & Flag.GENERIC_SC)
    prm = StripParams(
        n_rows=Bp * S, s=S, tv=tlenp, t_pad=t_pad, t_real=t_real, m=m,
        q=int(q), e=int(e), mat0=int(mat[0]), sc_mis=int(mat[1]),
        sc_N=sc_N, zdrop=int(zdrop), flag=int(flag),
        matt=tuple(int(v) for v in mat) if generic else (), cig=1)
    run, k_cap = _cached_cigar_batch(prm, B, int(end_bonus), interpret)
    qpad = np.zeros((Bp, S * 128), np.int8)
    qpad[:B, :min(Lq, S * 128)] = np.asarray(query, np.int8)[:, :S * 128]
    tpad = np.zeros((Bp, tlenp), np.int8)
    tpad[:B, :min(target.shape[1], tlenp)] = \
        np.asarray(target, np.int8)[:, :tlenp]
    lens = np.zeros((2, Bp), np.int32)
    lens[0, :B], lens[1, :B] = qlen, tlen
    rec, res_all, runs_all = run(jnp.asarray(pack_bases(qpad)),
                                 jnp.asarray(pack_bases(tpad)),
                                 jnp.asarray(lens[0]),
                                 jnp.asarray(lens[1]))
    rec = np.asarray(rec)[:B]
    res_all = np.asarray(res_all)
    runs_all = np.asarray(runs_all).reshape(B, -1)
    fields = unpack_records(rec, int(mat[1:].min()), int(q), int(e))
    out = []
    for p in range(B):
        ez = ExtzResult(
            max=int(fields["max"][p]), max_t=int(fields["max_t"][p]),
            max_q=int(fields["max_q"][p]), mqe=int(fields["mqe"][p]),
            mqe_t=int(fields["mqe_t"][p]), mte=int(fields["mte"][p]),
            mte_q=int(fields["mte_q"][p]), score=int(fields["score"][p]),
            zdropped=bool(fields["zdropped"][p]))
        if (flag & Flag.EXTZ_ONLY) and not ez.zdropped \
                and ez.mqe + end_bonus > ez.max:
            ez.reach_end = True
        had_start = (not ez.zdropped and not (flag & Flag.EXTZ_ONLY)) \
            or ez.reach_end or (ez.max_t >= 0 and ez.max_q >= 0)
        if had_start:
            ie, je, k = (int(res_all[p, 0]), int(res_all[p, 1]),
                         int(res_all[p, 2]))
            if k > k_cap:      # capped fetch overflowed: re-walk alone
                sub = strips_cigar_align(
                    query[p:p + 1], target[p:p + 1], qlen[p:p + 1],
                    tlen[p:p + 1], m, mat, q, e, zdrop=zdrop,
                    end_bonus=end_bonus, flag=flag, interpret=interpret)
                ez.cigar = sub[0].cigar
            else:
                ez.cigar = finish_runs(runs_all[p], k, ie, je, 0, is_rev)
        out.append(ez)
    return out


__all__ = ["SWParams", "build_strips_walk", "strips_walk", "finish_runs",
           "strips_cigar_align", "strips_cigar_batch",
           "strips_cigar_eligible"]
