"""Run-consuming on-device walker over the strips engine's byte store.

The strips forward (``ops/wavefront_strips.py`` with ``prm.cig=1``)
emits the reference's row-major direction bytes into a SKEWED store:
cell (pair p, target row i, query col j) lives at

    d8[i + j//128, p*S + j//128, j % 128]

i.e. step index ``t = i + j//128`` and plane row ``g = p*S + j//128``.
The walker receives it TRANSPOSED per pair (strip-major: (S, n_t, 128))
and caches the current strip's (blk, 128) plane in VMEM scratch,
rebuilt by one leading-axis dynamic slice whenever the walk changes
block or strip.

Every visit consumes a whole CIGAR RUN, not one op — visits ~= number
of runs, which is what makes the walk ~0.25 ms/pair at 3 kb:

* **M-runs** (state 0): after an M the state resets to 0, so the run
  continues while ``code == 0`` along the diagonal (i-k, j-k) — the
  line ``row - lane == const`` of the cached plane; one masked reduce
  pulls the run's bytes and a cross-lane argmax finds the stop.
* **I-runs** (states 2/4): one lane row holds the whole in-strip run.
  One-piece: a per-lane predicate (bit 0x10 | code==2).  Five-state
  (extd/exts): the state can alternate 2<->4 inside a run, so the stop
  lane comes from composing per-lane automaton maps {2,4}->{2,4,stop}
  with a 7-step suffix scan (associative, stop-absorbing).
* **D/N-runs** (states 1/3): vertical same-state runs down the block
  column (continuation bit | same code), consumed by one masked reduce
  over the plane — the exts intron carry yields runs of hundreds of N
  steps.

Per-visit semantics replay ``ksw_backtrack`` (ksw2.h:129-161; one-piece
codes 0=H 1=E 2=F with 0x08/0x10 continuation bits, two-piece adds
E2/F2 with 0x20/0x40, exts state 3 = intron with 0x20 and op N when
``min_intron_len > 0``; the strips store is effectively unbanded so
there are no band-edge force states).  A batched call walks a whole
launch: grid (pairs, blocks), per-block while-loop over actual visits.

The walker emits BAM-encoded runs (``len<<4 | op``); the host merges
adjacent runs and applies the tail flush + reverse (``finish_runs`` /
``finish_runs_batch``), mirroring ``traceback_device.finish_cigar``.
The fused batch entry points return records + start cells + capped
runs as ONE flat int32 vector = one device->host fetch.
"""
from __future__ import annotations

import functools
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.flags import CigarOp

I32 = jnp.int32


class SWParams(NamedTuple):
    n_t: int         # step-axis length of the pair's byte store
    sp: int          # padded strip rows (32-multiple)
    blk: int         # steps per grid block
    n_blocks: int
    r_rows: int      # runs-buffer rows (x128 lanes)
    two: int = 0     # 5-state (extd/exts) bytes: codes 0..4, bits 3..6
    nop: int = 0     # state 3 emits op N (exts intron) instead of D
    nb: int = 1      # pairs walked per call (grid = (nb, n_blocks))


def _walk_kernel(prm: SWParams, refs):
    (start_ref, d8_ref, res_ref, runs, st8, plane) = refs
    b = pl.program_id(0)               # pair within the batched call
    step = pl.program_id(1)
    blk_hi = (prm.n_blocks - 1 - step) * prm.blk + prm.blk
    blk_lo = blk_hi - prm.blk
    lane = jax.lax.broadcasted_iota(I32, (1, 128), 1)
    rowi = jax.lax.broadcasted_iota(I32, (prm.blk, 128), 0)
    lanei = jax.lax.broadcasted_iota(I32, (prm.blk, 128), 1)

    I, J, STATE, K, DONE, OP, LEN, CBLK, CSTRIP = range(9)

    @pl.when(step == 0)
    def _init():
        st8[I] = start_ref[b, 0]
        st8[J] = start_ref[b, 1]
        st8[STATE] = 0
        st8[K] = 0
        st8[DONE] = 0
        st8[OP] = 0
        st8[LEN] = 0
        st8[CBLK] = -1
        st8[CSTRIP] = -1

    def flush():
        # write the accumulated (op, len) run; no-op when empty
        @pl.when(st8[LEN] > 0)
        def _():
            k = st8[K]
            idx = (pl.ds(0, 1), pl.ds(k >> 7, 1), slice(None))
            row = runs[idx].reshape(1, 128)
            runs[idx] = jnp.where(lane == (k & 127),
                                  (st8[LEN] << 4) | st8[OP],
                                  row).reshape(1, 1, 128)
            st8[K] = k + 1
            st8[LEN] = 0

    def in_block(c):
        i, j = c
        return (i >= 0) & (j >= 0) & (i + (j >> 7) >= blk_lo)

    def visit(c):
        i, j = c
        state = st8[STATE]
        strip = j >> 7
        l = j & 127
        t = i + strip

        if True:
            # cached strip plane: the (blk, 128) byte rows of the
            # CURRENT strip, rebuilt only when the walk changes block or
            # strip (M/D runs stay put; I runs cross at most once per
            # visit).  The byte store arrives TRANSPOSED (sp, blk, 128)
            # so the rebuild is one leading-axis dynamic slice + copy
            # (no cross-sublane reduce); every visit then reads (1,128)
            # rows, and diagonal M-runs extract straight from the plane.
            @pl.when((st8[CBLK] != step) | (st8[CSTRIP] != strip))
            def _build():
                sl = d8_ref[pl.ds(0, 1), pl.ds(strip, 1), :, :]
                plane[...] = sl.reshape(prm.blk, 128).astype(I32) & 255
                st8[CBLK] = step
                st8[CSTRIP] = strip

            drow = plane[pl.ds(t - blk_lo, 1), :]               # (1,128)
            d_l = jnp.max(jnp.where(lane == l, drow, 0))
            # ksw_backtrack state machine (no force states: unbanded)
            s1 = jnp.where(state == 0, d_l & 7,
                           jnp.where((d_l >> (state + 2)) & 1, state, 0))
            s1 = jnp.where(s1 == 0, d_l & 7, s1)
            mrun = s1 == 0
            irun = ((s1 == 2) | (s1 == 4)) if prm.two else (s1 == 2)

            @pl.when(mrun)
            def _m():
                # diagonal M-run: after an M the state resets to 0, so
                # the run continues while code == 0 along (i-k, j-k).
                # In the skewed store that diagonal is the line
                # row - lane == (t - blk_lo) - l of the cached plane
                # (same strip while lane >= 0): one masked reduce pulls
                # the whole run's bytes, so a K-step match run costs ONE
                # visit instead of K.
                dsel = (rowi - lanei) == ((t - blk_lo) - l)
                diagv = jnp.max(jnp.where(dsel, plane[...], 0),
                                axis=0, keepdims=True)          # (1,128)
                lo = l - jnp.minimum(t - blk_lo, i)   # block/i range
                failm = (((diagv & 7) != 0) | (lane < lo)) & (lane < l)
                xm = jnp.max(jnp.where(failm, lane, -1))
                nM = l - xm                            # >= 1 (lane l is M)
                st8[I] = i - nM
                st8[J] = j - nM
                st8[STATE] = 0

                @pl.when((st8[OP] != 0) & (st8[LEN] > 0))
                def _fm():
                    flush()

                st8[OP] = 0
                st8[LEN] = st8[LEN] + nM

            @pl.when(irun)
            def _i():
                if prm.two:
                    # 5-state in-row insertion run (states 2 AND 4 both
                    # emit I; the state can alternate 2<->4 within one
                    # run).  The per-lane step is a tiny automaton map
                    # {2,4}->{2,4,stop} (stop=0); the run's stop lane
                    # is found by composing maps along the row with a
                    # 7-step suffix scan — composition is associative
                    # with stop absorbing, so row-visits stay <= ops
                    # exactly as one-piece.
                    code = drow & 7
                    keep2 = ((drow >> 4) & 1) == 1
                    keep4 = ((drow >> 6) & 1) == 1
                    u2 = jnp.where(keep2 | (code == 2), 2,
                                   jnp.where(code == 4, 4, 0))
                    u4 = jnp.where(keep4 | (code == 4), 4,
                                   jnp.where(code == 2, 2, 0))
                    # lanes >= l are identity: lane l's byte was
                    # consumed by the state machine above (an I is
                    # emitted AT l; the scan resolves lanes l-1..0)
                    u2 = jnp.where(lane < l, u2, 2)
                    u4 = jnp.where(lane < l, u4, 4)
                    for k in (1, 2, 4, 8, 16, 32, 64):
                        r2 = jnp.where(lane + k < 128,
                                       pltpu.roll(u2, 128 - k, axis=1), 2)
                        r4 = jnp.where(lane + k < 128,
                                       pltpu.roll(u4, 128 - k, axis=1), 4)
                        n2 = jnp.where(r2 == 0, 0,
                                       jnp.where(r2 == 2, u2, u4))
                        n4 = jnp.where(r4 == 0, 0,
                                       jnp.where(r4 == 2, u2, u4))
                        u2, u4 = n2, n4
                    cs = jnp.where(s1 == 2, u2, u4)
                    fail = (cs == 0) & (lane < l)
                    xmax = jnp.max(jnp.where(fail, lane, -1))
                    # no stop in row: the run crosses into the previous
                    # strip carrying the arrival state at lane 0
                    cont_state = jnp.max(jnp.where(lane == 0, cs, 0))
                    cont_state = jnp.where(cont_state == 0, s1,
                                           cont_state)
                else:
                    # in-row insertion run: emit-I predicate per lane
                    # (see module docstring); first failing lane <= l
                    # ends it
                    pred = (((drow >> 4) & 1) == 1) | ((drow & 7) == 2)
                    fail = jnp.logical_not(pred) & (lane <= l)
                    xmax = jnp.max(jnp.where(fail, lane, -1))
                    cont_state = 2
                n = l - xmax                       # >= 1 insertions
                d_x = jnp.max(jnp.where(lane == xmax, drow, 0))
                stop_in_row = xmax >= 0
                # the run's stop cell (bit clear, code in {0,1,3})
                # emits its own M/D/N op in the same visit
                b_s = d_x & 7
                if prm.nop:
                    op_b = jnp.where(b_s == 0, 0,
                                     jnp.where(b_s == 3, 3, 2))
                else:
                    op_b = jnp.where(b_s == 0, 0, 2)   # 0=M, 2=D
                jB = j - n                         # run's stop column
                st8[I] = jnp.where(stop_in_row, i - 1, i)
                st8[J] = jnp.where(stop_in_row,
                                   jnp.where(b_s == 0, jB - 1, jB), jB)
                st8[STATE] = jnp.where(stop_in_row, b_s, cont_state)
                # run-merged emission: most visits extend the open
                # (op, len) pair in SMEM; the VMEM runs buffer is
                # touched only at run boundaries
                @pl.when(st8[OP] != 1)
                def _fa():
                    flush()

                st8[OP] = 1
                st8[LEN] = st8[LEN] + n

                @pl.when(stop_in_row)
                def _b():
                    @pl.when(st8[OP] != op_b)
                    def _fb():
                        flush()

                    st8[OP] = op_b
                    st8[LEN] = st8[LEN] + 1

            @pl.when(jnp.logical_not(mrun | irun))
            def _d():
                # vertical D/N-run down the block column (states 1/3):
                # after a D the state persists, so the run continues
                # while the continuation bit holds or the code
                # re-enters the SAME state — one masked reduce over the
                # cached plane consumes the whole in-block run (the
                # exts intron carry yields runs of hundreds of N
                # steps; a 1<->3 alternation costs one extra visit)
                rr = t - blk_lo
                pv = plane[...]
                predv = (((pv >> (s1 + 2)) & 1) == 1) | \
                    ((pv & 7) == s1)
                faild = ((jnp.logical_not(predv) | (rowi < rr - i))
                         & (rowi < rr) & (lanei == l))
                xm = jnp.max(jnp.where(faild, rowi, -1))
                nD = rr - xm                       # >= 1
                if prm.nop:
                    op_b = jnp.where(s1 == 3, 3, 2)
                else:
                    op_b = 2
                st8[I] = i - nD
                st8[STATE] = s1

                @pl.when((st8[OP] != op_b) | (st8[LEN] == 0))
                def _fd():
                    flush()

                st8[OP] = op_b
                st8[LEN] = st8[LEN] + nD

        return st8[I], st8[J]

    # t strictly decreases per visit; the while loop runs only the
    # ACTUAL visits in this block (run-based consumption makes that
    # ~#cigar-runs, far below blk) and exits the moment the walk
    # leaves the block.  (i, j) thread through the carry so the cond
    # reads loop values, not refs.
    jax.lax.while_loop(in_block, visit, (st8[I], st8[J]))

    @pl.when(((st8[I] < 0) | (st8[J] < 0)) & (st8[DONE] == 0))
    def _fin():
        flush()
        st8[DONE] = 1

    res_ref[b, 0] = st8[I]
    res_ref[b, 1] = st8[J]
    res_ref[b, 2] = st8[K]


def build_strips_walk(prm: SWParams, interpret: bool = False):
    kernel = functools.partial(_walk_kernel, prm)

    def wrap(*refs):
        kernel(refs)

    from .bands import stable_kernel_name
    wrap.__name__ = stable_kernel_name("strips_walk", prm)
    return pl.pallas_call(
        wrap,
        grid=(prm.nb, prm.n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # starts (nb, 2)
            pl.BlockSpec((1, prm.sp, prm.blk, 128),
                         lambda b, k: (b, 0, prm.n_blocks - 1 - k, 0),
                         memory_space=pltpu.VMEM),      # reversed blocks
        ],
        out_shape=[
            jax.ShapeDtypeStruct((prm.nb, 3), jnp.int32),   # i, j, k
            jax.ShapeDtypeStruct((prm.nb, prm.r_rows, 128), jnp.int32),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, prm.r_rows, 128), lambda b, k: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.SMEM((9,), jnp.int32),
                        pltpu.VMEM((prm.blk, 128), jnp.int32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )


@functools.lru_cache(maxsize=64)
def _cached_walk(n_t: int, S: int, blk: int, interpret: bool,
                 two: int = 0, nop: int = 0):
    """Jitted (slice pair p -> transpose strips -> walk) over the batch
    store.  The strip axis is LEADING in the walker's transposed layout
    (untiled), so no sublane padding applies."""
    prm = SWParams(n_t=n_t, sp=S, blk=blk, n_blocks=n_t // blk,
                   r_rows=-(-2 * n_t // 128) + 1, two=two, nop=nop)
    call = build_strips_walk(prm, interpret)

    @jax.jit
    def run(d8, p, start):
        d8p = jax.lax.dynamic_slice(
            d8, (0, p * S, 0), (n_t, S, 128))
        res, runs = call(start.reshape(1, 2),
                         jnp.transpose(d8p, (1, 0, 2))[None])
        return res[0], runs[0]

    return run


def strips_walk(d8, S: int, p, i0: int, j0: int,
                interpret: bool = False, two: int = 0, nop: int = 0):
    """Walk pair ``p``'s byte planes from cell (i0, j0); returns the
    fetched ``(i_end, j_end, k, runs_flat)`` for :func:`finish_runs`."""
    n_t = int(d8.shape[0])
    blk = 128 if n_t % 128 == 0 else 32
    if n_t % blk:
        raise ValueError(f"step axis {n_t} not a multiple of {blk}")
    run = _cached_walk(n_t, int(S), blk, interpret, int(two), int(nop))
    res, runs = run(d8, jnp.int32(p),
                    jnp.asarray([i0, j0], np.int32))
    res = np.asarray(res)
    return int(res[0]), int(res[1]), int(res[2]), \
        np.asarray(runs).ravel()


def finish_runs(runs_flat: np.ndarray, count: int, i_end: int, j_end: int,
                min_intron: int, is_rev: bool) -> List[int]:
    """Merge the walk-order runs + tail flush + reverse (ksw2.h:150-159;
    mirrors ``traceback_device.finish_cigar`` for run-based emission).
    Vectorized: adjacent same-op runs merge via reduceat (the python
    push loop cost ~35 ms on a 17-pair whale bucket — measured r5)."""
    v = np.asarray(runs_flat[:count], np.int64)
    ops = v & 0xF
    lens = v >> 4
    tail = []
    if i_end >= 0:
        tail.append((CigarOp.N_SKIP
                     if (min_intron > 0 and i_end >= min_intron)
                     else CigarOp.DEL, i_end + 1))
    if j_end >= 0:
        tail.append((CigarOp.INS, j_end + 1))
    if tail:
        ops = np.concatenate([ops, np.array([t[0] for t in tail])])
        lens = np.concatenate([lens, np.array([t[1] for t in tail])])
    if ops.size == 0:
        return []
    starts = np.concatenate([[0], np.nonzero(ops[1:] != ops[:-1])[0] + 1])
    glens = np.add.reduceat(lens, starts)
    gops = ops[starts]
    cig = (glens.astype(np.int64) << 4) | gops
    if not is_rev:
        cig = cig[::-1]
    return [int(c) for c in cig]


def strips_cigar_align(query, target, qlen, tlen, m, mat, q, e,
                       zdrop: int = -1, end_bonus: int = 0,
                       flag=None, interpret: bool = False,
                       two: bool = False, q2: int = 0, e2: int = 0):
    """End-to-end strips CIGAR for a batch: skewed-store forward with
    byte emission, record replay for the ez fields, then the run-based
    device walker per pair from the reference's start cell
    (ksw2_extz2_sse.c:292-301; walk ksw2.h:129-161 with is_rot=0).
    Two-piece (``two``) walks the 7-bit extd bytes
    (ksw2_extd2_sse.c:191-322) with the 5-state walker.

    Returns a list of :class:`ExtzResult` with CIGARs.  Callers must
    have checked ``strips_eligible`` / ``strips_extd_eligible``.
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
        interpret=interpret, two=two, q2=q2, e2=e2)
    qc, ec = (int(q), int(e))
    if two and int(q2) + int(e2) < qc + ec:
        qc, ec = int(q2), int(e2)
    fields = unpack_records(np.asarray(rec), int(mat[1:].min()), qc, ec)
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
                                      interpret=interpret,
                                      two=int(bool(two)))
        ez.cigar = finish_runs(runs, k, ie, je, 0, is_rev)
        out.append(ez)
    return out


RUNS_CAP_ROWS = 17      # fetched runs rows cap (the walk buffer itself
                        # is uncapped — overflow re-walks)


def _runs_cap(n_t: int) -> int:
    """Fetched runs rows per pair, scaled to the pair length: a K-run
    CIGAR needs ~K slots and K ~ ops/avg-run-len; over a ~30 MB/s
    tunnel an oversized cap costs real milliseconds per pair (a 17-row
    cap on a 495-pair mixed workload was a ~2 MB / ~60 ms fetch).
    Overflow re-walks the pair alone (rare, degenerate alignments)."""
    r_rows = -(-2 * n_t // 128) + 1
    return min(r_rows, -(-n_t // 768), RUNS_CAP_ROWS)


# Fused-route cost-model constants, overridable for other hardware via
# KSW2T_FUSED_COST="exec_s,fwd_s_per_row,walk_s_per_row,slice_s" (see
# _fused_route_pays; calibrate by timing one fused vs per-pair CIGAR
# bucket on the target rig — bench/exp has the measurement scripts).
import os as _os

_FUSED_COST = tuple(
    float(v) for v in _os.environ.get(
        "KSW2T_FUSED_COST", "0.031,2.2e-6,1e-7,0.0005").split(","))


def _fused_route_pays(B: int, tmax: int) -> bool:
    """Cost model: fused strips-CIGAR (1 execution) vs per-pair fused
    single-pair pipelines (B executions).  Default constants measured on
    the real chip 2026-08-21 with the run-consuming walker + one-fetch
    output: per-execution round trip ~31 ms, cig-forward ~2.2 us per
    target row (7 ms at 3.2k rows, device trace), in-program walker
    ~0.25 ms + ~0.5 ms slice/fetch-share per pair (whale bucket
    17x3000: 56 ms fused vs ~530 ms per-pair).  Only 1-2-pair buckets
    still favor the per-pair path.  Other rigs can override via
    KSW2T_FUSED_COST (results stay correct either way; the gate is
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


def strips_cigar_extd_eligible(qlen, tlen, w, flag, m, mat, zdrop,
                               q, e, q2, e2) -> bool:
    """Eligibility for the fused TWO-PIECE strips-CIGAR path: the extd
    strips score conditions (e >= e2 post-swap chain-decoupling) on a
    CIGAR workload, the reference's degenerate guard with post-swap
    costs (ksw2_extd2_sse.c:100 — guard after the :93 swap), and the
    fused-route cost model."""
    from ..core.flags import Flag
    from .wavefront_strips import strips_extd_eligible

    f = int(flag)
    if f & (int(Flag.SCORE_ONLY) | int(Flag.EQX)):
        return False
    qc, ec = int(q), int(e)
    if int(q2) + int(e2) < qc + ec:
        qc, ec = int(q2), int(e2)
    if -int(np.asarray(mat).reshape(-1)[1:].min()) > 2 * (qc + ec):
        return False
    tlen = np.asarray(tlen)
    if not _fused_route_pays(int(tlen.size), int(tlen.max(initial=0))):
        return False
    return strips_extd_eligible(qlen, tlen, w, f | int(Flag.SCORE_ONLY),
                                m, mat, zdrop, q, e, q2, e2)


def _fused_one(prm, B: int, end_bonus: int, interpret: bool):
    """Traceable single-launch body: strips forward (byte emission) ->
    device start cells (ksw2_extz2_sse.c:292-301 rules on the replayed
    records) -> ONE batched walker call -> capped runs, all returned as
    one flat int32 vector.  Composable: several launches fused inside
    one jit share a single execution and a single fetch (the
    per-execution round trip is ~31 ms on this link).  Returns
    ``(fn, k_cap)``."""
    from ..core.flags import Flag
    from .wavefront_strips import _strips_run_fn

    fwd = _strips_run_fn(prm, interpret)
    S = prm.s
    n_t = prm.t_pad + 128          # d8 step axis: (t_pad//CH + 4) * CH
    wprm = SWParams(n_t=n_t, sp=S, blk=128, n_blocks=n_t // 128,
                    r_rows=-(-2 * n_t // 128) + 1,
                    two=int(prm.two or prm.spl), nop=int(prm.spl),
                    nb=B)
    walk = build_strips_walk(wprm, interpret)
    cap = _runs_cap(n_t)
    extz_only = bool(prm.flag & int(Flag.EXTZ_ONLY))
    Bp = prm.n_rows // S

    def fused(qpk, tpk, ql, tl, dak=None):
        rec, d8 = fwd(qpk, tpk, ql, tl) if dak is None \
            else fwd(qpk, tpk, ql, tl, dak)
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
        # ALL walkers ride ONE batched pallas call (grid (B, blocks));
        # the byte store reshapes to per-pair strip-major planes in one
        # transpose (strip axis leading = untiled: no sublane padding)
        d8b = jnp.transpose(
            d8.reshape(n_t, Bp, S, 128)[:, :B], (1, 2, 0, 3))
        starts = jnp.stack([i0[:B], j0[:B]], axis=1).astype(jnp.int32)
        res, runs = walk(starts, d8b)
        # ONE flat int32 output = ONE device->host fetch: on this
        # environment's tunnel every separate np.asarray costs a ~31 ms
        # round trip (three of them were ~70% of the whale bucket's
        # wall; the whole device program is ~13 ms — r5 trace)
        return jnp.concatenate([
            rec.reshape(-1), res.reshape(-1),
            runs[:, :cap].reshape(-1)])

    return fused, cap * 128


@functools.lru_cache(maxsize=32)
def _cached_cigar_batch(prm, B: int, end_bonus: int, interpret: bool):
    """Jitted single-launch fused CIGAR program (see _fused_one)."""
    fused, k_cap = _fused_one(prm, B, end_bonus, interpret)
    return jax.jit(fused), k_cap


def _flat_len(prm, B: int) -> int:
    """Length of one launch's flat int32 output (rec | res | runs)."""
    cap = _runs_cap(prm.t_pad + 128)
    Bp = prm.n_rows // prm.s
    return Bp * 9 + B * 3 + B * cap * 128


@functools.lru_cache(maxsize=32)
def _cached_cigar_multi(items: tuple, interpret: bool):
    """ONE jitted program running several fused CIGAR launches (a whole
    mixed workload's eligible buckets): inputs arrive as one flat uint8
    buffer (one upload), outputs concatenate into one flat int32 vector
    (one fetch).  ``items`` = tuple of (prm, B, end_bonus)."""
    from .wavefront_strips import _slice_launch

    fns = [(_fused_one(prm, B, eb, interpret)[0], prm, B)
           for prm, B, eb in items]

    def multi(buf):
        outs = []
        off = 0
        for fn, prm, B in fns:
            qpk, tpk, ql, tl, dak, off = _slice_launch(buf, prm, off)
            outs.append(fn(qpk, tpk, ql, tl, dak))
        return jnp.concatenate(outs)

    return jax.jit(multi)


def strips_cigar_fused_call(launches, interpret: bool = False):
    """Run every prepared CIGAR launch inside ONE jitted execution.

    ``launches`` = list of (prm, (qpk, tpk, ql, tl) numpy, B, end_bonus)
    from :func:`strips_cigar_prep`.  Returns the device flat int32
    array and the per-launch (offset, length) spans for
    :func:`unpack_cigar_flat`.

    KSW2T_CIGAR_FUSE=0 switches to per-launch jits with async fetches:
    on a low-latency local host that avoids compiling one program per
    bucket COMBINATION (each distinct workload mix is a fresh outer
    executable); on this environment's ~31 ms-per-execution tunnel the
    single fused program wins and stays the default."""
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    if _os.environ.get("KSW2T_CIGAR_FUSE", "1") == "0":
        return _per_launch_calls(launches, interpret)
    key = tuple((prm, B, eb) for prm, _, B, eb in launches)
    fn = _cached_cigar_multi(key, interpret)
    parts = []
    for prm, arrays, _, _ in launches:
        # (qpk, tpk[, dak], ql, tl) — must match _slice_launch order
        for a in arrays:
            parts.append(np.ascontiguousarray(a).reshape(-1)
                         .view(np.uint8))
    flat = fn(jnp.asarray(np.concatenate(parts)))
    spans = []
    off = 0
    for prm, _, B, _ in launches:
        n = _flat_len(prm, B)
        spans.append((off, n))
        off += n
    return flat, spans


class _LaunchParts:
    """Duck-typed stand-in for the fused flat device array: per-launch
    device arrays with async copies; np.asarray concatenates on read."""

    def __init__(self, arrs):
        self._arrs = arrs
        for a in arrs:
            cp = getattr(a, "copy_to_host_async", None)
            if cp is not None:
                cp()

    def copy_to_host_async(self):
        pass                                    # already started

    def __array__(self, dtype=None):
        out = np.concatenate([np.asarray(a) for a in self._arrs])
        return out.astype(dtype) if dtype is not None else out


def _per_launch_calls(launches, interpret):
    """KSW2T_CIGAR_FUSE=0 path: one jit per launch, fetches pipelined
    via async copies (see strips_cigar_fused_call docstring)."""
    arrs = []
    spans = []
    off = 0
    for prm, arrays, B, eb in launches:
        run, _ = _cached_cigar_batch(prm, B, eb, interpret)
        args = [jnp.asarray(a) for a in arrays]
        if len(args) == 4:
            out = run(*args)
        else:                   # (qpk, tpk, dak, ql, tl) splice order
            out = run(args[0], args[1], args[3], args[4], args[2])
        arrs.append(out)
        n = _flat_len(prm, B)
        spans.append((off, n))
        off += n
    return _LaunchParts(arrs), spans


def strips_exts_eligible(qlen, tlen, w, flag, m, mat, zdrop, q, e, q2,
                         junc_any: bool = False,
                         junc_bonus: int = 0) -> bool:
    """Eligibility for the fused SPLICED (exts) strips-CIGAR path: the
    one-piece strips conditions on a CIGAR workload, no junction
    annotations (their bonuses would exceed the 2-bit site-class
    stream), and the reference's degenerate guard
    (ksw2_exts2_sse.c:91)."""
    from ..core.flags import Flag
    from .wavefront_strips import strips_eligible

    f = int(flag)
    if f & (int(Flag.EQX) | int(Flag.EXTZ_ONLY)):
        return False
    if junc_any or junc_bonus:
        return False
    if int(q2) < 0:
        return False
    if -int(np.asarray(mat).reshape(-1)[1:].min()) > 2 * (int(q) + int(e)):
        return False
    tlen = np.asarray(tlen)
    if not (f & int(Flag.SCORE_ONLY)):
        # CIGAR mode pays walkers + runs fetch: gate on the cost model
        if not _fused_route_pays(int(tlen.size),
                                 int(tlen.max(initial=0))):
            return False
    return strips_eligible(qlen, tlen, w, f | int(Flag.SCORE_ONLY),
                           m, mat, zdrop, q, e)


def _splice_classes_batch(tpad, tlens, noncan, flag):
    """Donor/acceptor site CLASSES for a whole padded target matrix at
    once ({0: free, 1: semi, 2: -noncan}; junc-free — the strips route
    declines junc jobs).  Batched twin of the per-pair
    spec.diagdiff._splice_profiles value computation (which cost
    ~80 us/pair in per-pair calls — r5 trace); positions outside each
    pair's site ranges are class 2 exactly as the reference leaves
    them at -noncan (ksw2_exts2_sse.c:119-171)."""
    from ..core.flags import Flag

    B, L = tpad.shape
    t = tpad.astype(np.int32)
    tl = np.asarray(tlens, np.int64)[:, None]
    i = np.arange(L, dtype=np.int64)[None, :]
    fwd = bool(flag & Flag.SPLICE_FOR)
    rev = bool(flag & Flag.SPLICE_REV)
    rc = bool(flag & Flag.REV_CIGAR)
    if not (fwd or rev):
        return np.zeros((B, L), np.uint8)
    d_pat = ((2, 0, 1), (1, 0, 1)) if rc else ((2, 3, 0), (1, 3, 0))
    a_pat = ((3, 2, 0), (3, 1, 0)) if rc else ((0, 2, 1), (0, 1, 1))
    tp = np.pad(t, ((0, 0), (0, 4)))
    t1, t2, t3 = tp[:, 1:L + 1], tp[:, 2:L + 2], tp[:, 3:L + 3]
    dcan = np.zeros((B, L), bool)
    if fwd:
        dcan |= (t1 == d_pat[0][0]) & (t2 == d_pat[0][1])
    if rev:
        dcan |= (t1 == d_pat[1][0]) & (t2 == d_pat[1][1])
    dfl = ((t3 & 1) == d_pat[0][2]) & (t3 < 4)
    dcls = np.where(dcan & dfl, 0, np.where(dcan, 1, 2))
    dcls = np.where(i < tl - 4, dcls, 2).astype(np.uint8)
    tm1 = np.pad(t, ((0, 0), (1, 0)))[:, :L]
    tm2 = np.pad(t, ((0, 0), (2, 0)))[:, :L]
    acan = np.zeros((B, L), bool)
    if fwd:
        acan |= (tm1 == a_pat[0][0]) & (t == a_pat[0][1])
    if rev:
        acan |= (tm1 == a_pat[1][0]) & (t == a_pat[1][1])
    afl = ((tm2 & 1) == a_pat[0][2]) & (tm2 < 4)
    acls = np.where(acan & afl, 0, np.where(acan, 1, 2))
    acls = np.where((i >= 2) & (i < tl), acls, 2).astype(np.uint8)
    return (dcls | (acls << 2)).astype(np.uint8)


def strips_exts_cigar_prep(query, target, qlen, tlen, m, mat, q, e, q2,
                           noncan, zdrop, flag, cig: bool = True):
    """Host-side prep of spliced buckets for fused dispatch: the
    one-piece launch plan plus per-pair donor/acceptor site-class
    nibbles (classes {0, semi, -noncan}; ksw2_exts2_sse.c:119-171),
    packed alongside the sequences.  ``query``/``target`` are lists of
    per-job 1-D arrays.  Returns launch tuples for
    :func:`strips_cigar_fused_call` (``cig=False`` preps score-only
    launches for :func:`wavefront_strips.strips_fused_call`)."""
    from ..core.flags import Flag
    from ..spec.common import c_div
    from .packio import pack_bases
    from .wavefront_strips import (StripParams, _plan_rows, _strips_plan,
                                   round_up)

    flag = Flag(int(flag))
    q, e, q2 = int(q), int(e), int(q2)
    noncan = int(noncan)
    lt = c_div(q2 - q, e) - 1
    if q2 > q + e + lt * e:
        lt += 1
    ld = lt * e - (q2 - q)
    semi = c_div(-noncan, 2) if (flag & Flag.SPLICE_FLANK) else 0
    mat = np.asarray(mat, dtype=np.int8).reshape(-1)
    qlen = np.asarray(qlen, np.int32)
    tlen = np.asarray(tlen, np.int32)
    B = len(query)
    Lq = int(qlen.max())
    S0, tlenp, BMAX = _strips_plan(B, Lq, qlen, tlen)
    sc_N = -e if int(mat[m * m - 1]) == 0 else int(mat[m * m - 1])
    generic = bool(flag & Flag.GENERIC_SC)
    launches = []
    for i0 in range(0, B, BMAX):
        ql = qlen[i0:i0 + BMAX]
        tl = tlen[i0:i0 + BMAX]
        Bs = len(ql)
        S0s, tlenps, _ = _strips_plan(Bs, Lq, ql, tl)
        S, Bp = _plan_rows(Bs, S0s, tlenps)
        t_real = tlenps + S - 1
        t_pad = round_up(t_real + 1, 128)
        prm = StripParams(
            n_rows=Bp * S, s=S, tv=tlenps, t_pad=t_pad, t_real=t_real,
            m=m, q=q, e=e, mat0=int(mat[0]), sc_mis=int(mat[1]),
            sc_N=sc_N, zdrop=int(zdrop), flag=int(flag),
            matt=tuple(int(v) for v in mat) if generic else (),
            q2=q2, e2=0, lt=lt, ld=ld, cig=1 if cig else 0, spl=1,
            semi=semi, non=-noncan)
        qpad = np.zeros((Bp, S * 128), np.int8)
        tpad = np.zeros((Bp, tlenps), np.int8)
        for k in range(Bs):
            qv = query[i0 + k]
            tv_ = target[i0 + k]
            qpad[k, :min(len(qv), S * 128)] = qv[:S * 128]
            tpad[k, :min(len(tv_), tlenps)] = tv_[:tlenps]
        dpad = _splice_classes_batch(tpad[:Bs], tl, noncan, flag)
        dpad = np.concatenate(
            [dpad, np.zeros((Bp - Bs, tlenps), np.uint8)])
        lens = np.zeros((2, Bp), np.int32)
        lens[0, :Bs], lens[1, :Bs] = ql, tl
        arrays = (pack_bases(qpad), pack_bases(tpad), pack_bases(dpad),
                  lens[0], lens[1])
        launches.append((prm, arrays, Bs, 0) if cig
                        else (prm, arrays, Bs))
    return launches


def strips_exts_cigar_batch(query, target, qlen, tlen, m, mat, q, e,
                            q2, noncan, zdrop=-1, flag=None,
                            interpret: bool = False):
    """Batched spliced CIGARs through the fused strips route (convenience
    entry; the scheduler uses prep + fused_call + unpack directly)."""
    from ..core.flags import Flag
    from .exts import exts2_device

    flag = Flag(int(Flag.NONE if flag is None else flag))
    qlen = np.asarray(qlen, np.int32)
    tlen = np.asarray(tlen, np.int32)
    qjobs = [np.asarray(query[i][:qlen[i]]) for i in range(len(qlen))]
    tjobs = [np.asarray(target[i][:tlen[i]]) for i in range(len(tlen))]
    launches = strips_exts_cigar_prep(qjobs, tjobs, qlen, tlen, m, mat,
                                      q, e, q2, noncan, zdrop, flag)
    flat, spans = strips_cigar_fused_call(launches, interpret)
    h = np.asarray(flat)
    out = []
    pos = 0
    for (prm, _arrays, B, eb), (off, n) in zip(launches, spans):
        base = pos

        def rewalk(p, base=base):
            ez, _ = exts2_device(qjobs[base + p], tjobs[base + p], m,
                                 mat, q, e, q2, noncan, zdrop=zdrop,
                                 flag=flag)
            return ez.cigar

        out.extend(unpack_cigar_flat(h[off:off + n], prm, B, mat, eb,
                                     flag, rewalk))
        pos += B
    return out


def strips_cigar_prep(query, target, qlen, tlen, m, mat, q, e, zdrop,
                      flag, end_bonus: int = 0, two: bool = False,
                      q2: int = 0, e2: int = 0):
    """Host-side prep of a CIGAR bucket for fused dispatch (plan + pad
    + pack only; no device work).  Returns a list of launch tuples
    ``(prm, arrays, B, end_bonus)`` plus the per-launch job spans and
    the post-swap (q, e) used for the record guard.  Mirrors
    :func:`wavefront_strips.strips_prep` with ``cig=1`` params."""
    from .wavefront_strips import strips_prep

    launches = strips_prep(query, target, qlen, tlen, m, mat, q, e,
                           zdrop, flag, two=two, q2=q2, e2=e2)
    out = []
    for prm, arrays, B in launches:
        out.append((prm._replace(cig=1), arrays, B, int(end_bonus)))
    return out


def strips_cigar_batch(query, target, qlen, tlen, m, mat, q, e,
                       zdrop: int = -1, end_bonus: int = 0,
                       flag=None, interpret: bool = False,
                       two: bool = False, q2: int = 0, e2: int = 0):
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
                interpret=interpret, two=two, q2=q2, e2=e2))
        return out
    q, e = int(q), int(e)
    q_pre, e_pre, q2_pre, e2_pre = q, e, int(q2), int(e2)
    lt = ld = off0 = 0
    if two:
        from ..spec.strips_extd import long_params
        q2, e2 = int(q2), int(e2)
        qe_pre = q + e
        if q2 + e2 < q + e:
            q, q2 = q2, q
            e, e2 = e2, e
        lt, ld = long_params(q, e, q2, e2)
        off0 = (q + e) - qe_pre
    eN = e2 if two else e
    sc_N = -eN if int(mat[m * m - 1]) == 0 else int(mat[m * m - 1])
    S, Bp = _plan_rows(B, S0, tlenp)
    t_real = tlenp + S - 1
    t_pad = round_up(t_real + 1, 128)
    generic = bool(flag & Flag.GENERIC_SC)
    prm = StripParams(
        n_rows=Bp * S, s=S, tv=tlenp, t_pad=t_pad, t_real=t_real, m=m,
        q=q, e=e, mat0=int(mat[0]), sc_mis=int(mat[1]),
        sc_N=sc_N, zdrop=int(zdrop), flag=int(flag),
        matt=tuple(int(v) for v in mat) if generic else (),
        two=int(two), q2=int(q2), e2=int(e2), lt=lt, ld=ld, off0=off0,
        cig=1)
    run, k_cap = _cached_cigar_batch(prm, B, int(end_bonus), interpret)
    qpad = np.zeros((Bp, S * 128), np.int8)
    qpad[:B, :min(Lq, S * 128)] = np.asarray(query, np.int8)[:, :S * 128]
    tpad = np.zeros((Bp, tlenp), np.int8)
    tpad[:B, :min(target.shape[1], tlenp)] = \
        np.asarray(target, np.int8)[:, :tlenp]
    lens = np.zeros((2, Bp), np.int32)
    lens[0, :B], lens[1, :B] = qlen, tlen
    flat = np.asarray(run(jnp.asarray(pack_bases(qpad)),
                          jnp.asarray(pack_bases(tpad)),
                          jnp.asarray(lens[0]),
                          jnp.asarray(lens[1])))      # the ONE fetch

    def rewalk(p):
        sub = strips_cigar_align(
            query[p:p + 1], target[p:p + 1], qlen[p:p + 1],
            tlen[p:p + 1], m, mat, q_pre, e_pre, zdrop=zdrop,
            end_bonus=end_bonus, flag=flag, interpret=interpret,
            two=two, q2=q2_pre, e2=e2_pre)
        return sub[0].cigar

    return unpack_cigar_flat(flat, prm, B, mat, end_bonus, flag, rewalk)


def finish_runs_batch(runs_mat: np.ndarray, counts: np.ndarray,
                      i_end: np.ndarray, j_end: np.ndarray,
                      min_intron: int, is_rev: bool) -> list:
    """Batched :func:`finish_runs`: merge + tail + reverse for a whole
    launch in one numpy pass (the per-pair loop cost ~35 us/pair).
    Returns a list of per-pair CIGAR lists."""
    B, W = runs_mat.shape
    M = np.zeros((B, W + 2), np.int64)
    M[:, :W] = runs_mat.astype(np.int64)
    counts = np.asarray(counts, np.int64)
    i_end = np.asarray(i_end, np.int64)
    j_end = np.asarray(j_end, np.int64)
    has_d = i_end >= 0
    has_i = j_end >= 0
    opd = np.where((min_intron > 0) & (i_end >= min_intron),
                   int(CigarOp.N_SKIP), int(CigarOp.DEL))
    taild = ((i_end + 1) << 4) | opd
    taili = ((j_end + 1) << 4) | int(CigarOp.INS)
    rows = np.arange(B)
    M[rows, counts] = np.where(has_d, taild, M[rows, counts])
    pos_i = counts + has_d
    M[rows, pos_i] = np.where(has_i, taili, M[rows, pos_i])
    cnt2 = counts + has_d + has_i
    col = np.arange(W + 2)[None, :]
    valid = col < cnt2[:, None]
    vrow, vcol = np.nonzero(valid)          # row-major order
    if vrow.size == 0:
        return [[] for _ in range(B)]
    vv = M[vrow, vcol]
    vops = vv & 0xF
    vlens = vv >> 4
    brk = np.nonzero((vops[1:] != vops[:-1])
                     | (vrow[1:] != vrow[:-1]))[0] + 1
    starts = np.concatenate([[0], brk])
    glens = np.add.reduceat(vlens, starts)
    gops = vops[starts]
    grow = vrow[starts]
    cig = (glens << 4) | gops
    row_starts = np.searchsorted(grow, np.arange(B + 1))
    out = []
    for k in range(B):
        c = cig[row_starts[k]:row_starts[k + 1]]
        if not is_rev:
            c = c[::-1]
        out.append([int(x) for x in c])
    return out


def unpack_cigar_flat(flat: np.ndarray, prm, B: int, mat, end_bonus,
                      flag, rewalk) -> list:
    """One launch's flat int32 section -> per-pair ExtzResults.

    Layout: [rec (rows x NFIELDS) | res (B x 3) | runs (B x cap*128)].
    ``rewalk(p) -> cigar`` re-derives a pair whose capped runs fetch
    overflowed (degenerate alignments)."""
    from ..core.flags import Flag
    from ..core.result import ExtzResult
    from .batch_pallas import unpack_records

    flag = Flag(int(flag))
    is_rev = bool(flag & Flag.REV_CIGAR)
    extz_only = bool(flag & Flag.EXTZ_ONLY)
    mat = np.asarray(mat).reshape(-1)
    k_cap = (_flat_len(prm, B) - (prm.n_rows // prm.s) * 9 - B * 3) // B
    nrec = flat.size - B * 3 - B * k_cap
    rec = flat[:nrec].reshape(-1, 9)[:B]
    res_all = flat[nrec:nrec + B * 3].reshape(B, 3)
    runs_all = flat[nrec + B * 3:].reshape(B, -1)
    # prm carries POST-swap costs: the guard divides by the cheaper arm
    fields = unpack_records(rec, int(mat[1:].min()), int(prm.q),
                            int(prm.e))
    # batched assembly (one numpy pass over the whole launch)
    zd = fields["zdropped"].astype(bool)
    reach = extz_only & ~zd & (fields["mqe"] + end_bonus > fields["max"])
    had_start = ((~zd & (not extz_only)) | reach
                 | ((fields["max_t"] >= 0) & (fields["max_q"] >= 0)))
    ks = res_all[:, 2]
    overflow = ks > k_cap
    use_batch = had_start & ~overflow
    # exts: target gaps >= long_thres print as N introns (ksw2.h
    # backtrack min_intron_len = long_thres)
    mi = prm.lt if prm.spl else 0
    cigs = finish_runs_batch(
        runs_all, np.where(use_batch, ks, 0),
        np.where(use_batch, res_all[:, 0], -1),
        np.where(use_batch, res_all[:, 1], -1), mi, is_rev)
    out = []
    for p in range(B):
        ez = ExtzResult(
            max=int(fields["max"][p]), max_t=int(fields["max_t"][p]),
            max_q=int(fields["max_q"][p]), mqe=int(fields["mqe"][p]),
            mqe_t=int(fields["mqe_t"][p]), mte=int(fields["mte"][p]),
            mte_q=int(fields["mte_q"][p]), score=int(fields["score"][p]),
            zdropped=bool(zd[p]))
        if reach[p]:
            ez.reach_end = True
        if had_start[p]:
            ez.cigar = rewalk(p) if overflow[p] else cigs[p]
        out.append(ez)
    return out


__all__ = ["SWParams", "build_strips_walk", "strips_walk", "finish_runs",
           "strips_cigar_align", "strips_cigar_batch",
           "strips_cigar_eligible", "strips_cigar_extd_eligible",
           "strips_exts_eligible", "strips_exts_cigar_prep",
           "strips_exts_cigar_batch", "strips_cigar_prep",
           "strips_cigar_fused_call", "unpack_cigar_flat"]
