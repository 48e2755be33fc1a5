"""Host wrapper for the batched Pallas extz engine (one pair per row).

``extz_batch_device`` scores a padded batch of pairs with ``tlen <= 128``
on the TPU in one kernel launch — the production path for short-read
workloads (the reference's CLI loops pairs serially; inter-pair batching is
the TPU's main parallel axis, SURVEY.md section 2).

All derived planes (lane-replicated lengths, closed-form stopping
diagonals, the query-injection plane) are computed on device inside one
jitted program, so the host transfers only the compact int8 sequences.
Longer targets fall back to the per-pair kernel via the scheduler.
"""
from __future__ import annotations

import functools
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.flags import NEG_INF, Flag
from . import wavefront_batch as wb
from .inject import inject_plane, profile_planes
from .bands import pad_rows, round_up


@functools.lru_cache(maxsize=128)
def _cached_run(prm: wb.BatchParams, interpret: bool, with_cigar: bool = False):
    call = wb.build_batch_call(prm, with_cigar, interpret=interpret)
    R, n_diag, P = prm.n_rows, prm.n_diag, prm.p
    B = R // P
    generic = bool(prm.flag & int(Flag.GENERIC_SC))

    def run(query, target, qlen, tlen, w):
        """query (B,Lq) int8, target (B,Lt<=P*128) int8, lens (B,) int32."""
        I = jnp.int32
        qlen = qlen.astype(I)
        tlen = tlen.astype(I)
        w = w.astype(I)
        # first empty-band diagonal, closed form (validated against the
        # bruteforce bounds scan over 200k random (qlen, tlen, w))
        ndb = qlen + tlen - 1
        rlim = jnp.minimum(
            jnp.minimum(ndb, 2 * qlen + w - 1),
            jnp.minimum(2 * tlen + w - 1,
                        jnp.where(w == 0, 1, ndb))).astype(I)
        rr = jnp.arange(n_diag, dtype=I)[None, :]

        def rep(vec):
            return jnp.repeat(vec, P)[:, None] * jnp.ones((R, 128), I)

        qlp, tlp, wpl, rlp = rep(qlen), rep(tlen), rep(w), rep(rlim)
        tpad = jnp.zeros((B, P * 128), I).at[:, :target.shape[1]].set(
            target.astype(I)).reshape(R, 128)
        qinj = jnp.repeat(inject_plane(query, qlen, n_diag), P, axis=0)
        args = [qlp, tlp, wpl, rlp, tpad]
        if generic:
            # per-query-symbol profile planes, pre-biased (GENERIC_SC)
            qe2x = 2 * (prm.q + prm.e)
            args.append(profile_planes(
                tpad, prm.matt, prm.m,
                lambda v: ((v + qe2x) & 255) ^ 128))
        args.append(qinj)
        out = call(*args)
        if with_cigar:
            return out[0][::P, :wb.NFIELDS], out[1]
        return out[0][::P, :wb.NFIELDS]

    return jax.jit(run)


# column order of the (B, NFIELDS) score records (== wb.F_* lane order)
FIELD_ORDER = ("max", "max_t", "max_q", "mqe", "mqe_t", "mte", "mte_q",
               "score", "zdropped")


def unpack_records(res: np.ndarray, min_sc: int, q: int, e: int
                   ) -> Dict[str, np.ndarray]:
    """(B, NFIELDS) int32 records -> per-pair ez field dict.

    Applies the reference guard (ksw2_extz2_sse.c:78-82): when mismatches
    are invisible in the delta range every pair gets a reset ez.
    """
    out = {k: res[:, i].copy() for i, k in enumerate(FIELD_ORDER)}
    if -min_sc > 2 * (q + e):
        for k in out:
            out[k][:] = 0 if k in ("max", "zdropped") else (
                -1 if k.endswith(("_t", "_q")) else NEG_INF)
        out["max_t"][:] = -1
        out["max_q"][:] = -1
    return out


def extz_batch_records(
    query: np.ndarray,        # (B, Lq) int encoded, zero-padded
    target: np.ndarray,       # (B, Lt) int encoded, Lt <= P*128
    qlen: np.ndarray,         # (B,)
    tlen: np.ndarray,         # (B,)
    m: int,
    mat: np.ndarray,
    q: int,
    e: int,
    w: Optional[np.ndarray] = None,   # (B,) resolved >= 0; None = unbanded
    zdrop: int = -1,
    flag: Flag | int = Flag.SCORE_ONLY,
    interpret: bool = False,
) -> list:
    """Batched one-piece extension, score-only — async records form.

    Dispatches the kernel launches and returns a list of *device* arrays
    (one per <=512-row launch slice), each (B_i, NFIELDS) int32 in
    ``FIELD_ORDER`` column order, without forcing a device->host fetch.
    The scheduler concatenates the records of many buckets on device and
    fetches once — a single round-trip instead of one per bucket (the
    device tunnel costs ~25 ms per sync).  Use :func:`unpack_records` (and
    the ``min_sc`` guard) to turn fetched records into ez fields.
    """
    flag = Flag(int(flag))
    if not interpret and jax.default_backend() != "tpu":
        interpret = True          # Pallas TPU kernels interpret on CPU
    if not (flag & Flag.SCORE_ONLY):
        raise ValueError("batched engine is score-only; use extz2_device")
    B, Lq = query.shape
    Bt, Lt = target.shape
    assert B == Bt and Lt <= 3072
    P = (Lt + 127) // 128   # rows per pair; any P in 1..24 works
    qlen = np.asarray(qlen, np.int32)
    tlen = np.asarray(tlen, np.int32)
    if w is None:
        w = np.maximum(qlen, tlen)
    w = np.asarray(w, np.int32)
    mat = np.asarray(mat, dtype=np.int8).reshape(-1)
    # short effectively-unbanded score-only buckets take the row-major
    # engine: ~2x fewer VPU ops per pair than the anti-diagonal sweep
    from .wavefront_rows import extz_rows_records, rows_eligible
    if rows_eligible(qlen, tlen, w, flag, zdrop, m, mat):
        return extz_rows_records(query, target, qlen, tlen, m, mat, q, e,
                                 zdrop=zdrop, flag=flag, interpret=interpret)
    # longer effectively-unbanded score-only buckets take the skewed
    # strip-tiled engine: tlen+S steps at full occupancy instead of
    # qlen+tlen-1 triangle-wasted diagonals, Z-drop replayed post-hoc
    from .wavefront_strips import strips_eligible, strips_records
    if strips_eligible(qlen, tlen, w, flag, m, mat, zdrop, q, e):
        return strips_records(query, target, qlen, tlen, m, mat, q, e,
                              zdrop=zdrop, flag=flag, interpret=interpret)
    if zdrop >= 0 and not (flag & Flag.APPROX_MAX):
        # the exact-Z-drop kernel packs (H, tie-key) into one int32; the
        # key needs 5*P*128+2 values, so the positive H range shrinks as P
        # grows (the deep-negative side is clamped in-kernel)
        KB = 1 << (5 * P * 128 + 2).bit_length()
        hmax = int(mat.max()) * min(int(qlen.max()), int(tlen.max()))
        if (hmax + 1) * KB + KB >= (1 << 31):
            raise ValueError(
                f"scores too large for the packed Z-drop argmax at P={P}")

    # scratch VMEM bounds one score-only launch at ~768 rows (verified
    # compiling R=768 P=24 on v5e; a half-empty second slice costs nearly
    # a full launch, so occupancy beats conservatism); larger batches run
    # as slices
    RMAX = max(768 // P // 8 * 8, 8)
    if B > RMAX:
        pieces = []
        for i in range(0, B, RMAX):
            pieces.extend(extz_batch_records(
                query[i:i + RMAX], target[i:i + RMAX], qlen[i:i + RMAX],
                tlen[i:i + RMAX], m, mat, q, e, w[i:i + RMAX], zdrop, flag,
                interpret))
        return pieces
    sc_N = -e if int(mat[m * m - 1]) == 0 else int(mat[m * m - 1])

    Bp = pad_rows(B, P)
    R = Bp * P
    n_diag = int((qlen + tlen).max()) - 1 if B else 1
    n_diag = max(round_up(n_diag, wb.CHUNK), wb.CHUNK)

    prm = wb.BatchParams(
        n_rows=R, n_diag=n_diag, m=m,
        sc_mch=int(mat[0]), sc_mis=int(mat[1]), sc_N=sc_N,
        q=int(q), e=int(e), zdrop=int(zdrop), flag=int(flag), p=P,
        matt=tuple(int(v) for v in mat) if flag & Flag.GENERIC_SC else (),
    )
    run = _cached_run(prm, interpret)

    qpad = np.zeros((Bp, Lq), np.int8)
    qpad[:B] = np.asarray(query, np.int8)
    tpad = np.zeros((Bp, Lt), np.int8)
    tpad[:B] = np.asarray(target, np.int8)
    lens = np.zeros((3, Bp), np.int32)
    lens[0, :B], lens[1, :B], lens[2, :B] = qlen, tlen, w

    return [run(jnp.asarray(qpad), jnp.asarray(tpad),
                jnp.asarray(lens[0]), jnp.asarray(lens[1]),
                jnp.asarray(lens[2]))[:B]]


def extz_batch_device(
    query: np.ndarray,
    target: np.ndarray,
    qlen: np.ndarray,
    tlen: np.ndarray,
    m: int,
    mat: np.ndarray,
    q: int,
    e: int,
    w: Optional[np.ndarray] = None,
    zdrop: int = -1,
    flag: Flag | int = Flag.SCORE_ONLY,
    interpret: bool = False,
) -> Dict[str, np.ndarray]:
    """Batched one-piece extension, score-only; returns per-pair ez fields.

    Synchronous wrapper over :func:`extz_batch_records`.
    """
    pieces = extz_batch_records(query, target, qlen, tlen, m, mat, q, e,
                                w, zdrop, flag, interpret)
    res = np.concatenate([np.asarray(p) for p in pieces], axis=0)
    mat = np.asarray(mat, dtype=np.int8).reshape(-1)
    return unpack_records(res, int(mat[1:].min()), int(q), int(e))


@functools.lru_cache(maxsize=32)
def _cached_tb_starts(flag_int: int, end_bonus: int):
    """Jitted traceback-start selection (ksw2_extz2_sse.c:292-301) —
    computed on device so the CIGAR pipeline needs no mid-bucket fetch."""
    extz_only = bool(flag_int & int(Flag.EXTZ_ONLY))

    def starts(res, qlv, tlv):
        ok = (qlv > 0) & (tlv > 0)
        zd = res[:, wb.F_ZDROP] > 0
        if not extz_only:
            c1 = ok & jnp.logical_not(zd)
            i1, j1 = tlv - 1, qlv - 1
        else:
            c1 = (ok & jnp.logical_not(zd)
                  & (res[:, wb.F_MQE] + end_bonus > res[:, wb.F_MAX]))
            i1, j1 = res[:, wb.F_MQET], qlv - 1
        c2 = ok & (res[:, wb.F_MAXT] >= 0) & (res[:, wb.F_MAXQ] >= 0)
        i0 = jnp.where(c1, i1, jnp.where(c2, res[:, wb.F_MAXT], -1))
        j0 = jnp.where(c1, j1, jnp.where(c2, res[:, wb.F_MAXQ], -1))
        return i0.astype(jnp.int32), j0.astype(jnp.int32)

    return jax.jit(starts)


@jax.jit
def _pack_cigar_slice(res, ends, cnt, runs):
    """One (B, NFIELDS+2+1+MAXR) record per pair: fetch everything at once."""
    return jnp.concatenate(
        [res, ends, cnt[:, None].astype(jnp.int32), runs], axis=1)


@functools.lru_cache(maxsize=64)
def _cached_cigar_pipeline(prm: wb.BatchParams, B: int, flag_int: int,
                           end_bonus: int, rmax_round: int, interpret: bool):
    """ONE jitted program for a whole CIGAR slice: forward wavefront ->
    start-cell selection -> traceback walker -> RLE pack.

    Composing the already-cached jitted pieces inside a single jit keeps
    the per-slice cost to one dispatch (the tunnel charges per call) and
    lets XLA alias the direction planes between the forward kernel and
    the walker instead of round-tripping them.
    """
    from . import traceback_band as tbb
    from .band_batch import _cached_run_band_tb

    P, R, n_diag = prm.p, prm.n_rows, prm.n_diag
    Bp = R // P
    nd128 = round_up(n_diag, 128)
    nd2 = min(nd128, max(128, rmax_round))
    Bpw = -(-Bp // 8) * 8
    tprm = tbb.BandTbParams(n_pairs=Bpw, n_diag=nd2, w=nd2, p=P)
    fwd = (_cached_run(prm, interpret, True)
           if isinstance(prm, wb.BatchParams)
           else _cached_run_extd(prm, interpret, True))
    tb, MAXR = _cached_run_band_tb(tprm, interpret)
    starts = _cached_tb_starts(flag_int, end_bonus)

    def pipe(qpad, tpad, l0, l1, l2):
        res, p = fwd(qpad, tpad, l0, l1, l2)
        i0, j0 = starts(res, l0, l1)
        if nd2 > n_diag:
            p = jnp.pad(p, ((0, nd2 - n_diag), (0, 0), (0, 0)))
        elif nd2 < n_diag:
            p = p[:nd2]
        if Bpw != Bp:
            p = jnp.pad(p, ((0, 0), (0, (Bpw - Bp) * P), (0, 0)))
            i0 = jnp.pad(i0, (0, Bpw - Bp), constant_values=-1)
            j0 = jnp.pad(j0, (0, Bpw - Bp), constant_values=-1)
            l0 = jnp.pad(l0, (0, Bpw - Bp))
            l1 = jnp.pad(l1, (0, Bpw - Bp))
            l2 = jnp.pad(l2, (0, Bpw - Bp))
        ends, runs, cnt, _ops8 = tb(p, l0, l1, jnp.maximum(l2, 1), i0, j0)
        return jnp.concatenate(
            [res[:B], ends[:B], cnt[:B, None].astype(jnp.int32),
             runs[:B]], axis=1)

    return jax.jit(pipe), MAXR


def _cigar_batch_dispatch(prm, qpad, tpad, lens, B, flag, end_bonus,
                          interpret, defer=False):
    """Forward kernel -> device start cells -> device walker, NO fetch.

    Returns ``(packed_device_records, MAXR)``; the records carry
    [res | walk-end i,j | run count | RLE runs] per pair.  Used by the
    scheduler to overlap every bucket's CIGAR pipeline and fetch once.

    ``defer=True`` executes nothing: it returns a pending descriptor the
    scheduler hands to :func:`cigar_fused_call`, which runs EVERY slice
    of a workload inside one jitted execution (one tunnel round trip)
    with one truncated-slab fetch.
    """
    rmax = max(int((lens[0] + lens[1]).max()) - 2, 0)
    rmax_round = -(-(rmax + 1) // 1024) * 1024   # bound compiled variants
    if defer:
        _, MAXR = _cached_cigar_pipeline(prm, B, int(flag),
                                         int(end_bonus), rmax_round,
                                         interpret)
        key = ("z", prm, B, int(flag), int(end_bonus), rmax_round,
               qpad.shape[1], tpad.shape[1])
        return {"pipe_key": key, "arrs": (qpad, tpad, lens)}, MAXR
    pipe, MAXR = _cached_cigar_pipeline(prm, B, int(flag), int(end_bonus),
                                        rmax_round, interpret)
    packed = pipe(jnp.asarray(qpad), jnp.asarray(tpad),
                  jnp.asarray(lens[0]), jnp.asarray(lens[1]),
                  jnp.asarray(lens[2]))
    return packed, MAXR


RUNS_FETCH_CAP = 384     # fused-path slab fetch keeps at most this many
                         # RLE runs per pair (~30 MB/s tunnel: bytes are
                         # a first-order cost); cnt > cap falls back to
                         # the synchronous full-fetch path.  Splice reads
                         # have few runs (exons + one N), so exts slices
                         # cap lower.
RUNS_FETCH_CAP_EXTS = 128


@functools.lru_cache(maxsize=32)
def _cached_fused_cigar(keys: tuple, interpret: bool):
    """ONE jitted program running every CIGAR slice of a workload.

    ``keys`` are the descriptors from the deferring dispatchers.  Inputs
    arrive as one flat uint8 buffer (sequences 4-bit packed); the output
    is one flat int32 array of per-slice (B, NFIELDS+3+cap) slabs."""
    from .packio import unpack_bases

    def fused(buf):
        outs = []
        off = 0

        def take(n):
            nonlocal off
            part = jax.lax.dynamic_slice(buf, (off,), (n,))
            off += n
            return part

        for key in keys:
            kind, prm = key[0], key[1]
            Bp = prm.n_rows // prm.p
            # key layouts: ("z"|"d", prm, B, flag, eb, rmax, Lq, Lt)
            #              ("s", prm, B, rmax, Lq, Lt, noncan, jb, junc?)
            Lq, Lt = (key[4], key[5]) if kind == "s" else (key[6], key[7])
            nqb = Bp * ((Lq + 1) // 2)
            ntb = Bp * ((Lt + 1) // 2)
            qpad = unpack_bases(take(nqb).reshape(Bp, -1), Lq)
            tpad = unpack_bases(take(ntb).reshape(Bp, -1), Lt)
            if kind == "s":
                _, prm_, B, rmax_round, _, _, noncan, jb, has_junc = key
                R = prm.n_rows
                P = prm.p
                Bp_ = R // P
                junc = None
                if has_junc:
                    junc = take(Bp_ * Lt).reshape(Bp_, Lt)
                l0 = jax.lax.bitcast_convert_type(
                    take(4 * Bp).reshape(Bp, 4), jnp.int32).reshape(Bp)
                l1 = jax.lax.bitcast_convert_type(
                    take(4 * Bp).reshape(Bp, 4), jnp.int32).reshape(Bp)
                # donor/acceptor profiles derive from the target ON
                # device (no two-plane upload per slice)
                dn, ac = splice_profiles_device(
                    tpad, l1, P * 128, noncan, prm.flag, jb, junc)
                donb = ((dn + 128) & 255).reshape(Bp_ * P, 128)
                accb = ((ac + 128) & 255).reshape(Bp_ * P, 128)
                pipe, MAXR = _cached_cigar_pipeline_exts(
                    prm, B, rmax_round, interpret)
                slab = pipe(qpad, tpad, donb, accb, l0, l1)
            else:
                _, prm_, B, flag_int, eb, rmax_round, _, _ = key
                l0 = jax.lax.bitcast_convert_type(
                    take(4 * Bp).reshape(Bp, 4), jnp.int32).reshape(Bp)
                l1 = jax.lax.bitcast_convert_type(
                    take(4 * Bp).reshape(Bp, 4), jnp.int32).reshape(Bp)
                l2 = jax.lax.bitcast_convert_type(
                    take(4 * Bp).reshape(Bp, 4), jnp.int32).reshape(Bp)
                pipe, MAXR = _cached_cigar_pipeline(
                    prm, B, flag_int, eb, rmax_round, interpret)
                slab = pipe(qpad, tpad, l0, l1, l2)
            cap = RUNS_FETCH_CAP_EXTS if kind == "s" else RUNS_FETCH_CAP
            W = NFIELDS_REC + 3 + min(MAXR, cap)
            outs.append(slab[:, :W].reshape(-1))
        return jnp.concatenate(outs)

    return jax.jit(fused)


def cigar_fused_call(pendings, interpret: bool = False):
    """Run every pending CIGAR slice inside ONE jitted execution.

    ``pendings`` is a list of the descriptors produced by the deferring
    dispatchers (in a fixed order).  Returns (device flat int32 array,
    per-slice (offset, B, W, MAXR_eff) spans in the same order)."""
    from .packio import pack_bases

    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    keys = tuple(p["pipe_key"] for p in pendings)
    fn = _cached_fused_cigar(keys, interpret)
    parts = []
    spans = []
    off = 0
    for p in pendings:
        key = p["pipe_key"]
        kind, prm = key[0], key[1]
        B = key[2]
        if kind == "s":
            qpad, tpad, lens, junc = p["arrs"]
        else:
            qpad, tpad, lens = p["arrs"]
        parts.append(pack_bases(qpad).reshape(-1))
        parts.append(pack_bases(tpad).reshape(-1))
        if kind == "s" and junc is not None:
            parts.append(np.ascontiguousarray(junc, np.uint8).reshape(-1))
        for row in lens:
            parts.append(np.ascontiguousarray(row, np.int32)
                         .view(np.uint8))
        MAXR = p["MAXR"]
        cap = RUNS_FETCH_CAP_EXTS if kind == "s" else RUNS_FETCH_CAP
        W = NFIELDS_REC + 3 + min(MAXR, cap)
        spans.append((off, B, W, min(MAXR, cap)))
        off += B * W
    return fn(jnp.asarray(np.concatenate(parts))), spans


def _cigar_batch_finish(fetched, MAXR, B, query, target, qlen, tlen,
                        flag, end_bonus):
    """Host side of the async CIGAR pipeline.

    ``fetched`` is the (B, NFIELDS+3+MAXR) numpy slab for one slice.
    Returns the list of ExtzResult with CIGARs attached, or ``None`` when
    any pair overflowed the device RLE compaction (caller re-runs that
    slice through the synchronous path, which has the full-fetch
    fallback).
    """
    from ..core.result import ExtzResult
    from .traceback_band import finish_band_cigars_runs

    flag = Flag(int(flag))
    res = fetched[:, :NFIELDS_REC]
    ends = fetched[:, NFIELDS_REC:NFIELDS_REC + 2]
    cnt = fetched[:, NFIELDS_REC + 2]
    runs = fetched[:, NFIELDS_REC + 3:]
    out = []
    started = np.zeros(B, bool)
    for b in range(B):
        ez = ExtzResult()
        ez.reset()
        ez.max = int(res[b, wb.F_MAX])
        ez.max_t = int(res[b, wb.F_MAXT])
        ez.max_q = int(res[b, wb.F_MAXQ])
        ez.mqe = int(res[b, wb.F_MQE])
        ez.mqe_t = int(res[b, wb.F_MQET])
        ez.mte = int(res[b, wb.F_MTE])
        ez.mte_q = int(res[b, wb.F_MTEQ])
        ez.score = int(res[b, wb.F_SCORE])
        ez.zdropped = bool(res[b, wb.F_ZDROP])
        out.append(ez)
        qln, tln = int(qlen[b]), int(tlen[b])
        if qln <= 0 or tln <= 0:
            continue
        if not ez.zdropped and not (flag & Flag.EXTZ_ONLY):
            started[b] = True
        elif (not ez.zdropped and (flag & Flag.EXTZ_ONLY)
              and ez.mqe + end_bonus > ez.max):
            ez.reach_end = True
            started[b] = True
        elif ez.max_t >= 0 and ez.max_q >= 0:
            started[b] = True
    if (cnt[started] > MAXR).any():
        return None          # degenerate: re-run this slice synchronously
    rev = bool(flag & Flag.REV_CIGAR)
    cigs = finish_band_cigars_runs(runs, cnt.astype(np.int64), ends[:, 0],
                                   ends[:, 1], rev, started)
    for b in range(B):
        out[b].cigar = cigs[b]
    if flag & Flag.EQX:
        from ..core import cigar as cigarmod
        for b in range(B):
            if out[b].cigar:
                out[b].cigar = cigarmod.to_eqx(
                    out[b].cigar, query[b][:int(qlen[b])],
                    target[b][:int(tlen[b])])
    return out


NFIELDS_REC = wb.NFIELDS   # record width of the packed CIGAR slabs


def extz_batch_align_dispatch(
    query, target, qlen, tlen, m, mat, q, e, w=None, zdrop=-1,
    end_bonus=0, flag=Flag.NONE, interpret=False, defer=False,
):
    """Async CIGAR batch (extz): dispatch all device work, fetch nothing.

    Returns a list of slice dicts for :func:`extz_batch_align_finish` /
    the scheduler's single-fetch pipeline.  Mirrors
    :func:`extz_batch_align`'s routing (same RMAX slices, same params).
    """
    flag = Flag(int(flag))
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    if flag & Flag.SCORE_ONLY:
        raise ValueError("use extz_batch_records for score-only batches")
    B, Lq = query.shape
    Bt, Lt = target.shape
    assert B == Bt and Lt <= 1536
    P = (Lt + 127) // 128
    qlen = np.asarray(qlen, np.int32)
    tlen = np.asarray(tlen, np.int32)
    if w is None:
        w = np.maximum(qlen, tlen)
    w = np.asarray(w, np.int32)
    # the async pipeline never holds two slices' direction planes at once
    # (the walker donates them), so it can run wider launches than the
    # synchronous path
    RMAX = 384 // P // 8 * 8
    if B > RMAX:
        slices = []
        for i in range(0, B, RMAX):
            slices.extend(extz_batch_align_dispatch(
                query[i:i + RMAX], target[i:i + RMAX], qlen[i:i + RMAX],
                tlen[i:i + RMAX], m, mat, q, e, w[i:i + RMAX], zdrop,
                end_bonus, flag, interpret, defer))
        return slices
    mat = np.asarray(mat, dtype=np.int8).reshape(-1)
    sc_N = -e if int(mat[m * m - 1]) == 0 else int(mat[m * m - 1])
    min_sc = int(mat[1:].min())
    if -min_sc > 2 * (q + e):
        return [{"guard": True, "B": B, "args": None}]

    Bp = pad_rows(B, P)
    R = Bp * P
    n_diag = int((qlen + tlen).max()) - 1 if B else 1
    n_diag = max(round_up(n_diag, 32), 32)
    # chunk=32 beats 64 on the mixed CIGAR row (A/B on v5e: coarser
    # early-exit granularity loses more than fewer grid steps save), and
    # 128 exceeds the 16 MB scoped-VMEM limit at R=384
    prm = wb.BatchParams(
        n_rows=R, n_diag=n_diag, m=m,
        sc_mch=int(mat[0]), sc_mis=int(mat[1]), sc_N=sc_N,
        q=int(q), e=int(e), zdrop=int(zdrop), flag=int(flag), chunk=32,
        p=P,
        matt=tuple(int(v) for v in mat) if flag & Flag.GENERIC_SC else (),
    )
    qpad = np.zeros((Bp, Lq), np.int8)
    qpad[:B] = np.asarray(query, np.int8)
    tpad = np.zeros((Bp, Lt), np.int8)
    tpad[:B] = np.asarray(target, np.int8)
    lens = np.zeros((3, Bp), np.int32)
    lens[0, :B], lens[1, :B], lens[2, :B] = qlen, tlen, w
    out, MAXR = _cigar_batch_dispatch(
        prm, qpad, tpad, lens, B, flag, end_bonus, interpret, defer)
    d = {"MAXR": MAXR, "B": B, "args": (query, target, qlen, tlen, w)}
    d["pending" if defer else "packed"] = out
    if defer:
        d["pending"]["MAXR"] = MAXR
    return [d]


def extd_batch_align_dispatch(
    query, target, qlen, tlen, m, mat, q, e, q2, e2, w=None, zdrop=-1,
    end_bonus=0, flag=Flag.NONE, interpret=False, defer=False,
):
    """Async CIGAR batch (extd, two-piece): see extz_batch_align_dispatch."""
    flag = Flag(int(flag))
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    if flag & Flag.SCORE_ONLY:
        raise ValueError("use extd_batch_records for score-only batches")
    B, Lq = query.shape
    Bt, Lt = target.shape
    assert B == Bt and Lt <= 1536
    P = (Lt + 127) // 128
    qlen = np.asarray(qlen, np.int32)
    tlen = np.asarray(tlen, np.int32)
    if w is None:
        w = np.maximum(qlen, tlen)
    w = np.asarray(w, np.int32)
    RMAX = 384 // P // 8 * 8
    if B > RMAX:
        slices = []
        for i in range(0, B, RMAX):
            slices.extend(extd_batch_align_dispatch(
                query[i:i + RMAX], target[i:i + RMAX], qlen[i:i + RMAX],
                tlen[i:i + RMAX], m, mat, q, e, q2, e2, w[i:i + RMAX],
                zdrop, end_bonus, flag, interpret, defer))
        return slices
    matf = np.asarray(mat, dtype=np.int8).reshape(-1)
    min_sc = int(matf[1:].min())
    qc, ec = (q, e) if q + e <= q2 + e2 else (q2, e2)
    if -min_sc > 2 * (qc + ec):
        return [{"guard": True, "B": B, "args": None}]

    prm, _ms, _qe = _extd_batch_params(
        B, Lq, qlen, tlen, m, matf, q, e, q2, e2, zdrop, flag, 32, P)
    Bp = prm.n_rows // P
    qpad = np.zeros((Bp, Lq), np.int8)
    qpad[:B] = np.asarray(query, np.int8)
    tpad = np.zeros((Bp, Lt), np.int8)
    tpad[:B] = np.asarray(target, np.int8)
    lens = np.zeros((3, Bp), np.int32)
    lens[0, :B], lens[1, :B], lens[2, :B] = qlen, tlen, w
    out, MAXR = _cigar_batch_dispatch(
        prm, qpad, tpad, lens, B, flag, end_bonus, interpret, defer)
    d = {"MAXR": MAXR, "B": B, "args": (query, target, qlen, tlen, w)}
    d["pending" if defer else "packed"] = out
    if defer:
        d["pending"]["MAXR"] = MAXR
    return [d]


__all__ = ["extz_batch_device", "extz_batch_align",
           "extd_batch_device", "extd_batch_align",
           "exts_batch_align", "extf_batch_device", "gg2_batch_align"]


def extz_batch_align(
    query: np.ndarray,
    target: np.ndarray,
    qlen: np.ndarray,
    tlen: np.ndarray,
    m: int,
    mat: np.ndarray,
    q: int,
    e: int,
    w: Optional[np.ndarray] = None,
    zdrop: int = -1,
    end_bonus: int = 0,
    flag: Flag | int = Flag.NONE,
    interpret: bool = False,
):
    """Batched one-piece extension *with CIGARs* for short targets.

    Returns a list of ``ExtzResult`` (same traceback-start selection as
    ``ksw_extz2_sse``, ksw2_extz2_sse.c:292-301; native C++ backtrack per
    pair over the streamed direction planes).
    """
    from ..core.result import ExtzResult
    from ..native.bindings import backtrack

    flag = Flag(int(flag))
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    if flag & Flag.SCORE_ONLY:
        raise ValueError("use extz_batch_device for score-only batches")
    B, Lq = query.shape
    Bt, Lt = target.shape
    assert B == Bt and Lt <= 1536
    P = (Lt + 127) // 128   # rows per pair; any P in 1..12 works
    qlen = np.asarray(qlen, np.int32)
    tlen = np.asarray(tlen, np.int32)
    if w is None:
        w = np.maximum(qlen, tlen)
    w = np.asarray(w, np.int32)

    RMAX = 256 // P // 8 * 8                  # direction planes bound VMEM harder
    if B > RMAX:
        out = []
        for i in range(0, B, RMAX):
            out.extend(extz_batch_align(
                query[i:i + RMAX], target[i:i + RMAX], qlen[i:i + RMAX],
                tlen[i:i + RMAX], m, mat, q, e, w[i:i + RMAX], zdrop,
                end_bonus, flag, interpret))
        return out
    mat = np.asarray(mat, dtype=np.int8).reshape(-1)
    sc_N = -e if int(mat[m * m - 1]) == 0 else int(mat[m * m - 1])
    min_sc = int(mat[1:].min())
    if -min_sc > 2 * (q + e):
        out = []
        for _ in range(B):
            ez = ExtzResult()
            ez.reset()
            out.append(ez)
        return out

    Bp = pad_rows(B, P)
    R = Bp * P
    n_diag = int((qlen + tlen).max()) - 1 if B else 1
    n_diag = max(round_up(n_diag, 32), 32)

    prm = wb.BatchParams(
        n_rows=R, n_diag=n_diag, m=m,
        sc_mch=int(mat[0]), sc_mis=int(mat[1]), sc_N=sc_N,
        q=int(q), e=int(e), zdrop=int(zdrop), flag=int(flag), chunk=32,
        p=P,
        matt=tuple(int(v) for v in mat) if flag & Flag.GENERIC_SC else (),
    )
    run = _cached_run(prm, interpret, True)

    qpad = np.zeros((Bp, Lq), np.int8)
    qpad[:B] = np.asarray(query, np.int8)
    tpad = np.zeros((Bp, Lt), np.int8)
    tpad[:B] = np.asarray(target, np.int8)
    lens = np.zeros((3, Bp), np.int32)
    lens[0, :B], lens[1, :B], lens[2, :B] = qlen, tlen, w

    res, p = run(jnp.asarray(qpad), jnp.asarray(tpad),
                 jnp.asarray(lens[0]), jnp.asarray(lens[1]),
                 jnp.asarray(lens[2]))
    res = np.asarray(res)[:B]

    out = []
    rev = bool(flag & Flag.REV_CIGAR)
    i0a = np.full(B, -1, np.int32)
    j0a = np.full(B, -1, np.int32)
    started = np.zeros(B, bool)
    for b in range(B):
        ez = ExtzResult()
        ez.reset()
        ez.max = int(res[b, wb.F_MAX])
        ez.max_t = int(res[b, wb.F_MAXT])
        ez.max_q = int(res[b, wb.F_MAXQ])
        ez.mqe = int(res[b, wb.F_MQE])
        ez.mqe_t = int(res[b, wb.F_MQET])
        ez.mte = int(res[b, wb.F_MTE])
        ez.mte_q = int(res[b, wb.F_MTEQ])
        ez.score = int(res[b, wb.F_SCORE])
        ez.zdropped = bool(res[b, wb.F_ZDROP])
        out.append(ez)
        qln, tln = int(qlen[b]), int(tlen[b])
        if qln <= 0 or tln <= 0:
            continue
        # traceback start cell (ksw2_extz2_sse.c:292-301)
        if not ez.zdropped and not (flag & Flag.EXTZ_ONLY):
            i0a[b], j0a[b] = tln - 1, qln - 1
        elif (not ez.zdropped and (flag & Flag.EXTZ_ONLY)
              and ez.mqe + end_bonus > ez.max):
            ez.reach_end = True
            i0a[b], j0a[b] = ez.mqe_t, qln - 1
        elif ez.max_t >= 0 and ez.max_q >= 0:
            i0a[b], j0a[b] = ez.max_t, ez.max_q
        else:
            continue
        started[b] = True

    if os.environ.get("KSW2_HOST_TB") == "1":
        _host_tb_batch(np.asarray(p), out, qlen, tlen, w, i0a, j0a, started,
                       P, n_diag, rev)
    else:
        # batched on-device walk (t-coordinate layout: origin pinned at 0
        # via W >= n_diag); only compact RLE runs cross the link
        from .band_batch import device_walk_cigars
        nd128 = ((n_diag + 127) // 128) * 128
        if nd128 != n_diag:
            p = jnp.pad(p, ((0, nd128 - n_diag), (0, 0), (0, 0)))
        cigs = device_walk_cigars(p, R, P, nd128, nd128, qlen, tlen, w,
                                  i0a, j0a, started, rev, interpret)
        for b in range(B):
            out[b].cigar = cigs[b]
    if flag & Flag.EQX:
        # library extension: the reference extz2 ignores KSW_EZ_EQX (only
        # extd2/exts2 post-pass it), but every other engine here (spec,
        # async dispatch, extd sync) honors it for extz, so stay uniform
        from ..core import cigar as cigarmod
        for b in range(B):
            if out[b].cigar:
                out[b].cigar = cigarmod.to_eqx(
                    out[b].cigar, np.asarray(query[b])[:int(qlen[b])],
                    np.asarray(target[b])[:int(tlen[b])])
    return out


def _host_tb_batch(p, out, qlen, tlen, w, i0a, j0a, started, P, n_diag, rev):
    """Debug path: fetch the direction planes, run the native backtrack."""
    from ..native.bindings import backtrack

    rr = np.arange(n_diag, dtype=np.int64)[None, :]
    st0 = np.maximum(0, np.maximum(rr - qlen[:, None] + 1,
                                   (rr - w[:, None] + 1) >> 1))
    en0 = np.minimum(tlen[:, None] - 1,
                     np.minimum(rr, (rr + w[:, None]) >> 1))
    stb = (st0 // 16 * 16).astype(np.int32)
    enb = ((en0 + 16) // 16 * 16 - 1).astype(np.int32)
    zero_off = np.zeros(n_diag, np.int32)
    for b in range(len(out)):
        if not started[b]:
            continue
        qln, tln = int(qlen[b]), int(tlen[b])
        nd = qln + tln - 1
        pmat = np.ascontiguousarray(
            p[:nd, b * P:(b + 1) * P, :]).reshape(nd, P * 128)
        out[b].cigar = backtrack(
            pmat, stb[b, :nd], enb[b, :nd], P * 128,
            int(i0a[b]), int(j0a[b]), is_rot=True, is_rev=rev,
            store_off=zero_off[:nd])


@functools.lru_cache(maxsize=128)
def _cached_run_extd(prm, interpret: bool, with_cigar: bool = False):
    from . import wavefront_batch_extd as wbe
    call = wbe.build_batch_extd_call(prm, with_cigar, interpret=interpret)
    R, n_diag, P = prm.n_rows, prm.n_diag, prm.p
    B = R // P

    def run(query, target, qlen, tlen, w):
        I = jnp.int32
        qlen = qlen.astype(I)
        tlen = tlen.astype(I)
        w = w.astype(I)
        # first empty-band diagonal, closed form (validated against the
        # bruteforce bounds scan over 200k random (qlen, tlen, w))
        ndb = qlen + tlen - 1
        rlim = jnp.minimum(
            jnp.minimum(ndb, 2 * qlen + w - 1),
            jnp.minimum(2 * tlen + w - 1,
                        jnp.where(w == 0, 1, ndb))).astype(I)
        rr = jnp.arange(n_diag, dtype=I)[None, :]

        def rep(vec):
            return jnp.repeat(vec, P)[:, None] * jnp.ones((R, 128), I)

        qlp, tlp, wpl, rlp = rep(qlen), rep(tlen), rep(w), rep(rlim)
        tpad = jnp.zeros((B, P * 128), I).at[:, :target.shape[1]].set(
            target.astype(I)).reshape(R, 128)
        qinj = jnp.repeat(inject_plane(query, qlen, n_diag), P, axis=0)
        args = [qlp, tlp, wpl, rlp, tpad]
        if prm.flag & int(Flag.GENERIC_SC):
            # per-query-symbol profile planes, biased (GENERIC_SC)
            args.append(profile_planes(
                tpad, prm.matt, prm.m, lambda v: (v + 128) & 255))
        args.append(qinj)
        out = call(*args)
        if with_cigar:
            return out[0][::P, :wb.NFIELDS], out[1]
        return out[0][::P, :wb.NFIELDS]

    return jax.jit(run)


def _extd_batch_params(B, Lq, qlen, tlen, m, mat, q, e, q2, e2, zdrop, flag,
                       chunk, P=1):
    from ..spec.common import c_div
    from . import wavefront_batch_extd as wbe

    mat = np.asarray(mat, dtype=np.int8).reshape(-1)
    q, e, q2, e2 = int(q), int(e), int(q2), int(e2)
    qe_pre_swap = q + e
    if q2 + e2 < q + e:              # canonicalize (ksw2_extd2_sse.c:78)
        q, q2 = q2, q
        e, e2 = e2, e
    long_thres = c_div(q2 - q, e - e2) - 1 if e != e2 else 0
    if q2 + e2 + long_thres * e2 > q + e + long_thres * e:
        long_thres += 1
    long_diff = long_thres * (e - e2) - (q2 - q) - e2
    sc_N = -e2 if int(mat[m * m - 1]) == 0 else int(mat[m * m - 1])
    Bp = pad_rows(B, P)
    R = Bp * P
    n_diag = int((qlen + tlen).max()) - 1 if B else 1
    n_diag = max(round_up(n_diag, chunk), chunk)
    return wbe.BatchExtdParams(
        n_rows=R, n_diag=n_diag, m=m,
        sc_mch=int(mat[0]), sc_mis=int(mat[1]), sc_N=sc_N,
        q=q, e=e, q2=q2, e2=e2, qe_pre_swap=qe_pre_swap,
        long_thres=int(long_thres), long_diff=int(long_diff),
        zdrop=int(zdrop), flag=int(flag), chunk=chunk, p=P,
        matt=tuple(int(v) for v in mat) if flag & Flag.GENERIC_SC else (),
    ), int(mat[1:].min()), (q, e)


def extd_batch_device(
    query: np.ndarray,
    target: np.ndarray,
    qlen: np.ndarray,
    tlen: np.ndarray,
    m: int,
    mat: np.ndarray,
    q: int,
    e: int,
    q2: int,
    e2: int,
    w: Optional[np.ndarray] = None,
    zdrop: int = -1,
    flag: Flag | int = Flag.SCORE_ONLY,
    interpret: bool = False,
) -> Dict[str, np.ndarray]:
    """Batched two-piece extension, score-only (extd2 semantics).

    Synchronous wrapper over :func:`extd_batch_records`.
    """
    pieces = extd_batch_records(query, target, qlen, tlen, m, mat, q, e,
                                q2, e2, w, zdrop, flag, interpret)
    res = np.concatenate([np.asarray(p) for p in pieces], axis=0)
    mat = np.asarray(mat, dtype=np.int8).reshape(-1)
    # the reference guard consults the canonical (post-swap) gap cost
    qc, ec = (q, e) if q + e <= q2 + e2 else (q2, e2)
    return unpack_records(res, int(mat[1:].min()), int(qc), int(ec))


def extd_batch_records(
    query: np.ndarray,
    target: np.ndarray,
    qlen: np.ndarray,
    tlen: np.ndarray,
    m: int,
    mat: np.ndarray,
    q: int,
    e: int,
    q2: int,
    e2: int,
    w: Optional[np.ndarray] = None,
    zdrop: int = -1,
    flag: Flag | int = Flag.SCORE_ONLY,
    interpret: bool = False,
) -> list:
    """Batched two-piece extension, score-only — async records form.

    See :func:`extz_batch_records` for the records contract.
    """
    flag = Flag(int(flag))
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    if not (flag & Flag.SCORE_ONLY):
        raise ValueError("score-only entry; use extd_batch_align for CIGARs")
    B, Lq = query.shape
    Bt, Lt = target.shape
    assert B == Bt and Lt <= 3072
    P = (Lt + 127) // 128   # rows per pair; any P in 1..24 works
    qlen = np.asarray(qlen, np.int32)
    tlen = np.asarray(tlen, np.int32)
    if w is None:
        w = np.maximum(qlen, tlen)
    w = np.asarray(w, np.int32)
    # effectively-unbanded score-only buckets ride the strip-tiled
    # two-piece engine (full occupancy, no per-diagonal butterfly)
    from .wavefront_strips import strips_extd_eligible, strips_extd_records
    if strips_extd_eligible(qlen, tlen, w, flag, m, mat, zdrop,
                            q, e, q2, e2):
        return strips_extd_records(query, target, qlen, tlen, m, mat,
                                   q, e, q2, e2, zdrop=zdrop, flag=flag,
                                   interpret=interpret)
    if zdrop >= 0 and not (flag & Flag.APPROX_MAX):
        KB = 1 << (5 * P * 128 + 2).bit_length()
        hmax = (int(np.asarray(mat).max())
                * min(int(qlen.max()), int(tlen.max())))
        if (hmax + 1) * KB + KB >= (1 << 31):
            raise ValueError(
                f"scores too large for the packed Z-drop argmax at P={P}")
    # extd carries 2 more state planes than extz; ~576 rows fits (see the
    # extz records comment on occupancy vs conservatism)
    RMAX = max(576 // P // 8 * 8, 8)
    if B > RMAX:
        pieces = []
        for i in range(0, B, RMAX):
            pieces.extend(extd_batch_records(
                query[i:i + RMAX], target[i:i + RMAX], qlen[i:i + RMAX],
                tlen[i:i + RMAX], m, mat, q, e, q2, e2, w[i:i + RMAX],
                zdrop, flag, interpret))
        return pieces

    prm, _min_sc, _qe = _extd_batch_params(
        B, Lq, qlen, tlen, m, mat, q, e, q2, e2, zdrop, flag, wb.CHUNK, P)
    run = _cached_run_extd(prm, interpret)
    Bp = prm.n_rows // P
    qpad = np.zeros((Bp, Lq), np.int8)
    qpad[:B] = np.asarray(query, np.int8)
    tpad = np.zeros((Bp, Lt), np.int8)
    tpad[:B] = np.asarray(target, np.int8)
    lens = np.zeros((3, Bp), np.int32)
    lens[0, :B], lens[1, :B], lens[2, :B] = qlen, tlen, w
    return [run(jnp.asarray(qpad), jnp.asarray(tpad),
                jnp.asarray(lens[0]), jnp.asarray(lens[1]),
                jnp.asarray(lens[2]))[:B]]


def extd_batch_align(
    query: np.ndarray,
    target: np.ndarray,
    qlen: np.ndarray,
    tlen: np.ndarray,
    m: int,
    mat: np.ndarray,
    q: int,
    e: int,
    q2: int,
    e2: int,
    w: Optional[np.ndarray] = None,
    zdrop: int = -1,
    end_bonus: int = 0,
    flag: Flag | int = Flag.NONE,
    interpret: bool = False,
):
    """Batched two-piece extension with CIGARs for short targets."""
    from ..core import cigar as cigarmod
    from ..core.result import ExtzResult
    from ..native.bindings import backtrack

    flag = Flag(int(flag))
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    if flag & Flag.SCORE_ONLY:
        raise ValueError("use extd_batch_device for score-only batches")
    B, Lq = query.shape
    Bt, Lt = target.shape
    assert B == Bt and Lt <= 1536
    P = (Lt + 127) // 128   # rows per pair; any P in 1..12 works
    qlen = np.asarray(qlen, np.int32)
    tlen = np.asarray(tlen, np.int32)
    if w is None:
        w = np.maximum(qlen, tlen)
    w = np.asarray(w, np.int32)
    RMAX = 256 // P
    if B > RMAX:
        out = []
        for i in range(0, B, RMAX):
            out.extend(extd_batch_align(
                query[i:i + RMAX], target[i:i + RMAX], qlen[i:i + RMAX],
                tlen[i:i + RMAX], m, mat, q, e, q2, e2, w[i:i + RMAX],
                zdrop, end_bonus, flag, interpret))
        return out

    prm, min_sc, (qc, ec) = _extd_batch_params(
        B, Lq, qlen, tlen, m, mat, q, e, q2, e2, zdrop, flag, 32, P)
    if -min_sc > 2 * (qc + ec):
        out = []
        for _ in range(B):
            ez = ExtzResult()
            ez.reset()
            out.append(ez)
        return out
    run = _cached_run_extd(prm, interpret, True)
    Bp = prm.n_rows // P
    n_diag = prm.n_diag
    qpad = np.zeros((Bp, Lq), np.int8)
    qpad[:B] = np.asarray(query, np.int8)
    tpad = np.zeros((Bp, Lt), np.int8)
    tpad[:B] = np.asarray(target, np.int8)
    lens = np.zeros((3, Bp), np.int32)
    lens[0, :B], lens[1, :B], lens[2, :B] = qlen, tlen, w
    res, p = run(jnp.asarray(qpad), jnp.asarray(tpad),
                 jnp.asarray(lens[0]), jnp.asarray(lens[1]),
                 jnp.asarray(lens[2]))
    res = np.asarray(res)[:B]

    out = []
    rev = bool(flag & Flag.REV_CIGAR)
    i0a = np.full(B, -1, np.int32)
    j0a = np.full(B, -1, np.int32)
    started = np.zeros(B, bool)
    for b in range(B):
        ez = ExtzResult()
        ez.reset()
        ez.max = int(res[b, wb.F_MAX])
        ez.max_t = int(res[b, wb.F_MAXT])
        ez.max_q = int(res[b, wb.F_MAXQ])
        ez.mqe = int(res[b, wb.F_MQE])
        ez.mqe_t = int(res[b, wb.F_MQET])
        ez.mte = int(res[b, wb.F_MTE])
        ez.mte_q = int(res[b, wb.F_MTEQ])
        ez.score = int(res[b, wb.F_SCORE])
        ez.zdropped = bool(res[b, wb.F_ZDROP])
        out.append(ez)
        qln, tln = int(qlen[b]), int(tlen[b])
        if qln <= 0 or tln <= 0:
            continue
        if not ez.zdropped and not (flag & Flag.EXTZ_ONLY):
            i0a[b], j0a[b] = tln - 1, qln - 1
        elif (not ez.zdropped and (flag & Flag.EXTZ_ONLY)
              and ez.mqe + end_bonus > ez.max):
            ez.reach_end = True
            i0a[b], j0a[b] = ez.mqe_t, qln - 1
        elif ez.max_t >= 0 and ez.max_q >= 0:
            i0a[b], j0a[b] = ez.max_t, ez.max_q
        else:
            continue
        started[b] = True

    if os.environ.get("KSW2_HOST_TB") == "1":
        _host_tb_batch(np.asarray(p), out, qlen, tlen, w, i0a, j0a, started,
                       P, n_diag, rev)
    else:
        from .band_batch import device_walk_cigars
        R = prm.n_rows
        nd128 = ((n_diag + 127) // 128) * 128
        if nd128 != n_diag:
            p = jnp.pad(p, ((0, nd128 - n_diag), (0, 0), (0, 0)))
        cigs = device_walk_cigars(p, R, P, nd128, nd128, qlen, tlen, w,
                                  i0a, j0a, started, rev, interpret)
        for b in range(B):
            out[b].cigar = cigs[b]
    if flag & Flag.EQX:
        for b in range(B):
            if out[b].cigar:
                out[b].cigar = cigarmod.to_eqx(
                    out[b].cigar, query[b][:int(qlen[b])],
                    target[b][:int(tlen[b])])
    return out


@functools.lru_cache(maxsize=128)
def _cached_run_exts(prm, interpret: bool, with_cigar: bool = False):
    from . import wavefront_batch_exts as wbs
    call = wbs.build_batch_exts_call(prm, with_cigar, interpret=interpret)
    R, n_diag = prm.n_rows, prm.n_diag

    P = prm.p
    B = R // P

    def run(query, target, donb, accb, qlen, tlen):
        I = jnp.int32
        qlen = qlen.astype(I)
        tlen = tlen.astype(I)
        ndb = qlen + tlen - 1

        def rep(vec):
            return jnp.repeat(vec, P)[:, None] * jnp.ones((R, 128), I)

        qlp, tlp, rlp = rep(qlen), rep(tlen), rep(ndb)
        tpad = jnp.zeros((B, P * 128), I).at[:, :target.shape[1]].set(
            target.astype(I)).reshape(R, 128)
        rr = jnp.arange(n_diag, dtype=I)[None, :]
        qinj = jnp.repeat(inject_plane(query, qlen, n_diag), P, axis=0)
        args = [qlp, tlp, rlp, tpad, donb.astype(I), accb.astype(I)]
        if prm.flag & int(Flag.GENERIC_SC):
            args.append(profile_planes(
                tpad, prm.matt, prm.m, lambda v: (v + 128) & 255))
        args.append(qinj)
        out = call(*args)
        if with_cigar:
            return out[0][::P, :wb.NFIELDS], out[1]
        return out[0][::P, :wb.NFIELDS]

    return jax.jit(run)


def splice_profiles_batch(target, tlen, N, noncan, flag, junc, junc_bonus):
    """Vectorized per-pair donor/acceptor planes, (B, N) int8.

    Batch equivalent of :func:`ksw2_tpu.spec.diagdiff._splice_profiles`
    (the executable spec keeps its per-base scalar loops; this is the
    production path — 65k python iterations per 128x512 batch otherwise).
    Parity-tested against the spec in tests/test_batch_pallas.py.
    """
    from ..spec.common import c_div

    flag = Flag(int(flag))
    B, Lt = target.shape
    don = np.zeros((B, N), np.int64)
    acc = np.zeros((B, N), np.int64)
    if not (flag & (Flag.SPLICE_FOR | Flag.SPLICE_REV)):
        return don.astype(np.int8), acc.astype(np.int8)
    fwd = bool(flag & Flag.SPLICE_FOR)
    rev = bool(flag & Flag.SPLICE_REV)
    revc = bool(flag & Flag.REV_CIGAR)
    semi = c_div(-noncan, 2) if (flag & Flag.SPLICE_FLANK) else 0
    don[:] = -noncan
    acc[:] = -noncan
    idx = np.arange(N, dtype=np.int64)[None, :]
    tl = np.asarray(tlen, np.int64)[:, None]
    # tp[:, i+k] == t[i+k] with out-of-range == -1 (matches no base)
    tp = np.full((B, N + 4), -1, np.int64)
    tp[:, :Lt] = target
    # tm[:, i+2-k] == t[i-k] (k = 1, 2), same padding
    tm = np.full((B, N + 2), -1, np.int64)
    tm[:, 2:Lt + 2] = target
    t0, t1, t2, t3 = (tp[:, k:k + N] for k in range(4))
    tm1, tm2 = tm[:, 1:N + 1], tm[:, 0:N]

    if not revc:
        dcan1 = ((fwd & (t1 == 2) & (t2 == 3))
                 | (rev & (t1 == 1) & (t2 == 3)))
        dcan2 = dcan1 & ((t3 == 0) | (t3 == 2))
        acan1 = ((fwd & (tm1 == 0) & (t0 == 2))
                 | (rev & (tm1 == 0) & (t0 == 1)))
        acan2 = acan1 & ((tm2 == 1) | (tm2 == 3))
        dbit_f, dbit_r, abit_f, abit_r = 1, 8, 2, 4
    else:
        dcan1 = ((fwd & (t1 == 2) & (t2 == 0))
                 | (rev & (t1 == 1) & (t2 == 0)))
        dcan2 = dcan1 & ((t3 == 1) | (t3 == 3))
        acan1 = ((fwd & (tm1 == 3) & (t0 == 2))
                 | (rev & (tm1 == 3) & (t0 == 1)))
        acan2 = acan1 & ((tm2 == 0) | (tm2 == 2))
        dbit_f, dbit_r, abit_f, abit_r = 2, 4, 1, 8

    din = idx < (tl - 4)
    don = np.where(din & dcan2, 0, np.where(din & dcan1, semi, don))
    ain = (idx >= 2) & (idx < tl)
    acc = np.where(ain & acan2, 0, np.where(ain & acan1, semi, acc))
    if junc is not None:
        jp = np.zeros((B, N + 1), np.int64)
        jp[:, :Lt] = junc
        j1 = jp[:, 1:N + 1]
        j0 = jp[:, 0:N]
        dj = ((fwd & ((j1 & dbit_f) != 0)) | (rev & ((j1 & dbit_r) != 0)))             & (idx < tl - 1)
        aj = ((fwd & ((j0 & abit_f) != 0)) | (rev & ((j0 & abit_r) != 0)))             & (idx < tl)
        don = np.where(dj, don + junc_bonus, don)
        acc = np.where(aj, acc + junc_bonus, acc)
    # int8 wraparound exactly as the spec's _i8
    wrap = lambda x: (((x + 128) & 255) - 128).astype(np.int8)
    return wrap(don), wrap(acc)


def splice_profiles_device(tgt, tlen, N, noncan, flag_int, junc_bonus,
                           junc=None):
    """In-jit port of :func:`splice_profiles_batch`: (B, Lt) int target
    -> raw (B, N) donor/acceptor int32 (pre-bias).  Lets the fused splice
    pipeline derive the profiles from the (4-bit packed) target on
    device instead of uploading two full int8 planes per slice (~1 MB
    per 1024-job workload over a ~30 MB/s link)."""
    from ..spec.common import c_div

    flag = Flag(int(flag_int))
    B, Lt = tgt.shape
    tgt = tgt.astype(jnp.int32)
    if not (flag & (Flag.SPLICE_FOR | Flag.SPLICE_REV)):
        z = jnp.zeros((B, N), jnp.int32)
        return z, z
    fwd = bool(flag & Flag.SPLICE_FOR)
    rev = bool(flag & Flag.SPLICE_REV)
    revc = bool(flag & Flag.REV_CIGAR)
    semi = c_div(-noncan, 2) if (flag & Flag.SPLICE_FLANK) else 0
    idx = jnp.arange(N, dtype=jnp.int32)[None, :]
    tl = tlen.astype(jnp.int32)[:, None]
    tp = jnp.full((B, N + 4), -1, jnp.int32).at[:, :Lt].set(tgt)
    tm = jnp.full((B, N + 2), -1, jnp.int32).at[:, 2:Lt + 2].set(tgt)
    t0, t1, t2, t3 = (tp[:, k:k + N] for k in range(4))
    tm1, tm2 = tm[:, 1:N + 1], tm[:, 0:N]
    if not revc:
        dcan1 = ((fwd & (t1 == 2) & (t2 == 3))
                 | (rev & (t1 == 1) & (t2 == 3)))
        dcan2 = dcan1 & ((t3 == 0) | (t3 == 2))
        acan1 = ((fwd & (tm1 == 0) & (t0 == 2))
                 | (rev & (tm1 == 0) & (t0 == 1)))
        acan2 = acan1 & ((tm2 == 1) | (tm2 == 3))
        dbit_f, dbit_r, abit_f, abit_r = 1, 8, 2, 4
    else:
        dcan1 = ((fwd & (t1 == 2) & (t2 == 0))
                 | (rev & (t1 == 1) & (t2 == 0)))
        dcan2 = dcan1 & ((t3 == 1) | (t3 == 3))
        acan1 = ((fwd & (tm1 == 3) & (t0 == 2))
                 | (rev & (tm1 == 3) & (t0 == 1)))
        acan2 = acan1 & ((tm2 == 0) | (tm2 == 2))
        dbit_f, dbit_r, abit_f, abit_r = 2, 4, 1, 8
    base = jnp.full((B, N), -noncan, jnp.int32)
    din = idx < (tl - 4)
    don = jnp.where(din & dcan2, 0,
                    jnp.where(din & dcan1, semi, base))
    ain = (idx >= 2) & (idx < tl)
    acc = jnp.where(ain & acan2, 0,
                    jnp.where(ain & acan1, semi, base))
    if junc is not None:
        jp = jnp.zeros((B, N + 1), jnp.int32).at[:, :Lt].set(
            junc.astype(jnp.int32))
        j1, j0 = jp[:, 1:N + 1], jp[:, 0:N]
        dj = ((fwd & ((j1 & dbit_f) != 0))
              | (rev & ((j1 & dbit_r) != 0))) & (idx < tl - 1)
        aj = ((fwd & ((j0 & abit_f) != 0))
              | (rev & ((j0 & abit_r) != 0))) & (idx < tl)
        don = jnp.where(dj, don + junc_bonus, don)
        acc = jnp.where(aj, acc + junc_bonus, acc)
    # int8 wraparound as the spec's _i8, kept in int32 lanes
    w8 = lambda x: ((x + 128) & 255) - 128
    return w8(don), w8(acc)


def _exts_batch_prep(B, target, tlen, m, mat, q, e, q2, noncan, flag, junc,
                     junc_bonus, R, P=1):
    """Per-pair donor/acceptor planes (biased) + canonicalized params."""
    from ..spec.common import c_div

    mat = np.asarray(mat, dtype=np.int8).reshape(-1)
    long_thres = c_div(q2 - q, e) - 1
    if q2 > q + e + long_thres * e:
        long_thres += 1
    long_diff = long_thres * e - (q2 - q)
    sc_N = -e if int(mat[m * m - 1]) == 0 else int(mat[m * m - 1])
    dn, ac = splice_profiles_batch(
        np.asarray(target, np.int64), tlen, P * 128, noncan, flag,
        junc, junc_bonus)
    donb = np.full((R, 128), 128, np.int32)
    accb = np.full((R, 128), 128, np.int32)
    donb[:B * P] = ((dn.astype(np.int32) + 128) & 255).reshape(B * P, 128)
    accb[:B * P] = ((ac.astype(np.int32) + 128) & 255).reshape(B * P, 128)
    return mat, long_thres, long_diff, sc_N, donb, accb


def _exts_batch_align_fullfetch(
    query: np.ndarray,
    target: np.ndarray,
    qlen: np.ndarray,
    tlen: np.ndarray,
    m: int,
    mat: np.ndarray,
    q: int,
    e: int,
    q2: int,
    noncan: int,
    zdrop: int = -1,
    junc_bonus: int = 0,
    flag: Flag | int = Flag.NONE,
    junc: Optional[np.ndarray] = None,
    interpret: bool = False,
):
    """Splice batch with full direction-plane fetch + host backtrack.

    Score-only batches and RLE-overflow fallbacks from the device-walker
    pipeline come through here; regular CIGAR batches ride
    :func:`exts_batch_align`.
    """
    from ..core.result import ExtzResult
    from ..native.bindings import backtrack
    from . import wavefront_batch_exts as wbs

    flag = Flag(int(flag))
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    with_cigar = not (flag & Flag.SCORE_ONLY)
    B, Lq = query.shape
    Bt, Lt = target.shape
    assert B == Bt and Lt <= 1536
    P = (Lt + 127) // 128   # rows per pair; any P in 1..12 works
    qlen = np.asarray(qlen, np.int32)
    tlen = np.asarray(tlen, np.int32)
    RMAX = (256 if with_cigar else 384) // P // 8 * 8
    if B > RMAX:
        out = []
        for i in range(0, B, RMAX):
            out.extend(_exts_batch_align_fullfetch(
                query[i:i + RMAX], target[i:i + RMAX], qlen[i:i + RMAX],
                tlen[i:i + RMAX], m, mat, q, e, q2, noncan, zdrop,
                junc_bonus, flag,
                None if junc is None else junc[i:i + RMAX], interpret))
        return out

    q, e, q2, noncan = int(q), int(e), int(q2), int(noncan)
    Bp = pad_rows(B, P)
    R = Bp * P
    matf, long_thres, long_diff, sc_N, donb, accb = _exts_batch_prep(
        B, target, tlen, m, mat, q, e, q2, noncan, flag, junc, junc_bonus,
        R, P)
    min_sc = int(matf[1:].min())
    invalid = (m <= 1 or q2 <= q + e or -min_sc > 2 * (q + e))
    if invalid:
        out = []
        for _ in range(B):
            ez = ExtzResult()
            ez.reset()
            out.append(ez)
        return out

    chunk = 32 if with_cigar else wb.CHUNK
    n_diag = int((qlen + tlen).max()) - 1 if B else 1
    n_diag = max(round_up(n_diag, chunk), chunk)
    prm = wbs.BatchExtsParams(
        n_rows=R, n_diag=n_diag, m=m,
        sc_mch=int(matf[0]), sc_mis=int(matf[1]), sc_N=sc_N,
        q=q, e=e, q2=q2,
        long_thres=int(long_thres), long_diff=int(long_diff),
        zdrop=int(zdrop), flag=int(flag), chunk=chunk, p=P,
        matt=tuple(int(v) for v in matf) if flag & Flag.GENERIC_SC else (),
    )
    run = _cached_run_exts(prm, interpret, with_cigar)
    qpad = np.zeros((Bp, Lq), np.int8)
    qpad[:B] = np.asarray(query, np.int8)
    tpad = np.zeros((Bp, Lt), np.int8)
    tpad[:B] = np.asarray(target, np.int8)
    lens = np.zeros((2, Bp), np.int32)
    lens[0, :B], lens[1, :B] = qlen, tlen
    out_dev = run(jnp.asarray(qpad), jnp.asarray(tpad), jnp.asarray(donb),
                  jnp.asarray(accb), jnp.asarray(lens[0]),
                  jnp.asarray(lens[1]))
    if with_cigar:
        res, p = out_dev
        p = np.asarray(p)
    else:
        res = out_dev
        p = None
    res = np.asarray(res)[:B]

    rr = np.arange(n_diag, dtype=np.int64)[None, :]
    st0 = np.maximum(0, rr - qlen[:, None] + 1)
    en0 = np.minimum(tlen[:, None] - 1, rr)
    stb = (st0 // 16 * 16).astype(np.int32)
    enb = ((en0 + 16) // 16 * 16 - 1).astype(np.int32)
    zero_off = np.zeros(n_diag, np.int32)

    out = []
    rev = bool(flag & Flag.REV_CIGAR)
    for b in range(B):
        ez = ExtzResult()
        ez.reset()
        ez.max = int(res[b, wb.F_MAX])
        ez.max_t = int(res[b, wb.F_MAXT])
        ez.max_q = int(res[b, wb.F_MAXQ])
        ez.mqe = int(res[b, wb.F_MQE])
        ez.mqe_t = int(res[b, wb.F_MQET])
        ez.mte = int(res[b, wb.F_MTE])
        ez.mte_q = int(res[b, wb.F_MTEQ])
        ez.score = int(res[b, wb.F_SCORE])
        ez.zdropped = bool(res[b, wb.F_ZDROP])
        qln, tln = int(qlen[b]), int(tlen[b])
        if not with_cigar or qln <= 0 or tln <= 0:
            out.append(ez)
            continue
        # traceback start (ksw2_exts2_sse.c:407-410)
        if not ez.zdropped and not (flag & Flag.EXTZ_ONLY):
            i0, j0 = tln - 1, qln - 1
        elif ez.max_t >= 0 and ez.max_q >= 0:
            i0, j0 = ez.max_t, ez.max_q
        else:
            out.append(ez)
            continue
        nd = qln + tln - 1
        pmat = np.ascontiguousarray(
            p[:nd, b * P:(b + 1) * P, :]).reshape(nd, P * 128)
        ez.cigar = backtrack(
            pmat, stb[b, :nd], enb[b, :nd], P * 128, i0, j0,
            is_rot=True, is_rev=rev, store_off=zero_off[:nd],
            min_intron_len=long_thres)
        out.append(ez)
    return out


def _cached_tb_starts_exts(flag_int: int):
    """Jitted traceback-start selection for exts (ksw2_exts2_sse.c:407-410):
    corner unless zdropped/EXTZ_ONLY, else the max cell (no end_bonus)."""
    extz_only = bool(flag_int & int(Flag.EXTZ_ONLY))

    def starts(res, qlv, tlv):
        ok = (qlv > 0) & (tlv > 0)
        zd = res[:, wb.F_ZDROP] > 0
        c1 = (jnp.zeros_like(ok) if extz_only
              else ok & jnp.logical_not(zd))
        c2 = ok & (res[:, wb.F_MAXT] >= 0) & (res[:, wb.F_MAXQ] >= 0)
        i0 = jnp.where(c1, tlv - 1, jnp.where(c2, res[:, wb.F_MAXT], -1))
        j0 = jnp.where(c1, qlv - 1, jnp.where(c2, res[:, wb.F_MAXQ], -1))
        return i0.astype(jnp.int32), j0.astype(jnp.int32)

    return jax.jit(starts)


@functools.lru_cache(maxsize=64)
def _cached_cigar_pipeline_exts(prm, B: int, rmax_round: int,
                                interpret: bool):
    """ONE jitted program per splice CIGAR slice: exts forward wavefront ->
    start-cell selection -> N-op-aware device walker -> RLE pack.

    The direction planes never leave the chip; only the packed
    [res | walk ends | run count | RLE runs] records cross the tunnel."""
    from . import traceback_band as tbb
    from .band_batch import _cached_run_band_tb

    P, R, n_diag = prm.p, prm.n_rows, prm.n_diag
    Bp = R // P
    nd128 = round_up(n_diag, 128)
    nd2 = min(nd128, max(128, rmax_round))
    Bpw = -(-Bp // 8) * 8
    tprm = tbb.BandTbParams(n_pairs=Bpw, n_diag=nd2, w=nd2, p=P,
                            min_intron=prm.long_thres)
    fwd = _cached_run_exts(prm, interpret, True)
    tb, MAXR = _cached_run_band_tb(tprm, interpret)
    starts = _cached_tb_starts_exts(prm.flag)

    def pipe(qpad, tpad, donb, accb, l0, l1):
        res, p = fwd(qpad, tpad, donb, accb, l0, l1)
        i0, j0 = starts(res, l0, l1)
        if nd2 > n_diag:
            p = jnp.pad(p, ((0, nd2 - n_diag), (0, 0), (0, 0)))
        elif nd2 < n_diag:
            p = p[:nd2]
        if Bpw != Bp:
            p = jnp.pad(p, ((0, 0), (0, (Bpw - Bp) * P), (0, 0)))
            i0 = jnp.pad(i0, (0, Bpw - Bp), constant_values=-1)
            j0 = jnp.pad(j0, (0, Bpw - Bp), constant_values=-1)
            l0 = jnp.pad(l0, (0, Bpw - Bp))
            l1 = jnp.pad(l1, (0, Bpw - Bp))
        wv = jnp.maximum(l0 + l1, 1)       # exts has no band: w covers all r
        ends, runs, cnt, _ops8 = tb(p, l0, l1, wv, i0, j0)
        return jnp.concatenate(
            [res[:B], ends[:B], cnt[:B, None].astype(jnp.int32),
             runs[:B]], axis=1)

    return jax.jit(pipe), MAXR


def exts_batch_align_dispatch(
    query, target, qlen, tlen, m, mat, q, e, q2, noncan, zdrop=-1,
    junc_bonus=0, flag=Flag.NONE, junc=None, interpret=False, defer=False,
):
    """Async splice CIGAR batch: dispatch all device work, fetch nothing.

    Returns slice dicts for :func:`_cigar_batch_finish_exts` / the
    scheduler's single-fetch pipeline (same routing as
    :func:`exts_batch_align`)."""
    from . import wavefront_batch_exts as wbs

    flag = Flag(int(flag))
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    if flag & Flag.SCORE_ONLY:
        raise ValueError("score-only splice batches have no CIGAR dispatch")
    B, Lq = query.shape
    Bt, Lt = target.shape
    assert B == Bt and Lt <= 1536
    P = (Lt + 127) // 128
    qlen = np.asarray(qlen, np.int32)
    tlen = np.asarray(tlen, np.int32)
    # the async pipeline never holds two slices' direction planes at once
    # (the walker donates them), so it can run wider than the full-fetch path
    RMAX = 384 // P // 8 * 8
    if B > RMAX:
        slices = []
        for i in range(0, B, RMAX):
            slices.extend(exts_batch_align_dispatch(
                query[i:i + RMAX], target[i:i + RMAX], qlen[i:i + RMAX],
                tlen[i:i + RMAX], m, mat, q, e, q2, noncan, zdrop,
                junc_bonus, flag,
                None if junc is None else junc[i:i + RMAX], interpret,
                defer))
        return slices

    q, e, q2, noncan = int(q), int(e), int(q2), int(noncan)
    Bp = pad_rows(B, P)
    R = Bp * P
    matf, long_thres, long_diff, sc_N, donb, accb = _exts_batch_prep(
        B, target, tlen, m, mat, q, e, q2, noncan, flag, junc, junc_bonus,
        R, P)
    min_sc = int(matf[1:].min())
    if m <= 1 or q2 <= q + e or -min_sc > 2 * (q + e):
        return [{"guard": True, "B": B, "args": None}]

    chunk = 32
    n_diag = int((qlen + tlen).max()) - 1 if B else 1
    n_diag = max(round_up(n_diag, chunk), chunk)
    prm = wbs.BatchExtsParams(
        n_rows=R, n_diag=n_diag, m=m,
        sc_mch=int(matf[0]), sc_mis=int(matf[1]), sc_N=sc_N,
        q=q, e=e, q2=q2,
        long_thres=int(long_thres), long_diff=int(long_diff),
        zdrop=int(zdrop), flag=int(flag), chunk=chunk, p=P,
        matt=tuple(int(v) for v in matf) if flag & Flag.GENERIC_SC else (),
    )
    rmax = max(int((qlen + tlen).max()) - 2, 0)
    rmax_round = -(-(rmax + 1) // 1024) * 1024   # bound compiled variants
    pipe, MAXR = _cached_cigar_pipeline_exts(prm, B, rmax_round, interpret)
    qpad = np.zeros((Bp, Lq), np.int8)
    qpad[:B] = np.asarray(query, np.int8)
    tpad = np.zeros((Bp, Lt), np.int8)
    tpad[:B] = np.asarray(target, np.int8)
    lens = np.zeros((2, Bp), np.int32)
    lens[0, :B], lens[1, :B] = qlen, tlen
    d = {"MAXR": MAXR, "B": B, "min_intron": int(long_thres),
         "args": (query, target, qlen, tlen, junc)}
    if defer:
        jpad = None
        if junc is not None:
            jpad = np.zeros((Bp, Lt), np.uint8)
            jpad[:B] = np.asarray(junc, np.uint8)
        d["pending"] = {
            "pipe_key": ("s", prm, B, rmax_round, Lq, Lt, int(noncan),
                         int(junc_bonus), junc is not None),
            "arrs": (qpad, tpad, lens, jpad), "MAXR": MAXR}
        return [d]
    packed = pipe(jnp.asarray(qpad), jnp.asarray(tpad), jnp.asarray(donb),
                  jnp.asarray(accb), jnp.asarray(lens[0]),
                  jnp.asarray(lens[1]))
    d["packed"] = packed
    return [d]


def exts_batch_records(
    query, target, qlen, tlen, m, mat, q, e, q2, noncan, zdrop=-1,
    junc_bonus=0, flag=Flag.NONE, junc=None, interpret=False,
):
    """Score-only splice batch, async: dispatch only, nothing fetched.

    Returns slice dicts ``{"res": device (B, NFIELDS) records, "B": n}``
    (or ``{"guard": True}``); the caller concatenates every bucket's
    records and fetches once."""
    from . import wavefront_batch_exts as wbs

    flag = Flag(int(flag))
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    assert flag & Flag.SCORE_ONLY
    B, Lq = query.shape
    Bt, Lt = target.shape
    assert B == Bt and Lt <= 1536
    P = (Lt + 127) // 128
    qlen = np.asarray(qlen, np.int32)
    tlen = np.asarray(tlen, np.int32)
    RMAX = 384 // P // 8 * 8
    if B > RMAX:
        slices = []
        for i in range(0, B, RMAX):
            slices.extend(exts_batch_records(
                query[i:i + RMAX], target[i:i + RMAX], qlen[i:i + RMAX],
                tlen[i:i + RMAX], m, mat, q, e, q2, noncan, zdrop,
                junc_bonus, flag,
                None if junc is None else junc[i:i + RMAX], interpret))
        return slices

    q, e, q2, noncan = int(q), int(e), int(q2), int(noncan)
    Bp = pad_rows(B, P)
    R = Bp * P
    matf, long_thres, long_diff, sc_N, donb, accb = _exts_batch_prep(
        B, target, tlen, m, mat, q, e, q2, noncan, flag, junc, junc_bonus,
        R, P)
    min_sc = int(matf[1:].min())
    if m <= 1 or q2 <= q + e or -min_sc > 2 * (q + e):
        return [{"guard": True, "B": B}]
    n_diag = int((qlen + tlen).max()) - 1 if B else 1
    n_diag = max(round_up(n_diag, wb.CHUNK), wb.CHUNK)
    prm = wbs.BatchExtsParams(
        n_rows=R, n_diag=n_diag, m=m,
        sc_mch=int(matf[0]), sc_mis=int(matf[1]), sc_N=sc_N,
        q=q, e=e, q2=q2,
        long_thres=int(long_thres), long_diff=int(long_diff),
        zdrop=int(zdrop), flag=int(flag), chunk=wb.CHUNK, p=P,
        matt=tuple(int(v) for v in matf) if flag & Flag.GENERIC_SC else (),
    )
    run = _cached_run_exts(prm, interpret, False)
    qpad = np.zeros((Bp, Lq), np.int8)
    qpad[:B] = np.asarray(query, np.int8)
    tpad = np.zeros((Bp, Lt), np.int8)
    tpad[:B] = np.asarray(target, np.int8)
    lens = np.zeros((2, Bp), np.int32)
    lens[0, :B], lens[1, :B] = qlen, tlen
    res = run(jnp.asarray(qpad), jnp.asarray(tpad), jnp.asarray(donb),
              jnp.asarray(accb), jnp.asarray(lens[0]),
              jnp.asarray(lens[1]))
    return [{"res": res[:B], "B": B}]


def _cigar_batch_finish_exts(fetched, MAXR, B, qlen, tlen, flag,
                             min_intron):
    """Host side of the async splice pipeline.

    Returns the ExtzResult list with CIGARs (N ops for introns), or
    ``None`` when a pair overflowed the device RLE compaction (caller
    re-runs that slice through the full-fetch path)."""
    from ..core.result import ExtzResult
    from .traceback_band import finish_band_cigars_runs

    flag = Flag(int(flag))
    res = fetched[:, :NFIELDS_REC]
    ends = fetched[:, NFIELDS_REC:NFIELDS_REC + 2]
    cnt = fetched[:, NFIELDS_REC + 2]
    runs = fetched[:, NFIELDS_REC + 3:]
    out = []
    started = np.zeros(B, bool)
    for b in range(B):
        ez = ExtzResult()
        ez.reset()
        ez.max = int(res[b, wb.F_MAX])
        ez.max_t = int(res[b, wb.F_MAXT])
        ez.max_q = int(res[b, wb.F_MAXQ])
        ez.mqe = int(res[b, wb.F_MQE])
        ez.mqe_t = int(res[b, wb.F_MQET])
        ez.mte = int(res[b, wb.F_MTE])
        ez.mte_q = int(res[b, wb.F_MTEQ])
        ez.score = int(res[b, wb.F_SCORE])
        ez.zdropped = bool(res[b, wb.F_ZDROP])
        out.append(ez)
        qln, tln = int(qlen[b]), int(tlen[b])
        if qln <= 0 or tln <= 0:
            continue
        if not ez.zdropped and not (flag & Flag.EXTZ_ONLY):
            started[b] = True
        elif ez.max_t >= 0 and ez.max_q >= 0:
            started[b] = True
    if (cnt[started] > MAXR).any():
        return None          # degenerate: re-run this slice synchronously
    rev = bool(flag & Flag.REV_CIGAR)
    cigs = finish_band_cigars_runs(runs, cnt.astype(np.int64), ends[:, 0],
                                   ends[:, 1], rev, started,
                                   min_intron=min_intron)
    for b in range(B):
        out[b].cigar = cigs[b]
    return out


def exts_batch_align(
    query: np.ndarray,
    target: np.ndarray,
    qlen: np.ndarray,
    tlen: np.ndarray,
    m: int,
    mat: np.ndarray,
    q: int,
    e: int,
    q2: int,
    noncan: int,
    zdrop: int = -1,
    junc_bonus: int = 0,
    flag: Flag | int = Flag.NONE,
    junc: Optional[np.ndarray] = None,
    interpret: bool = False,
):
    """Batched spliced extension; CIGARs unless SCORE_ONLY is set.

    CIGAR batches ride the device-walker pipeline (direction planes stay
    on the chip; only packed RLE records are fetched); a slice whose RLE
    compaction overflows falls back to the full-fetch host backtrack."""
    from ..core.result import ExtzResult

    flag = Flag(int(flag))
    if flag & Flag.SCORE_ONLY:
        return _exts_batch_align_fullfetch(
            query, target, qlen, tlen, m, mat, q, e, q2, noncan, zdrop,
            junc_bonus, flag, junc, interpret)
    qlen = np.asarray(qlen, np.int32)
    tlen = np.asarray(tlen, np.int32)
    slices = exts_batch_align_dispatch(
        query, target, qlen, tlen, m, mat, q, e, q2, noncan, zdrop,
        junc_bonus, flag, junc, interpret)
    out = []
    for s in slices:
        B = s["B"]
        if s.get("guard"):
            for _ in range(B):
                ez = ExtzResult()
                ez.reset()
                out.append(ez)
            continue
        Qs, Ts, qls, tls, jn = s["args"]
        fetched = np.asarray(s["packed"])
        res = _cigar_batch_finish_exts(fetched, s["MAXR"], B, qls, tls,
                                       flag, s["min_intron"])
        if res is None:       # RLE overflow: sync re-run with full fetch
            res = _exts_batch_align_fullfetch(
                Qs, Ts, qls, tls, m, mat, q, e, q2, noncan, zdrop,
                junc_bonus, flag, jn, interpret)
        out.extend(res)
    return out


@functools.lru_cache(maxsize=64)
def _cached_run_extf(prm, interpret: bool):
    from . import wavefront_batch_extf as wbf
    call = wbf.build_batch_extf_call(prm, interpret=interpret)
    R, n_diag, P = prm.n_rows, prm.n_diag, prm.p
    B = R // P

    def run(query, target, qlen, tlen, w):
        I = jnp.int32
        qlen = qlen.astype(I)
        tlen = tlen.astype(I)
        w = w.astype(I)
        # first empty-band diagonal, closed form (validated against the
        # bruteforce bounds scan over 200k random (qlen, tlen, w))
        ndb = qlen + tlen - 1
        rlim = jnp.minimum(
            jnp.minimum(ndb, 2 * qlen + w - 1),
            jnp.minimum(2 * tlen + w - 1,
                        jnp.where(w == 0, 1, ndb))).astype(I)
        rr = jnp.arange(n_diag, dtype=I)[None, :]

        def rep(vec):
            return jnp.repeat(vec, P)[:, None] * jnp.ones((R, 128), I)

        qlp, tlp, wpl, rlp = rep(qlen), rep(tlen), rep(w), rep(rlim)
        tpad = jnp.zeros((B, P * 128), I).at[:, :target.shape[1]].set(
            target.astype(I)).reshape(R, 128)
        qinj = jnp.repeat(inject_plane(query, qlen, n_diag), P, axis=0)
        out = call(qlp, tlp, wpl, rlp, tpad, qinj)
        return out[0][::P, :wb.NFIELDS]

    return jax.jit(run)


def extf_batch_device(
    query: np.ndarray,
    target: np.ndarray,
    qlen: np.ndarray,
    tlen: np.ndarray,
    mch: int,
    mis: int,
    e: int,
    w: Optional[np.ndarray] = None,
    xdrop: int = -1,
    interpret: bool = False,
) -> Dict[str, np.ndarray]:
    """Batched linear-gap extension (extf2), score-only."""
    from . import wavefront_batch_extf as wbf

    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    B, Lq = query.shape
    Bt, Lt = target.shape
    assert B == Bt and Lt <= 1536
    P = (Lt + 127) // 128   # rows per pair; any P in 1..12 works
    qlen = np.asarray(qlen, np.int32)
    tlen = np.asarray(tlen, np.int32)
    if w is None:
        w = np.maximum(qlen, tlen)
    w = np.asarray(w, np.int32)
    RMAX = 512 // P // 8 * 8
    if B > RMAX:
        outs = [
            extf_batch_device(query[i:i + RMAX], target[i:i + RMAX],
                              qlen[i:i + RMAX], tlen[i:i + RMAX], mch, mis,
                              e, w[i:i + RMAX], xdrop, interpret)
            for i in range(0, B, RMAX)
        ]
        return {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}
    mis = int(mis) if int(mis) < 0 else -int(mis)
    Bp = pad_rows(B, P)
    R = Bp * P
    n_diag = int((qlen + tlen).max()) - 1 if B else 1
    n_diag = max(round_up(n_diag, wb.CHUNK), wb.CHUNK)
    prm = wbf.BatchExtfParams(
        n_rows=R, n_diag=n_diag, mch=int(mch), mis=mis, e=int(e),
        xdrop=int(xdrop), p=P,
    )
    run = _cached_run_extf(prm, interpret)
    qpad = np.zeros((Bp, Lq), np.int8)
    qpad[:B] = np.asarray(query, np.int8)
    tpad = np.zeros((Bp, Lt), np.int8)
    tpad[:B] = np.asarray(target, np.int8)
    lens = np.zeros((3, Bp), np.int32)
    lens[0, :B], lens[1, :B], lens[2, :B] = qlen, tlen, w
    res = np.asarray(run(jnp.asarray(qpad), jnp.asarray(tpad),
                         jnp.asarray(lens[0]), jnp.asarray(lens[1]),
                         jnp.asarray(lens[2])))[:B]
    return {
        "max": res[:, wb.F_MAX].copy(),
        "max_t": res[:, wb.F_MAXT].copy(),
        "max_q": res[:, wb.F_MAXQ].copy(),
        "score": res[:, wb.F_SCORE].copy(),
        "zdropped": res[:, wb.F_ZDROP].copy(),
    }


@functools.lru_cache(maxsize=64)
def _cached_run_gg2(prm, interpret: bool, with_cigar: bool):
    from . import wavefront_batch_gg2 as wbg
    call = wbg.build_batch_gg2_call(prm, with_cigar, interpret=interpret)
    R, n_diag, P = prm.n_rows, prm.n_diag, prm.p
    B = R // P

    def run(query, target, qlen, tlen, w):
        I = jnp.int32
        qlen = qlen.astype(I)
        tlen = tlen.astype(I)
        w = w.astype(I)
        rr = jnp.arange(n_diag, dtype=I)[None, :]

        def rep(vec):
            return jnp.repeat(vec, P)[:, None] * jnp.ones((R, 128), I)

        qlp, tlp, wpl = rep(qlen), rep(tlen), rep(w)
        tpad = jnp.zeros((B, P * 128), I).at[:, :target.shape[1]].set(
            target.astype(I)).reshape(R, 128)
        qinj = jnp.repeat(inject_plane(query, qlen, n_diag), P, axis=0)
        qe2x = 2 * (prm.q + prm.e)
        prof = profile_planes(tpad, prm.matt, prm.m,
                              lambda v: ((v + qe2x) & 255) ^ 128)
        out = call(qlp, tlp, wpl, tpad, prof, qinj)
        if with_cigar:
            return out[0][::P, :1], out[1]
        return out[0][::P, :1]

    return jax.jit(run)


def gg2_batch_align(
    query: np.ndarray,
    target: np.ndarray,
    qlen: np.ndarray,
    tlen: np.ndarray,
    m: int,
    mat: np.ndarray,
    q: int,
    e: int,
    w: Optional[np.ndarray] = None,
    with_cigar: bool = True,
    interpret: bool = False,
):
    """Batched banded global alignment (gg2_sse); returns (score, cigar)
    per pair (cigar ``[]`` in score-only mode).

    Pairs with ``qlen > tlen + w`` hit the reference's block-overrun quirk
    (ksw2_gg2_sse.c:32-34) and must go through the single-pair kernel.
    """
    from .bands import band_bounds_rounded
    from ..native.bindings import backtrack

    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    B, Lq = query.shape
    Bt, Lt = target.shape
    assert B == Bt and Lt <= 1536
    P = (Lt + 127) // 128   # rows per pair; any P in 1..12 works
    qlen = np.asarray(qlen, np.int32)
    tlen = np.asarray(tlen, np.int32)
    if w is None:
        w = np.maximum(qlen, tlen)
    w = np.asarray(w, np.int32)
    if (qlen > tlen + w).any():
        raise ValueError("qlen > tlen + w pairs need the single-pair gg2")
    RMAX = (256 if with_cigar else 512) // P // 8 * 8
    if B > RMAX:
        out = []
        for i in range(0, B, RMAX):
            out.extend(gg2_batch_align(
                query[i:i + RMAX], target[i:i + RMAX], qlen[i:i + RMAX],
                tlen[i:i + RMAX], m, mat, q, e, w[i:i + RMAX], with_cigar,
                interpret))
        return out
    from . import wavefront_batch_gg2 as wbg
    mat = np.asarray(mat, dtype=np.int8).reshape(-1)
    Bp = pad_rows(B, P)
    R = Bp * P
    n_diag = int((qlen + tlen).max()) - 1 if B else 1
    chunk = 32 if with_cigar else wb.CHUNK
    n_diag = max(round_up(n_diag, chunk), chunk)
    prm = wbg.BatchGg2Params(
        n_rows=R, n_diag=n_diag, m=m, q=int(q), e=int(e), chunk=chunk, p=P,
        matt=tuple(int(v) for v in mat),
    )
    run = _cached_run_gg2(prm, interpret, with_cigar)
    qpad = np.zeros((Bp, Lq), np.int8)
    qpad[:B] = np.asarray(query, np.int8)
    tpad = np.zeros((Bp, Lt), np.int8)
    tpad[:B] = np.asarray(target, np.int8)
    lens = np.zeros((3, Bp), np.int32)
    lens[0, :B], lens[1, :B], lens[2, :B] = qlen, tlen, w
    out_dev = run(jnp.asarray(qpad), jnp.asarray(tpad),
                  jnp.asarray(lens[0]), jnp.asarray(lens[1]),
                  jnp.asarray(lens[2]))
    if with_cigar:
        res, p = out_dev
        p = np.asarray(p)
    else:
        res = out_dev
        p = None
    res = np.asarray(res)[:B, 0]

    out = []
    for b in range(B):
        score = int(res[b])
        qln, tln, wb_ = int(qlen[b]), int(tlen[b]), int(w[b])
        if not with_cigar or qln <= 0 or tln <= 0:
            out.append((score, []))
            continue
        nd = qln + tln - 1
        st0, en0, st, en = band_bounds_rounded(nd, qln, tln, wb_)
        n_col0 = min(wb_ + 1, tln)
        n_col = ((n_col0 + 15) // 16 + 1) * 16
        pmat = np.ascontiguousarray(
            p[:nd, b * P:(b + 1) * P, :]).reshape(nd, P * 128)
        # repack to the reference's n_col-wide rows: gg2's traceback has no
        # upper clamp, so overflow reads must land on the next row's bytes
        pspec = np.zeros((nd, n_col), np.int8)
        for r in range(nd):
            lo = int(st[r])
            span = min(n_col, P * 128 - lo)
            pspec[r, :span] = pmat[r, lo:lo + span]
        cig = backtrack(pspec, st, None, n_col, tln - 1, qln - 1,
                        is_rot=True, store_off=st)
        out.append((score, cig))
    return out
