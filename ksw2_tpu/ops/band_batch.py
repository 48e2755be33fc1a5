"""Host wrapper for the band-relative batched engine (long banded pairs).

``extz_band_batch_device`` scores a batch of LONG banded extension pairs
(one-piece gap cost, exact max / Z-drop, score-only) in one kernel launch:
each pair occupies P sublane rows whose lanes hold *band-relative* target
positions, so a 50 kb pair with minimap2's w=751 needs 8 rows instead of
391 — 64 pairs advance per anti-diagonal step instead of 1, amortizing the
per-diagonal latency floor of the wavefront recurrence.

All heavy derived arrays (query/target injection streams, stopping
diagonals) are computed on device inside one jitted program from the
compact int8 sequences.  See :mod:`ksw2_tpu.ops.wavefront_band` for the
coordinate system.
"""
from __future__ import annotations

import functools
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..core.flags import NEG_INF, Flag
from . import wavefront_band as wband
from . import wavefront_batch as wb
from .bands import pad_rows, round_up


def _pick_p(wmax: int) -> int:
    for p in range(1, 13):
        if wmax <= p * 128 - 64:
            return p
    raise ValueError(f"band cap {wmax} too wide for the band engine")


def _tinj_layout(n_steps: int, n_diag: int, W: int, P: int):
    """Static (IDX, MASK) for the jump target-injection plane.

    Column ``s*128 + 32*slot + i`` of the plane holds target char
    ``orgv[r_k] + P*128 - 16 + i`` for the jump diagonal ``r_k`` falling in
    grid step ``s`` at in-step slot ``slot`` (jumps recur every 32
    diagonals; 128/32 = 4 slots per step).
    """
    q032 = (W - 1) % 32
    IDX = np.zeros(n_steps * 128, np.int32)
    MASK = np.zeros(n_steps * 128, bool)
    k = 2
    while True:
        r_k = W - 1 + 32 * k
        if r_k >= n_diag:
            break
        s_, slot = r_k // 128, (r_k % 128 - q032) // 32
        base = s_ * 128 + 32 * slot
        org_new = 16 * (k - 1)
        IDX[base:base + 16] = org_new + P * 128 - 16 + np.arange(16)
        MASK[base:base + 16] = True
        k += 1
    return IDX, MASK


def _make_band_run(call, prm, with_cigar=False):
    R, n_diag, P, W = prm.n_rows, prm.n_diag, prm.p, prm.w
    B = R // P
    n_steps128 = (n_diag + wb.CHUNK - 1) // wb.CHUNK   # tinj is CHUNK-blocked
    orgv = wband.org_schedule(n_diag, W)
    IDX, MASK = _tinj_layout(n_steps128, n_diag, W, P)
    t_need = int(orgv[-1]) + P * 128       # highest target index gathered

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
        tw = max(t_need, target.shape[1])      # gather + init both in range
        tpad = jnp.zeros((B, tw), I).at[:, :target.shape[1]].set(
            target.astype(I))
        tinit = tpad[:, :P * 128].reshape(R, 128)
        qidx = jnp.clip(rr - jnp.asarray(orgv)[None, :], 0,
                        jnp.maximum(qlen - 1, 0)[:, None])
        qinj = jnp.repeat(
            jnp.take_along_axis(query.astype(I), qidx, axis=1), P, axis=0)
        tinj = jnp.where(jnp.asarray(MASK)[None, :],
                         tpad[:, jnp.asarray(IDX)], 0)
        tinj = jnp.repeat(tinj, P, axis=0)
        out = call(qlp, tlp, wpl, rlp, tinit, qinj, tinj)
        if with_cigar:
            return out[0][::P, :wb.NFIELDS], out[1]
        return out[0][::P, :wb.NFIELDS]

    return jax.jit(run)


@functools.lru_cache(maxsize=64)
def _cached_run_band_tb(prm, interpret: bool):
    from . import traceback_band as tbb
    call = tbb.build_band_tb_call(prm, interpret=interpret)
    Bp, P, n_diag = prm.n_pairs, prm.p, prm.n_diag
    MAXR = min(n_diag, 8192, max(256, n_diag // 8))

    def run(p, qlen, tlen, w, i0, j0):
        I = jnp.int32

        def rep(vec):
            return vec.astype(I)[:, None] * jnp.ones((Bp, 128), I)

        if P > 1:
            # pair-major forward planes -> chunk-major for the walker's
            # (Bp,128) state layout; one HBM-bandwidth transpose
            nd = p.shape[0]
            p = jnp.transpose(p.reshape(nd, Bp, P, 128),
                              (0, 2, 1, 3)).reshape(nd, P * Bp, 128)
        res, ops8 = call(rep(qlen), rep(tlen), rep(w), rep(i0), rep(j0), p)
        # device-side RLE over each pair's visited ops in WALK order
        # (descending r), so only ~MAXR runs per pair leave the device
        arr = jnp.transpose(ops8, (1, 0, 2)).reshape(Bp, -1)
        opw = (arr[:, ::-1].astype(I)) & 255
        vis = opw != 255
        k = jnp.arange(n_diag, dtype=I)[None, :]
        packed = jnp.where(vis, k * 4 + (opw & 3), -1)
        cm = jax.lax.cummax(packed, axis=1)
        prev = jnp.concatenate(
            [jnp.full((Bp, 1), -1, I), cm[:, :-1]], axis=1)
        bnd = vis & ((prev < 0) | ((prev & 3) != (opw & 3)))
        cnt = jnp.sum(bnd.astype(I), axis=1)
        v = jnp.cumsum(vis.astype(I), axis=1)
        big = jnp.asarray(n_diag, I)
        negpos, _ = jax.lax.top_k(jnp.where(bnd, -k, -big - 1), MAXR)
        bpos = -negpos                        # ascending boundary positions
        bposc = jnp.minimum(bpos, n_diag - 1)
        startc = jnp.take_along_axis(v, bposc, axis=1) - 1
        nextc = jnp.concatenate(
            [startc[:, 1:], jnp.zeros((Bp, 1), I)], axis=1)
        idx = jnp.arange(MAXR, dtype=I)[None, :]
        totv = v[:, -1][:, None]
        nextc = jnp.where(idx + 1 >= cnt[:, None], totv, nextc)
        # pack (len, op) as len<<2|op: one array crosses the tunnel
        runs = jnp.where(
            idx < cnt[:, None],
            (nextc - startc) * 4
            + (jnp.take_along_axis(opw, bposc, axis=1) & 3), 0)
        return res[:, :2], runs, cnt, ops8

    # donate p: the walker's chunk-major transpose would otherwise hold
    # two full copies of the direction planes (GBs for long pairs).  CPU
    # interpret runs cannot use donation (warns) - only donate compiled.
    donate = () if interpret else (0,)
    return jax.jit(run, donate_argnums=donate), MAXR


def device_walk_runs(p, R, P, n_diag, W, qlen, tlen, w, i0_dev, j0_dev,
                     rmax_bound, interpret):
    """Async walker dispatch: start cells live on device, nothing fetched.

    ``i0_dev``/``j0_dev`` are (B,) device arrays (-1 = not started) as
    produced by the device-side traceback-start selection; ``rmax_bound``
    is a host upper bound on i0+j0 (e.g. max(qlen+tlen-2) over the batch)
    used for the static dead-block trim.  Returns
    ``(ends, runs, cnt, MAXR, n_kept)`` where the first three are device
    arrays — the caller fetches them (typically concatenated with other
    buckets' records in ONE transfer) and assembles CIGARs with
    :func:`ksw2_tpu.ops.traceback_band.finish_band_cigars_runs`.
    """
    from . import traceback_band as tbb

    Bp = R // P
    if Bp % 8:                      # walker state is one sublane row/pair
        Bp2 = -(-Bp // 8) * 8
        p = jnp.pad(p, ((0, 0), (0, Bp2 * P - R), (0, 0)))
        i0_dev = jnp.pad(i0_dev, (0, Bp2 - Bp), constant_values=-1)
        j0_dev = jnp.pad(j0_dev, (0, Bp2 - Bp), constant_values=-1)
        qlen = np.pad(qlen, (0, Bp2 - Bp))
        tlen = np.pad(tlen, (0, Bp2 - Bp))
        w = np.pad(w, (0, Bp2 - Bp), constant_values=1)
        Bp = Bp2
    nd2 = min(n_diag, max(128, -(-(int(rmax_bound) + 1) // 1024) * 1024))
    if nd2 < n_diag:
        p = p[:nd2]
        n_diag = nd2
    prm = tbb.BandTbParams(n_pairs=Bp, n_diag=n_diag, w=W, p=P)
    run, MAXR = _cached_run_band_tb(prm, interpret)
    lens = np.zeros((3, Bp), np.int32)
    lens[0, :len(qlen)], lens[1, :len(qlen)] = qlen, tlen
    lens[2, :len(qlen)] = np.maximum(w, 1)
    lens[2, len(qlen):] = 1
    ends, runs, cnt, _ops8 = run(
        p, jnp.asarray(lens[0]), jnp.asarray(lens[1]),
        jnp.asarray(lens[2]), i0_dev, j0_dev)
    del _ops8   # only the overflow fallback needs it; drop the HBM ref
    return ends, runs, cnt, MAXR, Bp


def device_walk_cigars(p, R, P, n_diag, W, qlen, tlen, w, i0, j0, started,
                       rev, interpret):
    """Walk all pairs' tracebacks on device; only compact RLE runs + walk
    ends come back.

    Works for both plane layouts: band-relative (``W`` = the shared band
    cap driving the drifting origin) and plain t-coordinate (pass
    ``W >= n_diag`` so the origin schedule stays pinned at 0).  ``n_diag``
    must be a multiple of 128 (pad ``p`` with anything; padded diagonals
    are above every walk start and never touched).
    """
    from . import traceback_band as tbb

    Bp = R // P
    if Bp % 8:                      # walker state is one sublane row/pair
        Bp = -(-Bp // 8) * 8
        p = jnp.pad(p, ((0, 0), (0, Bp * P - R), (0, 0)))
    i0p = np.full(Bp, -1, np.int32)
    j0p = np.full(Bp, -1, np.int32)
    i0p[:len(i0)] = i0
    j0p[:len(j0)] = j0
    # every walk starts at diagonal i0+j0 and only descends, so blocks
    # above the highest start are dead: trim them (big win for zdropped /
    # early-max pairs).  org(r) depends only on (r, W) - the kept prefix
    # is untouched.  Rounded to 1024 to bound compiled walker variants.
    rmax = int(np.max(i0p + j0p, initial=-1))
    nd2 = min(n_diag, max(128, -(-(rmax + 1) // 1024) * 1024))
    if nd2 < n_diag:
        p = p[:nd2]
        n_diag = nd2
    prm = tbb.BandTbParams(n_pairs=Bp, n_diag=n_diag, w=W, p=P)
    run, MAXR = _cached_run_band_tb(prm, interpret)
    lens = np.zeros((3, Bp), np.int32)
    lens[0, :len(qlen)], lens[1, :len(qlen)] = qlen, tlen
    lens[2, :len(qlen)] = w
    lens[2, len(qlen):] = 1
    res2, runs, cnt, ops8 = run(
        p, jnp.asarray(lens[0]), jnp.asarray(lens[1]),
        jnp.asarray(lens[2]), jnp.asarray(i0p), jnp.asarray(j0p))
    res2, runs, cnt = jax.device_get((res2, runs, cnt))
    if (cnt[:len(started)][started] > MAXR).any():
        # compaction overflow (degenerate alignments): fall back to the
        # full ops-by-diagonal fetch
        ops8 = np.asarray(ops8)
        return tbb.finish_band_cigars(ops8, res2[:, 0], res2[:, 1],
                                      rev, started)
    return tbb.finish_band_cigars_runs(runs, cnt, res2[:, 0],
                                       res2[:, 1], rev, started)


@functools.lru_cache(maxsize=64)
def _cached_run_band(prm: wband.BandParams, interpret: bool,
                     with_cigar: bool = False):
    return _make_band_run(
        wband.build_band_call(prm, with_cigar, interpret=interpret),
        prm, with_cigar)


@functools.lru_cache(maxsize=64)
def _cached_run_band_extd(prm, interpret: bool, with_cigar: bool = False):
    from . import wavefront_band_extd as wbe
    return _make_band_run(
        wbe.build_band_extd_call(prm, with_cigar, interpret=interpret),
        prm, with_cigar)


def extz_band_batch_records(
    query: np.ndarray,        # (B, Lq) int encoded, zero-padded
    target: np.ndarray,       # (B, Lt) int encoded
    qlen: np.ndarray,
    tlen: np.ndarray,
    m: int,
    mat: np.ndarray,
    q: int,
    e: int,
    w: np.ndarray,            # (B,) band widths, 1 <= w <= 1472
    zdrop: int = -1,
    flag: Flag | int = Flag.SCORE_ONLY,
    interpret: bool = False,
) -> list:
    """Banded batched one-piece extension, score-only — async records form.

    Like :func:`ksw2_tpu.ops.batch_pallas.extz_batch_records`: returns a
    list of device (B_i, NFIELDS) int32 record arrays without fetching.
    """
    flag = Flag(int(flag))
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    if not (flag & Flag.SCORE_ONLY):
        raise ValueError("band engine is score-only; use extz2_device")
    B, Lq = query.shape
    Bt, Lt = target.shape
    assert B == Bt
    qlen = np.asarray(qlen, np.int32)
    tlen = np.asarray(tlen, np.int32)
    w = np.asarray(w, np.int32)
    if B == 0:
        return []
    if w.min() < 1:
        raise ValueError("band engine needs per-pair w >= 1")
    W = int(w.max())
    P = _pick_p(W)
    mat = np.asarray(mat, dtype=np.int8).reshape(-1)
    # 13-bit tie key: H*8192 must stay in int32
    hmax = int(mat[0]) * int(min(qlen.max(), tlen.max()))
    if hmax >= (1 << 17):
        raise ValueError("scores too large for the packed banded argmax")

    RMAX = 512 // P // 8 * 8
    if B > RMAX:
        pieces = []
        for i in range(0, B, RMAX):
            pieces.extend(extz_band_batch_records(
                query[i:i + RMAX], target[i:i + RMAX], qlen[i:i + RMAX],
                tlen[i:i + RMAX], m, mat, q, e, w[i:i + RMAX], zdrop, flag,
                interpret))
        return pieces

    sc_N = -e if int(mat[m * m - 1]) == 0 else int(mat[m * m - 1])

    Bp = pad_rows(B, P)
    R = Bp * P
    n_diag = int((qlen + tlen).max()) - 1 if B else 1
    n_diag = max(round_up(n_diag, wb.CHUNK), wb.CHUNK)

    prm = wband.BandParams(
        n_rows=R, n_diag=n_diag, m=m,
        sc_mch=int(mat[0]), sc_mis=int(mat[1]), sc_N=sc_N,
        q=int(q), e=int(e), w=W, zdrop=int(zdrop), flag=int(flag), p=P,
        matt=tuple(int(v) for v in mat) if flag & Flag.GENERIC_SC else (),
    )
    run = _cached_run_band(prm, interpret)

    qpad = np.zeros((Bp, Lq), np.int8)
    qpad[:B] = np.asarray(query, np.int8)
    tpad = np.zeros((Bp, Lt), np.int8)
    tpad[:B] = np.asarray(target, np.int8)
    lens = np.zeros((3, Bp), np.int32)
    lens[0, :B], lens[1, :B], lens[2, :B] = qlen, tlen, w
    lens[2, B:] = 1        # padded rows need a legal band

    return [run(jnp.asarray(qpad), jnp.asarray(tpad),
                jnp.asarray(lens[0]), jnp.asarray(lens[1]),
                jnp.asarray(lens[2]))[:B]]


def extz_band_batch_device(
    query: np.ndarray,
    target: np.ndarray,
    qlen: np.ndarray,
    tlen: np.ndarray,
    m: int,
    mat: np.ndarray,
    q: int,
    e: int,
    w: np.ndarray,
    zdrop: int = -1,
    flag: Flag | int = Flag.SCORE_ONLY,
    interpret: bool = False,
) -> Dict[str, np.ndarray]:
    """Batched banded one-piece extension for long pairs, score-only.

    Synchronous wrapper over :func:`extz_band_batch_records`.
    """
    from .batch_pallas import unpack_records

    pieces = extz_band_batch_records(query, target, qlen, tlen, m, mat,
                                     q, e, w, zdrop, flag, interpret)
    if not pieces:
        return {k: np.zeros(0, np.int32) for k in
                ("max", "max_t", "max_q", "mqe", "mqe_t", "mte", "mte_q",
                 "score", "zdropped")}
    res = np.concatenate([np.asarray(p) for p in pieces], axis=0)
    mat = np.asarray(mat, dtype=np.int8).reshape(-1)
    return unpack_records(res, int(mat[1:].min()), int(q), int(e))


def extz_band_batch_align(
    query: np.ndarray,
    target: np.ndarray,
    qlen: np.ndarray,
    tlen: np.ndarray,
    m: int,
    mat: np.ndarray,
    q: int,
    e: int,
    w: np.ndarray,
    zdrop: int = -1,
    end_bonus: int = 0,
    flag: Flag | int = Flag.NONE,
    interpret: bool = False,
):
    """Batched banded one-piece extension WITH CIGARs for long pairs.

    Direction planes are stored band-relative and walked by the native
    backtrack with per-diagonal ``store_off = org(r)``.
    """
    from ..core.result import ExtzResult
    from ..native.bindings import backtrack

    flag = Flag(int(flag))
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    if flag & Flag.SCORE_ONLY:
        raise ValueError("use extz_band_batch_device for score batches")
    B, Lq = query.shape
    Bt, Lt = target.shape
    assert B == Bt
    qlen = np.asarray(qlen, np.int32)
    tlen = np.asarray(tlen, np.int32)
    w = np.asarray(w, np.int32)
    if B == 0:
        return []
    if w.min() < 1:
        raise ValueError("band engine needs per-pair w >= 1")
    W = int(w.max())
    P = _pick_p(W)
    mat = np.asarray(mat, dtype=np.int8).reshape(-1)
    hmax = int(mat[0]) * int(min(qlen.max(), tlen.max()))
    if hmax >= (1 << 17):
        raise ValueError("scores too large for the packed banded argmax")

    RMAX = 512 // P // 8 * 8          # d blocks are chunk=32 deep: VMEM stays ~8 MB
    if B > RMAX:
        out = []
        for i in range(0, B, RMAX):
            out.extend(extz_band_batch_align(
                query[i:i + RMAX], target[i:i + RMAX], qlen[i:i + RMAX],
                tlen[i:i + RMAX], m, mat, q, e, w[i:i + RMAX], zdrop,
                end_bonus, flag, interpret))
        return out

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
    n_diag = max(round_up(n_diag, wb.CHUNK), wb.CHUNK)

    prm = wband.BandParams(
        n_rows=R, n_diag=n_diag, m=m,
        sc_mch=int(mat[0]), sc_mis=int(mat[1]), sc_N=sc_N,
        q=int(q), e=int(e), w=W, zdrop=int(zdrop), flag=int(flag),
        chunk=32, p=P,
        matt=tuple(int(v) for v in mat) if flag & Flag.GENERIC_SC else (),
    )
    run = _cached_run_band(prm, interpret, True)

    qpad = np.zeros((Bp, Lq), np.int8)
    qpad[:B] = np.asarray(query, np.int8)
    tpad = np.zeros((Bp, Lt), np.int8)
    tpad[:B] = np.asarray(target, np.int8)
    lens = np.zeros((3, Bp), np.int32)
    lens[0, :B], lens[1, :B], lens[2, :B] = qlen, tlen, w
    lens[2, B:] = 1

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
        # fetch the direction planes and walk on the host (debug path)
        p = np.asarray(p)
        orgv = wband.org_schedule(n_diag, W)
        rr = np.arange(n_diag, dtype=np.int64)[None, :]
        st0 = np.maximum(0, np.maximum(rr - qlen[:, None] + 1,
                                       (rr - w[:, None] + 1) >> 1))
        en0 = np.minimum(tlen[:, None] - 1,
                         np.minimum(rr, (rr + w[:, None]) >> 1))
        stb = (st0 // 16 * 16).astype(np.int32)
        enb = ((en0 + 16) // 16 * 16 - 1).astype(np.int32)
        for b in range(B):
            if not started[b]:
                continue
            qln, tln = int(qlen[b]), int(tlen[b])
            nd = qln + tln - 1
            pmat = np.ascontiguousarray(
                p[:nd, b * P:(b + 1) * P, :]).reshape(nd, P * 128)
            out[b].cigar = backtrack(
                pmat, stb[b, :nd], enb[b, :nd], P * 128,
                int(i0a[b]), int(j0a[b]),
                is_rot=True, is_rev=rev, store_off=orgv[:nd])
    else:
        # batched on-device walk: the planes never leave the chip
        cigs = device_walk_cigars(p, prm.n_rows, prm.p, prm.n_diag,
                                  prm.w, qlen, tlen, w, i0a, j0a,
                                  started, rev, interpret)
        for b in range(B):
            out[b].cigar = cigs[b]
    return out


def extd_band_batch_records(
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
    w: np.ndarray,
    zdrop: int = -1,
    flag: Flag | int = Flag.SCORE_ONLY,
    interpret: bool = False,
) -> list:
    """Banded batched two-piece extension, score-only — async records form.

    See :func:`ksw2_tpu.ops.batch_pallas.extz_batch_records` for the
    records contract.
    """
    from ..spec.common import c_div
    from . import wavefront_band_extd as wbe

    flag = Flag(int(flag))
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    if not (flag & Flag.SCORE_ONLY):
        raise ValueError("band engine is score-only; use extd2_device")
    B, Lq = query.shape
    Bt, Lt = target.shape
    assert B == Bt
    qlen = np.asarray(qlen, np.int32)
    tlen = np.asarray(tlen, np.int32)
    w = np.asarray(w, np.int32)
    if B == 0:
        return []
    if w.min() < 1:
        raise ValueError("band engine needs per-pair w >= 1")
    W = int(w.max())
    P = _pick_p(W)
    mat = np.asarray(mat, dtype=np.int8).reshape(-1)
    hmax = int(mat[0]) * int(min(qlen.max(), tlen.max()))
    if hmax >= (1 << 17):
        raise ValueError("scores too large for the packed banded argmax")

    RMAX = 512 // P // 8 * 8
    if B > RMAX:
        pieces = []
        for i in range(0, B, RMAX):
            pieces.extend(extd_band_batch_records(
                query[i:i + RMAX], target[i:i + RMAX], qlen[i:i + RMAX],
                tlen[i:i + RMAX], m, mat, q, e, q2, e2, w[i:i + RMAX],
                zdrop, flag, interpret))
        return pieces

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
    n_diag = max(round_up(n_diag, wb.CHUNK), wb.CHUNK)

    prm = wbe.BandExtdParams(
        n_rows=R, n_diag=n_diag, m=m,
        sc_mch=int(mat[0]), sc_mis=int(mat[1]), sc_N=sc_N,
        q=q, e=e, q2=q2, e2=e2, qe_pre_swap=qe_pre_swap,
        long_thres=int(long_thres), long_diff=int(long_diff),
        w=W, zdrop=int(zdrop), flag=int(flag), p=P,
        matt=tuple(int(v) for v in mat) if flag & Flag.GENERIC_SC else (),
    )
    run = _cached_run_band_extd(prm, interpret)

    qpad = np.zeros((Bp, Lq), np.int8)
    qpad[:B] = np.asarray(query, np.int8)
    tpad = np.zeros((Bp, Lt), np.int8)
    tpad[:B] = np.asarray(target, np.int8)
    lens = np.zeros((3, Bp), np.int32)
    lens[0, :B], lens[1, :B], lens[2, :B] = qlen, tlen, w
    lens[2, B:] = 1

    return [run(jnp.asarray(qpad), jnp.asarray(tpad),
                jnp.asarray(lens[0]), jnp.asarray(lens[1]),
                jnp.asarray(lens[2]))[:B]]


def extd_band_batch_device(
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
    w: np.ndarray,
    zdrop: int = -1,
    flag: Flag | int = Flag.SCORE_ONLY,
    interpret: bool = False,
) -> Dict[str, np.ndarray]:
    """Batched banded two-piece extension for long pairs, score-only.

    Synchronous wrapper over :func:`extd_band_batch_records`.
    """
    from .batch_pallas import unpack_records

    pieces = extd_band_batch_records(query, target, qlen, tlen, m, mat,
                                     q, e, q2, e2, w, zdrop, flag, interpret)
    if not pieces:
        return {k: np.zeros(0, np.int32) for k in
                ("max", "max_t", "max_q", "mqe", "mqe_t", "mte", "mte_q",
                 "score", "zdropped")}
    res = np.concatenate([np.asarray(p) for p in pieces], axis=0)
    mat = np.asarray(mat, dtype=np.int8).reshape(-1)
    qc, ec = (q, e) if q + e <= q2 + e2 else (q2, e2)
    return unpack_records(res, int(mat[1:].min()), int(qc), int(ec))


def extd_band_batch_align(
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
    w: np.ndarray,
    zdrop: int = -1,
    end_bonus: int = 0,
    flag: Flag | int = Flag.NONE,
    interpret: bool = False,
):
    """Batched banded two-piece extension WITH CIGARs for long pairs."""
    from ..core import cigar as cigarmod
    from ..core.result import ExtzResult
    from ..native.bindings import backtrack
    from ..spec.common import c_div
    from . import wavefront_band_extd as wbe

    flag = Flag(int(flag))
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    if flag & Flag.SCORE_ONLY:
        raise ValueError("use extd_band_batch_device for score batches")
    B, Lq = query.shape
    Bt, Lt = target.shape
    assert B == Bt
    qlen = np.asarray(qlen, np.int32)
    tlen = np.asarray(tlen, np.int32)
    w = np.asarray(w, np.int32)
    if B == 0:
        return []
    if w.min() < 1:
        raise ValueError("band engine needs per-pair w >= 1")
    W = int(w.max())
    P = _pick_p(W)
    mat = np.asarray(mat, dtype=np.int8).reshape(-1)
    hmax = int(mat[0]) * int(min(qlen.max(), tlen.max()))
    if hmax >= (1 << 17):
        raise ValueError("scores too large for the packed banded argmax")

    RMAX = 512 // P // 8 * 8
    if B > RMAX:
        out = []
        for i in range(0, B, RMAX):
            out.extend(extd_band_batch_align(
                query[i:i + RMAX], target[i:i + RMAX], qlen[i:i + RMAX],
                tlen[i:i + RMAX], m, mat, q, e, q2, e2, w[i:i + RMAX],
                zdrop, end_bonus, flag, interpret))
        return out

    q, e, q2, e2 = int(q), int(e), int(q2), int(e2)
    qe_pre_swap = q + e
    if q2 + e2 < q + e:
        q, q2 = q2, q
        e, e2 = e2, e
    long_thres = c_div(q2 - q, e - e2) - 1 if e != e2 else 0
    if q2 + e2 + long_thres * e2 > q + e + long_thres * e:
        long_thres += 1
    long_diff = long_thres * (e - e2) - (q2 - q) - e2
    sc_N = -e2 if int(mat[m * m - 1]) == 0 else int(mat[m * m - 1])
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
    n_diag = max(round_up(n_diag, wb.CHUNK), wb.CHUNK)

    prm = wbe.BandExtdParams(
        n_rows=R, n_diag=n_diag, m=m,
        sc_mch=int(mat[0]), sc_mis=int(mat[1]), sc_N=sc_N,
        q=q, e=e, q2=q2, e2=e2, qe_pre_swap=qe_pre_swap,
        long_thres=int(long_thres), long_diff=int(long_diff),
        w=W, zdrop=int(zdrop), flag=int(flag), chunk=32, p=P,
        matt=tuple(int(v) for v in mat) if flag & Flag.GENERIC_SC else (),
    )
    run = _cached_run_band_extd(prm, interpret, True)

    qpad = np.zeros((Bp, Lq), np.int8)
    qpad[:B] = np.asarray(query, np.int8)
    tpad = np.zeros((Bp, Lt), np.int8)
    tpad[:B] = np.asarray(target, np.int8)
    lens = np.zeros((3, Bp), np.int32)
    lens[0, :B], lens[1, :B], lens[2, :B] = qlen, tlen, w
    lens[2, B:] = 1

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
        p = np.asarray(p)
        orgv = wband.org_schedule(n_diag, W)
        rr = np.arange(n_diag, dtype=np.int64)[None, :]
        st0 = np.maximum(0, np.maximum(rr - qlen[:, None] + 1,
                                       (rr - w[:, None] + 1) >> 1))
        en0 = np.minimum(tlen[:, None] - 1,
                         np.minimum(rr, (rr + w[:, None]) >> 1))
        stb = (st0 // 16 * 16).astype(np.int32)
        enb = ((en0 + 16) // 16 * 16 - 1).astype(np.int32)
        for b in range(B):
            if not started[b]:
                continue
            qln, tln = int(qlen[b]), int(tlen[b])
            nd = qln + tln - 1
            pmat = np.ascontiguousarray(
                p[:nd, b * P:(b + 1) * P, :]).reshape(nd, P * 128)
            out[b].cigar = backtrack(
                pmat, stb[b, :nd], enb[b, :nd], P * 128,
                int(i0a[b]), int(j0a[b]),
                is_rot=True, is_rev=rev, store_off=orgv[:nd])
    else:
        cigs = device_walk_cigars(p, prm.n_rows, prm.p, prm.n_diag,
                                  prm.w, qlen, tlen, w, i0a, j0a,
                                  started, rev, interpret)
        for b in range(B):
            out[b].cigar = cigs[b]
    if flag & Flag.EQX:
        for b in range(B):
            if out[b].cigar:
                out[b].cigar = cigarmod.to_eqx(
                    out[b].cigar, query[b][:int(qlen[b])],
                    target[b][:int(tlen[b])])
    return out


__all__ = ["extz_band_batch_device", "extz_band_batch_align",
           "extd_band_batch_device", "extd_band_batch_align"]
