"""Device op: one-piece affine extension on TPU (extz2 semantics).

Host wrapper around the Pallas wavefront kernel: pads/encodes inputs, runs
the kernel, assembles the ``ExtzResult`` and (in CIGAR mode) tracebacks over
the streamed direction matrix.  Byte parity target: ``ksw_extz2_sse``
(validated against :mod:`ksw2_tpu.spec.diagdiff`).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.flags import NEG_INF, Flag
from ..core.result import ExtzResult
from ..native.bindings import backtrack  # native with Python fallback
from ..spec.diagdiff import Trace
from . import wavefront as wf
from .bands import band_bounds_rounded, n_col_bytes, round_up


@functools.lru_cache(maxsize=256)
def _cached_call(prm: wf.ExtzParams, with_cigar: bool, interpret: bool):
    call = wf.build_extz_call(prm, with_cigar, interpret=interpret)
    return jax.jit(call)


@functools.lru_cache(maxsize=256)
def _cached_phased(prm: wf.ExtzParams, interpret: bool,
                   approx: bool = False):
    return jax.jit(wf.build_extz_phased(prm, interpret=interpret,
                                        approx=approx))


@functools.lru_cache(maxsize=256)
def _cached_tb(prm, interpret: bool):
    from . import traceback_device as tbd
    return jax.jit(tbd.build_traceback_call(prm, interpret=interpret))


@functools.lru_cache(maxsize=256)
def _cached_fused_single(prm: "wf.ExtzParams", flag_int: int,
                         end_bonus: int, full_rows: int, interpret: bool):
    """ONE jitted program for a single-pair CIGAR alignment: forward
    wavefront -> device start-cell selection (ksw2_extz2_sse.c:292-301)
    -> device walker -> 2-bit op packing.

    On this environment's tunnel each separate execution costs ~29 ms
    and each fetch ~28 ms + bytes/30MB/s; the unfused path paid
    exec+fetch+exec+fetch (~120 ms of tax on the 16.5k MT pair).  Fused:
    one execution and one small fetch (res | walk end | ops at 2
    bits/op — 16x fewer bytes than the raw op stream).
    """
    fwd = wf.build_extz_call(prm, True, interpret=interpret)
    flag = Flag(flag_int)
    perlane = not (flag & Flag.APPROX_MAX) and prm.zdrop < 0
    n_live = (wf._static_stop(prm.qlen, prm.tlen, prm.w, prm.n_diag)
              if perlane else prm.n_diag)
    n_steps = (n_live + prm.chunk - 1) // prm.chunk
    start_fn = make_ext_start_fn(flag_int, end_bonus, prm.qlen, prm.tlen,
                                 with_reach=True)
    pipe = compose_forward_tb(fwd, prm.qlen, prm.tlen, prm.w, prm.p_rows,
                              prm.chunk, n_steps, 0, 1, full_rows,
                              start_fn, interpret)
    return jax.jit(pipe), n_steps


def make_ext_start_fn(flag_int: int, end_bonus: int, qlen: int, tlen: int,
                      with_reach: bool):
    """Device start-cell rule mirroring ksw2_extz2_sse.c:292-301 /
    ksw2_exts2_sse.c:407-410 (``with_reach=False`` drops the
    EXTZ_ONLY+end_bonus reach-end case, which exts lacks)."""
    flag = Flag(flag_int)
    extz_only = bool(flag & Flag.EXTZ_ONLY)

    def start_fn(res):
        mx, mxt, mxq = res[wf.MAX], res[wf.MAXT], res[wf.MAXQ]
        mqe, mqet = res[wf.MQE], res[wf.MQET]
        zdr = res[wf.ZDROP] != 0
        if not extz_only:
            return (jnp.where(zdr, mxt, tlen - 1),
                    jnp.where(zdr, mxq, qlen - 1))
        if not with_reach:
            return mxt, mxq
        re_ = jnp.logical_not(zdr) & (mqe + end_bonus > mx)
        return (jnp.where(re_, mqet, mxt),
                jnp.where(re_, qlen - 1, mxq))

    return start_fn


def compose_forward_tb(fwd, qlen, tlen, w, p_rows, chunk, n_steps,
                       min_intron, upper_force, full_rows, start_fn,
                       interpret):
    """Unjitted single-pair pipeline: forward -> device start cell ->
    device walker -> 2-bit op packing, returning one flat int32 vector
    [res | walk end | packed ops] so the caller pays one execution and
    one small fetch."""
    from . import traceback_device as tbd
    tprm = tbd.TbParams(
        qlen=qlen, tlen=tlen, w=int(w), n_diag=qlen + tlen - 1,
        p_rows=p_rows, blk=chunk, n_blocks=n_steps,
        min_intron=int(min_intron), upper_force=int(upper_force),
        full_rows=int(full_rows))
    tb = tbd.build_traceback_call(tprm, interpret=interpret)

    def pipe(*args):
        res, p = fwd(*args)
        i0, j0 = start_fn(res)
        start = jnp.stack([i0, j0]).astype(jnp.int32)
        tres, ops = tb(start, p)
        o = (ops.reshape(-1).astype(jnp.uint32) & 3).reshape(-1, 16)
        sh = jnp.arange(16, dtype=jnp.uint32) * 2
        packed = jnp.sum(o << sh[None, :], axis=1).astype(jnp.int32)
        return jnp.concatenate([res.astype(jnp.int32), tres, packed])

    return pipe


def fused_tb_parse(flat, nres: int, min_intron: int, rev: bool):
    """Host side of :func:`compose_forward_tb`'s output: (cigar | None
    when the walk escaped, walk-end record)."""
    from . import traceback_device as tbd
    tres = flat[nres:nres + 4]
    if tres[3]:
        return None, tres
    u = flat[nres + 4:].astype(np.uint32)
    ops_flat = ((u[:, None] >> (2 * np.arange(16, dtype=np.uint32))) & 3) \
        .reshape(-1)
    return tbd.finish_cigar(ops_flat.astype(np.int32), int(tres[2]),
                            int(tres[0]), int(tres[1]), min_intron,
                            rev), tres


def device_backtrack(p_dev, n_steps, chunk, p_rows, qlen, tlen, w,
                     i0, j0, min_intron, is_rev, interpret, upper_force=1,
                     full_rows=0):
    """Walk the traceback on device; only the op string leaves the chip."""
    from . import traceback_device as tbd
    prm = tbd.TbParams(
        qlen=qlen, tlen=tlen, w=int(w), n_diag=qlen + tlen - 1,
        p_rows=p_rows, blk=chunk, n_blocks=n_steps,
        min_intron=int(min_intron), upper_force=int(upper_force),
        full_rows=int(full_rows),
    )
    call = _cached_tb(prm, interpret)
    res, ops = call(jnp.asarray(np.array([i0, j0], np.int32)), p_dev)
    res = np.asarray(res)
    if res[3]:
        return None   # walk escaped the stored rows: replay on the host
    ops_flat = np.asarray(ops).reshape(-1)
    return tbd.finish_cigar(ops_flat, int(res[2]), int(res[0]), int(res[1]),
                            int(min_intron), is_rev)


def _pad_seq(seq: np.ndarray, n: int) -> np.ndarray:
    out = np.zeros((n // 128, 128), np.int32)
    out.reshape(-1)[: len(seq)] = seq.astype(np.int32)
    return out


def _generic_prof(mat, target, m, q, e, N, tlen):
    """m query-symbol profile planes, pre-biased like the in-kernel
    specialized fill (ksw2_extz2_sse.c:141-144 semantics)."""
    R0 = N // 128
    qe = q + e
    tpv = np.zeros(N, np.int64)
    tpv[:tlen] = np.asarray(target, np.int64)
    prof = np.empty((m * R0, 128), np.int32)
    for c in range(m):
        vals = mat[(tpv * m + c)].astype(np.int64)
        prof[c * R0:(c + 1) * R0] = (
            ((vals + 2 * qe) & 255) ^ 128).reshape(R0, 128)
    return prof


def extz2_device(
    query: np.ndarray,
    target: np.ndarray,
    m: int,
    mat: np.ndarray,
    q: int,
    e: int,
    w: int = -1,
    zdrop: int = -1,
    end_bonus: int = 0,
    flag: Flag | int = Flag.NONE,
    interpret: bool = False,
    chunk: Optional[int] = None,
    device_tb: Optional[bool] = None,
) -> Tuple[ExtzResult, Optional[Trace]]:
    """Run the extz wavefront kernel for one pair; returns (ez, trace).

    ``device_tb`` walks the traceback on the TPU (default: on) so the
    direction matrix never crosses to the host; pass False to fetch the
    matrix and use the native host backtrack (also returns the Trace).
    """
    import os as _os
    if device_tb is None:
        device_tb = _os.environ.get("KSW2_HOST_TB") != "1"
    flag = Flag(int(flag))
    if not interpret and jax.default_backend() != "tpu":
        interpret = True          # Pallas TPU kernels interpret elsewhere
    ez = ExtzResult()
    ez.reset()
    qlen, tlen = len(query), len(target)
    if m <= 0 or qlen <= 0 or tlen <= 0:
        return ez, None
    mat = np.asarray(mat, dtype=np.int8).reshape(-1)
    min_sc = int(mat[1:].min())
    if -min_sc > 2 * (q + e):
        return ez, None
    with_cigar = not (flag & Flag.SCORE_ONLY)

    if w < 0:
        w = max(tlen, qlen)
    tlen_ = (tlen + 15) // 16
    n_diag = qlen + tlen - 1
    N = max(round_up(tlen_ * 16, 128), 1024)
    n_col16 = n_col_bytes(qlen, tlen, w)
    p_rows = round_up(n_col16 + 128, 128) // 128 if with_cigar else 0
    p_rows = round_up(p_rows, 32)  # tile alignment for the device traceback
    if chunk is None:
        if with_cigar:
            chunk = max(8, min(128, (4 << 20) // max(1, p_rows * 128)))
        else:
            chunk = 1024
    sc_N = -e if int(mat[m * m - 1]) == 0 else int(mat[m * m - 1])

    prm = wf.ExtzParams(
        qlen=qlen, tlen=tlen, m=m,
        sc_mch=int(mat[0]), sc_mis=int(mat[1]), sc_N=sc_N,
        q=int(q), e=int(e), w=int(w), zdrop=int(zdrop), flag=int(flag),
        chunk=int(chunk), n_diag=n_diag, n_rows=N // 128, p_rows=p_rows,
    )
    approx = bool(flag & Flag.APPROX_MAX)
    generic = bool(flag & Flag.GENERIC_SC)
    perlane = not approx and zdrop < 0
    qpad = _pad_seq(np.asarray(query), max(round_up(qlen, 128), 1024))
    tpad = _pad_seq(np.asarray(target), N)
    full_rows_s = 1 if (with_cigar
                        and p_rows >= N // 128) else 0
    fused_tb = None
    if (perlane or approx) and not with_cigar and not generic:
        # row-windowed phase chain (see wavefront.build_extz_phased);
        # approx (-g) runs the H0-walk variant of the same chain
        call = _cached_phased(prm, interpret, approx)
        res = call(jnp.asarray(qpad), jnp.asarray(tpad))
        p = None
    elif with_cigar and device_tb and not (flag & Flag.REV_CIGAR):
        # fused forward+walker: one execution, one packed fetch
        pipe, _n_steps = _cached_fused_single(
            prm, int(flag), int(end_bonus), full_rows_s, interpret)
        args = [jnp.asarray(qpad), jnp.asarray(tpad)]
        if generic:
            args.append(jnp.asarray(_generic_prof(mat, target, m, q, e,
                                                  N, tlen)))
        flat = np.asarray(pipe(*args))
        res = flat[:wf.NSTATE]
        fused_tb = (flat[wf.NSTATE:wf.NSTATE + 4],
                    flat[wf.NSTATE + 4:])
        p = None
    else:
        call = _cached_call(prm, with_cigar, interpret)
        args = [jnp.asarray(qpad), jnp.asarray(tpad)]
        if generic:
            args.append(jnp.asarray(_generic_prof(mat, target, m, q, e,
                                                  N, tlen)))
        out = call(*args)
        if with_cigar:
            res, p = out            # p stays on device for the traceback
        else:
            res = out[0]
            p = None
    res = np.asarray(res)

    ez.max = int(res[wf.MAX])
    ez.max_t = int(res[wf.MAXT])
    ez.max_q = int(res[wf.MAXQ])
    ez.mqe = int(res[wf.MQE])
    ez.mqe_t = int(res[wf.MQET])
    ez.mte = int(res[wf.MTE])
    ez.mte_q = int(res[wf.MTEQ])
    ez.score = int(res[wf.SCORE])
    ez.zdropped = bool(res[wf.ZDROP])

    trace = None
    if with_cigar:
        # traceback start cell (ksw2_extz2_sse.c:292-301)
        rev = bool(flag & Flag.REV_CIGAR)
        if not ez.zdropped and not (flag & Flag.EXTZ_ONLY):
            i0, j0 = tlen - 1, qlen - 1
        elif not ez.zdropped and (flag & Flag.EXTZ_ONLY) and ez.mqe + end_bonus > ez.max:
            ez.reach_end = True
            i0, j0 = ez.mqe_t, qlen - 1
        elif ez.max_t >= 0 and ez.max_q >= 0:
            i0, j0 = ez.max_t, ez.max_q
        else:
            i0 = None
        full_rows = 1 if p_rows >= N // 128 else 0
        if i0 is not None and fused_tb is not None:
            from . import traceback_device as tbd
            tres, packed = fused_tb
            if tres[3]:
                # walk escaped the stored rows (rare): re-run the
                # forward to materialize p and replay on the host
                call = _cached_call(prm, True, interpret)
                args = [jnp.asarray(qpad), jnp.asarray(tpad)]
                if generic:
                    args.append(jnp.asarray(_generic_prof(
                        mat, target, m, q, e, N, tlen)))
                _, p = call(*args)
                device_tb = False
            else:
                u = packed.astype(np.uint32)
                ops_flat = ((u[:, None] >> (2 * np.arange(16,
                            dtype=np.uint32))) & 3).reshape(-1)
                ez.cigar = tbd.finish_cigar(
                    ops_flat.astype(np.int32), int(tres[2]),
                    int(tres[0]), int(tres[1]), 0, rev)
        elif i0 is not None and device_tb:
            # walk on device: only the op string crosses to the host
            n_steps = p.shape[0] // chunk
            ez.cigar = device_backtrack(
                p, n_steps, chunk, p_rows, qlen, tlen, w, i0, j0,
                0, rev, interpret, full_rows=full_rows)
            if ez.cigar is None:
                # the walk escaped the stored rows: replay on the host
                # over the fetched direction matrix (exact same bytes)
                device_tb = False
        if i0 is not None and not device_tb:
            st0, en0, st, en = band_bounds_rounded(n_diag, qlen, tlen, w)
            store_off = (np.zeros_like(st) if full_rows
                         else st // 128 * 128)
            pmat = np.asarray(p).reshape(p.shape[0], -1)[:n_diag]
            trace = Trace(pmat, st, en, p_rows * 128)
            ez.cigar = backtrack(
                pmat, st, en, p_rows * 128, i0, j0,
                is_rot=True, is_rev=rev, store_off=store_off,
            )
    return ez, trace


__all__ = ["extz2_device"]
