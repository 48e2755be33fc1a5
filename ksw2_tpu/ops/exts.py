"""Device op: spliced extension on TPU (exts2 semantics).

Host wrapper around :mod:`ksw2_tpu.ops.wavefront_exts`: precomputes the
donor/acceptor splice profiles on the host (same code path as the spec
engine), runs the kernel, and tracebacks with ``min_intron_len=long_thres``
so long target gaps emit N ops (ksw2_exts2_sse.c:410).  Byte parity target:
``ksw_exts2_sse``.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.flags import Flag
from ..core.result import ExtzResult
from ..native.bindings import backtrack  # native with Python fallback
from ..spec.common import c_div
from ..spec.diagdiff import Trace, _splice_profiles
from . import wavefront as wf
from . import wavefront_exts as wfs
from .bands import band_bounds_rounded, n_col_bytes, round_up
from .extz import _pad_seq


@functools.lru_cache(maxsize=256)
def _cached_call(prm: wfs.ExtsParams, with_cigar: bool, interpret: bool):
    return jax.jit(wfs.build_exts_call(prm, with_cigar, interpret=interpret))


@functools.lru_cache(maxsize=256)
def _cached_phased(prm: wfs.ExtsParams, interpret: bool):
    return jax.jit(wfs.build_exts_phased(prm, interpret=interpret))


@functools.lru_cache(maxsize=256)
def _cached_fused_single(prm: wfs.ExtsParams, flag_int: int,
                         full_rows: int, interpret: bool):
    """Fused forward+walker for one exts pair: one execution, one
    packed fetch; the walker emits N ops for long target gaps
    (min_intron = long_thres, ksw2_exts2_sse.c:410)."""
    from .extz import compose_forward_tb, make_ext_start_fn
    fwd = wfs.build_exts_call(prm, True, interpret=interpret)
    n_steps = (prm.n_diag + prm.chunk - 1) // prm.chunk
    start_fn = make_ext_start_fn(flag_int, 0, prm.qlen, prm.tlen,
                                 with_reach=False)
    # exts has no band support (ksw2_exts2_sse.c:179-181): w is the
    # matrix-shape bound, as the host path passes to device_backtrack
    pipe = compose_forward_tb(fwd, prm.qlen, prm.tlen,
                              max(prm.qlen, prm.tlen), prm.p_rows,
                              prm.chunk, n_steps, prm.long_thres, 1,
                              full_rows, start_fn, interpret)
    return jax.jit(pipe)


def exts2_device(
    query: np.ndarray,
    target: np.ndarray,
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
    chunk: Optional[int] = None,
    device_tb: Optional[bool] = None,
) -> Tuple[ExtzResult, Optional[Trace]]:
    """Run the exts wavefront kernel for one pair; returns (ez, trace)."""
    import os as _os
    if device_tb is None:
        device_tb = _os.environ.get("KSW2_HOST_TB") != "1"
    flag = Flag(int(flag))
    if not interpret and jax.default_backend() != "tpu":
        interpret = True          # Pallas TPU kernels interpret elsewhere
    ez = ExtzResult()
    ez.reset()
    qlen, tlen = len(query), len(target)
    q, e, q2, noncan = int(q), int(e), int(q2), int(noncan)
    if m <= 1 or qlen <= 0 or tlen <= 0 or q2 <= q + e:
        return ez, None
    mat = np.asarray(mat, dtype=np.int8).reshape(-1)
    min_sc = int(mat[1:].min())
    if -min_sc > 2 * (q + e):
        return ez, None
    with_cigar = not (flag & Flag.SCORE_ONLY)

    long_thres = c_div(q2 - q, e) - 1
    if q2 > q + e + long_thres * e:
        long_thres += 1
    long_diff = long_thres * e - (q2 - q)

    tlen_ = (tlen + 15) // 16
    n_diag = qlen + tlen - 1
    N = max(round_up(tlen_ * 16, 128), 1024)
    w = qlen + tlen                  # no band: shape-only bounds
    n_col16 = n_col_bytes(qlen, tlen, w)
    p_rows = round_up(n_col16 + 128, 128) // 128 if with_cigar else 0
    p_rows = round_up(p_rows, 32)  # tile alignment for the device traceback
    if chunk is None:
        chunk = (max(8, min(128, (4 << 20) // max(1, p_rows * 128)))
                 if with_cigar else 512)
    sc_N = -e if int(mat[m * m - 1]) == 0 else int(mat[m * m - 1])

    prm = wfs.ExtsParams(
        qlen=qlen, tlen=tlen, m=m,
        sc_mch=int(mat[0]), sc_mis=int(mat[1]), sc_N=sc_N,
        q=q, e=e, q2=q2,
        long_thres=int(long_thres), long_diff=int(long_diff),
        zdrop=int(zdrop), flag=int(flag),
        chunk=int(chunk), n_diag=n_diag, n_rows=N // 128, p_rows=p_rows,
    )
    donor, acceptor = _splice_profiles(
        np.asarray(target), tlen, N, noncan, flag, junc, junc_bonus)
    donb = ((donor.astype(np.int32) + 128) & 255).reshape(N // 128, 128)
    accb = ((acceptor.astype(np.int32) + 128) & 255).reshape(N // 128, 128)

    qpad = _pad_seq(np.asarray(query), max(round_up(qlen, 128), 1024))
    tpad = _pad_seq(np.asarray(target), N)
    generic = bool(flag & Flag.GENERIC_SC)
    perlane = not (flag & Flag.APPROX_MAX) and zdrop < 0
    full_rows_s = 1 if p_rows >= N // 128 else 0
    fused_tb = None
    if perlane and not with_cigar and not generic:
        # row-windowed phase chain (see wavefront_exts.build_exts_phased)
        call = _cached_phased(prm, interpret)
        res = call(jnp.asarray(qpad.reshape(-1)), jnp.asarray(tpad),
                   jnp.asarray(donb), jnp.asarray(accb))
        p = None
    elif with_cigar and device_tb and not (flag & Flag.REV_CIGAR) \
            and not generic:
        pipe = _cached_fused_single(prm, int(flag), full_rows_s,
                                    interpret)
        flat = np.asarray(pipe(jnp.asarray(qpad.reshape(-1)),
                               jnp.asarray(tpad), jnp.asarray(donb),
                               jnp.asarray(accb)))
        res = flat[:wf.NSTATE]
        fused_tb = flat
        p = None
    else:
        call = _cached_call(prm, with_cigar, interpret)
        args = [jnp.asarray(qpad.reshape(-1)), jnp.asarray(tpad),
                jnp.asarray(donb), jnp.asarray(accb)]
        if generic:
            # biased profile planes (exts stores raw scores + sign bias)
            R0 = N // 128
            tpv = np.zeros(N, np.int64)
            tpv[:tlen] = np.asarray(target, np.int64)
            prof = np.empty((m * R0, 128), np.int32)
            for c in range(m):
                vals = mat[(tpv * m + c)].astype(np.int64)
                prof[c * R0:(c + 1) * R0] = (
                    (vals + 128) & 255).reshape(R0, 128)
            args.append(jnp.asarray(prof))
        out = call(*args)
        if with_cigar:
            res, p = out        # p stays on device for the traceback
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
        rev = bool(flag & Flag.REV_CIGAR)
        # traceback start (ksw2_exts2_sse.c:407-410; no end_bonus variant)
        if not ez.zdropped and not (flag & Flag.EXTZ_ONLY):
            i0, j0 = tlen - 1, qlen - 1
        elif ez.max_t >= 0 and ez.max_q >= 0:
            i0, j0 = ez.max_t, ez.max_q
        else:
            i0 = None
        full_rows = 1 if p_rows >= N // 128 else 0
        if i0 is not None and fused_tb is not None:
            from .extz import fused_tb_parse
            cig, _tres = fused_tb_parse(fused_tb, wf.NSTATE, long_thres,
                                        rev)
            if cig is None:
                call = _cached_call(prm, True, interpret)
                _, p = call(jnp.asarray(qpad.reshape(-1)),
                            jnp.asarray(tpad), jnp.asarray(donb),
                            jnp.asarray(accb))
                device_tb = False
            else:
                ez.cigar = cig
        elif i0 is not None and device_tb:
            from .extz import device_backtrack
            ez.cigar = device_backtrack(
                p, p.shape[0] // chunk, chunk, p_rows, qlen, tlen, w,
                i0, j0, long_thres, rev, interpret, full_rows=full_rows)
            if ez.cigar is None:
                device_tb = False   # escaped: replay on the host
        if i0 is not None and not device_tb:
            st0, en0, st, en = band_bounds_rounded(n_diag, qlen, tlen, w)
            store_off = (np.zeros_like(st) if full_rows
                         else st // 128 * 128)
            pmat = np.asarray(p).reshape(p.shape[0], -1)[:n_diag]
            trace = Trace(pmat, st, en, p_rows * 128)
            ez.cigar = backtrack(
                pmat, st, en, p_rows * 128, i0, j0,
                is_rot=True, is_rev=rev, store_off=store_off,
                min_intron_len=long_thres,
            )
        # note: unlike extd2, the reference exts2 has no EQX post-pass
    return ez, trace


__all__ = ["exts2_device"]
