"""Device op: two-piece affine extension on TPU (extd2 semantics)."""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import cigar as cigarmod
from ..core.flags import NEG_INF, Flag
from ..core.result import ExtzResult
from ..native.bindings import backtrack  # native with Python fallback
from ..spec.common import c_div
from ..spec.diagdiff import Trace
from . import wavefront as wf
from . import wavefront_extd as wfd
from .bands import band_bounds_rounded, n_col_bytes, round_up
from .extz import _pad_seq


@functools.lru_cache(maxsize=256)
def _cached_call(prm: wfd.ExtdParams, with_cigar: bool, interpret: bool):
    return jax.jit(wfd.build_extd_call(prm, with_cigar, interpret=interpret))


@functools.lru_cache(maxsize=256)
def _cached_phased(prm: wfd.ExtdParams, interpret: bool):
    return jax.jit(wfd.build_extd_phased(prm, interpret=interpret))


@functools.lru_cache(maxsize=256)
def _cached_fused_single(prm: wfd.ExtdParams, flag_int: int,
                         end_bonus: int, full_rows: int, interpret: bool):
    """Fused forward+walker for one extd pair (see extz's twin): one
    execution, one packed fetch — the unfused path also fetched the
    WHOLE direction matrix to the host."""
    from .extz import compose_forward_tb, make_ext_start_fn
    fwd = wfd.build_extd_call(prm, True, interpret=interpret)
    n_steps = (prm.n_diag + prm.chunk - 1) // prm.chunk
    start_fn = make_ext_start_fn(flag_int, end_bonus, prm.qlen, prm.tlen,
                                 with_reach=True)
    pipe = compose_forward_tb(fwd, prm.qlen, prm.tlen, prm.w, prm.p_rows,
                              prm.chunk, n_steps, 0, 1, full_rows,
                              start_fn, interpret)
    return jax.jit(pipe)


def extd2_device(
    query: np.ndarray,
    target: np.ndarray,
    m: int,
    mat: np.ndarray,
    q: int,
    e: int,
    q2: int,
    e2: int,
    w: int = -1,
    zdrop: int = -1,
    end_bonus: int = 0,
    flag: Flag | int = Flag.NONE,
    interpret: bool = False,
    chunk: Optional[int] = None,
    device_tb: Optional[bool] = None,
) -> Tuple[ExtzResult, Optional[Trace]]:
    """Run the extd wavefront kernel for one pair; returns (ez, trace)."""
    import os as _os
    if device_tb is None:
        device_tb = _os.environ.get("KSW2_HOST_TB") != "1"
    flag = Flag(int(flag))
    if not interpret and jax.default_backend() != "tpu":
        interpret = True          # Pallas TPU kernels interpret elsewhere
    ez = ExtzResult()
    ez.reset()
    qlen, tlen = len(query), len(target)
    if m <= 1 or qlen <= 0 or tlen <= 0:
        return ez, None
    mat = np.asarray(mat, dtype=np.int8).reshape(-1)
    q, e, q2, e2 = int(q), int(e), int(q2), int(e2)
    qe_pre_swap = q + e
    if q2 + e2 < q + e:  # canonicalize (reference: ksw2_extd2_sse.c:78)
        q, q2 = q2, q
        e, e2 = e2, e
    min_sc = int(mat[1:].min())
    if -min_sc > 2 * (q + e):
        return ez, None
    with_cigar = not (flag & Flag.SCORE_ONLY)

    long_thres = c_div(q2 - q, e - e2) - 1 if e != e2 else 0
    if q2 + e2 + long_thres * e2 > q + e + long_thres * e:
        long_thres += 1
    long_diff = long_thres * (e - e2) - (q2 - q) - e2

    if w < 0:
        w = max(tlen, qlen)
    tlen_ = (tlen + 15) // 16
    n_diag = qlen + tlen - 1
    N = max(round_up(tlen_ * 16, 128), 1024)
    n_col16 = n_col_bytes(qlen, tlen, w)
    p_rows = round_up(n_col16 + 128, 128) // 128 if with_cigar else 0
    p_rows = round_up(p_rows, 32)  # tile alignment for the device traceback
    if chunk is None:
        chunk = max(8, min(128, (4 << 20) // max(1, p_rows * 128))) if with_cigar else 1024
    sc_N = -e2 if int(mat[m * m - 1]) == 0 else int(mat[m * m - 1])

    prm = wfd.ExtdParams(
        qlen=qlen, tlen=tlen, m=m,
        sc_mch=int(mat[0]), sc_mis=int(mat[1]), sc_N=sc_N,
        q=q, e=e, q2=q2, e2=e2, qe_pre_swap=qe_pre_swap,
        long_thres=int(long_thres), long_diff=int(long_diff),
        w=int(w), zdrop=int(zdrop), flag=int(flag),
        chunk=int(chunk), n_diag=n_diag, n_rows=N // 128, p_rows=p_rows,
    )
    generic = bool(flag & Flag.GENERIC_SC)
    perlane = not (flag & Flag.APPROX_MAX) and zdrop < 0
    qpad = _pad_seq(np.asarray(query), max(round_up(qlen, 128), 1024))
    tpad = _pad_seq(np.asarray(target), N)
    full_rows_s = 1 if p_rows >= N // 128 else 0
    fused_tb = None
    if perlane and not with_cigar and not generic:
        # row-windowed phase chain (see wavefront_extd.build_extd_phased)
        call = _cached_phased(prm, interpret)
        res = call(jnp.asarray(qpad.reshape(-1)), jnp.asarray(tpad))
        p = None
    elif with_cigar and device_tb and not (flag & Flag.REV_CIGAR):
        pipe = _cached_fused_single(prm, int(flag), int(end_bonus),
                                    full_rows_s, interpret)
        args = [jnp.asarray(qpad), jnp.asarray(tpad)]
        if generic:
            args.append(jnp.asarray(_extd_prof(mat, target, m, N, tlen)))
        flat = np.asarray(pipe(*args))
        res = flat[:wf.NSTATE]
        fused_tb = flat
        p = None
    else:
        call = _cached_call(prm, with_cigar, interpret)
        args = [jnp.asarray(qpad), jnp.asarray(tpad)]
        if generic:
            args.append(jnp.asarray(_extd_prof(mat, target, m, N, tlen)))
        out = call(*args)
        if with_cigar:
            res, p = out
            p = np.asarray(p)
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
            from .extz import fused_tb_parse
            cig, _tres = fused_tb_parse(fused_tb, wf.NSTATE, 0, rev)
            if cig is None:
                # escaped (rare): materialize p and replay on the host
                call = _cached_call(prm, True, interpret)
                args = [jnp.asarray(qpad), jnp.asarray(tpad)]
                if generic:
                    args.append(jnp.asarray(_extd_prof(mat, target, m, N,
                                                       tlen)))
                _, p = call(*args)
                p = np.asarray(p)
                device_tb = False
            else:
                ez.cigar = cig
        elif i0 is not None and device_tb:
            from .extz import device_backtrack
            ez.cigar = device_backtrack(
                p, p.shape[0] // chunk, chunk, p_rows, qlen, tlen, w,
                i0, j0, 0, rev, interpret, full_rows=full_rows)
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
            )
        if (flag & Flag.EQX) and ez.cigar:
            ez.cigar = cigarmod.to_eqx(ez.cigar, query, target)
    return ez, trace


__all__ = ["extd2_device"]


def _extd_prof(mat, target, m, N, tlen):
    """Biased profile planes (extd stores raw scores + sign bias; no
    2(q+e) shift in the extd canon)."""
    R0 = N // 128
    tpv = np.zeros(N, np.int64)
    tpv[:tlen] = np.asarray(target, np.int64)
    prof = np.empty((m * R0, 128), np.int32)
    for c in range(m):
        vals = mat[(tpv * m + c)].astype(np.int64)
        prof[c * R0:(c + 1) * R0] = ((vals + 128) & 255).reshape(R0, 128)
    return prof
