"""Device op: banded global alignment on TPU (gg2_sse semantics).

Host wrapper around :mod:`ksw2_tpu.ops.wavefront_gg2`: precomputes the m
query-symbol score profiles, runs the kernel, tracebacks from the corner.
Byte parity target: ``ksw_gg2_sse`` (including its deterministic H0-walk
buffer-overrun quirk when qlen > tlen + w; see the kernel docstring).
"""
from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..native.bindings import backtrack  # native with Python fallback
from ..spec.diagdiff import Trace
from . import wavefront_gg2 as wfg
from .bands import band_bounds_rounded, round_up
from .extz import _pad_seq


@functools.lru_cache(maxsize=256)
def _cached_fused_single(prm: "wfg.Gg2Params", full_rows: int,
                         interpret: bool):
    """Fused gg2 forward + corner-start walker: one execution, one
    packed fetch (gg2 always produces a CIGAR; upper_force=0 mirrors
    device_backtrack's gg2 call)."""
    import jax.numpy as jnp
    from .extz import compose_forward_tb
    from . import wavefront_gg2 as _wfg
    fwd = _wfg.build_gg2_call(prm, interpret=interpret)
    n_steps = (prm.n_diag + prm.chunk - 1) // prm.chunk

    def start_fn(res):
        return (jnp.int32(prm.tlen - 1), jnp.int32(prm.qlen - 1))

    pipe = compose_forward_tb(fwd, prm.qlen, prm.tlen, prm.w, prm.p_rows,
                              prm.chunk, n_steps, 0, 0, full_rows,
                              start_fn, interpret)
    return jax.jit(pipe)


@functools.lru_cache(maxsize=256)
def _cached_call(prm: wfg.Gg2Params, interpret: bool):
    return jax.jit(wfg.build_gg2_call(prm, interpret=interpret))


def gg2_device(
    query: np.ndarray,
    target: np.ndarray,
    m: int,
    mat: np.ndarray,
    q: int,
    e: int,
    w: int = -1,
    interpret: bool = False,
    chunk: Optional[int] = None,
    device_tb: Optional[bool] = None,
) -> Tuple[int, List[int], Optional[Trace]]:
    """Run the gg2 wavefront kernel; returns (score, cigar, trace)."""
    import os as _os
    if device_tb is None:
        device_tb = _os.environ.get("KSW2_HOST_TB") != "1"
    if not interpret and jax.default_backend() != "tpu":
        interpret = True          # Pallas TPU kernels interpret elsewhere
    qlen, tlen = len(query), len(target)
    mat = np.asarray(mat, dtype=np.int8).reshape(-1)
    q, e = int(q), int(e)
    qe = q + e
    if w < 0:
        w = max(tlen, qlen)
    n_col0 = min(w + 1, tlen)
    tlen_ = (tlen + 15) // 16
    n_col = ((n_col0 + 15) // 16 + 1) * 16
    n_diag = qlen + tlen - 1
    N = max(round_up(tlen_ * 16, 128), 1024)
    R = N // 128
    p_rows = round_up(round_up(n_col + 128, 128) // 128, 32)
    if chunk is None:
        chunk = max(8, min(128, (4 << 20) // max(1, p_rows * 128)))

    prm = wfg.Gg2Params(
        qlen=qlen, tlen=tlen, m=m, q=q, e=e, w=int(w),
        chunk=int(chunk), n_diag=n_diag, n_rows=R, p_rows=p_rows,
    )
    call = _cached_call(prm, interpret)

    # m query-symbol profiles: prof_c[t] = mat[target[t]*m + c], with the
    # +2(q+e) shift and sign bias folded in (kernel reads them as s values)
    tpadv = np.zeros(N, np.int64)
    tpadv[:tlen] = np.asarray(target, np.int64)
    prof = np.empty((m * R, 128), np.int32)
    for c in range(m):
        vals = mat[(tpadv * m + c).astype(np.int64)].astype(np.int64)
        prof[c * R:(c + 1) * R] = (
            ((vals + 2 * qe) & 255) ^ 128).reshape(R, 128)

    qpad = _pad_seq(np.asarray(query), max(round_up(qlen, 128), 1024))
    tpad = _pad_seq(np.asarray(target), N)
    if device_tb:
        # fused forward+walker: one execution, one packed fetch
        from . import wavefront_gg2 as _wfg2
        from .extz import fused_tb_parse
        pipe = _cached_fused_single(prm, 1 if p_rows >= R else 0,
                                    interpret)
        flat = np.asarray(pipe(jnp.asarray(qpad.reshape(-1)),
                               jnp.asarray(tpad), jnp.asarray(prof)))
        score = int(flat[0])
        cig, _tres = fused_tb_parse(flat, _wfg2.NSTATE_GG, 0, False)
        if cig is not None:
            return score, cig, None
        # the walk escaped the band upward: materialize p and replay
        # with the reference's exact flat row layout (its reads run
        # into the next diagonal)
        res, p = call(jnp.asarray(qpad.reshape(-1)), jnp.asarray(tpad),
                      jnp.asarray(prof))
    else:
        res, p = call(jnp.asarray(qpad.reshape(-1)), jnp.asarray(tpad),
                      jnp.asarray(prof))
        score = int(np.asarray(res)[0])
    p = np.asarray(p)
    st0, en0, st, en = band_bounds_rounded(n_diag, qlen, tlen, w)
    store_off = (np.zeros_like(st) if p_rows >= R
                 else st // 128 * 128)
    pmat = p.reshape(p.shape[0], -1)[:n_diag]
    # repack to the reference's n_col-wide rows so flat overflow reads
    # land on the same bytes (ksw2_gg2_sse.c:41-47)
    pspec = np.zeros((n_diag, n_col), np.int8)
    for r in range(n_diag):
        lo = int(st[r] - store_off[r])
        span = min(n_col, p_rows * 128 - lo)
        pspec[r, :span] = pmat[r, lo:lo + span]
    trace = Trace(pspec, st, None, n_col)
    cig = backtrack(pspec, st, None, n_col, tlen - 1, qlen - 1,
                    is_rot=True, store_off=st)
    return score, cig, trace


__all__ = ["gg2_device"]
