"""Device op: linear-gap extension on TPU (extf2 semantics).

Host wrapper around :mod:`ksw2_tpu.ops.wavefront_extf`.  Byte parity target:
``ksw_extf2_sse`` (score-only by contract, ksw2_extf2_sse.c:12-15).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.result import ExtzResult
from . import wavefront as wf
from . import wavefront_extf as wff
from .bands import round_up


@functools.lru_cache(maxsize=256)
def _cached_call(prm: wff.ExtfParams, interpret: bool):
    return jax.jit(wff.build_extf_call(prm, interpret=interpret))


def extf2_device(
    query: np.ndarray,
    target: np.ndarray,
    mch: int,
    mis: int,
    e: int,
    w: int = -1,
    xdrop: int = -1,
    interpret: bool = False,
    chunk: int = 512,
) -> ExtzResult:
    """Run the extf wavefront kernel for one pair; returns the ez record."""
    if not interpret and jax.default_backend() != "tpu":
        interpret = True          # Pallas TPU kernels interpret elsewhere
    ez = ExtzResult()
    ez.reset()
    qlen, tlen = len(query), len(target)
    if qlen <= 0 or tlen <= 0:
        return ez
    mis = int(mis) if int(mis) < 0 else -int(mis)
    if w < 0:
        w = max(tlen, qlen)
    tlen_ = (tlen + 15) // 16
    n_diag = qlen + tlen - 1
    N = max(round_up(tlen_ * 16, 128), 1024)

    prm = wff.ExtfParams(
        qlen=qlen, tlen=tlen, mch=int(mch), mis=mis, e=int(e), w=int(w),
        xdrop=int(xdrop), chunk=int(chunk), n_diag=n_diag, n_rows=N // 128,
    )
    call = _cached_call(prm, interpret)

    qpad = np.zeros(max(round_up(qlen, 128), 1024), np.int32)
    qpad[:qlen] = np.asarray(query, np.int32)
    tpad = np.zeros((N // 128, 128), np.int32)
    tpad.reshape(-1)[:tlen] = np.asarray(target, np.int32)
    res = np.asarray(call(jnp.asarray(qpad), jnp.asarray(tpad))[0])

    ez.max = int(res[wf.MAX])
    ez.max_t = int(res[wf.MAXT])
    ez.max_q = int(res[wf.MAXQ])
    ez.score = int(res[wf.SCORE])
    ez.zdropped = bool(res[wf.ZDROP])
    return ez


__all__ = ["extf2_device"]
