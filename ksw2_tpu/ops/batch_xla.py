"""Batched wavefront DP as a pure-XLA program (no Pallas).

This is the *inter-pair* parallel axis: thousands of padded/bucketed pairs
advance one anti-diagonal per loop step, vectorized over the batch.  It is
backend-agnostic (TPU/CPU), `shard_map`-able over a device mesh (the batch
axis is embarrassingly parallel), and keeps the same per-pair byte-parity
semantics as the single-pair Pallas kernel (16-lane band rounding, int8
wrap emulation, exact-max argmax order, Z-drop stopping diagonal).

Score-only mode (the high-throughput production path).  CIGAR batches run
through the per-pair Pallas kernel instead (direction matrices don't batch
economically).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.flags import NEG_INF, Flag

I32 = jnp.int32
_INT_MIN = -(2 ** 31) + 1
_BIGKEY = 2 ** 30


def _w8(xv):
    return ((xv + 128) & 255) - 128


class BatchSpec(NamedTuple):
    """Static bucket configuration (one XLA compilation per spec)."""
    Lq: int          # padded query length
    Lt: int          # padded target length (multiple of 16)
    m: int
    sc_mch: int
    sc_mis: int
    sc_N: int
    q: int
    e: int
    zdrop: int
    flag: int        # SCORE_ONLY implied; APPROX_MAX/APPROX_DROP honored


def _shift1_b(arr, first):
    """Batched shift along the t axis: out[:, k] = arr[:, k-1], out[:,0]=first."""
    return jnp.concatenate([first[:, None], arr[:, :-1]], axis=1)


@functools.partial(jax.jit, static_argnums=(0,))
def extz_batch_scores(spec: BatchSpec, query, target, qlen, tlen, w):
    """Batched one-piece extension, score-only.

    Args:
      query:  (B, Lq) int32 encoded bases (zero-padded)
      target: (B, Lt) int32
      qlen, tlen, w: (B,) int32 per-pair params (w >= 0 resolved)

    Returns a dict of (B,) int32 result fields matching ``ksw_extz_t``.
    """
    B, Lt = target.shape
    N = spec.Lt
    qe = spec.q + spec.e
    flag = Flag(spec.flag)
    approx = bool(flag & Flag.APPROX_MAX)
    n_diag_max = spec.Lq + spec.Lt - 1
    tvec = jnp.arange(N, dtype=I32)[None, :]

    tn = target == spec.m - 1

    state = dict(
        u=jnp.zeros((B, N), I32),
        v=jnp.zeros((B, N), I32),
        x=jnp.zeros((B, N), I32),
        y=jnp.zeros((B, N), I32),
        s=jnp.zeros((B, N), I32),
        Q=jnp.zeros((B, N), I32),
        H=jnp.full((B, N), NEG_INF, I32),
        max=jnp.zeros((B,), I32),
        max_t=jnp.full((B,), -1, I32),
        max_q=jnp.full((B,), -1, I32),
        mqe=jnp.full((B,), NEG_INF, I32),
        mqe_t=jnp.full((B,), -1, I32),
        mte=jnp.full((B,), NEG_INF, I32),
        mte_q=jnp.full((B,), -1, I32),
        score=jnp.full((B,), NEG_INF, I32),
        zdropped=jnp.zeros((B,), I32),
        fin=jnp.zeros((B,), I32),
        H0=jnp.zeros((B,), I32),
        last_H0_t=jnp.zeros((B,), I32),
        last_st=jnp.full((B,), -1, I32),
        last_en=jnp.full((B,), -1, I32),
    )

    def gather(arr, idx):
        return jnp.take_along_axis(arr, idx[:, None], axis=1)[:, 0]

    def body(r, st_):
        st = dict(st_)
        n_diag = qlen + tlen - 1
        st0 = jnp.maximum(0, jnp.maximum(r - qlen + 1, (r - w + 1) >> 1))
        en0 = jnp.minimum(tlen - 1, jnp.minimum(r, (r + w) >> 1))
        empty = st0 > en0
        live = (r < n_diag) & (st["fin"] == 0)
        act = live & jnp.logical_not(empty)
        # empty band terminates with zdropped=1 (ksw2_extz2_sse.c:111-114)
        st["zdropped"] = jnp.where(live & empty, 1, st["zdropped"])
        st["fin"] = jnp.where(live & empty, 1, st["fin"])

        stb = st0 // 16 * 16
        enb = (en0 + 16) // 16 * 16 - 1
        in_range = (stb - 1 >= st["last_st"]) & (stb - 1 <= st["last_en"])
        need_ov = (stb == 0) | jnp.logical_not(in_range)
        ov_v = jnp.where(stb == 0, ((r > 0).astype(I32) * spec.q), 0)

        am = act[:, None]
        # first-column presets
        col_mask = am & (enb >= r)[:, None] & (tvec == r)
        ucol = ((r > 0).astype(I32) * spec.q)
        u0 = jnp.where(col_mask, ucol, st["u"])
        y0 = jnp.where(col_mask, 0, st["y"])

        # reversed-query window
        qv = gather(query, jnp.minimum(jnp.maximum(r, 0), jnp.maximum(qlen - 1, 0)))
        Qn = jnp.where(am, _shift1_b(st["Q"], qv), st["Q"])
        # score profile
        fill_hi = st0 + ((en0 - st0) // 16) * 16 + 15
        eq = target == Qn
        nm = tn | (Qn == spec.m - 1)
        sval = jnp.where(eq, spec.sc_mch, spec.sc_mis)
        sval = jnp.where(nm, spec.sc_N, sval)
        smask = am & (tvec >= st0[:, None]) & (tvec <= fill_hi[:, None])
        s = jnp.where(smask, sval, st["s"])

        ovm = tvec == stb[:, None]
        xs = jnp.where(ovm & need_ov[:, None], 0, _shift1_b(st["x"], jnp.zeros((B,), I32)))
        vs_shift = _shift1_b(st["v"], ov_v)
        vs = jnp.where(ovm & need_ov[:, None], ov_v[:, None], vs_shift)
        a = _w8(xs + vs)
        b = _w8(y0 + u0)
        zz = _w8(s + 2 * qe)
        z = jnp.maximum(zz, a)
        z = jnp.where((z & 255) > (b & 255), z, b)        # max_epu8
        clamp = spec.sc_mch + 2 * qe
        cb = clamp & 0xFF
        cc = cb - 256 if cb > 127 else cb
        z = jnp.where((z & 255) < cb, z, cc)              # min_epu8 vs const
        unew = _w8(z - vs)
        vnew = _w8(z - u0)
        z2 = _w8(z - spec.q)
        a = _w8(a - z2)
        b = _w8(b - z2)
        bmask = am & (tvec >= stb[:, None]) & (tvec <= enb[:, None])
        st["u"] = jnp.where(bmask, unew, u0)
        st["v"] = jnp.where(bmask, vnew, v0 := st["v"])
        st["x"] = jnp.where(bmask, jnp.maximum(a, 0), st["x"])
        st["y"] = jnp.where(bmask, jnp.maximum(b, 0), y0)
        st["Q"] = Qn
        st["s"] = s
        del v0

        if not approx:
            vu = st["v"] & 0xFF
            uu = st["u"] & 0xFF
            is0 = r == 0
            h_en0 = jnp.where(
                en0 > 0,
                gather(st["H"], jnp.maximum(en0 - 1, 0)) + gather(uu, en0) - qe,
                gather(st["H"], en0) + gather(vu, en0) - qe,
            )
            h0val = vu[:, 0] - 2 * qe
            h_last = jnp.where(is0, h0val, h_en0)
            scan_mask = bmask & (tvec >= st0[:, None]) & (tvec < en0[:, None]) \
                & jnp.logical_not(is0)
            Hnew = st["H"] + vu - qe
            H = jnp.where(scan_mask, Hnew, st["H"])
            M = jnp.maximum(
                jnp.max(jnp.where(scan_mask, Hnew, _INT_MIN), axis=1), h_last)
            en1 = st0 + (en0 - st0) // 4 * 4
            cls = (tvec - st0[:, None]) & 3
            key = jnp.where(tvec < en1[:, None], cls * (1 << 26) + tvec,
                            (1 << 28) + tvec)
            keym = jnp.where(scan_mask & (Hnew == M[:, None]), key, _BIGKEY)
            kmin = jnp.min(keym, axis=1)
            max_t = jnp.where(h_last == M, en0, kmin & ((1 << 26) - 1))
            max_t = jnp.where(is0, 0, max_t)
            H = jnp.where(am & (tvec == en0[:, None]), h_last[:, None], H)
            st["H"] = H
            upd_mte = act & (en0 == tlen - 1) & (h_last > st["mte"])
            st["mte"] = jnp.where(upd_mte, h_last, st["mte"])
            st["mte_q"] = jnp.where(upd_mte, r - enb, st["mte_q"])
            h_st0 = gather(H, st0)
            upd_mqe = act & (r - st0 == qlen - 1) & (h_st0 > st["mqe"])
            st["mqe"] = jnp.where(upd_mqe, h_st0, st["mqe"])
            st["mqe_t"] = jnp.where(upd_mqe, st0, st["mqe_t"])
            _zdrop(st, act, M, r, max_t)
            fin_sc = act & (r == qlen + tlen - 2) & (en0 == tlen - 1)
            st["score"] = jnp.where(fin_sc, h_last, st["score"])
        else:
            vu = st["v"] & 0xFF
            uu = st["u"] & 0xFF
            lt = st["last_H0_t"]
            c1 = (lt >= st0) & (lt <= en0)
            c2 = (lt + 1 >= st0) & (lt + 1 <= en0)
            d0 = gather(vu, lt) - qe
            d1 = gather(uu, jnp.minimum(lt + 1, N - 1)) - qe
            both = c1 & c2
            newH0 = jnp.where(both, st["H0"] + jnp.maximum(d0, d1),
                              jnp.where(c1, st["H0"] + d0, st["H0"] + d1))
            newlt = jnp.where(both, jnp.where(d0 > d1, lt, lt + 1),
                              jnp.where(c1, lt, lt + 1))
            is0 = r == 0
            h00 = vu[:, 0] - 2 * qe
            st["H0"] = jnp.where(act, jnp.where(is0, h00, newH0), st["H0"])
            st["last_H0_t"] = jnp.where(act, jnp.where(is0, 0, newlt),
                                        st["last_H0_t"])
            if flag & Flag.APPROX_DROP:
                _zdrop(st, act & jnp.logical_not(is0), st["H0"], r,
                       st["last_H0_t"])
            fin_sc = act & (r == qlen + tlen - 2) & (en0 == tlen - 1)
            st["score"] = jnp.where(fin_sc, st["H0"], st["score"])

        st["last_st"] = jnp.where(act, stb, st["last_st"])
        st["last_en"] = jnp.where(act, enb, st["last_en"])
        return st

    def _zdrop(st, act, Hval, r, tt):
        better = act & (Hval > st["max"])
        mt, mq = st["max_t"], st["max_q"]
        tl = tt - mt
        ql = (r - tt) - mq
        l = jnp.abs(tl - ql)
        trig = (act & jnp.logical_not(Hval > st["max"]) & (tt >= mt)
                & (r - tt >= mq) & (spec.zdrop >= 0)
                & (st["max"] - Hval > spec.zdrop + l * spec.e))
        st["max"] = jnp.where(better, Hval, st["max"])
        st["max_t"] = jnp.where(better, tt, mt)
        st["max_q"] = jnp.where(better, r - tt, mq)
        st["zdropped"] = jnp.where(trig, 1, st["zdropped"])
        st["fin"] = jnp.where(trig, 1, st["fin"])

    # NOTE: lax.fori_loop miscompiles this dict-carry loop under jit on CPU
    # (stale reads of the previous iteration's state; scan and unrolled are
    # correct) -- observed with jax 0.8.x.  lax.scan is used instead.
    def _sbody(carry, r):
        return body(r, carry), None

    out, _ = jax.lax.scan(_sbody, state, jnp.arange(n_diag_max, dtype=I32))
    return {k: out[k] for k in
            ("max", "max_t", "max_q", "mqe", "mqe_t", "mte", "mte_q",
             "score", "zdropped")}


__all__ = ["BatchSpec", "extz_batch_scores"]
