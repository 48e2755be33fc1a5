"""Chained device-resident A/B per bucket shape: strips vs wavefront/band.

Amortized launch cost (pipelined chains, one fetch), interleaved arms.
"""
import time
import numpy as np
import sys
import os as _os, sys as _sys
_repo = _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_sys.path.insert(0, _repo)
_sys.path.insert(0, _os.path.join(_repo, "tests"))

import jax.numpy as jnp
from ksw2_tpu.utils.ccache import ensure_compile_cache
ensure_compile_cache()
import refcmp
from ksw2_tpu.core.flags import Flag
from ksw2_tpu.core.matrix import encode_dna, simple_mat
from ksw2_tpu.ops import batch_pallas as bp
from ksw2_tpu.ops import wavefront_batch as wb
from ksw2_tpu.ops.bands import pad_rows, round_up
from ksw2_tpu.ops.wavefront_strips import (StripParams, _cached_strips_run,
                                           _pad_counts, CH)
from ksw2_tpu.ops.packio import pack_bases

mat = simple_mat(5, 2, -4)
rng = np.random.default_rng(3)

# bucket shapes from the 2048 mixed workload: (L, B_launch)
CASES = [(3000, 21), (1500, 42), (700, 84), (250, 256)]

for L, B in CASES:
    pairs = []
    for _ in range(B):
        t, q = refcmp.random_pair(rng, L, divergence=0.15, indel=0.06)
        pairs.append((encode_dna(q)[:L], encode_dna(t)[:L]))
    Lq = max(len(q) for q, t in pairs)
    Lt = max(len(t) for q, t in pairs)
    Q = np.zeros((B, Lq), np.int8)
    T = np.zeros((B, Lt), np.int8)
    ql = np.zeros(B, np.int32)
    tl = np.zeros(B, np.int32)
    for i, (q, t) in enumerate(pairs):
        Q[i, :len(q)] = q
        T[i, :len(t)] = t
        ql[i], tl[i] = len(q), len(t)
    wv = np.maximum(ql, tl)
    cells = int((ql.astype(np.int64) * tl).sum())

    # strips arm (device-resident packed inputs)
    S = (Lq + 127) // 128
    Bp = _pad_counts(B, S)
    tlenp = max(round_up(Lt, CH), CH)
    t_real = tlenp + S - 1
    t_pad = round_up(t_real + 1, 128)
    prm = StripParams(n_rows=Bp * S, s=S, tv=tlenp, t_pad=t_pad,
                      t_real=t_real, m=5, q=4, e=2, mat0=2, sc_mis=-4,
                      sc_N=-2, zdrop=100, flag=int(Flag.SCORE_ONLY))
    run_s = _cached_strips_run(prm, False)
    qpad = np.zeros((Bp, S * 128), np.int8)
    qpad[:B, :Lq] = Q
    tpad = np.zeros((Bp, tlenp), np.int8)
    tpad[:B, :Lt] = T
    lens = np.zeros((2, Bp), np.int32)
    lens[0, :B], lens[1, :B] = ql, tl
    dQs = jnp.asarray(pack_bases(qpad))
    dTs = jnp.asarray(pack_bases(tpad))
    dls = (jnp.asarray(lens[0]), jnp.asarray(lens[1]))

    def chain_s(reps):
        acc = run_s(dQs, dTs, *dls)
        cur = dQs
        t0 = time.time()
        for _ in range(reps):
            cur = jnp.roll(cur, 1, axis=0)
            acc = acc + run_s(cur, dTs, *dls)
        np.asarray(acc)
        return (time.time() - t0) / reps

    # wavefront arm
    P = (Lt + 127) // 128
    Bpw = pad_rows(B, P)
    n_diag = int((ql + tl).max()) - 1
    n_diag = max(round_up(n_diag, wb.CHUNK), wb.CHUNK)
    prmw = wb.BatchParams(n_rows=Bpw * P, n_diag=n_diag, m=5, sc_mch=2,
                          sc_mis=-4, sc_N=-2, q=4, e=2, zdrop=100,
                          flag=int(Flag.SCORE_ONLY), p=P)
    run_w = bp._cached_run(prmw, False)
    qpw = np.zeros((Bpw, Lq), np.int8)
    qpw[:B] = Q
    tpw = np.zeros((Bpw, Lt), np.int8)
    tpw[:B] = T
    lw = np.zeros((3, Bpw), np.int32)
    lw[0, :B], lw[1, :B], lw[2, :B] = ql, tl, wv
    dQw, dTw = jnp.asarray(qpw), jnp.asarray(tpw)
    dlw = tuple(jnp.asarray(lw[i]) for i in range(3))

    def chain_w(reps):
        acc = run_w(dQw, dTw, *dlw)
        cur = dQw
        t0 = time.time()
        for _ in range(reps):
            cur = jnp.roll(cur, 1, axis=0)
            acc = acc + run_w(cur, dTw, *dlw)
        np.asarray(acc)
        return (time.time() - t0) / reps

    reps = max(4, min(30, int(3e8 // cells)))
    chain_s(2)
    chain_w(2)
    ds = min(chain_s(reps), chain_s(reps))
    dw = min(chain_w(reps), chain_w(reps))
    ds2 = min(chain_s(reps), chain_s(reps))
    print(f"L={L:5d} B={B:4d}: strips {min(ds,ds2)*1e3:7.2f} ms "
          f"{cells/min(ds,ds2)/1e9:6.2f} Gc/s | wavef {dw*1e3:7.2f} ms "
          f"{cells/dw/1e9:6.2f} Gc/s", flush=True)
