"""Per-launch ENQUEUE time (no fetch): strips vs wavefront, interleaved."""
import time
import numpy as np
import sys
import os as _os, sys as _sys
_repo = _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_sys.path.insert(0, _repo)
_sys.path.insert(0, _os.path.join(_repo, "tests"))

import jax
import jax.numpy as jnp
from ksw2_tpu.utils.ccache import ensure_compile_cache
ensure_compile_cache()
import refcmp
from ksw2_tpu.core.flags import Flag
from ksw2_tpu.core.matrix import encode_dna, simple_mat
from ksw2_tpu.ops.wavefront_strips import strips_records
from ksw2_tpu.ops import batch_pallas as bp
from ksw2_tpu.ops import wavefront_batch as wb
from ksw2_tpu.ops.bands import pad_rows, round_up

mat = simple_mat(5, 2, -4)
rng = np.random.default_rng(3)

for L, B in [(3000, 21), (1500, 42), (700, 84), (250, 256)]:
    pairs = []
    for _ in range(B):
        t, q = refcmp.random_pair(rng, L, divergence=0.15, indel=0.06)
        pairs.append((encode_dna(q)[:L], encode_dna(t)[:L]))
    Lq = max(len(q) for q, t in pairs)
    Lt = max(len(t) for q, t in pairs)
    Q = np.zeros((B, Lq), np.int32)
    T = np.zeros((B, Lt), np.int32)
    ql = np.zeros(B, np.int32)
    tl = np.zeros(B, np.int32)
    for i, (q, t) in enumerate(pairs):
        Q[i, :len(q)] = q
        T[i, :len(t)] = t
        ql[i], tl[i] = len(q), len(t)
    wv = np.maximum(ql, tl)

    def enq_strips():
        t0 = time.time()
        p = strips_records(Q, T, ql, tl, 5, mat, 4, 2, zdrop=100,
                           flag=Flag.SCORE_ONLY)
        dt = time.time() - t0
        return dt, p

    P = (Lt + 127) // 128
    Bpw = pad_rows(B, P)
    n_diag = max(round_up(int((ql + tl).max()) - 1, wb.CHUNK), wb.CHUNK)
    prmw = wb.BatchParams(n_rows=Bpw * P, n_diag=n_diag, m=5, sc_mch=2,
                          sc_mis=-4, sc_N=-2, q=4, e=2, zdrop=100,
                          flag=int(Flag.SCORE_ONLY), p=P)
    run_w = bp._cached_run(prmw, False)

    def enq_wavef():
        t0 = time.time()
        qpw = np.zeros((Bpw, Lq), np.int8)
        qpw[:B] = Q
        tpw = np.zeros((Bpw, Lt), np.int8)
        tpw[:B] = T
        lw = np.zeros((3, Bpw), np.int32)
        lw[0, :B], lw[1, :B], lw[2, :B] = ql, tl, wv
        p = run_w(jnp.asarray(qpw), jnp.asarray(tpw), jnp.asarray(lw[0]),
                  jnp.asarray(lw[1]), jnp.asarray(lw[2]))
        dt = time.time() - t0
        return dt, p

    # warm (also completes any compile)
    _, p1 = enq_strips()
    _, p2 = enq_wavef()
    np.asarray(p1[0]), np.asarray(p2)
    outs = []
    for it in range(3):
        ds, p1 = enq_strips()
        dw, p2 = enq_wavef()
        np.asarray(p1[0])   # drain queue between measurements
        np.asarray(p2)
        outs.append((ds, dw))
    best_s = min(d for d, _ in outs)
    best_w = min(d for _, d in outs)
    print(f"L={L:5d} B={B:4d}: strips enqueue {best_s*1e3:7.1f} ms | "
          f"wavef enqueue {best_w*1e3:7.1f} ms", flush=True)
