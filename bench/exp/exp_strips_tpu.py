"""TPU smoke: strips kernel compile + parity + whale-bucket timing."""
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
from ksw2_tpu.ops.wavefront_strips import strips_records, _cached_strips_run
from ksw2_tpu.ops.batch_pallas import unpack_records
from ksw2_tpu.spec import diagdiff

MAT = simple_mat(5, 2, -4)
print("backend:", jax.default_backend(), flush=True)

# --- parity: small mixed batch on the real chip
rng = np.random.default_rng(5)
pairs = []
for L in (64, 129, 300, 450, 37, 256):
    t, q = refcmp.random_pair(rng, L, divergence=0.18, indel=0.08,
                              with_n=True)
    pairs.append((encode_dna(q), encode_dna(t)))
B = len(pairs)
Lq = max(len(q) for q, t in pairs)
Lt = max(len(t) for q, t in pairs)
Q = np.zeros((B, Lq), np.int8)
T = np.zeros((B, Lt), np.int8)
qlen = np.zeros(B, np.int32)
tlen = np.zeros(B, np.int32)
for i, (q, t) in enumerate(pairs):
    Q[i, :len(q)] = q
    T[i, :len(t)] = t
    qlen[i], tlen[i] = len(q), len(t)
t0 = time.time()
recs = np.concatenate([np.asarray(p) for p in strips_records(
    Q, T, qlen, tlen, 5, MAT, 4, 2, zdrop=100,
    flag=Flag.SCORE_ONLY)], axis=0)
print(f"compile+run1 {time.time()-t0:.1f}s", flush=True)
out = unpack_records(recs, -4, 4, 2)
bad = 0
for i, (qs, ts) in enumerate(pairs):
    ez, _ = diagdiff.extz2(qs, ts, 5, MAT, 4, 2, w=-1, zdrop=100,
                           flag=Flag.SCORE_ONLY)
    want = dict(max=ez.max, max_t=ez.max_t, max_q=ez.max_q, mqe=ez.mqe,
                mqe_t=ez.mqe_t, mte=ez.mte, mte_q=ez.mte_q,
                score=ez.score, zdropped=int(ez.zdropped))
    got = {k: int(out[k][i]) for k in want}
    if got != want:
        bad += 1
        print(f"MISMATCH {i}: " +
              str({k: (got[k], want[k]) for k in want if got[k] != want[k]}),
              flush=True)
print("parity bad =", bad, flush=True)

# --- whale-bucket timing: 17 x 3000bp, zdrop=100 (the mixed bench's
# dominant bucket, currently ~44 ms device via wavefront P=24)
B2 = 17
L2 = 3000
pairs2 = []
for _ in range(B2):
    t, q = refcmp.random_pair(rng, L2, divergence=0.15, indel=0.06)
    pairs2.append((encode_dna(q)[:L2], encode_dna(t)[:L2]))
Lq2 = max(len(q) for q, t in pairs2)
Lt2 = max(len(t) for q, t in pairs2)
Q2 = np.zeros((B2, Lq2), np.int8)
T2 = np.zeros((B2, Lt2), np.int8)
q2l = np.zeros(B2, np.int32)
t2l = np.zeros(B2, np.int32)
for i, (q, t) in enumerate(pairs2):
    Q2[i, :len(q)] = q
    T2[i, :len(t)] = t
    q2l[i], t2l[i] = len(q), len(t)

t0 = time.time()
pieces = strips_records(Q2, T2, q2l, t2l, 5, MAT, 4, 2, zdrop=100,
                        flag=Flag.SCORE_ONLY)
r0 = np.concatenate([np.asarray(p) for p in pieces], axis=0)
print(f"whale compile+run1 {time.time()-t0:.1f}s", flush=True)
o2 = unpack_records(r0, -4, 4, 2)
bad2 = 0
for i, (qs, ts) in enumerate(pairs2[:5]):
    ez, _ = diagdiff.extz2(qs, ts, 5, MAT, 4, 2, w=-1, zdrop=100,
                           flag=Flag.SCORE_ONLY)
    if (int(o2["max"][i]), int(o2["score"][i])) != (ez.max, ez.score):
        bad2 += 1
        print("whale mismatch", i, int(o2["max"][i]), ez.max,
              int(o2["score"][i]), ez.score, flush=True)
print("whale parity (5 spot) bad =", bad2, flush=True)

# chained timing through the cached run fn
from ksw2_tpu.ops.wavefront_strips import StripParams, _pad_counts, CH
from ksw2_tpu.ops.bands import round_up
S = (L2 + 127) // 128
Bp = _pad_counts(B2, S)
tlenp = round_up(L2, CH)
t_real = tlenp + S - 1
t_pad = round_up(t_real + 1, 128)
prm = StripParams(n_rows=Bp * S, s=S, tv=tlenp, t_pad=t_pad,
                  t_real=t_real, m=5, q=4, e=2, mat0=2, sc_mis=-4,
                  sc_N=-2, zdrop=100, flag=int(Flag.SCORE_ONLY))
run = _cached_strips_run(prm, False)
Qp = np.zeros((Bp, S * 128), np.int8)
Qp[:B2, :Lq2] = Q2
Tp = np.zeros((Bp, tlenp), np.int8)
Tp[:B2, :Lt2] = T2
lens = np.zeros((2, Bp), np.int32)
lens[0, :B2], lens[1, :B2] = q2l, t2l
dQ, dT = jnp.asarray(Qp), jnp.asarray(Tp)
dql, dtl = jnp.asarray(lens[0]), jnp.asarray(lens[1])


def chain(reps):
    acc = run(dQ, dT, dql, dtl)
    cur = dQ
    t0 = time.time()
    for _ in range(reps):
        cur = jnp.roll(cur, 1, axis=0)
        acc = acc + run(cur, dT, dql, dtl)
    np.asarray(acc)
    return (time.time() - t0) / reps


chain(3)
for _ in range(3):
    dt = chain(10)
    cells = B2 * L2 * L2
    print(f"whale: {dt*1e3:.1f} ms/launch  {cells/dt/1e9:.1f} Gc/s "
          f"(vs ~3.5 via wavefront P=24)", flush=True)
