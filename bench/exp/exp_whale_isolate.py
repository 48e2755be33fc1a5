"""Isolate whale-bucket cost: direct cached-run chain (device-resident)
vs strips_records per-call path. A/B interleaved in one process."""
import os as _os, sys as _sys, time
_repo = _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_sys.path.insert(0, _repo)
_sys.path.insert(0, _os.path.join(_repo, "tests"))

import numpy as np
import jax.numpy as jnp
from ksw2_tpu.utils.ccache import ensure_compile_cache
ensure_compile_cache()
import refcmp
from ksw2_tpu.core.flags import Flag
from ksw2_tpu.core.matrix import encode_dna, simple_mat
from ksw2_tpu.ops.wavefront_strips import (strips_records,
                                           _cached_strips_run, StripParams,
                                           _plan_rows, _canon_s,
                                           _canon_tlenp, CH)
from ksw2_tpu.ops.packio import pack_bases

MAT = simple_mat(5, 2, -4)
rng = np.random.default_rng(777)
B2 = 17
pairs2 = []
for _ in range(B2):
    t, q = refcmp.random_pair(rng, 3000, divergence=0.15, indel=0.06)
    pairs2.append((encode_dna(q), encode_dna(t)))
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
cells = int((q2l.astype(np.int64) * t2l).sum())
print(f"whale {B2} pairs, Lq={Lq2} Lt={Lt2}, {cells/1e6:.0f}M cells",
      flush=True)

S0 = _canon_s(max(1, (Lq2 + 127) // 128))
tlenp = _canon_tlenp(Lt2)
S, Bp = _plan_rows(B2, S0, tlenp)
t_real = tlenp + S - 1
t_pad = ((t_real + 1 + 127) // 128) * 128
prm = StripParams(n_rows=Bp * S, s=S, tv=tlenp, t_pad=t_pad,
                  t_real=t_real, m=5, q=4, e=2, mat0=2, sc_mis=-4,
                  sc_N=-2, zdrop=100, flag=int(Flag.SCORE_ONLY))
print(f"plan: S={S} Bp={Bp} R={Bp*S} t_pad={t_pad}", flush=True)
run = _cached_strips_run(prm, False)
qpad = np.zeros((Bp, S * 128), np.int8)
qpad[:B2, :Lq2] = Q2
tpad = np.zeros((Bp, tlenp), np.int8)
tpad[:B2, :Lt2] = T2
lens = np.zeros((2, Bp), np.int32)
lens[0, :B2], lens[1, :B2] = q2l, t2l
dQ = jnp.asarray(pack_bases(qpad))
dT = jnp.asarray(pack_bases(tpad))
dql, dtl = jnp.asarray(lens[0]), jnp.asarray(lens[1])

def chain_direct(reps=8):
    t0 = time.time()
    outs = [run(dQ, dT, dql, dtl) for _ in range(reps)]
    for o in outs:
        np.asarray(o)
    return (time.time() - t0) / reps * 1e3

def chain_records(reps=8):
    t0 = time.time()
    ps = []
    for _ in range(reps):
        ps.extend(strips_records(Q2, T2, q2l, t2l, 5, MAT, 4, 2,
                                 zdrop=100, flag=Flag.SCORE_ONLY))
    for p in ps:
        np.asarray(p)
    return (time.time() - t0) / reps * 1e3

chain_direct(2); chain_records(2)
for rep in range(3):
    a = chain_direct()
    b = chain_records()
    print(f"rep{rep}: direct {a:6.1f} ms ({cells/1e6/a:5.2f} Gc/s)   "
          f"records {b:6.1f} ms ({cells/1e6/b:5.2f} Gc/s)", flush=True)
