"""Per-bucket device-time profile of the mixed-512 workload (real TPU).

For each bucket: time N blocking reps of its engine call alone (enqueue +
wait), best-of, plus the enqueue-only slice.  Interleaved A/B per the
measurement rules (one process, round-robin reps).
"""
import os
import sys
import time

import numpy as np

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)
sys.path.insert(0, os.path.join(_repo, "tests"))

import refcmp

from ksw2_tpu.core.flags import Flag
from ksw2_tpu.core.matrix import encode_dna, simple_mat
from ksw2_tpu.batch import scheduler as sched
from ksw2_tpu.ops.batch_pallas import extz_batch_records

mat = simple_mat(5, 2, -4)
rngm = np.random.default_rng(777)
lensm = rngm.choice([150, 250, 400, 700, 1100, 1500, 3000], 512,
                    p=[.3, .25, .15, .12, .08, .06, .04])
jobs = []
for L in lensm:
    t, q = refcmp.random_pair(rngm, int(L), divergence=0.15, indel=0.06)
    jobs.append(sched.AlignJob(query=encode_dna(q), target=encode_dna(t)))

buckets = {}
for i, job in enumerate(jobs):
    key = sched._bucket_key(len(job.query), len(job.target))
    buckets.setdefault(key, []).append(i)

packed = []
for (Lq, Lt), idxs in sorted(buckets.items(),
                             key=lambda kv: -len(kv[1])):
    B = len(idxs)
    Q = np.zeros((B, Lq), np.int32)
    T = np.zeros((B, Lt), np.int32)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    wv = np.zeros(B, np.int32)
    for k, i in enumerate(idxs):
        job = jobs[i]
        Q[k, :len(job.query)] = job.query
        T[k, :len(job.target)] = job.target
        qlen[k] = len(job.query)
        tlen[k] = len(job.target)
        wv[k] = max(len(job.query), len(job.target))
    cells = sum(int(qlen[k]) * int(tlen[k]) for k in range(B))
    packed.append(dict(Lq=Lq, Lt=Lt, B=B, Q=Q, T=T, qlen=qlen, tlen=tlen,
                       wv=wv, cells=cells,
                       enq=[], tot=[]))

def one(b):
    t0 = time.time()
    ps = extz_batch_records(b["Q"], b["T"], b["qlen"], b["tlen"], 5, mat,
                            4, 2, b["wv"], zdrop=100, flag=Flag.SCORE_ONLY)
    t1 = time.time()
    outs = [np.asarray(p) for p in ps]
    t2 = time.time()
    b["enq"].append((t1 - t0) * 1e3)
    b["tot"].append((t2 - t0) * 1e3)

# warm all
for b in packed:
    one(b)
# interleaved reps
for rep in range(5):
    for b in packed:
        one(b)

print(f"{'Lq':>5} {'Lt':>5} {'B':>4} {'cells':>9} "
      f"{'enq_ms':>7} {'tot_ms':>7} {'Gc/s':>6}")
tot_best = 0.0
for b in packed:
    enq = min(b["enq"][1:])
    tot = min(b["tot"][1:])
    tot_best += tot
    print(f"{b['Lq']:>5} {b['Lt']:>5} {b['B']:>4} "
          f"{b['cells']/1e6:8.1f}M {enq:7.1f} {tot:7.1f} "
          f"{b['cells']/1e6/tot:6.2f}")
cells_all = sum(b["cells"] for b in packed)
print(f"sum of per-bucket best: {tot_best:.1f} ms "
      f"-> {cells_all/1e6/tot_best:.2f} Gc/s serial-bucket bound")
