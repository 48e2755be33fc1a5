"""Phase-level profile of the mixed-512 scheduler row (real TPU).

Answers: where do the ~160 ms/call go when the strips kernel itself
measures 15 Gc/s on the whale bucket?  Breaks align_batch_scores into
bucketize / per-bucket host prep / enqueue / device wait / unpack with
wall timers, then prints a per-bucket table.

Run: python bench/profile_mixed.py  (one process; never concurrently
with another TPU process).
"""
import os
import sys
import time

import numpy as np

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)
sys.path.insert(0, os.path.join(_repo, "tests"))

import jax
import refcmp

from ksw2_tpu.core.flags import Flag
from ksw2_tpu.core.matrix import encode_dna, simple_mat
from ksw2_tpu.batch import scheduler as sched
from ksw2_tpu.batch.scheduler import AlignJob, align_batch_scores

mat = simple_mat(5, 2, -4)
rngm = np.random.default_rng(777)
lensm = rngm.choice([150, 250, 400, 700, 1100, 1500, 3000], 512,
                    p=[.3, .25, .15, .12, .08, .06, .04])
jobs = []
mcells = 0
for L in lensm:
    t, q = refcmp.random_pair(rngm, int(L), divergence=0.15, indel=0.06)
    jobs.append(AlignJob(query=encode_dna(q), target=encode_dna(t)))
    mcells += len(t) * len(q)
print(f"jobs=512 mcells={mcells/1e9:.3f} G", flush=True)

# ---- end-to-end, current scheduler
def run():
    ezs = align_batch_scores(jobs, 5, mat, 4, 2, zdrop=100,
                             flag=Flag.SCORE_ONLY)
    tot = sum(ez.max for ez in ezs)
    assert tot == 165978, tot

t0 = time.time()
run()
print(f"warm call: {time.time()-t0:.1f}s", flush=True)
for rep in range(3):
    t0 = time.time()
    run()
    dt = time.time() - t0
    print(f"e2e rep{rep}: {dt*1e3:.1f} ms = {mcells/1e9/dt:.2f} Gc/s",
          flush=True)

# ---- instrumented: wrap dispatch to time each bucket's host-side cost,
# then measure the device tail separately
orig_dispatch_all = sched._dispatch_all
rows = []

def timed_dispatch_all(dispatch, items):
    items = list(items)
    def timed(it):
        (Lq, Lt), idxs = it
        th0 = time.time()
        out = dispatch(it)
        th1 = time.time()
        rows.append(dict(Lq=Lq, Lt=Lt, B=len(idxs),
                         cells=sum(len(jobs[i].query) * len(jobs[i].target)
                                   for i in idxs),
                         host_ms=(th1 - th0) * 1e3))
        return out
    if len(items) <= 1:
        return [timed(it) for it in items]
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=min(8, len(items))) as ex:
        return list(ex.map(timed, items))

sched._dispatch_all = timed_dispatch_all
for rep in range(2):
    rows.clear()
    t0 = time.time()
    buckets = {}
    for i, job in enumerate(jobs):
        key = sched._bucket_key(len(job.query), len(job.target))
        buckets.setdefault(key, []).append(i)
    t_bucket = time.time() - t0

    t0 = time.time()
    ezs = align_batch_scores(jobs, 5, mat, 4, 2, zdrop=100,
                             flag=Flag.SCORE_ONLY)
    t_total = time.time() - t0
    assert sum(ez.max for ez in ezs) == 165978
    print(f"\n--- instrumented rep {rep}: total {t_total*1e3:.1f} ms "
          f"(bucketize alone {t_bucket*1e3:.1f} ms, "
          f"{len(rows)} buckets)", flush=True)
    rows.sort(key=lambda r: -r["cells"])
    hsum = 0.0
    for r in rows:
        print(f"  Lq={r['Lq']:>5} Lt={r['Lt']:>5} B={r['B']:>3} "
              f"cells={r['cells']/1e6:8.1f}M host_ms={r['host_ms']:7.1f}")
        hsum += r["host_ms"]
    print(f"  sum(host_ms across threads) = {hsum:.1f}")
sched._dispatch_all = orig_dispatch_all

# ---- device-only: pre-pack every bucket once, then time enqueue+wait
# (what the device actually costs with zero host prep)
from ksw2_tpu.ops.batch_pallas import extz_batch_records

packed = []
for (Lq, Lt), idxs in buckets.items():
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
    packed.append((Lq, Lt, Q, T, qlen, tlen, wv))

def device_only():
    t0 = time.time()
    all_pieces = []
    for (Lq, Lt, Q, T, qlen, tlen, wv) in packed:
        ps = extz_batch_records(Q, T, qlen, tlen, 5, mat, 4, 2, wv,
                                zdrop=100, flag=Flag.SCORE_ONLY)
        all_pieces.extend(ps)
    t_enq = time.time() - t0
    for p in all_pieces:
        cp = getattr(p, "copy_to_host_async", None)
        if cp:
            cp()
    outs = [np.asarray(p) for p in all_pieces]
    t_all = time.time() - t0
    return t_enq, t_all, outs

device_only()
for rep in range(3):
    t_enq, t_all, _ = device_only()
    print(f"prepacked rep{rep}: enqueue {t_enq*1e3:.1f} ms, "
          f"total {t_all*1e3:.1f} ms = {mcells/1e9/t_all:.2f} Gc/s",
          flush=True)
