"""Round-4 mixed-row measurement: e2e, streamed, whale-on-strips."""
import os as _os, sys as _sys, time
_repo = _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_sys.path.insert(0, _repo)
_sys.path.insert(0, _os.path.join(_repo, "tests"))

import numpy as np
from ksw2_tpu.utils.ccache import ensure_compile_cache
ensure_compile_cache()
import refcmp
from ksw2_tpu.core.flags import Flag
from ksw2_tpu.core.matrix import encode_dna, simple_mat
from ksw2_tpu.batch.scheduler import (AlignJob, align_batch_scores,
                                      align_batch_scores_async,
                                      _bucket_key_scores)

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

buckets = {}
for j in jobs:
    buckets.setdefault(_bucket_key_scores(len(j.query), len(j.target)), []).append(1)
print("buckets:", sorted((k, len(v)) for k, v in buckets.items()),
      flush=True)
print(f"mcells={mcells/1e9:.3f}G", flush=True)

def run():
    ezs = align_batch_scores(jobs, 5, mat, 4, 2, zdrop=100,
                             flag=Flag.SCORE_ONLY)
    tot = sum(ez.max for ez in ezs)
    assert tot == 165978, tot

t0 = time.time(); run(); print(f"warm: {time.time()-t0:.1f}s", flush=True)

for rep in range(6):
    t0 = time.time(); run(); dt = time.time()-t0
    print(f"e2e rep{rep}: {dt*1e3:.1f} ms = {mcells/1e9/dt:.2f} Gc/s",
          flush=True)

def stream(k=8):
    t0 = time.time()
    hs = [align_batch_scores_async(jobs, 5, mat, 4, 2, zdrop=100,
                                   flag=Flag.SCORE_ONLY) for _ in range(k)]
    for h in hs:
        tot = sum(ez.max for ez in h.result())
        assert tot == 165978, tot
    return time.time() - t0

stream(2)
for rep in range(3):
    dt = stream(8)
    print(f"stream8 rep{rep}: {dt*1e3:.1f} ms = {8*mcells/1e9/dt:.2f} Gc/s",
          flush=True)
