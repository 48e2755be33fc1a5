"""In-process interleaved A/B: mixed2048 scheduler with/without strips."""
import time
import numpy as np
import sys
import os as _os, sys as _sys
_repo = _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_sys.path.insert(0, _repo)
_sys.path.insert(0, _os.path.join(_repo, "tests"))

from ksw2_tpu.utils.ccache import ensure_compile_cache
ensure_compile_cache()
import refcmp
from ksw2_tpu.core.flags import Flag
from ksw2_tpu.core.matrix import encode_dna, simple_mat
from ksw2_tpu.batch.scheduler import AlignJob, align_batch_scores
import ksw2_tpu.ops.wavefront_strips as ws

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
jobs4 = jobs * 4
orig_elig = ws.strips_eligible


def run_once():
    t0 = time.time()
    ezs = align_batch_scores(jobs4, 5, mat, 4, 2, zdrop=100,
                             flag=Flag.SCORE_ONLY)
    dt = time.time() - t0
    assert sum(ez.max for ez in ezs) == 4 * 165978
    return dt


run_once()
ws.strips_eligible = lambda *a, **k: False
run_once()
ws.strips_eligible = orig_elig

for it in range(3):
    ws.strips_eligible = orig_elig
    da = min(run_once(), run_once())
    ws.strips_eligible = lambda *a, **k: False
    db = min(run_once(), run_once())
    print(f"strips {da*1e3:6.0f} ms {4*mcells/da/1e9:5.2f} Gc/s | "
          f"old {db*1e3:6.0f} ms {4*mcells/db/1e9:5.2f} Gc/s", flush=True)
