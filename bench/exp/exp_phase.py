"""Phase-level timing of align_batch_scores: enqueue vs fetch, both arms."""
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
import ksw2_tpu.batch.scheduler as sched
import ksw2_tpu.ops.wavefront_strips as ws

mat = simple_mat(5, 2, -4)
rngm = np.random.default_rng(777)
lensm = rngm.choice([150, 250, 400, 700, 1100, 1500, 3000], 512,
                    p=[.3, .25, .15, .12, .08, .06, .04])
jobs = []
for L in lensm:
    t, q = refcmp.random_pair(rngm, int(L), divergence=0.15, indel=0.06)
    jobs.append(sched.AlignJob(query=encode_dna(q), target=encode_dna(t)))
jobs4 = jobs * 4

orig_dispatch_all = sched._dispatch_all
orig_copies = sched._start_host_copies
orig_unpack = sched._unpack_pending
phases = {}


def patched_dispatch_all(dispatch, items):
    t0 = time.time()
    out = orig_dispatch_all(dispatch, items)
    phases["enqueue"] = time.time() - t0
    return out


def patched_copies(pending):
    t0 = time.time()
    orig_copies(pending)
    phases["copies"] = time.time() - t0


def patched_unpack(pending, results, guard):
    t0 = time.time()
    orig_unpack(pending, results, guard)
    phases["unpack"] = time.time() - t0


sched._dispatch_all = patched_dispatch_all
sched._start_host_copies = patched_copies
sched._unpack_pending = patched_unpack

orig_elig = ws.strips_eligible


def run_once(tag):
    t0 = time.time()
    ezs = sched.align_batch_scores(jobs4, 5, mat, 4, 2, zdrop=100,
                                   flag=Flag.SCORE_ONLY)
    dt = time.time() - t0
    assert sum(ez.max for ez in ezs) == 4 * 165978
    print(f"{tag}: total {dt*1e3:6.0f}  enqueue {phases['enqueue']*1e3:6.0f}"
          f"  copies {phases['copies']*1e3:6.0f}"
          f"  unpack {phases['unpack']*1e3:6.0f}", flush=True)
    return dt


run_once("warm strips")
ws.strips_eligible = lambda *a, **k: False
run_once("warm old   ")
for it in range(3):
    ws.strips_eligible = orig_elig
    run_once("strips")
    run_once("strips")
    ws.strips_eligible = lambda *a, **k: False
    run_once("old   ")
    run_once("old   ")
