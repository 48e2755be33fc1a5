"""Mesh-sharded scheduler path + scaling-efficiency measurement.

Runs on the suite's virtual 8-device CPU mesh (conftest).  Parity is the
hard assert; the efficiency number is printed, not asserted (virtual CPU
devices share host cores, so speedup is a weak lower bound of real ICI
scaling — BASELINE.md targets >= 85% to 2 hosts on hardware).
"""
import numpy as np

from ksw2_tpu.core.flags import Flag
from ksw2_tpu.core.matrix import simple_mat


def test_sharded_scheduler_run_fn():
    """align_batch_scores with the mesh run_fn == local results."""
    from ksw2_tpu.batch.scheduler import AlignJob, align_batch_scores
    from ksw2_tpu.parallel.mesh import make_mesh, make_sharded_run_fn

    rng = np.random.default_rng(5)
    mat = simple_mat(5, 2, -4)
    jobs = []
    for _ in range(37):                      # odd count forces padding
        L = int(rng.integers(40, 200))
        q = rng.integers(0, 4, size=L).astype(np.int32)
        t = np.where(rng.random(L) < 0.15,
                     rng.integers(0, 4, size=L), q).astype(np.int32)
        jobs.append(AlignJob(query=q, target=t))

    mesh = make_mesh(8)
    sharded = align_batch_scores(jobs, 5, mat, 4, 2, zdrop=100,
                                 flag=Flag.SCORE_ONLY,
                                 run_fn=make_sharded_run_fn(mesh))
    local = align_batch_scores(jobs, 5, mat, 4, 2, zdrop=100,
                               flag=Flag.SCORE_ONLY)
    for i, (a, b) in enumerate(zip(sharded, local)):
        for f in ("max", "max_t", "max_q", "mqe", "mqe_t", "mte", "mte_q",
                  "score", "zdropped"):
            assert getattr(a, f) == getattr(b, f), (i, f)


def test_scaling_efficiency_runs():
    from ksw2_tpu.parallel.mesh import scaling_efficiency

    t1, tn, eff = scaling_efficiency(8, B_per_dev=16, L=64, reps=2)
    assert t1 > 0 and tn > 0 and eff > 0
    print(f"virtual-8 scaling efficiency: {eff:.2f} "
          f"(t1={t1*1e3:.1f}ms, t8={tn*1e3:.1f}ms)")
