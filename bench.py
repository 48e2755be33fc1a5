"""Headline benchmark: DP Gcells/s on the reference's 50k pair, one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: ksw2_extz2_sse SSE4.1 exact-max score-only on the same pair,
measured on this machine at 1.31 Gcells/s (BASELINE.md).
"""
from __future__ import annotations

import gzip
import json
import sys
import time

import numpy as np

BASELINE_GCELLS = 1.31  # ksw2 extz2_sse -s (exact max), this machine


def read_fa(path: str) -> str:
    op = gzip.open if path.endswith(".gz") else open
    cur = []
    with op(path, "rt") as f:
        for line in f:
            line = line.strip()
            if line.startswith(">"):
                if cur:
                    break
            else:
                cur.append(line)
    return "".join(cur)


def _tpu_tunnel_alive(timeout_s: float = 90.0) -> bool:
    """Probe the axon TPU tunnel in a subprocess.

    When the tunnel is down, jax backend init blocks forever (the platform
    plugin's sitecustomize pins the platform regardless of JAX_PLATFORMS),
    which would hang this benchmark outright; probe in a killable child
    instead and fall back to CPU when it is dead.
    """
    import subprocess

    for _ in range(2):     # the tunnel has transient failures: retry once
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; jnp.ones(4).sum();"
                 "print(jax.default_backend())"],
                capture_output=True, timeout=timeout_s, cwd="/root/repo")
            if b"tpu" in r.stdout:
                return True
        except Exception:
            pass
    return False


def main() -> None:
    alive = _tpu_tunnel_alive()
    import jax
    if not alive:
        try:  # dead tunnel: force CPU before any backend initializes
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    from ksw2_tpu.utils.ccache import ensure_compile_cache
    ensure_compile_cache()   # per-user persistent executable cache
    from ksw2_tpu.core.flags import Flag
    from ksw2_tpu.core.matrix import encode_dna, simple_mat

    t = read_fa("/root/reference/test/t2.fa.gz")
    q = read_fa("/root/reference/test/q2.fa.gz")
    ts, qs = encode_dna(t), encode_dna(q)
    mat = simple_mat(5, 2, 4)
    cells = len(t) * len(q) / 1e9

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from ksw2_tpu.ops.extz import extz2_device

        # quick real-TPU parity sweep BEFORE timing (so the recorded bench
        # implies on-chip correctness, not just CPU-interpret correctness):
        # random pairs through the compiled single-pair and batched extz
        # kernels vs the golden-validated spec engines
        from ksw2_tpu.core.matrix import simple_mat as _sm
        from ksw2_tpu.ops.batch_pallas import extz_batch_device
        from ksw2_tpu.spec import diagdiff as _dd

        rngv = np.random.default_rng(2026)
        matv = _sm(5, 2, 4)
        B = 16
        Qv = rngv.integers(0, 4, size=(B, 120)).astype(np.int8)
        Tv = np.where(rngv.random((B, 120)) < 0.15,
                      rngv.integers(0, 4, size=(B, 120)), Qv).astype(np.int8)
        lv = np.full((B,), 120, np.int32)
        ob = extz_batch_device(Qv, Tv, lv, lv, 5, matv, 4, 2, zdrop=100,
                               flag=Flag.SCORE_ONLY)
        for k in range(B):
            ev, _ = _dd.extz2(Qv[k].astype(np.int32), Tv[k].astype(np.int32),
                              5, matv, 4, 2, zdrop=100, flag=Flag.SCORE_ONLY)
            for fk in ("max", "max_t", "max_q", "score"):
                assert int(ob[fk][k]) == getattr(ev, fk),                     ("tpu-parity", k, fk, int(ob[fk][k]), getattr(ev, fk))
        ezv, _ = extz2_device(Qv[0].astype(np.int32)[:100],
                              Tv[0].astype(np.int32), 5, matv, 4, 2, w=64)
        evv, _ = _dd.extz2(Qv[0].astype(np.int32)[:100],
                           Tv[0].astype(np.int32), 5, matv, 4, 2, w=64)
        assert (ezv.score, ezv.cigar) == (evv.score, evv.cigar),             ("tpu-parity-single", ezv.score, evv.score)

        flag = Flag.SCORE_ONLY

        def one_run():
            t0 = time.time()
            ez, _ = extz2_device(qs, ts, 5, mat, 4, 2, flag=flag)
            dt = time.time() - t0
            assert ez.score == 69932, ez.score  # parity anchor (ref output)
            return dt

        # the device tunnel is occasionally flaky/slow: retry transient
        # failures and report the best of several runs (per-run parity
        # asserted every time)
        one_run()  # compile
        best = None
        fails = 0
        for _ in range(5):
            try:
                dt = one_run()
            except AssertionError:
                raise
            except Exception:
                fails += 1
                if fails > 3:
                    raise
                time.sleep(2)
                continue
            best = dt if best is None else min(best, dt)
        gcells = cells / best
    else:
        # CPU fallback: XLA batch engine on a trimmed pair (keeps CI honest)
        from ksw2_tpu.ops.batch_xla import BatchSpec, extz_batch_scores
        import jax.numpy as jnp

        L = 4096
        spec = BatchSpec(Lq=L, Lt=L, m=5, sc_mch=2, sc_mis=-4, sc_N=-2,
                         q=4, e=2, zdrop=-1, flag=int(Flag.SCORE_ONLY))
        Q = np.zeros((1, L), np.int32)
        T = np.zeros((1, L), np.int32)
        Q[0] = qs[:L]
        T[0] = ts[:L]
        args = (jnp.asarray(Q), jnp.asarray(T),
                jnp.asarray([L], np.int32), jnp.asarray([L], np.int32),
                jnp.asarray([L], np.int32))
        out = extz_batch_scores(spec, *args)
        _ = np.asarray(out["score"])
        t0 = time.time()
        out = extz_batch_scores(spec, *args)
        _ = np.asarray(out["score"])
        dt = time.time() - t0
        gcells = (L * L / 1e9) / dt

    # tunnel-health diagnostic: best trivial-exec round trip right now.
    # The shared tunnel has multi-hour congestion phases (quiet ~25-30 ms,
    # degraded 0.5-400 s); a large value here marks the headline number
    # as environment-bound, not code-bound.
    import jax.numpy as jnp
    rtts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(jax.jit(lambda v: v + 1)(jnp.arange(64)))
        rtts.append(time.time() - t0)
    print(json.dumps({
        "metric": "extz_50k_exact_score_gcells_per_s",
        "value": round(gcells, 3),
        "unit": "Gcells/s",
        "vs_baseline": round(gcells / BASELINE_GCELLS, 2),
        # labels degraded runs honestly: "cpu" means the TPU tunnel was
        # down and this number is NOT comparable to the TPU baseline
        "backend": jax.default_backend(),
        "tunnel_exec_ms": round(min(rtts) * 1e3, 1),
    }))


if __name__ == "__main__":
    main()
