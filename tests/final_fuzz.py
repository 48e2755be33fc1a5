"""Final differential campaign: device pipeline vs reference binary.

Runs the device engines in interpret mode on CPU: this terminal's
platform plugin pins the TPU backend regardless of JAX_PLATFORMS, so the
platform is forced through jax.config before any backend initializes
(random shapes would otherwise each pay a multi-minute TPU compile;
real-chip coverage lives in tests/tpu_validate.py).
"""
import os
import sys

try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import refcmp
from ksw2_tpu.core.flags import Flag
from ksw2_tpu.core.matrix import encode_dna, simple_mat
from ksw2_tpu.ops.extz import extz2_device
from ksw2_tpu.ops.extd import extd2_device
from ksw2_tpu.ops.extf import extf2_device
from ksw2_tpu.ops.gg2 import gg2_device
from ksw2_tpu.spec import diagdiff

rng = np.random.default_rng(int(sys.argv[1]) if len(sys.argv) > 1 else 777)
N = int(sys.argv[2]) if len(sys.argv) > 2 else 80
fails = total = 0
mat = simple_mat(5, 2, 4)
for i in range(N):
    if i and i % 8 == 0:
        # each random shape compiles fresh XLA:CPU executables (the fused
        # forward+walker pipelines are ~2x the old programs); hundreds of
        # them exhaust the LLVM JIT's allocator in one process, so drop
        # compiled programs periodically (they are never reused here) and
        # the engines' builder caches with them
        import jax as _jax
        import functools as _ft
        _jax.clear_caches()
        from ksw2_tpu.ops import extz as _oz, extd as _od, exts as _os_, \
            gg2 as _og
        for _mod in (_oz, _od, _os_, _og):
            for _name in dir(_mod):
                _fn = getattr(_mod, _name)
                if hasattr(_fn, "cache_clear"):
                    _fn.cache_clear()
    tlen = int(rng.integers(5, 250))
    t, q = refcmp.random_pair(rng, tlen, divergence=float(rng.uniform(0, 0.5)),
                              indel=float(rng.uniform(0, 0.25)),
                              with_n=bool(rng.integers(0, 2)))
    qs, ts = encode_dna(q), encode_dna(t)
    w = int(rng.choice([-1, 3, 10, 33, 100]))
    z = int(rng.choice([-1, 10, 50, 200]))
    right = bool(rng.integers(0, 2)); sonly = bool(rng.integers(0, 2))
    approx = bool(rng.integers(0, 2))
    flag = ((Flag.RIGHT if right else Flag.NONE)
            | (Flag.SCORE_ONLY if sonly else Flag.NONE)
            | ((Flag.APPROX_MAX | Flag.APPROX_DROP) if approx else Flag.NONE))
    checks = []
    ref = refcmp.run_ref("extz2_sse", t, q, w=w, z=z, right=right,
                         score_only=sonly, approx=approx)
    got = extz2_device(qs, ts, 5, mat, 4, 2, w=w, zdrop=z, flag=flag,
                       interpret=True)[0].tsv_fields()
    checks.append(("extz", ref, got))
    O, E = int(rng.choice([4, 16])), int(rng.choice([1, 2]))
    O2, E2 = int(rng.choice([13, 24])), int(rng.choice([1, 2]))
    ref = refcmp.run_ref("extd2_sse", t, q, q=O, e=E, q2=O2, e2=E2, w=w, z=z,
                         right=right, score_only=sonly, approx=approx)
    got = extd2_device(qs, ts, 5, mat, O, E, O2, E2, w=w, zdrop=z, flag=flag,
                       interpret=True)[0].tsv_fields()
    checks.append(("extd", ref, got))
    if sonly:
        ref = refcmp.run_ref("extf2_sse", t, q, w=w, z=z, score_only=True)
        got = extf2_device(qs, ts, 2, -4, 2, w=w, xdrop=z,
                           interpret=True).tsv_fields()
        checks.append(("extf", ref, got))
    if not approx:
        from ksw2_tpu.ops.exts import exts2_device
        smat = simple_mat(5, 1, -2)
        fl = flag | Flag.SPLICE_FOR
        ref = refcmp.run_ref("exts2_sse", t, q, w=w, z=z, right=right,
                             score_only=sonly)
        got = exts2_device(qs, ts, 5, smat, 2, 1, 32, 4, zdrop=z,
                           junc_bonus=0, flag=fl,
                           interpret=True)[0].tsv_fields()
        checks.append(("exts", ref, got))
    if not (sonly or approx or right):
        ref = refcmp.run_ref("gg2_sse", t, q, w=w, z=z)
        s_, c_, _ = gg2_device(qs, ts, 5, mat, 4, 2, w=w, interpret=True)
        from ksw2_tpu.core.cigar import to_string
        got = [str(s_), "0", "-1", "-1", to_string(c_)]
        checks.append(("gg2", ref, got))
    for name, ref, got in checks:
        total += 1
        if ref != got:
            fails += 1
            print("MISMATCH", name, i, dict(w=w, z=z, right=right,
                                            sonly=sonly, approx=approx))
            print("  ref:", ref)
            print("  got:", got)
print(f"final fuzz seed={sys.argv[1] if len(sys.argv)>1 else 777}: "
      f"{total} runs, {fails} fails")
sys.exit(1 if fails else 0)
