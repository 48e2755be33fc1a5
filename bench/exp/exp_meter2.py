"""Corrected metering: CSE-proof rep chaining + fetch-cost-vs-size."""
import os as _os, sys as _sys, time
_repo = _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_sys.path.insert(0, _repo)

import numpy as np
import jax
import jax.numpy as jnp
from ksw2_tpu.utils.ccache import ensure_compile_cache
ensure_compile_cache()
print("backend:", jax.default_backend(), flush=True)

I32 = jnp.int32


def _t(f):
    t0 = time.time(); f(); return (time.time() - t0) * 1e3


# ---- fetch cost vs size (device->host)
for kb in (1, 64, 256, 1024, 4096, 16384):
    n = kb * 256
    f = jax.jit(lambda v: v + 1)
    x = jnp.arange(n, dtype=I32)
    np.asarray(f(x))
    best = min(_t(lambda: np.asarray(f(x))) for _ in range(6))
    print(f"fetch {kb:6d} KB: {best:8.1f} ms  "
          f"({kb / best * 1000 / 1024:6.1f} MB/s eff)", flush=True)

# ---- upload cost vs size (host->device, forced via tiny dependent fetch)
g = jax.jit(lambda v: v[:8] + 1)
for kb in (64, 1024, 16384):
    n = kb * 256
    h = np.arange(n, dtype=np.int32)
    np.asarray(g(jnp.asarray(h)))
    best = min(_t(lambda: np.asarray(g(jnp.asarray(h)))) for _ in range(6))
    print(f"upload {kb:6d} KB: {best:7.1f} ms", flush=True)

# ---- CSE-proof fused-reps meter on the REAL whale strips launch
import sys
sys.path.insert(0, _os.path.join(_repo, "tests"))
import refcmp
from ksw2_tpu.core.flags import Flag
from ksw2_tpu.core.matrix import encode_dna, simple_mat
from ksw2_tpu.ops.wavefront_strips import (strips_prep, _strips_run_fn)

MAT = simple_mat(5, 2, -4)
rng = np.random.default_rng(777)
B2 = 17
pairs2 = []
for _ in range(B2):
    t, q = refcmp.random_pair(rng, 3000, divergence=0.15, indel=0.06)
    pairs2.append((encode_dna(q), encode_dna(t)))
ql = np.array([len(q) for q, t in pairs2], np.int32)
tl = np.array([len(t) for q, t in pairs2], np.int32)
cells = int((ql.astype(np.int64) * tl).sum())
launches = strips_prep([q for q, t in pairs2], [t for q, t in pairs2],
                       ql, tl, 5, MAT, 4, 2, 100, Flag.SCORE_ONLY)
(prm, arrs, B) = launches[0]
print("prm rows:", prm.n_rows, "t_pad:", prm.t_pad, flush=True)
fn = _strips_run_fn(prm, False)
dev = [jnp.asarray(a) for a in arrs]


def many(k):
    def f(qpk, tpk, a, b):
        acc = jnp.int32(0)
        out = None
        for _ in range(k):
            # CSE-proof: perturb lens by a data-dependent 0/1 that XLA
            # cannot fold (b rows with tlen+1 change real compute by ~0)
            o = fn(qpk, tpk, a, b + (acc & 1))
            out = o
            acc = acc + o[0, 0]
        return out, acc
    return jax.jit(f)


f1, f5 = many(1), many(5)
np.asarray(f1(*dev)[1]); np.asarray(f5(*dev)[1])
t1 = min(_t(lambda: np.asarray(f1(*dev)[1])) for _ in range(4))
t5 = min(_t(lambda: np.asarray(f5(*dev)[1])) for _ in range(4))
comp = (t5 - t1) / 4
print(f"whale strips true compute: {comp:.1f} ms/launch "
      f"= {cells / 1e6 / comp:.1f} Gc/s   (T1 {t1:.1f}, T5 {t5:.1f})",
      flush=True)
