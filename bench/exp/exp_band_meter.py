"""True-compute meter for the band engines (fused reps; tax-immune).

The band rows were never measured free of the tunnel's per-execution
round trip.  (T(K fused) - T(1)) / (K-1) cancels it, sizing the real
op-diet headroom for the banded-approx target (round-5 lead #2).
"""
import os as _os, sys as _sys, time
_repo = _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_sys.path.insert(0, _repo)
_sys.path.insert(0, _os.path.join(_repo, "tests"))

import numpy as np
import jax
import jax.numpy as jnp
from ksw2_tpu.utils.ccache import ensure_compile_cache
ensure_compile_cache()
from ksw2_tpu.core.flags import Flag
from ksw2_tpu.core.matrix import simple_mat
from ksw2_tpu.ops import wavefront_band as wband
from ksw2_tpu.ops import wavefront_batch as wb
from ksw2_tpu.ops.band_batch import _cached_run_band, _pick_p
from ksw2_tpu.ops.bands import pad_rows, round_up

# the suite's band row shape: 64 pairs, 50k, w=751
B, L, W = 64, 50000, 751
mat = simple_mat(5, 2, -4)
rng = np.random.default_rng(5)
Q = rng.integers(0, 4, (B, L)).astype(np.int8)
T = np.where(rng.random((B, L)) < 0.10, rng.integers(0, 4, (B, L)),
             Q).astype(np.int8)
qlen = np.full(B, L, np.int32)
tlen = np.full(B, L, np.int32)
wv = np.full(B, W, np.int32)

P = _pick_p(W)
RMAX = 512 // P // 8 * 8
Bs = min(B, RMAX)                     # one slice's worth
Bp = pad_rows(Bs, P)
R = Bp * P
n_diag = max(round_up(2 * L - 1, wb.CHUNK), wb.CHUNK)


def build(flag):
    prm = wband.BandParams(
        n_rows=R, n_diag=n_diag, m=5, sc_mch=2, sc_mis=-4, sc_N=-2,
        q=4, e=2, w=W, zdrop=200, flag=int(flag), p=P)
    return _cached_run_band(prm, False)


cells = Bs * L * (2 * W)              # band cells actually computed
full = Bs * float(L) * L              # matrix cells (the suite's metric)


def _t(f):
    t0 = time.time(); f(); return (time.time() - t0) * 1e3


for name, flag in (("exact", Flag.SCORE_ONLY),
                   ("approx", Flag.SCORE_ONLY | Flag.APPROX_MAX
                    | Flag.APPROX_DROP)):
    run = build(flag)
    qpad = np.zeros((Bp, L), np.int8); qpad[:Bs] = Q[:Bs]
    tpad = np.zeros((Bp, L), np.int8); tpad[:Bs] = T[:Bs]
    lens = np.zeros((3, Bp), np.int32)
    lens[0, :Bs], lens[1, :Bs], lens[2, :Bs] = qlen[:Bs], tlen[:Bs], wv[:Bs]
    lens[2, Bs:] = 1
    dq, dt = jnp.asarray(qpad), jnp.asarray(tpad)
    l0, l1, l2 = (jnp.asarray(lens[k]) for k in range(3))

    def many(k):
        def f(a, b, x0, x1, x2):
            acc = jnp.int32(0)
            out = None
            for _ in range(k):
                o = run(a, b, x0, x1, x2 + (acc & 1))
                out = o
                acc = acc + o[0, 0]
            return out, acc
        return jax.jit(f)

    f1, f5 = many(1), many(4)
    np.asarray(f1(dq, dt, l0, l1, l2)[1])
    np.asarray(f5(dq, dt, l0, l1, l2)[1])
    t1 = min(_t(lambda: np.asarray(f1(dq, dt, l0, l1, l2)[1]))
             for _ in range(3))
    t5 = min(_t(lambda: np.asarray(f5(dq, dt, l0, l1, l2)[1]))
             for _ in range(3))
    comp = (t5 - t1) / 3
    print(f"band {name:6s}: true compute {comp*1:8.1f} ms/launch "
          f"({Bs} pairs)  = {full/1e6/comp:6.2f} Gc/s(matrix) "
          f"/ {cells/1e6/comp:6.2f} Gc/s(band)   T1={t1:.0f} T4={t5:.0f}",
          flush=True)
