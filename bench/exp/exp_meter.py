"""Accurate kernel metering: N fused reps in ONE execution; true compute
= (T(N) - T(1)) / (N-1).  Variants ablate per-step sections of a
whale-shaped strips kernel (R=504, 3200 steps) to attribute cost."""
import os as _os, sys as _sys, time
_repo = _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_sys.path.insert(0, _repo)

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from ksw2_tpu.utils.ccache import ensure_compile_cache
ensure_compile_cache()
print("backend:", jax.default_backend(), flush=True)

I32 = jnp.int32
SENT = -(2 ** 31) + 1
CH = 32
R = 504
G = 3200 // CH + 4
T_REAL = 3100
TV = 3072
KB = 16384


def make_kernel(mode):
    shape = (R, 128)

    def body(lnp, words, D_out, Dq_out, hl_out, H, E, dA, dB, dqA, dqB,
             bh1, bh2, bf1):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _init():
            for ref in (dA, dB, dqA, dqB):
                ref[...] = jnp.full(shape, SENT, I32)
            for ref in (H, E, bh1, bh2, bf1):
                ref[...] = jnp.zeros(shape, I32)
            hl_out[...] = jnp.full(shape, SENT, I32)

        lane = lnp[...]
        lane0 = lane == 0
        W0 = jnp.broadcast_to(words[0, 0], shape)
        rbase = lane + 17          # stand-ins for per-lane constants
        qlm = jnp.full(shape, 3100, I32)
        tl1 = jnp.full(shape, 2999, I32)
        spv = jnp.zeros(shape, I32)
        vmv = lane < 120

        def step(tau, _):
            t = c * CH + tau
            sc = (W0 >> tau) & 1
            Hprev = H[...]
            Eprev = E[...]
            bhv = bh2[...]
            Hd = jnp.where(lane0, bhv, pltpu.roll(Hprev, 1, axis=1))
            hnof = jnp.maximum(Hd + sc, Eprev)
            cv = Hd + 2
            hnofc = jnp.minimum(hnof, cv)
            A = hnofc + lane * 2 - 4
            S0 = jnp.where(lane0, bf1[...], pltpu.roll(A, 1, axis=1))
            if mode != "noscan":
                for k in (1, 2, 4, 8, 16, 32, 64):
                    S0 = jnp.where(lane >= k,
                                   jnp.maximum(S0, pltpu.roll(S0, k,
                                                              axis=1)), S0)
            F = S0 - lane * 2 - 4
            Hn = jnp.minimum(jnp.maximum(hnof, F), cv)
            En = jnp.maximum(Eprev - 2, Hn - 6)
            H[...] = Hn
            E[...] = En
            if mode != "nostreams":
                seed = jnp.maximum(F, hnofc - 4) - 2
                bf1[...] = pltpu.roll(pltpu.roll(seed, 1, axis=1), 1,
                                      axis=0)
                bh2[...] = bh1[...]
                bh1[...] = pltpu.roll(pltpu.roll(Hn, 1, axis=1), 1,
                                      axis=0)
            if mode not in ("norec",):
                if mode == "simplekey":
                    kf = t - spv + 1
                    va = vmv
                else:
                    r_pl = rbase + t
                    i_pl = t - spv
                    act = (i_pl >= 0) & (i_pl < 3000)
                    st0 = jnp.maximum(0, r_pl - qlm)
                    en0 = jnp.minimum(tl1, r_pl)
                    en1 = st0 + ((en0 - st0) & -4)
                    cls = (i_pl - st0) & 3
                    kf = jnp.where(i_pl < en1, cls * TV + i_pl + 1,
                                   4 * TV + i_pl + 1)
                    kf = jnp.where(i_pl == en0, 0, kf)
                    va = act & vmv
                packed = jnp.where(va, Hn * KB + (KB - 1 - kf), SENT)
                tm = t & 127
                rolled = pltpu.roll(packed, tm, axis=1)
                lm = lane >= tm
                dA[...] = jnp.maximum(dA[...],
                                      jnp.where(lm, rolled, SENT))
                dB[...] = jnp.maximum(dB[...],
                                      jnp.where(lm, SENT, rolled))
                if mode != "nodq":
                    qsel = vmv & (lane == ((119 + tm) & 127))
                    hdec = rolled >> 14
                    dqA[...] = jnp.maximum(
                        dqA[...], jnp.where(qsel & lm, hdec, SENT))
                    dqB[...] = jnp.maximum(
                        dqB[...],
                        jnp.where(qsel & jnp.logical_not(lm), hdec, SENT))
            hl_out[...] = jnp.where(sc > 0, Hn, hl_out[...])

        @pl.when(c * CH < T_REAL)
        def _run():
            jax.lax.fori_loop(0, CH, step, None)

        @pl.when(c % 4 == 3)
        def _flush():
            D_out[0] = dA[...]
            Dq_out[0] = dqA[...]
            dA[...] = dB[...]
            dB[...] = jnp.full(shape, SENT, I32)
            dqA[...] = dqB[...]
            dqB[...] = jnp.full(shape, SENT, I32)

    NF = G // 4
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        body,
        grid=(G,),
        in_specs=[const,
                  pl.BlockSpec((1, 3, R, 1), lambda c: (c, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((NF, R, 128), I32),
                   jax.ShapeDtypeStruct((NF, R, 128), I32),
                   jax.ShapeDtypeStruct((R, 128), I32)],
        out_specs=[pl.BlockSpec((1, R, 128), lambda c: (c // 4, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, R, 128), lambda c: (c // 4, 0, 0),
                                memory_space=pltpu.VMEM),
                   const],
        scratch_shapes=[pltpu.VMEM((R, 128), I32)] * 9,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )


def meter(mode, n=5):
    call = make_kernel(mode)
    lane = jax.lax.broadcasted_iota(I32, (R, 128), 1)
    words = jnp.zeros((G, 3, R, 1), I32)

    def many(k):
        def f(l, w):
            acc = None
            for _ in range(k):
                o = call(l, w)
                s = o[2][0, 0]
                acc = s if acc is None else acc + s
                l = l + acc.astype(I32) * 0   # serialize reps
            return acc
        return jax.jit(f)

    f1, fn = many(1), many(n)
    np.asarray(f1(lane, words)); np.asarray(fn(lane, words))
    t1 = min(_t(lambda: np.asarray(f1(lane, words))) for _ in range(3))
    tn = min(_t(lambda: np.asarray(fn(lane, words))) for _ in range(3))
    return (tn - t1) / (n - 1), t1


def _t(f):
    t0 = time.time(); f(); return (time.time() - t0) * 1e3


for mode in ("full", "norec", "simplekey", "nodq", "noscan", "nostreams"):
    comp, t1 = meter(mode)
    print(f"{mode:10s}: true compute {comp:7.1f} ms  (single wall {t1:6.1f})",
          flush=True)
