"""Ablate the strips kernel's per-step components to find the hotspot.

Compiles several stripped variants of the inner step (same shapes as the
whale bucket: R=504, t_pad=3200) and times chained reps of each.  The
variants compute garbage where ablated — timing only.
"""
import os as _os, sys as _sys, time, functools
_repo = _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_sys.path.insert(0, _repo)

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from ksw2_tpu.utils.ccache import ensure_compile_cache
ensure_compile_cache()

I32 = jnp.int32
SENT = -(2 ** 31) + 1
CH = 32
R = 504
G = 3200 // CH + 4
T_REAL = 3100


def make_kernel(mode):
    shape = (R, 128)

    def body(lnp, words, D_out, Dq_out, hl_out, H, E, dA, dB, bh1, bh2,
             bf1):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _init():
            for ref in (dA, dB):
                ref[...] = jnp.full(shape, SENT, I32)
            for ref in (H, E, bh1, bh2, bf1):
                ref[...] = jnp.zeros(shape, I32)
            hl_out[...] = jnp.full(shape, SENT, I32)

        lane = lnp[...]
        lane0 = lane == 0
        W0 = jnp.broadcast_to(words[0, 0], shape)

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
            if mode not in ("norec", "staticrec"):
                packed = Hn * 1024 + lane
                tm = t & 127
                rolled = pltpu.roll(packed, tm, axis=1)
                lm = lane >= tm
                dA[...] = jnp.maximum(dA[...],
                                      jnp.where(lm, rolled, SENT))
                dB[...] = jnp.maximum(dB[...],
                                      jnp.where(lm, SENT, rolled))
            elif mode == "staticrec":
                # static roll amount (wrong results; timing lower bound)
                packed = Hn * 1024 + lane
                rolled = pltpu.roll(packed, 17, axis=1)
                lm = lane >= (t & 127)
                dA[...] = jnp.maximum(dA[...],
                                      jnp.where(lm, rolled, SENT))
                dB[...] = jnp.maximum(dB[...],
                                      jnp.where(lm, SENT, rolled))
            hl_out[...] = jnp.where(sc > 0, Hn, hl_out[...])

        @pl.when(c * CH < T_REAL)
        def _run():
            jax.lax.fori_loop(0, CH, step, None)

        @pl.when(c % 4 == 3)
        def _flush():
            D_out[0] = dA[...]
            Dq_out[0] = dA[...]
            dA[...] = dB[...]
            dB[...] = jnp.full(shape, SENT, I32)

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
        scratch_shapes=[pltpu.VMEM((R, 128), I32)] * 7,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )


lane = jax.lax.broadcasted_iota(I32, (R, 128), 1)
words = jnp.zeros((G, 3, R, 1), I32)

for mode in ("full", "norec", "staticrec", "noscan", "nostreams"):
    k = jax.jit(make_kernel(mode))
    t0 = time.time()
    outs = k(lane, words)
    np.asarray(outs[2])
    tc = time.time() - t0

    def chain(reps=6):
        t0 = time.time()
        rs = [k(lane, words) for _ in range(reps)]
        for r_ in rs:
            np.asarray(r_[2])
        return (time.time() - t0) / reps * 1e3

    chain(2)
    best = min(chain() for _ in range(2))
    print(f"{mode:10s}: {best:7.1f} ms/launch (compile {tc:.0f}s)",
          flush=True)
