"""Pin the per-grid-step overhead: same 3200-step kernel at CH=32/64/128,
plus scratch-count and R ablations.  Timing only (garbage math)."""
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
T_PAD = 3200


def make(ch, R, nscratch):
    G = T_PAD // ch + (128 // ch)
    shape = (R, 128)

    def body(*refs):
        lnp, words, D_out, hl_out = refs[:4]
        scr = refs[4:]
        H, E = scr[0], scr[1]
        dA, dB = scr[2], scr[3]
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _init():
            for ref in scr:
                ref[...] = jnp.zeros(shape, I32)
            hl_out[...] = jnp.full(shape, SENT, I32)

        lane = lnp[...]
        lane0 = lane == 0
        W0 = jnp.broadcast_to(words[0, 0], shape)

        def step(tau, _):
            t = c * ch + tau
            sc = (W0 >> (tau & 31)) & 1
            Hprev = H[...]
            Eprev = E[...]
            Hd = jnp.where(lane0, Eprev, pltpu.roll(Hprev, 1, axis=1))
            hnof = jnp.maximum(Hd + sc, Eprev)
            cv = Hd + 2
            S0 = pltpu.roll(hnof, 1, axis=1)
            for k in (1, 2, 4, 8, 16, 32, 64):
                S0 = jnp.where(lane >= k,
                               jnp.maximum(S0, pltpu.roll(S0, k, axis=1)),
                               S0)
            Hn = jnp.minimum(jnp.maximum(hnof, S0 - 4), cv)
            En = jnp.maximum(Eprev - 2, Hn - 6)
            H[...] = Hn
            E[...] = En
            packed = Hn * 1024 + lane
            tm = t & 127
            rolled = pltpu.roll(packed, tm, axis=1)
            lm = lane >= tm
            dA[...] = jnp.maximum(dA[...], jnp.where(lm, rolled, SENT))
            dB[...] = jnp.maximum(dB[...], jnp.where(lm, SENT, rolled))
            hl_out[...] = jnp.where(sc > 0, Hn, hl_out[...])

        @pl.when(c * ch < 3100)
        def _run():
            jax.lax.fori_loop(0, ch, step, None)

        per = 128 // ch

        @pl.when(c % per == per - 1)
        def _flush():
            D_out[0] = dA[...]
            dA[...] = dB[...]
            dB[...] = jnp.full(shape, SENT, I32)

    NF = (G * ch) // 128
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        body,
        grid=(G,),
        in_specs=[const,
                  pl.BlockSpec((1, 3, R, 1), lambda c: (c, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((NF, R, 128), I32),
                   jax.ShapeDtypeStruct((R, 128), I32)],
        out_specs=[pl.BlockSpec((1, R, 128),
                                lambda c: (c // (128 // ch), 0, 0),
                                memory_space=pltpu.VMEM),
                   const],
        scratch_shapes=[pltpu.VMEM((R, 128), I32)] * nscratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    ), G


cases = [("ch32 R504 s9", 32, 504, 9),
         ("ch64 R504 s9", 64, 504, 9),
         ("ch128 R504 s9", 128, 504, 9),
         ("ch32 R504 s5", 32, 504, 5),
         ("ch32 R104 s9", 32, 104, 9),
         ("ch128 R104 s9", 128, 104, 9)]
for name, ch, R, ns in cases:
    k, G = make(ch, R, ns)
    k = jax.jit(k)
    lane = jax.lax.broadcasted_iota(I32, (R, 128), 1)
    words = jnp.zeros((G, 3, R, 1), I32)
    t0 = time.time()
    np.asarray(k(lane, words)[1])
    tc = time.time() - t0

    def chain(reps=6):
        t0 = time.time()
        rs = [k(lane, words) for _ in range(reps)]
        for r_ in rs:
            np.asarray(r_[1])
        return (time.time() - t0) / reps * 1e3

    chain(2)
    best = min(chain() for _ in range(2))
    print(f"{name:14s}: G={G:3d}  {best:7.1f} ms/launch  "
          f"({best/G*1e3:6.0f} us/gridstep; compile {tc:.0f}s)", flush=True)
