"""Characterize the tunnel's per-execution tax: XLA vs pallas, separate
executions vs fused-in-one-jit, pipelining behavior."""
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
x = jnp.arange(8 * 128, dtype=I32).reshape(8, 128)


def t(f, n=10):
    f(); f()
    ts = []
    for _ in range(n):
        t0 = time.time(); f(); ts.append(time.time() - t0)
    return min(ts) * 1e3


# a) pure-XLA trivial
fx = jax.jit(lambda v: v + 1)
print("a) xla x+1 fetch:           %7.2f ms" % t(lambda: np.asarray(fx(x))), flush=True)

# b) pure-XLA heavy scan (1000 sequential steps)
def scanny(v):
    def stp(c, _):
        return jnp.maximum(c * 2 - c, jnp.roll(c, 1, axis=1)), None
    o, _ = jax.lax.scan(stp, v, None, length=1000)
    return o
fs = jax.jit(scanny)
print("b) xla scan1000 fetch:      %7.2f ms" % t(lambda: np.asarray(fs(x))), flush=True)


def kern(x_ref, o_ref):
    o_ref[...] = x_ref[...] + 1


call = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((8, 128), I32))
fp = jax.jit(lambda v: call(v))
print("c) 1 tiny pallas fetch:     %7.2f ms" % t(lambda: np.asarray(fp(x))), flush=True)

# d) 6 separate tiny pallas executions, fetch at end
def six_sep():
    ys = [fp(x + i) for i in range(6)]
    for y in ys:
        np.asarray(y)
print("d) 6 sep pallas execs:      %7.2f ms" % t(six_sep), flush=True)

# e) 6 pallas calls inside ONE jit
def six_fused(v):
    for _ in range(6):
        v = call(v)
    return v
ff = jax.jit(six_fused)
print("e) 6 pallas in one jit:     %7.2f ms" % t(lambda: np.asarray(ff(x))), flush=True)

# f) pallas with a 3200-iteration internal grid (compute-light)
def kern2(x_ref, o_ref):
    @pl.when(pl.program_id(0) == 0)
    def _i():
        o_ref[...] = x_ref[...]
    o_ref[...] = o_ref[...] + 1
call2 = pl.pallas_call(
    kern2, grid=(3200,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_shape=jax.ShapeDtypeStruct((8, 128), I32),
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)))
f2 = jax.jit(lambda v: call2(v))
print("f) grid3200 tiny pallas:    %7.2f ms" % t(lambda: np.asarray(f2(x))), flush=True)

# g) same but grid folded into an internal fori (grid=1)
def kern3(x_ref, o_ref):
    o_ref[...] = x_ref[...]
    def stp(i, _):
        o_ref[...] = o_ref[...] + 1
        return 0
    jax.lax.fori_loop(0, 3200, stp, 0)
call3 = pl.pallas_call(
    kern3,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_shape=jax.ShapeDtypeStruct((8, 128), I32),
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
f3 = jax.jit(lambda v: call3(v))
print("g) fori3200 grid1 pallas:   %7.2f ms" % t(lambda: np.asarray(f3(x))), flush=True)
