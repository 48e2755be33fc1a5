"""Batched local alignment (Smith-Waterman, affine) on TPU.

Capability the reference only declares (ksw2.h:92-93, "no local alignment
yet"): implemented here outright. One pair per sublane row like the other
batch engines, but in absolute int32 arithmetic (no byte deltas — local
resets to zero keep values small anyway and the VPU lanes are 32-bit):

    H(r)[t] = max(0, H(r-2)[t-1] + s, E(r)[t], F(r)[t])
    E(r)[t] = max(H(r-1)[t-1] - q, E(r-1)[t-1]) - e    (consumes target)
    F(r)[t] = max(H(r-1)[t]   - q, F(r-1)[t])   - e    (consumes query)

with lanes = target positions and r = i + j the anti-diagonal.  The best
cell per pair is tracked per lane (strict improvement keeps the first
attainment) and finalized with butterfly reductions using the oracle's
row-major tie-break (:mod:`ksw2_tpu.spec.local`).
"""
from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .inject import inject_plane
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bands import round_up
from .wavefront_batch import CHUNK, _bmax, _bmin

I32 = jnp.int32
_NEG = -(10 ** 9)
_BIG = 2 ** 30


class LocalParams(NamedTuple):
    n_rows: int
    n_diag: int
    m: int
    sc_mch: int
    sc_mis: int
    sc_N: int
    q: int
    e: int


def _local_kernel(prm: LocalParams, refs):
    (qlp_ref, tlp_ref, target_ref, qinj_ref, res_ref,
     H1, H2, E, F, Q, BH, BR) = refs

    R = prm.n_rows
    shape = (R, 128)
    step = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(I32, shape, 1)
    lane0 = lane == 0

    @pl.when(step == 0)
    def _init():
        zero = jnp.zeros(shape, I32)
        H1[...] = zero
        H2[...] = zero
        E[...] = jnp.full(shape, _NEG, I32)
        F[...] = jnp.full(shape, _NEG, I32)
        Q[...] = zero
        BH[...] = zero
        BR[...] = jnp.full(shape, -1, I32)

    qlp = qlp_ref[...]
    tlp = tlp_ref[...]
    T = target_ref[...]
    tN = T == prm.m - 1
    ndc = qlp + tlp - 1

    def diag_body(rr, _):
        r = step * CHUNK + rr
        act = r < ndc
        st0 = jnp.maximum(0, r - qlp + 1)
        en0 = jnp.minimum(tlp - 1, r)
        band = act & (lane >= st0) & (lane <= en0)

        qv = pltpu.roll(qinj_ref[...], -(r % CHUNK), axis=1)
        Qn = jnp.where(lane0, qv, jnp.roll(Q[...], 1, axis=1))
        Qn = jnp.where(act, Qn, Q[...])
        Q[...] = Qn

        eq = T == Qn
        nm = tN | (Qn == prm.m - 1)
        s = jnp.where(eq, prm.sc_mch, prm.sc_mis)
        s = jnp.where(nm, prm.sc_N, s)

        h1s = jnp.where(lane0, 0, jnp.roll(H1[...], 1, axis=1))
        h2s = jnp.where(lane0, 0, jnp.roll(H2[...], 1, axis=1))
        es = jnp.where(lane0, _NEG, jnp.roll(E[...], 1, axis=1))
        En = jnp.maximum(h1s - prm.q, es) - prm.e
        Fn = jnp.maximum(H1[...] - prm.q, F[...]) - prm.e
        Hn = jnp.maximum(0, h2s + s)
        Hn = jnp.maximum(Hn, En)
        Hn = jnp.maximum(Hn, Fn)
        Hn = jnp.where(band, Hn, 0)
        En = jnp.where(band, En, _NEG)
        Fn = jnp.where(band, Fn, _NEG)
        H2[...] = H1[...]
        H1[...] = Hn
        E[...] = En
        F[...] = Fn
        better = band & (Hn > BH[...])
        BH[...] = jnp.where(better, Hn, BH[...])
        BR[...] = jnp.where(better, r, BR[...])

    jax.lax.fori_loop(0, CHUNK, diag_body, None)

    @pl.when(step == pl.num_programs(0) - 1)
    def _emit():
        V = _bmax(BH[...])
        cand = (BH[...] == V) & (V > 0)
        te = _bmin(jnp.where(cand, lane, _BIG))
        rsel = _bmax(jnp.where(cand & (lane == te), BR[...], _NEG))
        te = jnp.where(V > 0, te, -1)
        qe = jnp.where(V > 0, rsel - te, -1)
        out = jnp.zeros(shape, I32)
        out = jnp.where(lane == 0, V, out)
        out = jnp.where(lane == 1, te, out)
        out = jnp.where(lane == 2, qe, out)
        res_ref[...] = out


def build_local_call(prm: LocalParams, interpret: bool = False):
    R = prm.n_rows
    shape = (R, 128)
    n_steps = (prm.n_diag + CHUNK - 1) // CHUNK
    scratch = [pltpu.VMEM(shape, jnp.int32) for _ in range(7)]
    kernel = functools.partial(_local_kernel, prm)

    def wrap(*refs):
        kernel(refs)

    from .bands import stable_kernel_name as _skn
    try:
        wrap.__name__ = _skn('batch_local', prm)
    except NameError:
        pass
    return pl.pallas_call(
        wrap,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # qlp
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # tlp
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # target
            pl.BlockSpec((R, CHUNK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),                 # qinj
        ],
        out_shape=[jax.ShapeDtypeStruct(shape, jnp.int32)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


@functools.lru_cache(maxsize=128)
def _cached_local(prm: LocalParams, interpret: bool):
    call = build_local_call(prm, interpret=interpret)
    R, n_diag = prm.n_rows, prm.n_diag

    def run(query, target, qlen, tlen):
        I = jnp.int32
        qlen = qlen.astype(I)
        tlen = tlen.astype(I)
        ones = jnp.ones((R, 128), I)
        qlp = qlen[:, None] * ones
        tlp = tlen[:, None] * ones
        tpad = jnp.zeros((R, 128), I).at[:, :target.shape[1]].set(
            target.astype(I))
        qinj = inject_plane(query, qlen, n_diag)
        return call(qlp, tlp, tpad, qinj)[0][:, :3]

    return jax.jit(run)


def local_batch_device(
    query: np.ndarray,
    target: np.ndarray,
    qlen: np.ndarray,
    tlen: np.ndarray,
    m: int,
    mat: np.ndarray,
    q: int,
    e: int,
    interpret: bool = False,
) -> Dict[str, np.ndarray]:
    """Batched local alignment; returns {'score', 'te', 'qe'} per pair."""
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    B, Lq = query.shape
    Bt, Lt = target.shape
    assert B == Bt and Lt <= 128
    qlen = np.asarray(qlen, np.int32)
    tlen = np.asarray(tlen, np.int32)
    RMAX = 512
    if B > RMAX:
        outs = [
            local_batch_device(query[i:i + RMAX], target[i:i + RMAX],
                               qlen[i:i + RMAX], tlen[i:i + RMAX],
                               m, mat, q, e, interpret)
            for i in range(0, B, RMAX)
        ]
        return {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}
    mat = np.asarray(mat, dtype=np.int8).reshape(-1)
    sc_N = int(mat[m * m - 1])

    R = max(round_up(B, 8), 8)
    n_diag = int((qlen + tlen).max()) - 1 if B else 1
    n_diag = max(round_up(n_diag, CHUNK), CHUNK)
    prm = LocalParams(
        n_rows=R, n_diag=n_diag, m=m,
        sc_mch=int(mat[0]), sc_mis=int(mat[1]), sc_N=sc_N,
        q=int(q), e=int(e),
    )
    run = _cached_local(prm, interpret)
    qpad = np.zeros((R, Lq), np.int8)
    qpad[:B] = np.asarray(query, np.int8)
    tpad = np.zeros((R, Lt), np.int8)
    tpad[:B] = np.asarray(target, np.int8)
    lens = np.zeros((2, R), np.int32)
    lens[0, :B], lens[1, :B] = qlen, tlen
    res = np.asarray(run(jnp.asarray(qpad), jnp.asarray(tpad),
                         jnp.asarray(lens[0]), jnp.asarray(lens[1])))[:B]
    return {"score": res[:, 0].copy(), "te": res[:, 1].copy(),
            "qe": res[:, 2].copy()}


__all__ = ["LocalParams", "build_local_call", "local_batch_device"]
