"""Row-major batched Pallas engine for short pairs (extz2 semantics).

The wavefront engines sweep anti-diagonals, which is forced when the DP
state must stay in the byte-difference canon (long pairs, banding).  For
short unbanded pairs (qlen, tlen <= 128) a row-major sweep is strictly
cheaper on the VPU: one grid row per *target* row (tlen steps instead of
qlen+tlen-1 diagonals), every query lane live every step (no triangle
waste), and H carried directly in int32 so the whole unsigned-byte bias
machinery disappears.  The within-row F dependency — the reason the
reference had to rotate to anti-diagonals for SSE (tex/ksw2.tex) — is
broken by substitution: with gapoe >= gape,

    F(i,j+1) = max(F(i,j) - gape, H_noF(i,j) - gapoe),

where H_noF = max(Hdiag + s, E) does not involve F (an F-winning H never
improves the open path since gapoe >= gape), so F is a max-plus *prefix
scan* along the row: F(i,j) = max_k<=j-1 (A(k)) - j*gape with
A(k) = H_noF(i,k) + k*gape - gapo — seven butterfly steps.

Layout: the query axis j lives on SUBLANES and pairs on lanes, planes
(128, B).  Measured on v5e, cross-sublane rolls cost ~0.6x a lane roll
and the 7-step prefix butterfly 0.46 us vs 1.0 us on the lane axis — and
this kernel is roll-bound, not ALU-bound.

Z-drop / ez-field parity trick: the reference applies its running-max +
drop test per ANTI-diagonal (ksw2.h:191-207 via ksw2_extz2_sse.c:263-269),
a sequential automaton the row sweep cannot run in order.  But stopping
early never changes the cells computed *before* the stop, so the kernel
records, per diagonal r, the packed (max H, SSE merge-order tie key) —
each row i contributes its lanes to diagonals i..i+127 with one dynamic
sublane roll — and the automaton is replayed exactly afterwards in XLA
(one log-depth ``lax.cummax`` over a (M, 255-r, max_t) pack), recovering
the same stopping diagonal, max/max_t/max_q, mqe/mqe_t, mte/mte_q
(including the reference's ``mte_q = r - en`` 16-rounded quirk,
ksw2_extz2_sse.c:264) and score.

Tie-break parity for the per-diagonal argmax replicates the SSE merge
order of ksw2_extz2_sse.c:224-260: the en0 boundary cell wins all ties,
then int32 lane classes ((t - st0) & 3) in order, earliest t within a
class, then the scalar remainder loop in increasing t.

The reference's per-cell clamp ``z = min(z, mat[0] + 2(q+e))``
(ksw2_extz2_sse.c:42,70) is H(i,j) <= H(i-1,j-1) + mat[0] here — a no-op
for simple matrices (the tex bounds) but binding, and observable, for
GENERIC_SC matrices whose entries exceed mat[0]; by min/max
distributivity the F-scan operand clamps the same way.

Score-only.  CIGAR short batches keep using the wavefront engine.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.flags import NEG_INF, Flag
from .wavefront_batch import chunk_early_exit

I32 = jnp.int32
_SENT = -(2 ** 30)          # "no value" for packed planes (decode-safe)
_BIG = 2 ** 30
KB = 1024                   # per-diagonal pack: H*KB + (KB-1 - tie_key)
KBITS = 10
CHUNK = 32                  # target rows per grid step


class RowParams(NamedTuple):
    n_pairs: int            # B = padded pair count (one pair per lane)
    n_trows: int            # padded max target length (grid extent)
    m: int
    q: int                  # gap open
    e: int                  # gap extend
    zdrop: int
    flag: int
    mat0: int = 0           # mat[0]: the reference's per-cell z clamp
    chunk: int = CHUNK      # target rows per grid step


def _row_kernel_body(prm: RowParams, refs):
    (qlp_ref, tlp_ref, s_ref, d0, d1, dq0, dq1, hl_ref,
     H, E, stopr) = refs
    B = prm.n_pairs
    shape = (128, B)
    gapoe = prm.q + prm.e
    step = pl.program_id(0)
    subl = jax.lax.broadcasted_iota(I32, shape, 0)

    qlp = qlp_ref[...]
    tlp = tlp_ref[...]
    qlm1 = qlp - 1
    tlm1 = tlp - 1
    # hoisted invariants
    jgape = subl * prm.e                      # j * gape
    a_off = jgape - prm.q                     # A = H_noF + j*gape - gapo
    cls2 = (qlm1 - subl) & 3                  # (t - st0) & 3 when st0 > 0
    j0 = subl == 0
    vlane = subl < qlp                        # valid query rows
    qend = subl == qlm1                       # the mqe sample row

    @pl.when(step == 0)
    def _init():
        # virtual row above the matrix: H(-1, j) = -(gapoe + gape*j),
        # E(0, j) = -(2*gapoe + gape*j)   (ksw2_extz.c:31-35)
        H[...] = -gapoe - jgape
        E[...] = -2 * gapoe - jgape
        d0[...] = jnp.full(shape, _SENT, I32)
        d1[...] = jnp.full(shape, _SENT, I32)
        dq0[...] = jnp.full(shape, _SENT, I32)
        dq1[...] = jnp.full(shape, _SENT, I32)
        hl_ref[...] = jnp.full(shape, NEG_INF, I32)
        stopr[0] = 0

    def row_body(rr, _):
        i = step * prm.chunk + rr
        act = i < tlp
        s = s_ref[rr].astype(I32)

        # H(i-1, j-1) diagonal shift; row 0 reads the column boundary
        # H(i-1, -1) = -(gapoe + gape*(i-1)), or 0 for the virtual corner.
        # Branch-free on purpose: a scalar jnp.where feeding a plane-level
        # select mis-evaluates under the Pallas interpreter's fori (the
        # Mosaic path is fine) — multiply by the predicate instead.
        hb = (i > 0).astype(I32) * -(gapoe + prm.e * (i - 1))
        Hp = H[...]
        Hd = jnp.where(j0, hb, pltpu.roll(Hp, 1, axis=0))

        Ev = E[...]
        hnof = jnp.maximum(Hd + s, Ev)
        cv = Hd + prm.mat0                    # the reference z clamp
        hnof_c = jnp.minimum(hnof, cv)

        # F scan; the row's F(i, 0) = -(2*gapoe + gape*i) seeds row 0
        A = hnof_c + a_off
        fb = -(2 * gapoe + prm.e * i)
        S0 = jnp.where(j0, fb, pltpu.roll(A, 1, axis=0))
        for k in (1, 2, 4, 8, 16, 32, 64):
            S0 = jnp.where(subl >= k,
                           jnp.maximum(S0, pltpu.roll(S0, k, axis=0)), S0)
        F = S0 - jgape

        Hn = jnp.minimum(jnp.maximum(hnof, F), cv)
        En = jnp.maximum(Ev - prm.e, Hn - gapoe)
        # no act mask: post-tlen rows compute garbage that is never
        # sampled (every record below is act-masked) and cannot overflow
        # (the clamp bounds per-row growth)
        H[...] = Hn
        E[...] = En

        # ---- per-diagonal records (diagonal r = i + j) ----
        # SSE merge-order tie key (ksw2_extz2_sse.c:224-260): en0 cell ->
        # 0; t < en1 -> cls*128 + t+1; remainder -> 512 + t+1, with
        # t = i constant per row and st0/en0 varying along sublanes.
        en0cell = j0 | (i == tlm1)
        st0pos = subl > (qlm1 - i)            # st0 = r+1-qlen > 0
        cls = jnp.where(st0pos, cls2, i & 3)
        en0mi = jnp.minimum(tlm1 - i, subl)   # en0 - i
        lt_en1 = (en0mi + cls) > 3
        kf = jnp.where(en0cell, 0,
                       jnp.where(lt_en1, cls * 128 + (i + 1), 512 + i + 1))
        pmask = act & vlane
        packed = jnp.where(pmask, Hn * KB + (KB - 1 - kf), _SENT)
        rolled = pltpu.roll(packed, i, axis=0)
        ge_i = subl >= (i & 127)
        d0[...] = jnp.maximum(d0[...], jnp.where(ge_i, rolled, _SENT))
        d1[...] = jnp.maximum(d1[...], jnp.where(ge_i, _SENT, rolled))

        # mqe sample: cell (i, qlen-1) on diagonal i + qlen - 1, packed
        # (H*256 + (127 - i)) so the earliest diagonal wins ties
        pq = jnp.where(pmask & qend, Hn * 256 + (127 - i), _SENT)
        rolledq = pltpu.roll(pq, i, axis=0)
        dq0[...] = jnp.maximum(dq0[...], jnp.where(ge_i, rolledq, _SENT))
        dq1[...] = jnp.maximum(dq1[...], jnp.where(ge_i, _SENT, rolledq))

        # mte samples live on the last target row
        hl_ref[...] = jnp.where(act & (i == tlm1), Hn, hl_ref[...])

    chunk_early_exit(stopr, step, prm.chunk, tlp, None,
                     lambda: jax.lax.fori_loop(0, prm.chunk, row_body, None))


def build_rows_call(prm: RowParams, interpret: bool = False):
    B = prm.n_pairs
    shape = (128, B)
    n_steps = (prm.n_trows + prm.chunk - 1) // prm.chunk

    def wrap(*refs):
        _row_kernel_body(prm, refs)

    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        wrap,
        grid=(n_steps,),
        in_specs=[const, const,
                  pl.BlockSpec((prm.chunk, 128, B), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct(shape, jnp.int32)] * 5,
        out_specs=[const] * 5,
        scratch_shapes=[pltpu.VMEM(shape, jnp.int32),
                        pltpu.VMEM(shape, jnp.int32),
                        pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


def _postprocess(prm: RowParams, D, Dq, Hlast, qlen, tlen):
    """Replay the reference's per-diagonal ez automaton exactly.

    D, Dq: (B, 256) packed per-diagonal records; Hlast: (B, 128);
    qlen/tlen: (B,).  Returns (B, 9) int32 records in FIELD_ORDER.
    """
    B = D.shape[0]
    r = jnp.arange(256, dtype=I32)[None, :]
    jl = jnp.arange(128, dtype=I32)[None, :]
    qlc = qlen[:, None].astype(I32)
    tlc = tlen[:, None].astype(I32)
    ndc = qlc + tlc - 1
    valid = r < ndc

    M = D >> KBITS
    kq = (KB - 1) - (D & (KB - 1))
    maxt = jnp.where(kq == 0, jnp.minimum(tlc - 1, r),
                     jnp.where(kq <= 512, (kq - 1) & 127, kq - 1 - 512))

    # running-max automaton state after each diagonal (ksw2.h:196-197):
    # strict > update, so the earliest diagonal wins ties.  One int32
    # cummax carries (M, 255-r, max_t): |M| < 2^14 holds for every
    # eligible workload (mat_max * min(qlen,tlen) <= 127*128 < 16384);
    # the deep-negative clamp only affects all-negative prefixes, whose
    # decode is never consulted (max > 0 gates every use).
    key = jnp.where(valid,
                    jnp.maximum(M, -(1 << 14)) * 32768 + (255 - r) * 128
                    + maxt, _SENT)
    cm = jax.lax.cummax(key, axis=1)
    bestM = cm >> 15
    rstar = 255 - ((cm >> 7) & 255)
    bp = cm & 127
    pos = bestM > 0
    mx = jnp.where(pos, bestM, 0)
    mt = jnp.where(pos, bp, -1)
    mq = jnp.where(pos, rstar - bp, -1)
    # state *before* each diagonal
    mxp = jnp.concatenate([jnp.zeros((B, 1), I32), mx[:, :-1]], axis=1)
    mtp = jnp.concatenate([jnp.full((B, 1), -1, I32), mt[:, :-1]], axis=1)
    mqp = jnp.concatenate([jnp.full((B, 1), -1, I32), mq[:, :-1]], axis=1)

    if prm.zdrop >= 0:
        l = jnp.abs((maxt - mtp) - ((r - maxt) - mqp))
        trig = (valid & jnp.logical_not(M > mxp) & (maxt >= mtp)
                & ((r - maxt) >= mqp)
                & ((mxp - M) > prm.zdrop + l * prm.e))
        rdrop = jnp.min(jnp.where(trig, r, _BIG), axis=1)
        dropped = rdrop < _BIG
    else:
        rdrop = jnp.full((B,), _BIG, I32)
        dropped = jnp.zeros((B,), bool)
    rc = jnp.where(dropped, rdrop, ndc[:, 0] - 1)
    rcc = rc[:, None]

    # max/max_t/max_q = automaton state after diagonal rc (no update can
    # happen at a dropping diagonal, so the masked prefix is exact)
    kmask = r <= rcc
    bkc = jnp.max(jnp.where(kmask, key, _SENT), axis=1)
    bestMc = bkc >> 15
    rstarc = 255 - ((bkc >> 7) & 255)
    bpc = bkc & 127
    posc = bestMc > 0
    vmax = jnp.where(posc, bestMc, 0)
    vmaxt = jnp.where(posc, bpc, -1)
    vmaxq = jnp.where(posc, rstarc - bpc, -1)

    # mqe: packed (H*256 + 127 - i) at diagonals i + qlen - 1 <= rc
    qb = jnp.max(jnp.where(kmask, Dq, _SENT), axis=1)
    hasq = qb > _SENT // 2
    mqe = jnp.where(hasq, qb >> 8, NEG_INF)
    mqet = jnp.where(hasq, 127 - (qb & 255), -1)

    # mte: last-row H at query columns j <= rc - (tlen-1); mte_q keeps
    # the reference's 16-rounded `r - en` quirk (ksw2_extz2_sse.c:264)
    tmask = (jl <= rcc - (tlc - 1)) & (jl < qlc) & (tlc > 0)
    pt = jnp.where(tmask, Hlast * 256 + (255 - jl), _SENT)
    tb = jnp.max(pt, axis=1)
    hast = tb > _SENT // 2
    jstar = 255 - (tb & 255)
    en_c = ((tlen.astype(I32) + 15) & -16) - 1
    mte = jnp.where(hast, tb >> 8, NEG_INF)
    mteq = jnp.where(hast, (tlen.astype(I32) - 1 + jstar) - en_c, -1)

    # score: corner H, only when the final diagonal completed undropped
    hq = jnp.sum(jnp.where(jl == qlc - 1, Hlast, 0), axis=1)
    done = jnp.logical_not(dropped) & (qlen > 0) & (tlen > 0)
    score = jnp.where(done, hq, NEG_INF)

    return jnp.stack([vmax, vmaxt, vmaxq, mqe, mqet, mte, mteq, score,
                      dropped.astype(I32)], axis=1)


@functools.lru_cache(maxsize=64)
def _cached_rows_run(prm: RowParams, generic: bool, matt: tuple,
                     sc_mch: int, sc_mis: int, sc_N: int,
                     interpret: bool):
    call = build_rows_call(prm, interpret=interpret)
    B = prm.n_pairs
    m = prm.m

    def run(query, target, qlen, tlen):
        """query (B,Lq) int8, target (B,Lt) int8, lens (B,) int32."""
        qlen = qlen.astype(I32)
        tlen = tlen.astype(I32)
        rep = jnp.ones((128, B), I32)
        qlp = qlen[None, :] * rep
        tlp = tlen[None, :] * rep
        # score planes s[i, j, b] = score(target[b,i], query[b,j]) built
        # from broadcast compares/selects (XLA gathers lower to scalar
        # loops on TPU — see ops/inject.py)
        Qs = jnp.zeros((128, B), I32).at[:query.shape[1]].set(
            query.astype(I32).T)
        Tt = jnp.zeros((prm.n_trows, B), I32).at[:target.shape[1]].set(
            target.astype(I32).T)
        if generic:
            matv = np.asarray(matt, np.int64).reshape(m, m)
            s = jnp.zeros((prm.n_trows, 128, B), jnp.int8)
            for c in range(m):
                prof = jnp.full((prm.n_trows, B), int(matv[m - 1, c]),
                                jnp.int8)
                for t in range(m - 1):
                    prof = jnp.where(Tt == t, int(matv[t, c]), prof)
                s = jnp.where(Qs[None] == c, prof[:, None], s)
        else:
            eq = Tt[:, None, :] == Qs[None]
            nm = (Tt[:, None, :] == m - 1) | (Qs[None] == m - 1)
            s = jnp.where(nm, jnp.int8(sc_N),
                          jnp.where(eq, jnp.int8(sc_mch), jnp.int8(sc_mis)))
        d0, d1, dq0, dq1, hlast = call(qlp, tlp, s)
        D = jnp.concatenate([d0.T, d1.T], axis=1)
        Dq = jnp.concatenate([dq0.T, dq1.T], axis=1)
        return _postprocess(prm, D, Dq, hlast.T, qlen, tlen)

    return jax.jit(run)


def rows_eligible(qlen, tlen, w, flag, zdrop, m, mat) -> bool:
    """True when every pair's band never clips the matrix bounds (the
    SSE diagonal band equals the matrix-shape bounds for all diagonals),
    qlen/tlen fit one lane row, and the mode is plain score-only."""
    flag = int(flag)
    if flag & (int(Flag.APPROX_MAX) | int(Flag.APPROX_DROP)):
        return False
    if not (flag & int(Flag.SCORE_ONLY)):
        return False
    qlen = np.asarray(qlen)
    tlen = np.asarray(tlen)
    if qlen.size == 0 or qlen.max(initial=0) > 128 or \
            tlen.max(initial=0) > 128:
        return False
    if qlen.min(initial=1) < 1 or tlen.min(initial=1) < 1:
        return False
    w = np.asarray(w)
    r = np.arange(256, dtype=np.int64)[None, :]
    ql = qlen.astype(np.int64)[:, None]
    tl = tlen.astype(np.int64)[:, None]
    wl = w.astype(np.int64)[:, None]
    live = r < ql + tl - 1
    st_clip = (r - wl + 1) >> 1 > np.maximum(0, r - ql + 1)
    en_clip = (r + wl) >> 1 < np.minimum(tl - 1, r)
    return not bool(((st_clip | en_clip) & live).any())


def _pad_pairs(B: int) -> int:
    """Pairs live on lanes: pad to the 128-lane tile, on a coarse ladder
    (compile-cache friendly, cf. ops/bands.py pad_rows)."""
    Bp = max(B, 1)
    step = max(128, (1 << (Bp - 1).bit_length()) // 4)
    return -(-Bp // step) * step


def extz_rows_records(query, target, qlen, tlen, m, mat, q, e,
                      zdrop=-1, flag=Flag.SCORE_ONLY,
                      interpret: bool = False) -> list:
    """Row-major batched one-piece extension, score-only, async records.

    Same contract as :func:`ops.batch_pallas.extz_batch_records` (list of
    device (B_i, NFIELDS) int32 records in FIELD_ORDER); callers must
    have checked :func:`rows_eligible`.
    """
    flag = Flag(int(flag))
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    B, Lq = query.shape
    qlen = np.asarray(qlen, np.int32)
    tlen = np.asarray(tlen, np.int32)
    mat = np.asarray(mat, dtype=np.int8).reshape(-1)
    BMAX = 512
    if B > BMAX:
        pieces = []
        for i in range(0, B, BMAX):
            pieces.extend(extz_rows_records(
                query[i:i + BMAX], target[i:i + BMAX], qlen[i:i + BMAX],
                tlen[i:i + BMAX], m, mat, q, e, zdrop, flag, interpret))
        return pieces
    sc_N = -e if int(mat[m * m - 1]) == 0 else int(mat[m * m - 1])
    Bp = _pad_pairs(B)
    tmax = int(tlen.max()) if B else 1
    n_trows = max(CHUNK, (tmax + CHUNK - 1) // CHUNK * CHUNK)
    # bucket arrays may be padded wider than the actual lengths; the
    # columns beyond every qlen/tlen are dead padding
    query = np.asarray(query)[:, :128]
    target = np.asarray(target)[:, :n_trows]
    Lq = query.shape[1]
    generic = bool(flag & Flag.GENERIC_SC)
    prm = RowParams(n_pairs=Bp, n_trows=n_trows, m=m, q=int(q), e=int(e),
                    zdrop=int(zdrop), flag=int(flag), mat0=int(mat[0]))
    run = _cached_rows_run(
        prm, generic, tuple(int(v) for v in mat) if generic else (),
        int(mat[0]), int(mat[1]), sc_N, interpret)
    qpad = np.zeros((Bp, Lq), np.int8)
    qpad[:B] = np.asarray(query, np.int8)
    tpad = np.zeros((Bp, target.shape[1]), np.int8)
    tpad[:B] = np.asarray(target, np.int8)
    lens = np.zeros((2, Bp), np.int32)
    lens[0, :B], lens[1, :B] = qlen, tlen
    return [run(jnp.asarray(qpad), jnp.asarray(tpad),
                jnp.asarray(lens[0]), jnp.asarray(lens[1]))[:B]]


__all__ = ["RowParams", "build_rows_call", "rows_eligible",
           "extz_rows_records", "CHUNK"]
