"""Executable spec of the strip-tiled row-major engine (arbitrary lengths).

The batched wavefront engines sweep anti-diagonals with one pair spread
over ``P`` sublane rows; about half of every row's lane-steps are triangle
waste, and exact Z-drop costs a cross-lane butterfly per diagonal.  The
row-major engine (`ops/wavefront_rows.py`) fixes both for pairs with
``qlen, tlen <= 128``.  This module specifies its generalization to
arbitrary lengths:

* the query axis is cut into **strips** of 128 columns; strip ``s`` holds
  global query columns ``[128s, 128s+128)``;
* each strip runs the row-major sweep over every target row, carrying two
  boundary streams from the strip to its right neighbour: ``bH[i] =
  H(i, 128s-1)`` (feeding the next strip's diagonal term at its first
  lane) and ``bF[i] = F(i, 128s)`` (the next strip's F-scan seed,
  pre-advanced by one gap-extension step);
* the within-row F dependency is broken by the same prefix-scan
  substitution as the rows engine (valid whenever gap-open+ext >= ext):
  ``F(i,j) = max(bF(i), max_{k<j} A(k)) - j*e`` with
  ``A(k) = Hnof_c(i,k) + k*e - q`` (clamped H-without-F), so a strip row
  is seven butterfly steps, not 128 sequential cells;
* per-ANTI-diagonal observables (running max + Z-drop stopping diagonal,
  with ``ksw_extz2_sse``'s exact merge-order tie rule) are not computed in
  sweep order.  Instead the sweep records, per diagonal ``r``:
  ``D[r]`` = packed (max H, merge-order tie key) over the diagonal's
  cells (a pointwise max, order-independent), ``Dq[r]`` = H of the
  query-end cell on ``r`` (at most one per diagonal), and ``hl[j]`` = H of
  the last-target-row cell in column ``j``; the reference's per-diagonal
  ez automaton (ksw2_extz2_sse.c:263-269 + ksw2.h:191-207) is then
  **replayed exactly** from those records by :func:`replay_records`.

The Pallas kernel schedules the same math as a software pipeline (strip
``s`` processes target row ``t - s`` at step ``t``, boundary streams
flowing between adjacent plane rows), which changes nothing observable;
this spec runs strips sequentially for clarity and is validated against
``spec.diagdiff.extz2`` (the byte-parity spec of ksw2_extz2_sse.c).

Scope: one-piece extz costs, score-only, exact max (no APPROX_*), w
effectively unbanded (the band never clips the matrix-shape bounds; see
``strips_eligible`` in the ops module).  Cite: ksw2_extz2_sse.c:150-286
for the semantics being reproduced.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ..core.flags import NEG_INF

SENT = -(2 ** 31) + 1      # "no value" for packed record streams


def key_params(tv: int) -> Tuple[int, int]:
    """(KB, KBITS) for the packed (H, tie-key) records at t-capacity tv.

    The key space is ``5*tv + 2`` values (en0-cell + 4 lane classes * tv +
    scalar tail), mirroring ops/wavefront_batch.py; KB is the next power
    of two so encode/decode are shifts/masks on the VPU.
    """
    kbits = int(5 * tv + 1).bit_length()
    return 1 << kbits, kbits


def merge_key(t: int, st0: int, en0: int, tv: int) -> int:
    """ksw_extz2_sse's exact-max merge-order rank of cell t on a diagonal.

    Smaller = earlier in the reference's scan merge = wins score ties
    (spec/common.py:exact_max_scan): the en0 boundary cell first, then the
    SSE vector region [st0, en1) ranked by (lane class, t), then the
    scalar tail [en1, en0) ranked by t.
    """
    if t == en0:
        return 0
    en1 = st0 + ((en0 - st0) & -4)
    if t < en1:
        return ((t - st0) & 3) * tv + t + 1
    return 4 * tv + t + 1


def strips_forward(
    query: np.ndarray,
    target: np.ndarray,
    m: int,
    mat: np.ndarray,
    q: int,
    e: int,
    tv: int | None = None,
    generic: bool = False,
) -> Dict[str, np.ndarray]:
    """Strip-tiled forward sweep for one pair; returns the record streams.

    Returns dict with ``D`` (n_diag,) packed per-diagonal (H, key) int64,
    ``Dq`` (n_diag,) query-end-cell H (SENT where none), ``hl`` (qlen,)
    last-target-row H.  All H values are exact int32-range scores.
    ``generic`` selects the raw-matrix-gather score rule (KSW_EZ_GENERIC_SC,
    ksw2_extz2_sse.c:141-144) over the specialized match/mismatch/N fill
    (ksw2_extz2_sse.c:125-140).
    """
    query = np.asarray(query, np.int64)
    target = np.asarray(target, np.int64)
    qlen, tlen = len(query), len(target)
    mat = np.asarray(mat, np.int64).reshape(m, m)
    sc_N = -e if mat[m - 1, m - 1] == 0 else int(mat[m - 1, m - 1])
    gapoe = q + e
    mat0 = int(mat[0, 0])
    n_diag = qlen + tlen - 1
    n_strips = (qlen + 127) // 128
    if tv is None:
        tv = tlen

    D = np.full(n_diag, SENT, np.int64)
    Dq = np.full(n_diag, SENT, np.int64)
    hl = np.full(qlen, SENT, np.int64)
    KB, _ = key_params(tv)

    # boundary streams entering the current strip (strip 0: closed form)
    # bH[i] = H(i, j0-1) for i in [-1, tlen); bF[i] = F(i, j0) seed
    bH = None
    bF = None
    for s in range(n_strips):
        j0 = s * 128
        sw = min(128, qlen - j0)          # strip width (last may be short)
        jj = np.arange(sw, dtype=np.int64)
        jg = j0 + jj                      # global query columns
        qs = query[j0:j0 + sw]
        # H plane holds H(i-1, j) entering row i; init = virtual row -1
        H = -(gapoe + e * jg)
        E = -(2 * gapoe + e * jg)
        nbH = np.empty(tlen, np.int64)    # boundary streams for strip s+1
        nbF = np.empty(tlen, np.int64)
        for i in range(tlen):
            if generic:
                sc = mat[target[i], qs]
            else:
                sc = np.where((target[i] == m - 1) | (qs == m - 1), sc_N,
                              np.where(qs == target[i], mat0,
                                       int(mat[0, 1])))
            # diagonal term H(i-1, j-1): shift H right; first lane from
            # the left boundary stream (or the closed-form column bound)
            if s == 0:
                hb = 0 if i == 0 else -(gapoe + e * (i - 1))
            else:
                hb = (-(gapoe + e * (j0 - 1))) if i == 0 else int(bH[i - 1])
            Hd = np.concatenate(([hb], H[:-1]))
            hnof = np.maximum(Hd + sc, E)
            cv = Hd + mat0                # the reference's per-cell clamp
            hnof_c = np.minimum(hnof, cv)
            # F prefix scan with the incoming seed
            if s == 0:
                fb = -(2 * gapoe + e * i)
            else:
                fb = int(bF[i])
            A = hnof_c + jj * e - q
            S0 = np.empty(sw, np.int64)
            S0[0] = fb
            for k in range(1, sw):
                S0[k] = max(S0[k - 1], A[k - 1])
            F = S0 - jj * e
            Hn = np.minimum(np.maximum(hnof, F), cv)
            En = np.maximum(E - e, Hn - gapoe)
            H, E = Hn, En
            # boundary streams for the next strip (only full strips feed one)
            if sw == 128:
                nbH[i] = Hn[127]
                nbF[i] = max(F[127], hnof_c[127] - q) - e
            # record streams
            r = i + jg                    # per-lane global diagonals
            st0 = np.maximum(0, r - qlen + 1)
            en0 = np.minimum(tlen - 1, r)
            for x in range(sw):
                rr = int(r[x])
                kf = merge_key(i, int(st0[x]), int(en0[x]), tv)
                packed = Hn[x] * KB + (KB - 1 - kf)
                if packed > D[rr]:
                    D[rr] = packed
            if j0 <= qlen - 1 < j0 + sw:
                Dq[i + qlen - 1] = Hn[qlen - 1 - j0]
            if i == tlen - 1:
                hl[j0:j0 + sw] = Hn
        bH, bF = nbH, nbF
    return {"D": D, "Dq": Dq, "hl": hl}


def replay_records(
    D: np.ndarray,
    Dq: np.ndarray,
    hl: np.ndarray,
    qlen: int,
    tlen: int,
    e: int,
    zdrop: int,
    tv: int | None = None,
) -> Dict[str, int]:
    """Replay the reference's per-diagonal ez automaton from the records.

    Sequential mirror of ksw2_extz2_sse.c:263-269 (mte -> mqe -> zdrop ->
    score, in that order, per diagonal) + ksw2.h:191-207; the engine's
    vectorized postprocess must match this exactly.
    """
    if tv is None:
        tv = tlen
    KB, kbits = key_params(tv)
    n_diag = qlen + tlen - 1
    en_c = ((tlen + 15) & -16) - 1        # 16-rounded band end (unbanded)
    mx, mt, mq = 0, -1, -1
    mqe, mqe_t = NEG_INF, -1
    mte, mte_q = NEG_INF, -1
    score = NEG_INF
    zdropped = False
    for r in range(n_diag):
        packed = int(D[r])
        M = packed >> kbits
        kstar = KB - 1 - (packed & (KB - 1))
        en0 = min(tlen - 1, r)
        if kstar == 0:
            maxt = en0
        elif kstar <= 4 * tv:
            maxt = (kstar - 1) % tv
        else:
            maxt = kstar - 1 - 4 * tv
        # ez updates precede the drop break (ksw2_extz2_sse.c:263-269)
        if en0 == tlen - 1:
            h_en0 = int(hl[r - (tlen - 1)])
            if h_en0 > mte:
                mte, mte_q = h_en0, r - en_c
        if r >= qlen - 1 and Dq[r] != SENT and int(Dq[r]) > mqe:
            mqe, mqe_t = int(Dq[r]), r - (qlen - 1)
        # ksw_apply_zdrop
        if M > mx:
            mx, mt, mq = M, maxt, r - maxt
        elif maxt >= mt and r - maxt >= mq:
            tl = maxt - mt
            ql = (r - maxt) - mq
            l = tl - ql if tl > ql else ql - tl
            if zdrop >= 0 and mx - M > zdrop + l * e:
                zdropped = True
                break
        if r == n_diag - 1:
            score = int(hl[qlen - 1])
    return {"max": mx, "max_t": mt, "max_q": mq, "mqe": mqe,
            "mqe_t": mqe_t, "mte": mte, "mte_q": mte_q, "score": score,
            "zdropped": int(zdropped)}


def strips_extz(
    query: np.ndarray,
    target: np.ndarray,
    m: int,
    mat: np.ndarray,
    q: int,
    e: int,
    zdrop: int = -1,
    tv: int | None = None,
    generic: bool = False,
) -> Dict[str, int]:
    """Full strip-tiled score-only extz for one pair (spec entry point).

    The ``-min_sc > 2(q+e)`` reset guard (ksw2_extz2_sse.c:78-82) is the
    caller's job, as in the batch engines (ops/batch_pallas.unpack_records).
    """
    rec = strips_forward(query, target, m, mat, q, e, tv=tv,
                         generic=generic)
    return replay_records(rec["D"], rec["Dq"], rec["hl"], len(query),
                          len(target), e, zdrop, tv=tv)


__all__ = ["strips_forward", "replay_records", "strips_extz",
           "merge_key", "key_params", "SENT"]
