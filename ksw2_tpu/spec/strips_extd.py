"""Executable spec of the strip-tiled TWO-PIECE (extd) row-major engine.

Extends ``spec/strips.py`` to the dual gap cost min{q+k*e, q2+k*e2}
(``ksw_extd2_sse``, /root/reference/ksw2_extd2_sse.c:131-386).  Row-major
absolute-H recurrence per target row::

    hnof   = max(Hd + sc, E, E2)         # H without the horizontal states
    cv     = Hd + mat0                   # the reference's per-cell clamp
    F      = prefix-max chain opened from min(hnof, cv) with (q, e)
    Hc1    = min(max(hnof, F), cv)
    F2     = prefix-max chain opened from Hc1 with (q2, e2)
    H      = min(max(hnof, F, F2), cv)
    E'     = max(E  - e,  H - q  - e)
    E2'    = max(E2 - e2, H - q2 - e2)

The two horizontal chains decouple because (post the reference's
canonicalization swap, and requiring e >= e2):

* F opening from an F-valued cell is dominated by extending F (q >= 0);
  same for F2 (q2 >= 0) — the classic chain lemma;
* F opening from an F2-valued cell is dominated by extending F2
  (-q - k*e <= -k*e2 for all k >= 0 whenever e >= e2);
* F2 opening from an F-valued cell IS the two-piece crossover and is
  kept (F2's chain opens from Hc1, which includes F).

So the H values (score-only observables) equal the reference's exactly;
only the internal F state may under-report where it never feeds H.

Boundary conditions mirror ksw2_extd2_sse.c:156-163: the virtual column
``H(i, -1)`` and row ``H(-1, j)`` step by -e until ``long_thres``, take
``long_diff`` at it, then step by -e2.  The reference quirk that H at
diagonal r==0 is seeded with the PRE-swap q+e (ksw2_extd2_sse.c:358)
shows up as a constant offset on the one cell (0,0); the replay applies
it to the diagonal-0 record.

Z-drop gap compensation uses e2 (ksw2_extd2_sse.c:364).
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from ..core.flags import NEG_INF
from .strips import SENT, key_params, merge_key, replay_records


def long_params(q: int, e: int, q2: int, e2: int):
    """(long_thres, long_diff) after canonicalization (diagdiff.extd2)."""
    if e != e2:
        long_thres = (q2 - q + (e - e2) - 1) // (e - e2) - 1
    else:
        long_thres = 0
    if q2 + e2 + long_thres * e2 > q + e + long_thres * e:
        long_thres += 1
    long_diff = long_thres * (e - e2) - (q2 - q) - e2
    return long_thres, long_diff


def boundary_h(n: int, qe: int, e: int, e2: int, long_thres: int,
               long_diff: int) -> np.ndarray:
    """H(i, -1) for i in [0, n): cumulative of the stepped v1 boundary
    (-qe at i=0; then -e / long_diff at long_thres / -e2)."""
    d = np.full(n, -e2, np.int64)
    if n > 0:
        d[0] = -qe
    idx = np.arange(n)
    d = np.where((idx >= 1) & (idx < long_thres), -e, d)
    if 0 < long_thres < n:
        d[long_thres] = long_diff
    return np.cumsum(d)


def strips_forward_extd(
    query: np.ndarray,
    target: np.ndarray,
    m: int,
    mat: np.ndarray,
    q: int,
    e: int,
    q2: int,
    e2: int,
    tv: int | None = None,
    generic: bool = False,
) -> Dict[str, np.ndarray]:
    """Two-piece strip-tiled forward sweep for one pair; record streams.

    Caller passes the POST-swap costs (see :func:`strips_extd`).  Returns
    the same D/Dq/hl streams as the one-piece spec.
    """
    query = np.asarray(query, np.int64)
    target = np.asarray(target, np.int64)
    qlen, tlen = len(query), len(target)
    mat = np.asarray(mat, np.int64).reshape(m, m)
    sc_N = -e2 if mat[m - 1, m - 1] == 0 else int(mat[m - 1, m - 1])
    qe, qe2 = q + e, q2 + e2
    mat0 = int(mat[0, 0])
    long_thres, long_diff = long_params(q, e, q2, e2)
    n_diag = qlen + tlen - 1
    n_strips = (qlen + 127) // 128
    if tv is None:
        tv = tlen

    D = np.full(n_diag, SENT, np.int64)
    Dq = np.full(n_diag, SENT, np.int64)
    hl = np.full(qlen, SENT, np.int64)
    KB, _ = key_params(tv)

    # virtual boundaries: column H(i,-1) and row H(-1,j) (same stepping)
    colH = boundary_h(tlen, qe, e, e2, long_thres, long_diff)
    rowH = boundary_h(qlen, qe, e, e2, long_thres, long_diff)

    bH = None                  # H(i, j0-1) stream entering current strip
    bF1 = None                 # F  (i, j0) seed
    bF2 = None                 # F2 (i, j0) seed
    for s in range(n_strips):
        j0 = s * 128
        sw = min(128, qlen - j0)
        jj = np.arange(sw, dtype=np.int64)
        jg = j0 + jj
        qs = query[j0:j0 + sw]
        H = rowH[jg].copy()            # H(-1, j) entering row 0
        E = rowH[jg] - qe              # E(0, j) candidates
        E2 = rowH[jg] - qe2
        nbH = np.empty(tlen, np.int64)
        nbF1 = np.empty(tlen, np.int64)
        nbF2 = np.empty(tlen, np.int64)
        for i in range(tlen):
            if generic:
                sc = mat[target[i], qs]
            else:
                sc = np.where((target[i] == m - 1) | (qs == m - 1), sc_N,
                              np.where(qs == target[i], mat0,
                                       int(mat[0, 1])))
            if s == 0:
                hb = 0 if i == 0 else int(colH[i - 1])
            else:
                hb = int(rowH[j0 - 1]) if i == 0 else int(bH[i - 1])
            Hd = np.concatenate(([hb], H[:-1]))
            hnof = np.maximum(Hd + sc, np.maximum(E, E2))
            cv = Hd + mat0
            hnof_c = np.minimum(hnof, cv)
            # F chain (q, e)
            if s == 0:
                fb1 = int(colH[i]) - qe
            else:
                fb1 = int(bF1[i])
            A1 = hnof_c + jj * e - q
            S1 = np.empty(sw, np.int64)
            S1[0] = fb1
            for k in range(1, sw):
                S1[k] = max(S1[k - 1], A1[k - 1])
            F1 = S1 - jj * e
            Hc1 = np.minimum(np.maximum(hnof, F1), cv)
            # F2 chain (q2, e2) opens from Hc1 (includes F: the crossover)
            if s == 0:
                fb2 = int(colH[i]) - qe2
            else:
                fb2 = int(bF2[i])
            A2 = Hc1 + jj * e2 - q2
            S2 = np.empty(sw, np.int64)
            S2[0] = fb2
            for k in range(1, sw):
                S2[k] = max(S2[k - 1], A2[k - 1])
            F2 = S2 - jj * e2
            Hn = np.minimum(np.maximum(np.maximum(hnof, F1), F2), cv)
            En = np.maximum(E - e, Hn - qe)
            E2n = np.maximum(E2 - e2, Hn - qe2)
            H, E, E2 = Hn, En, E2n
            if sw == 128:
                nbH[i] = Hn[127]
                nbF1[i] = max(F1[127], np.minimum(Hn[127], cv[127]) - q) - e
                nbF2[i] = max(F2[127], np.minimum(Hn[127], cv[127]) - q2) \
                    - e2
            r = i + jg
            st0 = np.maximum(0, r - qlen + 1)
            en0 = np.minimum(tlen - 1, r)
            for xx in range(sw):
                rr = int(r[xx])
                kf = merge_key(i, int(st0[xx]), int(en0[xx]), tv)
                packed = Hn[xx] * KB + (KB - 1 - kf)
                if packed > D[rr]:
                    D[rr] = packed
            if j0 <= qlen - 1 < j0 + sw:
                Dq[i + qlen - 1] = Hn[qlen - 1 - j0]
            if i == tlen - 1:
                hl[j0:j0 + sw] = Hn
        bH, bF1, bF2 = nbH, nbF1, nbF2
    return {"D": D, "Dq": Dq, "hl": hl}


def strips_extd(
    query: np.ndarray,
    target: np.ndarray,
    m: int,
    mat: np.ndarray,
    q: int,
    e: int,
    q2: int,
    e2: int,
    zdrop: int = -1,
    tv: int | None = None,
    generic: bool = False,
) -> Dict[str, int]:
    """Full strip-tiled score-only extd for one pair (spec entry point).

    Applies the reference's canonicalization swap and the pre-swap r==0
    H seed quirk, then replays the shared per-diagonal automaton with
    the e2 Z-drop slope.
    """
    q, e, q2, e2 = int(q), int(e), int(q2), int(e2)
    qe_pre = q + e
    if q2 + e2 < q + e:
        q, q2 = q2, q
        e, e2 = e2, e
    qlen, tlen = len(query), len(target)
    if tv is None:
        tv = tlen
    rec = strips_forward_extd(query, target, m, mat, q, e, q2, e2, tv=tv,
                              generic=generic)
    # The reference seeds its reconstructed H row at r==0 with the
    # PRE-swap q+e (ksw2_extd2_sse.c:358); every later H accumulates
    # from that seed, so the WHOLE reported H surface is offset by
    # (q+e)_post - (q+e)_pre when the swap fired.  The offset interacts
    # with the automaton's 0 floor (ez.max starts at 0), so it must be
    # applied to the streams, not the outputs.
    off0 = (q + e) - qe_pre            # nonzero only when the swap fired
    if off0:
        KB, _ = key_params(tv)
        rec = {k: v.copy() for k, v in rec.items()}
        live = rec["D"] != SENT
        rec["D"][live] += off0 * KB    # shifts the H field, keeps the key
        live = rec["Dq"] != SENT
        rec["Dq"][live] += off0
        live = rec["hl"] != SENT
        rec["hl"][live] += off0
    return replay_records(rec["D"], rec["Dq"], rec["hl"], qlen, tlen,
                          e2, zdrop, tv=tv)


__all__ = ["strips_forward_extd", "strips_extd", "long_params",
           "boundary_h"]
