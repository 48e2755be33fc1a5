"""Executable spec: row-major direction bytes for a strips CIGAR mode.

Round-5 groundwork (BENCH_NOTES round-5 leads #3).  The strip-tiled
engine computes absolute H/E/F row-major; this spec shows that the
reference's per-cell direction bytes (ksw2_extz2_sse.c:150-223's ``d``)
are pure functions of the LOCAL absolute values, so a row-major sweep
can emit a (tlen, qlen) byte matrix that ``ksw_backtrack(is_rot=0)``
walks to the reference's exact CIGAR:

* argmax code (bits 0-2): left-align ``d = 1 if E > M else 0; d = 2 if
  F > max(M, E)`` with M = H(i-1,j-1) + sc UNclamped (the reference
  compares before its clamp); right-align flips strict/equal.
* continuation bits: 0x08 iff E > H_c - q (>= for right), 0x10 iff
  F > H_c - q, with H_c the CLAMPED cell value (the reference derives
  them from ``a - (z - q)`` after the clamp).
* the prefix-chain F (opened from clamped H-without-F) equals the DP's
  F identically — an F opened from an F-valued H never exceeds the
  extension term when q >= 0 — so chain values feed the byte rules
  unchanged.

Scope: one-piece extz, effectively unbanded, left/right align; the ez
fields come from the same record streams as the score-only spec
(``spec.strips``), so Z-drop start-cell selection is unchanged.
Validated byte-exact against ``diagdiff.extz2`` CIGARs (which are
byte-validated against the compiled reference).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from ..core.flags import Flag
from .backtrack import backtrack
from .strips import SENT, key_params, merge_key, replay_records


def strips_forward_cigar(
    query: np.ndarray,
    target: np.ndarray,
    m: int,
    mat: np.ndarray,
    q: int,
    e: int,
    right: bool = False,
    generic: bool = False,
) -> Tuple[Dict[str, np.ndarray], np.ndarray]:
    """Row-major forward sweep emitting record streams + direction bytes.

    Returns ``(records, dmat)`` with ``dmat`` (tlen, qlen) uint8 in the
    reference's byte encoding.  The sweep is written full-width for
    clarity; cell values (hence bytes) are identical to the 128-column
    strip pipeline's, which this module specifies.
    """
    query = np.asarray(query, np.int64)
    target = np.asarray(target, np.int64)
    qlen, tlen = len(query), len(target)
    mat = np.asarray(mat, np.int64).reshape(m, m)
    sc_N = -e if mat[m - 1, m - 1] == 0 else int(mat[m - 1, m - 1])
    gapoe = q + e
    mat0 = int(mat[0, 0])
    n_diag = qlen + tlen - 1
    tv = tlen
    KB, _ = key_params(tv)

    D = np.full(n_diag, SENT, np.int64)
    Dq = np.full(n_diag, SENT, np.int64)
    hl = np.full(qlen, SENT, np.int64)
    dmat = np.zeros((tlen, qlen), np.uint8)

    jj = np.arange(qlen, dtype=np.int64)
    H = -(gapoe + e * jj)              # H(-1, j)
    E = H - gapoe                      # E(0, j)
    for i in range(tlen):
        if generic:
            sc = mat[target[i], query]
        else:
            sc = np.where((target[i] == m - 1) | (query == m - 1), sc_N,
                          np.where(query == target[i], mat0,
                                   int(mat[0, 1])))
        hb = 0 if i == 0 else -(gapoe + e * (i - 1))
        Hd = np.concatenate(([hb], H[:-1]))
        M = Hd + sc
        cv = Hd + mat0
        hnof = np.maximum(M, E)
        hnof_c = np.minimum(hnof, cv)
        # F prefix chain (== the DP's F; see module docstring)
        A = hnof_c + jj * e - q
        S0 = np.empty(qlen, np.int64)
        S0[0] = -(2 * gapoe + e * i)
        for k in range(1, qlen):
            S0[k] = max(S0[k - 1], A[k - 1])
        F = S0 - jj * e
        Hn = np.minimum(np.maximum(hnof, F), cv)
        # ---- direction bytes (reference tie rules)
        if not right:
            d = np.where(E > M, 1, 0).astype(np.uint8)
            d = np.where(F > np.maximum(M, E), np.uint8(2), d)
            ca = E > Hn - q
            cb = F > Hn - q
        else:
            d = np.where(M > E, 0, 1).astype(np.uint8)
            d = np.where(np.maximum(M, E) > F, d, np.uint8(2))
            ca = E >= Hn - q
            cb = F >= Hn - q
        d |= np.where(ca, np.uint8(0x08), np.uint8(0))
        d |= np.where(cb, np.uint8(0x10), np.uint8(0))
        dmat[i] = d
        # ---- record streams (as spec.strips)
        En = np.maximum(E - e, Hn - gapoe)
        H, E = Hn, En
        r = i + jj
        st0 = np.maximum(0, r - qlen + 1)
        en0 = np.minimum(tlen - 1, r)
        for x in range(qlen):
            rr = int(r[x])
            kf = merge_key(i, int(st0[x]), int(en0[x]), tv)
            packed = Hn[x] * KB + (KB - 1 - kf)
            if packed > D[rr]:
                D[rr] = packed
        Dq[i + qlen - 1] = Hn[qlen - 1]
        if i == tlen - 1:
            hl[:] = Hn
    return {"D": D, "Dq": Dq, "hl": hl}, dmat


def strips_extz_cigar(
    query: np.ndarray,
    target: np.ndarray,
    m: int,
    mat: np.ndarray,
    q: int,
    e: int,
    zdrop: int = -1,
    end_bonus: int = 0,
    flag: Flag | int = Flag.NONE,
) -> Tuple[Dict[str, int], List[int]]:
    """Full strips-CIGAR extz for one pair: records replay (ez fields)
    + row-major byte-matrix walk (ksw2_extz2_sse.c:292-301 start-cell
    rules, ksw2.h:129-161 walk with is_rot=0)."""
    flag = Flag(int(flag))
    qlen, tlen = len(query), len(target)
    rec, dmat = strips_forward_cigar(query, target, m, mat, q, e,
                                     right=bool(flag & Flag.RIGHT))
    ez = replay_records(rec["D"], rec["Dq"], rec["hl"], qlen, tlen, e,
                        zdrop)
    cigar: List[int] = []
    if not ez["zdropped"] and not (flag & Flag.EXTZ_ONLY):
        i0, j0 = tlen - 1, qlen - 1
    elif not ez["zdropped"] and (flag & Flag.EXTZ_ONLY) \
            and ez["mqe"] + end_bonus > ez["max"]:
        i0, j0 = ez["mqe_t"], qlen - 1
    elif ez["max_t"] >= 0 and ez["max_q"] >= 0:
        i0, j0 = ez["max_t"], ez["max_q"]
    else:
        return ez, cigar
    off = np.zeros(tlen, np.int32)
    cigar = backtrack(dmat, off, None, qlen, i0, j0, is_rot=False,
                      is_rev=bool(flag & Flag.REV_CIGAR))
    return ez, cigar





def strips_forward_cigar_extd(
    query: np.ndarray,
    target: np.ndarray,
    m: int,
    mat: np.ndarray,
    q: int,
    e: int,
    q2: int,
    e2: int,
    right: bool = False,
) -> Tuple[Dict[str, np.ndarray], np.ndarray]:
    """Two-piece row-major forward + the reference's 7-bit bytes.

    Byte rules (ksw2_extd2_sse.c:191-322): argmax codes in candidate
    order M, E(1), F(2), E2(3), F2(4) with UNclamped comparisons and the
    clamp applied before the continuation thresholds (E/F vs H_c - q,
    E2/F2 vs H_c - q2).  NOTE the bytes need the DP's OWN F values — the
    score-path chain under-reports F where it opened from an F2-valued
    cell (H is unaffected, the byte's 0x10 bit would not be): a kernel
    CIGAR mode therefore needs a second F chain opened from the full
    clamped H (one extra prefix scan per row); this spec computes the
    row DP sequentially for clarity.  Caller passes POST-swap costs.
    """
    from .strips_extd import boundary_h, long_params

    query = np.asarray(query, np.int64)
    target = np.asarray(target, np.int64)
    qlen, tlen = len(query), len(target)
    mat = np.asarray(mat, np.int64).reshape(m, m)
    sc_N = -e2 if mat[m - 1, m - 1] == 0 else int(mat[m - 1, m - 1])
    qe, qe2 = q + e, q2 + e2
    mat0 = int(mat[0, 0])
    lt, ld = long_params(q, e, q2, e2)
    n_diag = qlen + tlen - 1
    tv = tlen
    KB, _ = key_params(tv)

    D = np.full(n_diag, SENT, np.int64)
    Dq = np.full(n_diag, SENT, np.int64)
    hl = np.full(qlen, SENT, np.int64)
    dmat = np.zeros((tlen, qlen), np.uint8)

    colH = boundary_h(tlen, qe, e, e2, lt, ld)
    rowH = boundary_h(qlen, qe, e, e2, lt, ld)
    H = rowH.copy()                    # H(-1, j)
    E = rowH - qe                      # E(0, j)
    E2 = rowH - qe2
    for i in range(tlen):
        sc = np.where((target[i] == m - 1) | (query == m - 1), sc_N,
                      np.where(query == target[i], mat0, int(mat[0, 1])))
        hb = 0 if i == 0 else int(colH[i - 1])
        Hd = np.concatenate(([hb], H[:-1]))
        Fv = int(colH[i]) - qe         # F(i, 0)
        F2v = int(colH[i]) - qe2
        Hn = np.empty(qlen, np.int64)
        for j in range(qlen):
            M = int(Hd[j]) + int(sc[j])
            cv = int(Hd[j]) + mat0
            z = M
            d = 0
            for cand, code in ((int(E[j]), 1), (Fv, 2),
                               (int(E2[j]), 3), (F2v, 4)):
                if (cand > z) if not right else (cand >= z):
                    d = code
                z = max(z, cand)
            z = min(z, cv)
            if not right:
                ca = int(E[j]) > z - q
                cb = Fv > z - q
                ca2 = int(E2[j]) > z - q2
                cb2 = F2v > z - q2
            else:
                ca = int(E[j]) >= z - q
                cb = Fv >= z - q
                ca2 = int(E2[j]) >= z - q2
                cb2 = F2v >= z - q2
            d |= (0x08 if ca else 0) | (0x10 if cb else 0) \
                | (0x20 if ca2 else 0) | (0x40 if cb2 else 0)
            dmat[i, j] = d
            Hn[j] = z
            Fv = max(Fv - e, z - qe)       # F(i, j+1)
            F2v = max(F2v - e2, z - qe2)
        En = np.maximum(E - e, Hn - qe)
        E2n = np.maximum(E2 - e2, Hn - qe2)
        H, E, E2 = Hn, En, E2n
        r = i + np.arange(qlen, dtype=np.int64)
        st0 = np.maximum(0, r - qlen + 1)
        en0 = np.minimum(tlen - 1, r)
        for x in range(qlen):
            rr = int(r[x])
            kf = merge_key(i, int(st0[x]), int(en0[x]), tv)
            packed = Hn[x] * KB + (KB - 1 - kf)
            if packed > D[rr]:
                D[rr] = packed
        Dq[i + qlen - 1] = Hn[qlen - 1]
        if i == tlen - 1:
            hl[:] = Hn
    return {"D": D, "Dq": Dq, "hl": hl}, dmat


def strips_extd_cigar(
    query: np.ndarray,
    target: np.ndarray,
    m: int,
    mat: np.ndarray,
    q: int,
    e: int,
    q2: int,
    e2: int,
    zdrop: int = -1,
    end_bonus: int = 0,
    flag: Flag | int = Flag.NONE,
) -> Tuple[Dict[str, int], List[int]]:
    """Full strips-CIGAR extd: swap + pre-swap H-surface offset + e2
    Z-drop slope (as spec.strips_extd) + row-major byte walk."""
    flag = Flag(int(flag))
    q, e, q2, e2 = int(q), int(e), int(q2), int(e2)
    qe_pre = q + e
    if q2 + e2 < q + e:
        q, q2 = q2, q
        e, e2 = e2, e
    qlen, tlen = len(query), len(target)
    rec, dmat = strips_forward_cigar_extd(
        query, target, m, mat, q, e, q2, e2,
        right=bool(flag & Flag.RIGHT))
    off0 = (q + e) - qe_pre
    if off0:
        rec = {k: v.copy() for k, v in rec.items()}
        for k in ("D",):
            live = rec[k] != SENT
            rec[k][live] += off0 * key_params(tlen)[0]
        for k in ("Dq", "hl"):
            live = rec[k] != SENT
            rec[k][live] += off0
    ez = replay_records(rec["D"], rec["Dq"], rec["hl"], qlen, tlen, e2,
                        zdrop)
    cigar: List[int] = []
    if not ez["zdropped"] and not (flag & Flag.EXTZ_ONLY):
        i0, j0 = tlen - 1, qlen - 1
    elif not ez["zdropped"] and (flag & Flag.EXTZ_ONLY) \
            and ez["mqe"] + end_bonus > ez["max"]:
        i0, j0 = ez["mqe_t"], qlen - 1
    elif ez["max_t"] >= 0 and ez["max_q"] >= 0:
        i0, j0 = ez["max_t"], ez["max_q"]
    else:
        return ez, cigar
    off = np.zeros(tlen, np.int32)
    cigar = backtrack(dmat, off, None, qlen, i0, j0, is_rot=False,
                      is_rev=bool(flag & Flag.REV_CIGAR))
    return ez, cigar


def strips_exts_cigar(
    query: np.ndarray,
    target: np.ndarray,
    m: int,
    mat: np.ndarray,
    q: int,
    e: int,
    q2: int,
    noncan: int,
    zdrop: int = -1,
    junc_bonus: int = 0,
    flag: Flag | int = Flag.NONE,
    junc=None,
) -> Tuple[Dict[str, int], List[int]]:
    """Spliced strips-CIGAR (exts): row-major absolute recurrence with
    the intron state carried VERTICALLY with no per-row decay —

        N(i+1, j)   = max(N(i, j), H(i, j) + donor(i) - q2)
        cand3(i, j) = N(i, j) + acceptor(i)

    (donor paid at open, acceptor at close, free intron length), byte
    codes M,E,F,N(3) with the 0x20 continuation bit from
    ``N + q2 - H > donor(i)`` and NO per-cell clamp (exts has none);
    boundaries step -e until long_thres, long_diff at it, then FLAT
    (``boundary_h`` with e2 = 0); Z-drop gap slope 0
    (ksw2_exts2_sse.c:398's apply_zdrop e).  Walk with
    min_intron_len = long_thres emits N ops for long target gaps.
    """
    from ..spec.common import c_div
    from .diagdiff import _splice_profiles
    from .strips_extd import boundary_h

    flag = Flag(int(flag))
    right = bool(flag & Flag.RIGHT)
    query = np.asarray(query, np.int64)
    target = np.asarray(target, np.int64)
    qlen, tlen = len(query), len(target)
    mat = np.asarray(mat, np.int64).reshape(m, m)
    sc_N = -e if mat[m - 1, m - 1] == 0 else int(mat[m - 1, m - 1])
    qe = q + e
    mat0 = int(mat[0, 0])
    lt = c_div(q2 - q, e) - 1
    if q2 > q + e + lt * e:
        lt += 1
    ld = lt * e - (q2 - q)
    n_diag = qlen + tlen - 1
    tv = tlen
    KB, _ = key_params(tv)
    donor, acceptor = _splice_profiles(target, tlen, tlen, noncan, flag,
                                       junc, junc_bonus)
    donor = donor.astype(np.int64)
    acceptor = acceptor.astype(np.int64)

    D = np.full(n_diag, SENT, np.int64)
    Dq = np.full(n_diag, SENT, np.int64)
    hl = np.full(qlen, SENT, np.int64)
    dmat = np.zeros((tlen, qlen), np.uint8)

    colH = boundary_h(tlen, qe, e, 0, lt, ld)
    rowH = boundary_h(qlen, qe, e, 0, lt, ld)
    jj = np.arange(qlen, dtype=np.int64)
    H = rowH.copy()
    E = rowH - qe
    NI = rowH - q2                     # intron state entering row 0
    for i in range(tlen):
        sc = np.where((target[i] == m - 1) | (query == m - 1), sc_N,
                      np.where(query == target[i], mat0, int(mat[0, 1])))
        hb = 0 if i == 0 else int(colH[i - 1])
        Hd = np.concatenate(([hb], H[:-1]))
        M = Hd + sc
        cand3 = NI + int(acceptor[i])
        hnof = np.maximum(M, np.maximum(E, cand3))
        # F prefix chain (no clamp in exts; chain == DP-F, q >= 0)
        A = hnof + jj * e - q
        S0 = np.empty(qlen, np.int64)
        S0[0] = int(colH[i]) - qe
        for k in range(1, qlen):
            S0[k] = max(S0[k - 1], A[k - 1])
        F = S0 - jj * e
        Hn = np.maximum(hnof, F)
        # ---- 7-bit bytes: codes M,E(1),F(2),N(3); order a, b, a2a
        if not right:
            d = np.where(E > M, 1, 0).astype(np.uint8)
            z2 = np.maximum(M, E)
            d = np.where(F > z2, np.uint8(2), d)
            d = np.where(cand3 > np.maximum(z2, F), np.uint8(3), d)
            ca = E > Hn - q
            cb = F > Hn - q
            cd = NI + q2 - Hn > int(donor[i])
        else:
            d = np.where(M > E, 0, 1).astype(np.uint8)
            z2 = np.maximum(M, E)
            d = np.where(z2 > F, d, np.uint8(2))
            d = np.where(np.maximum(z2, F) > cand3, d, np.uint8(3))
            ca = E >= Hn - q
            cb = F >= Hn - q
            cd = NI + q2 - Hn >= int(donor[i])
        d |= np.where(ca, np.uint8(0x08), np.uint8(0))
        d |= np.where(cb, np.uint8(0x10), np.uint8(0))
        d |= np.where(cd, np.uint8(0x20), np.uint8(0))
        dmat[i] = d
        # ---- state updates + records
        En = np.maximum(E - e, Hn - qe)
        NIn = np.maximum(NI, Hn + int(donor[i]) - q2)
        H, E, NI = Hn, En, NIn
        r = i + jj
        st0 = np.maximum(0, r - qlen + 1)
        en0 = np.minimum(tlen - 1, r)
        for x in range(qlen):
            rr = int(r[x])
            kf = merge_key(i, int(st0[x]), int(en0[x]), tv)
            packed = Hn[x] * KB + (KB - 1 - kf)
            if packed > D[rr]:
                D[rr] = packed
        Dq[i + qlen - 1] = Hn[qlen - 1]
        if i == tlen - 1:
            hl[:] = Hn
    # exts d-byte order note: the reference evaluates a2a BETWEEN b?  No:
    # candidate order is a, b, a2a (diagdiff.exts2) — matched above.
    ez = replay_records(D, Dq, hl, qlen, tlen, 0, zdrop)
    cigar: List[int] = []
    if not ez["zdropped"] and not (flag & Flag.EXTZ_ONLY):
        i0, j0 = tlen - 1, qlen - 1
    elif ez["max_t"] >= 0 and ez["max_q"] >= 0:
        i0, j0 = ez["max_t"], ez["max_q"]
    else:
        return ez, cigar
    off = np.zeros(tlen, np.int32)
    cigar = backtrack(dmat, off, None, qlen, i0, j0, is_rot=False,
                      is_rev=bool(flag & Flag.REV_CIGAR),
                      min_intron_len=lt)
    return ez, cigar


__all__ = ["strips_forward_cigar", "strips_extz_cigar",
           "strips_forward_cigar_extd", "strips_extd_cigar",
           "strips_exts_cigar"]
