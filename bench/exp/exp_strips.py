"""Debug: strips kernel (interpret) vs diagdiff spec. Scratch, not committed."""
import numpy as np
import sys
import os as _os, sys as _sys
_repo = _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_sys.path.insert(0, _repo)
_sys.path.insert(0, _os.path.join(_repo, "tests"))

import refcmp
from ksw2_tpu.core.flags import Flag
from ksw2_tpu.core.matrix import encode_dna, simple_mat
from ksw2_tpu.ops.wavefront_strips import strips_records, strips_eligible
from ksw2_tpu.ops.batch_pallas import unpack_records
from ksw2_tpu.spec import diagdiff

MAT = simple_mat(5, 2, -4)


def run_case(pairs, zdrop, seedname=""):
    B = len(pairs)
    Lq = max(len(q) for q, t in pairs)
    Lt = max(len(t) for q, t in pairs)
    Q = np.zeros((B, Lq), np.int8)
    T = np.zeros((B, Lt), np.int8)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    for i, (q, t) in enumerate(pairs):
        Q[i, :len(q)] = q
        T[i, :len(t)] = t
        qlen[i], tlen[i] = len(q), len(t)
    w = np.maximum(qlen, tlen)
    assert strips_eligible(qlen, tlen, w, Flag.SCORE_ONLY, 5, MAT, zdrop)
    recs = np.concatenate([np.asarray(p) for p in strips_records(
        Q, T, qlen, tlen, 5, MAT, 4, 2, zdrop=zdrop,
        flag=Flag.SCORE_ONLY, interpret=True)], axis=0)
    out = unpack_records(recs, -4, 4, 2)
    nbad = 0
    for i, (qs, ts) in enumerate(pairs):
        ez, _ = diagdiff.extz2(qs, ts, 5, MAT, 4, 2, w=-1, zdrop=zdrop,
                               flag=Flag.SCORE_ONLY)
        want = dict(max=ez.max, max_t=ez.max_t, max_q=ez.max_q, mqe=ez.mqe,
                    mqe_t=ez.mqe_t, mte=ez.mte, mte_q=ez.mte_q,
                    score=ez.score, zdropped=int(ez.zdropped))
        got = {k: int(out[k][i]) for k in want}
        if got != want:
            nbad += 1
            print(f"[{seedname}] MISMATCH pair {i} ql={qlen[i]} tl={tlen[i]} "
                  f"z={zdrop}")
            for k in want:
                if got[k] != want[k]:
                    print(f"   {k}: got {got[k]} want {want[k]}")
            if nbad >= 3:
                break
    return nbad


rng = np.random.default_rng(1)

# tiny smoke: 2 pairs, single strip
pairs = []
for _ in range(2):
    t, q = refcmp.random_pair(rng, 60, divergence=0.15, indel=0.06)
    pairs.append((encode_dna(q), encode_dna(t)))
print("case1 (tiny, S=1):", run_case(pairs, -1, "tiny"))

# multi-strip: qlen ~300
pairs = []
for _ in range(3):
    t, q = refcmp.random_pair(rng, 300, divergence=0.15, indel=0.06)
    pairs.append((encode_dna(q), encode_dna(t)))
print("case2 (S=3):", run_case(pairs, -1, "s3"))
print("case3 (S=3, zdrop):", run_case(pairs, 100, "s3z"))

# mixed lengths incl. edges
pairs = []
for L in (1, 2, 128, 129, 255, 256, 300, 37):
    t, q = refcmp.random_pair(rng, L, divergence=0.2, indel=0.1,
                              with_n=True)
    pairs.append((encode_dna(q), encode_dna(t)))
print("case4 (mixed+N):", run_case(pairs, 50, "mix"))
