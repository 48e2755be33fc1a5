"""Real-TPU validation sweep (run manually / by verify; not part of pytest).

Usage: python tests/tpu_validate.py [n_cases]
Writes a summary line per engine; exits nonzero on any mismatch.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import refcmp  # noqa: E402
from ksw2_tpu.core.flags import Flag  # noqa: E402
from ksw2_tpu.core.matrix import encode_dna, simple_mat  # noqa: E402
from ksw2_tpu.spec import diagdiff  # noqa: E402


def readfa(p):
    cur = []
    for line in open(p):
        line = line.strip()
        if not line.startswith(">"):
            cur.append(line)
    return "".join(cur)


def sweep_extz(n, rng):
    from ksw2_tpu.ops.extz import extz2_device
    fails = 0
    for i in range(n):
        tlen = int(rng.choice([40, 80, 120]))
        t, q = refcmp.random_pair(rng, tlen, divergence=float(rng.uniform(0, 0.4)),
                                  indel=float(rng.uniform(0, 0.15)),
                                  with_n=bool(rng.integers(0, 2)))
        w = int(rng.choice([-1, 5, 16]))
        z = int(rng.choice([-1, 20]))
        flag = Flag.NONE
        if rng.integers(0, 2):
            flag |= Flag.RIGHT
        if rng.integers(0, 2):
            flag |= Flag.SCORE_ONLY
        if rng.integers(0, 2):
            flag |= Flag.APPROX_MAX | Flag.APPROX_DROP
        mat = simple_mat(5, 2, 4)
        qs, ts = encode_dna(q), encode_dna(t)
        ez_s, _ = diagdiff.extz2(qs, ts, 5, mat, 4, 2, w=w, zdrop=z, flag=flag)
        ez_d, _ = extz2_device(qs, ts, 5, mat, 4, 2, w=w, zdrop=z, flag=flag)
        if ez_s.tsv_fields() != ez_d.tsv_fields():
            fails += 1
            print("extz MISMATCH", w, z, int(flag), t[:60], q[:60])
            print("  spec:", ez_s.tsv_fields())
            print("  tpu :", ez_d.tsv_fields())
    return fails


def sweep_extd(n, rng):
    from ksw2_tpu.ops.extd import extd2_device
    fails = 0
    for i in range(n):
        tlen = int(rng.choice([40, 80, 120]))
        t, q = refcmp.random_pair(rng, tlen, divergence=float(rng.uniform(0, 0.4)),
                                  indel=float(rng.uniform(0, 0.15)),
                                  with_n=bool(rng.integers(0, 2)))
        w = int(rng.choice([-1, 5, 16]))
        z = int(rng.choice([-1, 20]))
        flag = Flag.NONE
        if rng.integers(0, 2):
            flag |= Flag.RIGHT
        if rng.integers(0, 2):
            flag |= Flag.SCORE_ONLY
        if rng.integers(0, 2):
            flag |= Flag.APPROX_MAX | Flag.APPROX_DROP
        if rng.integers(0, 3) == 0 and not (flag & Flag.SCORE_ONLY):
            flag |= Flag.EQX
        O, E = int(rng.choice([4, 16])), int(rng.choice([1, 2]))
        O2, E2 = int(rng.choice([13, 24])), int(rng.choice([1, 2]))
        mat = simple_mat(5, 2, 4)
        qs, ts = encode_dna(q), encode_dna(t)
        ez_s, _ = diagdiff.extd2(qs, ts, 5, mat, O, E, O2, E2, w=w, zdrop=z, flag=flag)
        ez_d, _ = extd2_device(qs, ts, 5, mat, O, E, O2, E2, w=w, zdrop=z, flag=flag)
        if ez_s.tsv_fields() != ez_d.tsv_fields():
            fails += 1
            print("extd MISMATCH", dict(O=O, E=E, O2=O2, E2=E2, w=w, z=z, flag=int(flag)))
            print("  spec:", ez_s.tsv_fields())
            print("  tpu :", ez_d.tsv_fields())
    return fails


def sweep_extf(n, rng):
    from ksw2_tpu.ops.extf import extf2_device
    fails = 0
    for i in range(n):
        tlen = int(rng.choice([40, 80, 120]))
        t, q = refcmp.random_pair(rng, tlen, divergence=float(rng.uniform(0, 0.4)),
                                  indel=float(rng.uniform(0, 0.15)))
        w = int(rng.choice([-1, 5, 16]))
        xd = int(rng.choice([-1, 20, 100]))
        qs, ts = encode_dna(q), encode_dna(t)
        ez_s = diagdiff.extf2(qs, ts, 2, -4, 2, w=w, xdrop=xd)
        ez_d = extf2_device(qs, ts, 2, -4, 2, w=w, xdrop=xd)
        if ez_s.tsv_fields() != ez_d.tsv_fields():
            fails += 1
            print("extf MISMATCH", dict(w=w, xd=xd))
            print("  spec:", ez_s.tsv_fields())
            print("  tpu :", ez_d.tsv_fields())
    return fails


def sweep_exts(n, rng):
    from ksw2_tpu.ops.exts import exts2_device
    fails = 0
    for i in range(n):
        tlen = int(rng.choice([40, 80, 120]))
        t, q = refcmp.random_pair(rng, tlen, divergence=float(rng.uniform(0, 0.3)),
                                  indel=float(rng.uniform(0, 0.15)),
                                  with_n=bool(rng.integers(0, 2)))
        z = int(rng.choice([-1, 20, 100]))
        flag = Flag.SPLICE_FOR
        if rng.integers(0, 2):
            flag |= Flag.SCORE_ONLY
        if rng.integers(0, 2):
            flag |= Flag.RIGHT
        if rng.integers(0, 2):
            flag |= Flag.APPROX_MAX | Flag.APPROX_DROP
        if rng.integers(0, 2):
            flag |= Flag.SPLICE_FLANK
        if rng.integers(0, 3) == 0:
            flag |= Flag.SPLICE_REV
        mat = simple_mat(5, 1, -2)
        qs, ts = encode_dna(q), encode_dna(t)
        ez_s, _ = diagdiff.exts2(qs, ts, 5, mat, 2, 1, 32, 4, zdrop=z,
                                 junc_bonus=0, flag=flag)
        ez_d, _ = exts2_device(qs, ts, 5, mat, 2, 1, 32, 4, zdrop=z,
                               junc_bonus=0, flag=flag)
        if ez_s.tsv_fields() != ez_d.tsv_fields():
            fails += 1
            print("exts MISMATCH", dict(z=z, flag=int(flag)))
            print("  spec:", ez_s.tsv_fields())
            print("  tpu :", ez_d.tsv_fields())
    return fails


def sweep_gg2(n, rng):
    from ksw2_tpu.ops.gg2 import gg2_device
    fails = 0
    for i in range(n):
        tlen = int(rng.choice([40, 80, 120]))
        t, q = refcmp.random_pair(rng, tlen, divergence=float(rng.uniform(0, 0.35)),
                                  indel=float(rng.uniform(0, 0.15)),
                                  with_n=bool(rng.integers(0, 2)))
        w = int(rng.choice([-1, 5, 16]))
        qs, ts = encode_dna(q), encode_dna(t)
        mat = simple_mat(5, 2, 4)
        ws, wc, _ = diagdiff.gg2_sse(qs, ts, 5, mat, 4, 2, w=w)
        gs, gc, _ = gg2_device(qs, ts, 5, mat, 4, 2, w=w)
        if (ws, wc) != (gs, gc):
            fails += 1
            print("gg2 MISMATCH", dict(w=w))
            print("  spec:", ws, wc[:10])
            print("  tpu :", gs, gc[:10])
    return fails


def sweep_band(n, rng):
    """Band-relative batched engines on moderate banded pairs (one launch
    per variant keeps compile cost bounded: fixed bucket shape)."""
    from ksw2_tpu.ops.band_batch import (extd_band_batch_device,
                                         extz_band_batch_device)
    mat = simple_mat(5, 2, 4)
    B = max(4, min(n, 8))
    pairs = []
    for _ in range(B):
        tlen = 600
        t, q = refcmp.random_pair(rng, tlen,
                                  divergence=float(rng.uniform(0, 0.3)),
                                  indel=float(rng.uniform(0, 0.1)))
        pairs.append((encode_dna(q)[:620], encode_dna(t)[:620]))
    Lq = Lt = 620
    Q = np.zeros((B, Lq), np.int32)
    T = np.zeros((B, Lt), np.int32)
    qlen = np.array([len(q) for q, t in pairs], np.int32)
    tlen = np.array([len(t) for q, t in pairs], np.int32)
    for i, (q, t) in enumerate(pairs):
        Q[i, : len(q)] = q
        T[i, : len(t)] = t
    wv = rng.integers(16, 120, B).astype(np.int32)
    fails = 0
    # full CIGARs through the batched on-device traceback
    from ksw2_tpu.ops.band_batch import extz_band_batch_align
    ezs = extz_band_batch_align(Q, T, qlen, tlen, 5, mat, 4, 2, wv,
                                zdrop=80, flag=Flag.NONE)
    for i, (q, t) in enumerate(pairs):
        want, _ = diagdiff.extz2(q, t, 5, mat, 4, 2, w=int(wv[i]),
                                 zdrop=80, flag=Flag.NONE)
        if ezs[i].tsv_fields() != want.tsv_fields():
            print(f"band cigar FAIL i={i} w={wv[i]}")
            fails += 1
    for flag, z in ((Flag.SCORE_ONLY, 80),
                    (Flag.SCORE_ONLY | Flag.APPROX_MAX | Flag.APPROX_DROP,
                     80)):
        out = extz_band_batch_device(Q, T, qlen, tlen, 5, mat, 4, 2, wv,
                                     zdrop=z, flag=flag)
        outd = extd_band_batch_device(Q, T, qlen, tlen, 5, mat, 4, 2, 13, 1,
                                      wv, zdrop=z, flag=flag)
        for i, (q, t) in enumerate(pairs):
            want, _ = diagdiff.extz2(q, t, 5, mat, 4, 2, w=int(wv[i]),
                                     zdrop=z, flag=flag)
            wantd, _ = diagdiff.extd2(q, t, 5, mat, 4, 2, 13, 1,
                                      w=int(wv[i]), zdrop=z, flag=flag)
            for o, wz, name in ((out, want, "extz"), (outd, wantd, "extd")):
                got = [int(o[k][i]) for k in ("score", "max", "max_t",
                                              "max_q")]
                exp = [wz.score, wz.max, wz.max_t, wz.max_q]
                if got != exp or bool(o["zdropped"][i]) != wz.zdropped:
                    print(f"band {name} FAIL i={i} w={wv[i]} flag={flag}: "
                          f"{got} != {exp}")
                    fails += 1
    return fails


def sweep_batch(n, rng):
    """t-coordinate batch engines, full CIGARs via the on-device walker
    (one launch per family: fixed bucket shape keeps compile cost bounded)."""
    from ksw2_tpu.ops.batch_pallas import extd_batch_align, extz_batch_align
    mat = simple_mat(5, 2, 4)
    B = max(4, min(n, 8))
    pairs = []
    for _ in range(B):
        tlen = int(rng.choice([60, 150, 300]))
        t, q = refcmp.random_pair(rng, tlen,
                                  divergence=float(rng.uniform(0, 0.3)),
                                  indel=float(rng.uniform(0, 0.1)),
                                  with_n=bool(rng.integers(0, 2)))
        pairs.append((encode_dna(q), encode_dna(t)))
    Lq = max(len(q) for q, t in pairs)
    Lt = max(len(t) for q, t in pairs)
    Q = np.zeros((B, Lq), np.int32)
    T = np.zeros((B, Lt), np.int32)
    qlen = np.array([len(q) for q, t in pairs], np.int32)
    tlen = np.array([len(t) for q, t in pairs], np.int32)
    for i, (q, t) in enumerate(pairs):
        Q[i, : len(q)] = q
        T[i, : len(t)] = t
    fails = 0
    ezs = extz_batch_align(Q, T, qlen, tlen, 5, mat, 4, 2, zdrop=80)
    ezd = extd_batch_align(Q, T, qlen, tlen, 5, mat, 4, 2, 13, 1, zdrop=80)
    for i, (q, t) in enumerate(pairs):
        want, _ = diagdiff.extz2(q, t, 5, mat, 4, 2, zdrop=80)
        wantd, _ = diagdiff.extd2(q, t, 5, mat, 4, 2, 13, 1, zdrop=80)
        if ezs[i].tsv_fields() != want.tsv_fields():
            print(f"batch extz cigar FAIL i={i}")
            print("  spec:", want.tsv_fields())
            print("  tpu :", ezs[i].tsv_fields())
            fails += 1
        if ezd[i].tsv_fields() != wantd.tsv_fields():
            print(f"batch extd cigar FAIL i={i}")
            print("  spec:", wantd.tsv_fields())
            print("  tpu :", ezd[i].tsv_fields())
            fails += 1
    return fails


def sweep_strips(rng):
    """Round-4 strips engines on the real chip: one-piece + two-piece
    fused scheduler dispatch (strips_prep -> strips_fused_call) on a
    mixed bucket, byte-compared per pair against the spec."""
    from ksw2_tpu.ops.wavefront_strips import (strips_prep,
                                               strips_fused_call)
    from ksw2_tpu.ops.batch_pallas import unpack_records

    mat = simple_mat(5, 2, 4)
    pairs = []
    for _ in range(9):
        tlen = int(rng.choice([150, 400, 900, 2800]))
        t, q = refcmp.random_pair(rng, tlen,
                                  divergence=float(rng.uniform(0, 0.3)),
                                  indel=float(rng.uniform(0, 0.1)),
                                  with_n=bool(rng.integers(0, 2)))
        pairs.append((encode_dna(q), encode_dna(t)))
    qs = [q for q, t in pairs]
    ts = [t for q, t in pairs]
    qlen = np.array([len(q) for q in qs], np.int32)
    tlen = np.array([len(t) for t in ts], np.int32)
    fails = 0
    # one-piece + two-piece launches fused into ONE execution
    launches = strips_prep(qs, ts, qlen, tlen, 5, mat, 4, 2, 100,
                           Flag.SCORE_ONLY)
    launches += strips_prep(qs, ts, qlen, tlen, 5, mat, 4, 2, 100,
                            Flag.SCORE_ONLY, two=True, q2=13, e2=1)
    rec = np.asarray(strips_fused_call(launches))
    B = len(pairs)
    out1 = unpack_records(rec[:B], -4, 4, 2)
    out2 = unpack_records(rec[B:2 * B], -4, 4, 2)
    for i, (q, t) in enumerate(pairs):
        want, _ = diagdiff.extz2(q, t, 5, mat, 4, 2, zdrop=100,
                                 flag=Flag.SCORE_ONLY)
        wantd, _ = diagdiff.extd2(q, t, 5, mat, 4, 2, 13, 1, zdrop=100,
                                  flag=Flag.SCORE_ONLY)
        got1 = tuple(int(out1[k][i]) for k in
                     ("max", "max_t", "max_q", "mqe", "mqe_t", "mte",
                      "mte_q", "score", "zdropped"))
        w1 = (want.max, want.max_t, want.max_q, want.mqe, want.mqe_t,
              want.mte, want.mte_q, want.score, int(want.zdropped))
        got2 = tuple(int(out2[k][i]) for k in
                     ("max", "max_t", "max_q", "mqe", "mqe_t", "mte",
                      "mte_q", "score", "zdropped"))
        w2 = (wantd.max, wantd.max_t, wantd.max_q, wantd.mqe,
              wantd.mqe_t, wantd.mte, wantd.mte_q, wantd.score,
              int(wantd.zdropped))
        if got1 != w1:
            print(f"strips extz FAIL i={i}: {got1} != {w1}")
            fails += 1
        if got2 != w2:
            print(f"strips extd FAIL i={i}: {got2} != {w2}")
            fails += 1
    return fails


def sweep_newpaths(rng):
    """High-P packing (P=10 batch, P=9 band), all-pairs early exit, and the
    trimmed device walker on zdropped CIGARs -- one launch each."""
    from ksw2_tpu.ops.band_batch import extz_band_batch_device
    from ksw2_tpu.ops.batch_pallas import extz_batch_align, extz_batch_device
    mat = simple_mat(5, 2, 4)
    fails = 0

    # P=10 t-coordinate batch, scores + CIGARs
    B = 8
    pairs = []
    for _ in range(B):
        t, q = refcmp.random_pair(rng, 1250, divergence=0.2, indel=0.08)
        pairs.append((encode_dna(q)[:1280], encode_dna(t)[:1280]))
    Lq = max(len(q) for q, t in pairs)
    Lt = max(len(t) for q, t in pairs)
    Q = np.zeros((B, Lq), np.int32)
    T = np.zeros((B, Lt), np.int32)
    qlen = np.array([len(q) for q, t in pairs], np.int32)
    tlen = np.array([len(t) for q, t in pairs], np.int32)
    for i, (q, t) in enumerate(pairs):
        Q[i, : len(q)] = q
        T[i, : len(t)] = t
    assert (Lt + 127) // 128 > 8
    ezs = extz_batch_align(Q, T, qlen, tlen, 5, mat, 4, 2, zdrop=150)
    for i, (q, t) in enumerate(pairs):
        want, _ = diagdiff.extz2(q, t, 5, mat, 4, 2, zdrop=150)
        if ezs[i].tsv_fields() != want.tsv_fields() or \
                ezs[i].cigar != want.cigar:
            print(f"high-P batch cigar FAIL i={i}")
            fails += 1

    # P=9 band engine (w > 960)
    wv = np.full(B, 1000, np.int32)
    out = extz_band_batch_device(Q, T, qlen, tlen, 5, mat, 4, 2, wv,
                                 zdrop=150, flag=Flag.SCORE_ONLY)
    for i, (q, t) in enumerate(pairs):
        want, _ = diagdiff.extz2(q, t, 5, mat, 4, 2, w=1000, zdrop=150,
                                 flag=Flag.SCORE_ONLY)
        got = [int(out[k][i]) for k in ("score", "max", "max_t", "max_q")]
        if got != [want.score, want.max, want.max_t, want.max_q]:
            print(f"high-P band FAIL i={i}: {got}")
            fails += 1

    # all-pairs z-drop early: chunk early-exit fires mid-grid; the device
    # walker trims every diagonal block above the highest walk start
    B2 = 8
    dpairs = []
    for s in range(B2):
        r2 = np.random.default_rng(1000 + s)
        t1, q1 = refcmp.random_pair(r2, 1200, divergence=0.1, indel=0.03)
        t2, _ = refcmp.random_pair(r2, 1200, divergence=0.1, indel=0.03)
        dpairs.append((encode_dna(q1[:550] + t2[:600]), encode_dna(t1)))
    Lq = max(len(q) for q, t in dpairs)
    Lt2 = max(len(t) for q, t in dpairs)
    Q2 = np.zeros((B2, Lq), np.int32)
    T2 = np.zeros((B2, Lt2), np.int32)
    qlen2 = np.array([len(q) for q, t in dpairs], np.int32)
    tlen2 = np.array([len(t) for q, t in dpairs], np.int32)
    for i, (q, t) in enumerate(dpairs):
        Q2[i, : len(q)] = q
        T2[i, : len(t)] = t
    out = extz_batch_device(Q2, T2, qlen2, tlen2, 5, mat, 4, 2, zdrop=100,
                            flag=Flag.SCORE_ONLY)
    ezc = extz_batch_align(Q2, T2, qlen2, tlen2, 5, mat, 4, 2, zdrop=100)
    ndrop = 0
    for i, (q, t) in enumerate(dpairs):
        want, _ = diagdiff.extz2(q, t, 5, mat, 4, 2, zdrop=100,
                                 flag=Flag.SCORE_ONLY)
        wantc, _ = diagdiff.extz2(q, t, 5, mat, 4, 2, zdrop=100)
        ndrop += int(want.zdropped)
        got = [int(out[k][i]) for k in ("score", "max", "max_t", "max_q")]
        if got != [want.score, want.max, want.max_t, want.max_q] or \
                bool(out["zdropped"][i]) != want.zdropped:
            print(f"early-exit scores FAIL i={i}: {got}")
            fails += 1
        if ezc[i].tsv_fields() != wantc.tsv_fields() or \
                ezc[i].cigar != wantc.cigar:
            print(f"early-exit cigar FAIL i={i}")
            fails += 1
    assert ndrop == B2, "early-exit sweep expects every pair to z-drop"
    return fails


def sweep_round2(rng):
    """Round-2 paths: multi-phase approx walk carry, device GENERIC_SC,
    and the traceback escape fallback wiring -- on the real chip."""
    from ksw2_tpu.ops.extz import extz2_device
    from ksw2_tpu.ops.extd import extd2_device
    mat = simple_mat(5, 2, 4)
    fails = 0

    # approx (-sg) through >= 2 phases, with and without Z-drop
    q = rng.integers(0, 4, size=900).astype(np.int32)
    t = np.where(rng.random(900) < 0.1,
                 rng.integers(0, 4, size=900), q).astype(np.int32)
    FL = Flag.SCORE_ONLY | Flag.APPROX_MAX | Flag.APPROX_DROP
    for z in (-1, 150):
        ez, _ = extz2_device(q, t, 5, mat, 4, 2, zdrop=z, flag=FL)
        want, _ = diagdiff.extz2(q, t, 5, mat, 4, 2, zdrop=z, flag=FL)
        for fld in ("max", "max_t", "max_q", "score", "zdropped"):
            if getattr(ez, fld) != getattr(want, fld):
                print(f"approx multi-phase FAIL z={z} {fld}")
                fails += 1

    # GENERIC_SC on the single-pair device route (scores + CIGAR)
    gmat = rng.integers(-5, 4, size=(5, 5)).astype(np.int8)
    np.fill_diagonal(gmat, rng.integers(1, 4, size=5))
    gmat = gmat.reshape(-1)
    qg = rng.integers(0, 5, size=180).astype(np.int32)
    tg = rng.integers(0, 5, size=200).astype(np.int32)
    for fl in (Flag.SCORE_ONLY | Flag.GENERIC_SC, Flag.GENERIC_SC):
        ez, _ = extz2_device(qg, tg, 5, gmat, 4, 2, w=100, flag=fl)
        want, _ = diagdiff.extz2(qg, tg, 5, gmat, 4, 2, w=100, flag=fl)
        if ez.tsv_fields() != want.tsv_fields() or ez.cigar != want.cigar:
            print(f"generic extz FAIL flag={int(fl)}")
            fails += 1
        ez, _ = extd2_device(qg, tg, 5, gmat, 4, 2, 13, 1, flag=fl)
        want, _ = diagdiff.extd2(qg, tg, 5, gmat, 4, 2, 13, 1, flag=fl)
        if ez.tsv_fields() != want.tsv_fields() or ez.cigar != want.cigar:
            print(f"generic extd FAIL flag={int(fl)}")
            fails += 1
    return fails


def mt_anchors():
    from ksw2_tpu.ops.extz import extz2_device
    from ksw2_tpu.ops.extd import extd2_device
    t = readfa("/root/reference/test/MT-human.fa")
    q = readfa("/root/reference/test/MT-orang.fa")
    ts, qs = encode_dna(t), encode_dna(q)
    mat = simple_mat(5, 2, 4)
    fails = 0
    ez, _ = extz2_device(qs, ts, 5, mat, 4, 2, flag=Flag.SCORE_ONLY)
    if ez.tsv_fields() != ["16102", "17054", "16568", "16024"]:
        print("MT extz anchor FAIL:", ez.tsv_fields())
        fails += 1
    t0 = time.time()
    ez, _ = extd2_device(qs, ts, 5, mat, 4, 2, 13, 1, flag=Flag.SCORE_ONLY)
    t0 = time.time()
    ez, _ = extd2_device(qs, ts, 5, mat, 4, 2, 13, 1, flag=Flag.SCORE_ONLY)
    dt = time.time() - t0
    if ez.tsv_fields() != ["17127", "17614", "16568", "16024"]:
        print("MT extd anchor FAIL:", ez.tsv_fields())
        fails += 1
    print(f"MT extd2 score-only: {0.273/dt:.1f} Gcells/s")
    return fails


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    rng = np.random.default_rng(int(sys.argv[2]) if len(sys.argv) > 2 else 0)
    f = 0
    f += sweep_extz(n, rng)
    print(f"extz sweep done ({n} cases, {f} fails)")
    fd = sweep_extd(n, rng)
    f += fd
    print(f"extd sweep done ({n} cases, {fd} fails)")
    ff = sweep_extf(n, rng)
    f += ff
    print(f"extf sweep done ({n} cases, {ff} fails)")
    fs = sweep_exts(n, rng)
    f += fs
    print(f"exts sweep done ({n} cases, {fs} fails)")
    fg = sweep_gg2(n, rng)
    f += fg
    print(f"gg2 sweep done ({n} cases, {fg} fails)")
    fb = sweep_band(n, rng)
    f += fb
    print(f"band sweep done ({fb} fails)")
    fbt = sweep_batch(n, rng)
    f += fbt
    print(f"batch sweep done ({fbt} fails)")
    fn = sweep_newpaths(rng)
    f += fn
    print(f"new-paths sweep done ({fn} fails)")
    fr2 = sweep_round2(rng)
    f += fr2
    print(f"round-2 sweep done ({fr2} fails)")
    fst = sweep_strips(rng)
    f += fst
    print(f"strips sweep done ({fst} fails)")
    f += mt_anchors()
    print("TPU VALIDATION", "FAILED" if f else "PASSED")
    sys.exit(1 if f else 0)
