"""Generate the golden parity corpus from the compiled reference binary.

Run while a reference build is available ($KSW2_REF_BIN); the output
``tests/golden/cases.jsonl`` is checked in so the test suite never needs the
binary.  Each line: {algo, params, target, query, expect: [fields...]}.

Cases where the reference's behavior is undefined (documented in
tests/refcmp.py and the spec modules) are excluded or field-trimmed.
"""
from __future__ import annotations

import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
import refcmp  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "golden", "cases.jsonl")
ALL = ["extz2_sse", "extd2_sse", "extf2_sse", "gg2", "gg2_sse", "exts2_sse",
       "gg", "extz", "extd"]


def read_fa(path: str) -> str:
    op = gzip.open if path.endswith(".gz") else open
    cur = []
    with op(path, "rt") as f:
        for line in f:
            line = line.strip()
            if line.startswith(">"):
                if cur:
                    break
            else:
                cur.append(line)
    return "".join(cur)


def main() -> None:
    rng = np.random.default_rng(20260816)
    cases = []

    # 1) the repo's own short test pairs, every algo, assorted params
    tdir = "/root/reference/test"
    t1 = open(os.path.join(tdir, "t1.fa")).read()
    q1 = open(os.path.join(tdir, "q1.fa")).read()

    def parse_multi(txt):
        seqs, name = [], None
        for line in txt.splitlines():
            if line.startswith(">"):
                name = line[1:].split()[0]
                seqs.append([name, ""])
            elif seqs:
                seqs[-1][1] += line.strip()
        return seqs

    pairs = list(zip(parse_multi(t1), parse_multi(q1)))
    for (tn, ts), (qn, qs) in pairs:
        for algo in ALL:
            for kw in (
                dict(),
                dict(right=True),
                dict(score_only=True),
                dict(approx=True),
                dict(a=1, b=9, q=16, e=1, w=10),   # the t5-header regression params
                dict(w=10, z=100),
            ):
                cases.append((algo, ts, qs, kw))

    # 2) random fuzz corpus across lengths/params
    for _ in range(450):
        tlen = int(rng.integers(1, 200))
        t, q = refcmp.random_pair(
            rng, tlen,
            divergence=float(rng.uniform(0, 0.5)),
            indel=float(rng.uniform(0, 0.2)),
            with_n=bool(rng.integers(0, 2)),
        )
        algo = str(rng.choice(ALL))
        kw = dict(
            a=int(rng.choice([1, 2])), b=int(rng.choice([2, 4, 9])),
            q=int(rng.choice([2, 4, 16])), e=int(rng.choice([1, 2])),
            q2=int(rng.choice([13, 24, 32])), e2=int(rng.choice([1, 2])),
            w=int(rng.choice([-1, -1, 0, 3, 5, 10, 16, 33])),
            z=int(rng.choice([-1, -1, 5, 20, 100])),
            right=bool(rng.integers(0, 2)) and algo in
                ("extz2_sse", "extd2_sse", "exts2_sse", "extz", "extd"),
            score_only=bool(rng.integers(0, 2)) and algo in
                ("extz2_sse", "extd2_sse", "gg", "extz", "extd"),
            approx=bool(rng.integers(0, 2)) and algo in
                ("extz2_sse", "extd2_sse"),
        )
        cases.append((algo, t, q, kw))

    # 3) a few longer pairs (1-3 kb) for band/zdrop behavior at scale
    for _ in range(20):
        tlen = int(rng.integers(800, 3000))
        t, q = refcmp.random_pair(rng, tlen, divergence=0.12, indel=0.06)
        algo = str(rng.choice(ALL))
        kw = dict(w=int(rng.choice([-1, 101, 331])), z=int(rng.choice([-1, 200])))
        cases.append((algo, t, q, kw))

    n_written = n_skipped = 0
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as out:
        for algo, t, q, kw in cases:
            full = dict(a=2, b=4, q=4, e=2, q2=13, e2=1, w=-1, z=-1,
                        right=False, score_only=False, approx=False)
            full.update(kw)
            # reference-UB exclusions (see tests/refcmp.py)
            if algo in ("extz", "extd") and full["w"] >= 0 and len(t) > len(q) + full["w"] + 1:
                n_skipped += 1
                continue
            if algo == "gg2" and full["w"] >= 0 and len(q) > len(t) + full["w"]:
                n_skipped += 1
                continue
            expect = refcmp.run_ref(algo, t, q, **full)
            fields_only = False
            if (algo in ("extz", "extd", "gg") and not full["score_only"]
                    and len(expect) > 4 and expect[0].lstrip("-").isdigit()
                    and int(expect[0]) < -0x20000000):
                # banded-out corner: reference CIGAR reads its own OOB memory
                expect = expect[:4]
                fields_only = True
            out.write(json.dumps({
                "algo": algo, "target": t, "query": q, "params": full,
                "expect": expect, "fields_only": fields_only,
            }) + "\n")
            n_written += 1
    print(f"wrote {n_written} cases to {OUT} ({n_skipped} UB cases skipped)")


if __name__ == "__main__":
    main()
