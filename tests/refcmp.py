"""Differential-testing harness: run the compiled reference binary and the
spec engines on the same inputs and compare output lines.

The reference binary (built from the upstream C sources, not part of this
repo) is located via $KSW2_REF_BIN.  Tests that need live comparison skip
when it is absent; the checked-in golden corpus under tests/golden/ is
generated with make_golden.py while the binary is available.
"""
from __future__ import annotations

import os
import subprocess
import tempfile
from typing import List, Optional, Sequence

import numpy as np

from ksw2_tpu.core import cigar as cigarmod
from ksw2_tpu.core.flags import Flag
from ksw2_tpu.core.matrix import encode_dna, simple_mat

REF_BIN = os.environ.get("KSW2_REF_BIN", "/tmp/refbuild/ksw2-test")


def have_ref() -> bool:
    return os.path.exists(REF_BIN)


def run_ref(
    algo: str,
    target: str,
    query: str,
    a: int = 2,
    b: int = 4,
    q: int = 4,
    e: int = 2,
    q2: int = 13,
    e2: int = 1,
    w: int = -1,
    z: int = -1,
    right: bool = False,
    score_only: bool = False,
    approx: bool = False,
) -> List[str]:
    """Run the reference CLI on one pair; returns the output fields."""
    with tempfile.TemporaryDirectory() as td:
        tf = os.path.join(td, "t.fa")
        qf = os.path.join(td, "q.fa")
        with open(tf, "w") as f:
            f.write(f">t\n{target}\n")
        with open(qf, "w") as f:
            f.write(f">q\n{query}\n")
        cmd = [REF_BIN, "-t", algo, "-A", str(a), "-B", str(b),
               "-O", f"{q},{q2}", "-E", f"{e},{e2}", "-w", str(w), "-z", str(z)]
        if right:
            cmd.append("-r")
        if score_only:
            cmd.append("-s")
        if approx:
            cmd.append("-g")
        cmd += [tf, qf]
        out = subprocess.run(cmd, capture_output=True, check=True).stdout
    # exts2 CIGARs contain op 3 (N); the reference CLI indexes past "MID" and
    # prints the string's NUL terminator -- normalize that byte to 'N'.
    line = out.decode("latin-1").replace("\x00", "N").strip()
    return line.split("\t")[2:]  # drop the name columns


def run_spec(
    algo: str,
    target: str,
    query: str,
    a: int = 2,
    b: int = 4,
    q: int = 4,
    e: int = 2,
    q2: int = 13,
    e2: int = 1,
    w: int = -1,
    z: int = -1,
    right: bool = False,
    score_only: bool = False,
    approx: bool = False,
    backend: str = "spec",
) -> List[str]:
    """Run one of our engines with CLI-equivalent dispatch (cli.c:50-132)."""
    from ksw2_tpu.spec import diagdiff
    if algo in ("gg", "extz", "extd"):
        from ksw2_tpu.spec import rowdp

    mat = simple_mat(5, a, -b)
    qs = encode_dna(query)
    ts = encode_dna(target)
    flag = Flag.NONE
    if right:
        flag |= Flag.RIGHT
    if score_only:
        flag |= Flag.SCORE_ONLY
    if approx:
        flag |= Flag.APPROX_MAX | Flag.APPROX_DROP

    if algo == "extz2_sse":
        ez, _ = diagdiff.extz2(qs, ts, 5, mat, q, e, w=w, zdrop=z, flag=flag)
    elif algo == "extd2_sse":
        ez, _ = diagdiff.extd2(qs, ts, 5, mat, q, e, q2, e2, w=w, zdrop=z, flag=flag)
    elif algo == "exts2_sse":
        smat = simple_mat(5, 1, -2)
        ez, _ = diagdiff.exts2(
            qs, ts, 5, smat, 2, 1, 32, 4, zdrop=z, junc_bonus=0,
            flag=flag | Flag.SPLICE_FOR,
        )
    elif algo == "extf2_sse":
        ez = diagdiff.extf2(qs, ts, int(mat[0]), int(mat[1]), e, w=w, xdrop=z)
    elif algo == "gg2_sse":
        score, cig, _ = diagdiff.gg2_sse(qs, ts, 5, mat, q, e, w=w)
        return _gg_fields(score, cig)
    elif algo == "gg2":
        score, cig, _ = diagdiff.gg2(qs, ts, 5, mat, q, e, w=w, with_cigar=not score_only)
        return _gg_fields(score, cig if not score_only else [])
    elif algo == "gg":
        score, cig = rowdp.gg(qs, ts, 5, mat, q, e, w=w, with_cigar=not score_only)
        return _gg_fields(score, cig if not score_only else [])
    elif algo == "extz":
        ez = rowdp.extz(qs, ts, 5, mat, q, e, w=w, zdrop=z, flag=flag)
    elif algo == "extd":
        ez = rowdp.extd(qs, ts, 5, mat, q, e, q2, e2, w=w, zdrop=z, flag=flag)
    else:
        raise ValueError(algo)
    return ez.tsv_fields()


def _gg_fields(score: int, cig: Sequence[int]) -> List[str]:
    # The CLI prints gg-family results through the shared print_aln with the
    # ez fields reset by global_aln (max=0, coords -1) -- cli.c:55-57,134-145.
    fields = [str(score), "0", "-1", "-1"]
    if cig:
        fields.append("".join(f"{c >> 4}{'MIDN'[c & 0xF]}" for c in cig))
    return fields


def random_pair(rng: np.random.Generator, tlen: int, divergence: float = 0.1,
                indel: float = 0.05, with_n: bool = False) -> tuple[str, str]:
    """A target and a mutated copy as query (realistic alignment workload)."""
    alpha = "ACGT" + ("N" if with_n else "")
    t = "".join(rng.choice(list("ACGT"), size=tlen))
    qchars: List[str] = []
    i = 0
    while i < tlen:
        r = rng.random()
        if r < indel / 2:  # deletion
            i += int(rng.integers(1, 8))
            continue
        if r < indel:  # insertion
            qchars.extend(rng.choice(list(alpha), size=int(rng.integers(1, 8))))
        if rng.random() < divergence:
            qchars.append(str(rng.choice(list(alpha))))
        else:
            qchars.append(t[i])
        i += 1
    q = "".join(qchars)
    if not q:
        q = "A"
    return t, q


__all__ = ["have_ref", "run_ref", "run_spec", "random_pair", "REF_BIN"]


def have_parasail() -> bool:
    """True when the optional parasail python bindings are installed.

    Mirrors the reference CLI's compile-time HAVE_PARASAIL comparator
    hook (cli.c:85-126, Makefile:10-21): an independent third-party
    oracle for global-alignment scores, used when available and skipped
    otherwise.
    """
    try:
        import parasail  # noqa: F401
        return True
    except Exception:
        return False


def run_parasail_nw(tseq: str, qseq: str, a: int = 2, b: int = 4,
                    gapo: int = 4, gape: int = 2) -> int:
    """Global (NW) score from parasail, reference-CLI cost conventions.

    The reference compares ksw_gg against parasail's nw_striped with the
    same simple matrix and gap costs (cli.c:103-126: open = gapo + gape,
    extend = gape, matrix from a/-b).
    """
    import parasail

    matrix = parasail.matrix_create("ACGT", a, -b)
    r = parasail.nw_striped_32(qseq, tseq, gapo + gape, gape, matrix)
    return int(r.score)


def have_gaba() -> bool:
    """True when a libgaba comparator is available on this machine.

    Mirrors the reference CLI's compile-time HAVE_GABA hook
    (cli.c:85-107, Makefile:16-21): gaba is an adaptive-band X-drop
    library used as a second independent oracle for extension scores.
    Neither a gaba Python binding nor libgaba ship in this image, so we
    probe for a loadable shared library (KSW2_GABA_LIB overrides the
    name) and skip cleanly otherwise — exactly like the reference,
    which only gains the comparator when built with gaba/ checked out.
    """
    import ctypes
    import os as _os

    name = _os.environ.get("KSW2_GABA_LIB", "libgaba.so")
    try:
        lib = ctypes.CDLL(name)
    except OSError:
        return False
    return hasattr(lib, "gaba_init")


def run_gaba_extension(tseq: str, qseq: str, a: int = 2, b: int = 4,
                       gapo: int = 4, gape: int = 2,
                       zdrop: int = 100) -> int:
    """Extension score from libgaba via ctypes (reference conventions).

    The reference seeds gaba with GABA_SCORE_SIMPLE(mat[0], |mat[1]|,
    q, e) and xdrop = min(zdrop, 120) (cli.c:95-99) and compares the
    trace score against ksw_extz.  gaba's C API is struct-heavy; rather
    than replicate GABA_PARAMS bit-for-bit here, this helper shells out
    to the reference binary built WITH gaba when one is available
    (KSW2_GABA_REF_BIN), which is how the reference itself consumes the
    library.
    """
    import subprocess
    import tempfile
    import os as _os

    ref = _os.environ.get("KSW2_GABA_REF_BIN")
    if not ref:
        raise RuntimeError("set KSW2_GABA_REF_BIN to a gaba-enabled "
                           "ksw2-test build")
    with tempfile.TemporaryDirectory() as td:
        tf = _os.path.join(td, "t.fa")
        qf = _os.path.join(td, "q.fa")
        with open(tf, "w") as f:
            f.write(f">t\n{tseq}\n")
        with open(qf, "w") as f:
            f.write(f">q\n{qseq}\n")
        out = subprocess.run(
            [ref, "-t", "gaba", "-A", str(a), "-B", str(b),
             "-O", str(gapo), "-E", str(gape), "-z", str(zdrop), tf, qf],
            capture_output=True, check=True).stdout
    return int(out.decode().strip().split("\t")[2])
