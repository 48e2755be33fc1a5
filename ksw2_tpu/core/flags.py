"""Alignment flags, CIGAR operator codes and shared constants.

Behavioral contract mirrors the reference library lh3/ksw2
(``/root/reference/ksw2.h:6-27``): the flag bit values, CIGAR op codes and the
NEG_INF sentinel are part of the observable API (scores of banded-out
alignments are reported as NEG_INF; flags select kernel variants).
"""
from __future__ import annotations

import enum

# Sentinel for "unreachable" scores (reference: ksw2.h:6).
NEG_INF = -0x40000000


class Flag(enum.IntFlag):
    """Run-time behavior flags (reference: ksw2.h:8-18)."""

    NONE = 0
    SCORE_ONLY = 0x01    # don't record the alignment path / CIGAR
    RIGHT = 0x02         # right-align gaps
    GENERIC_SC = 0x04    # use the full scoring matrix (else match/mismatch + wildcard)
    APPROX_MAX = 0x08    # approximate max-score tracking (O(1)/diagonal)
    APPROX_DROP = 0x10   # approximate Z-drop (uses the approx max)
    EXTZ_ONLY = 0x40     # only perform extension (changes traceback start cell)
    REV_CIGAR = 0x80     # emit the CIGAR reversed
    SPLICE_FOR = 0x100   # splice mode, forward strand (GT..AG)
    SPLICE_REV = 0x200   # splice mode, reverse strand (CT..AC)
    SPLICE_FLANK = 0x400 # reward high-confidence flanking context (GTr/yAG)
    EQX = 0x800          # rewrite CIGAR M into =/X


class CigarOp(enum.IntEnum):
    """BAM CIGAR operator codes used by the engine (reference: ksw2.h:22-27)."""

    MATCH = 0   # M
    INS = 1     # I (consumes query)
    DEL = 2     # D (consumes target)
    N_SKIP = 3  # N (intron skip on the target)
    EQ = 7      # =
    X = 8       # X


# Character for each op when pretty-printing (BAM convention).
CIGAR_CHARS = "MIDNSHP=X"

__all__ = ["NEG_INF", "Flag", "CigarOp", "CIGAR_CHARS"]
