"""Alignment result record.

Field-for-field mirror of the reference's ``ksw_extz_t``
(``/root/reference/ksw2.h:33-42``); the extension-state contract (max/max_q/
max_t, mqe/mqe_t, mte/mte_q, zdropped, reach_end) is what callers such as
minimap2 use to stitch left-extend + right-extend + global fills, so every
field must round-trip exactly.
"""
from __future__ import annotations

import dataclasses
from typing import List

from .flags import NEG_INF
from . import cigar as _cigar


@dataclasses.dataclass
class ExtzResult:
    max: int = 0                 # running best extension score (uint31 in C)
    zdropped: bool = False       # extension terminated by the Z-drop test
    max_q: int = -1              # query coordinate of the best extension cell
    max_t: int = -1              # target coordinate of the best extension cell
    mqe: int = NEG_INF           # best score among cells at the query end
    mqe_t: int = -1              # target coordinate achieving mqe
    mte: int = NEG_INF           # best score among cells at the target end
    mte_q: int = -1              # query coordinate achieving mte
    score: int = NEG_INF         # score reaching both ends (may be NEG_INF)
    reach_end: bool = False      # extension reached the query end (EXTZ_ONLY)
    cigar: List[int] = dataclasses.field(default_factory=list)

    def reset(self) -> None:
        """Reset to the pre-alignment state (reference: ksw2.h:184-189)."""
        self.max_q = self.max_t = self.mqe_t = self.mte_q = -1
        self.max = 0
        self.score = self.mqe = self.mte = NEG_INF
        self.cigar = []
        self.zdropped = False
        self.reach_end = False

    @property
    def n_cigar(self) -> int:
        return len(self.cigar)

    def cigar_string(self) -> str:
        return _cigar.to_string(self.cigar)

    def tsv_fields(self) -> List[str]:
        """The reference CLI's output fields (cli.c:134-145)."""
        out = [str(self.score), str(self.max), str(self.max_t), str(self.max_q)]
        if self.cigar:
            # The reference prints via "MID"[op]; ops are only M/I/D for the
            # DNA kernels.  N (introns) prints as 'N' here (the reference CLI
            # reads out of bounds for op 3; we print the BAM char instead).
            out.append(
                "".join(f"{c >> 4}{'MIDNSHP=X'[c & 0xF]}" for c in self.cigar)
            )
        return out


__all__ = ["ExtzResult"]
