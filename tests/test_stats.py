"""The km_stat analogue: compile-cache + device observability report."""
import numpy as np

from ksw2_tpu.core.flags import Flag
from ksw2_tpu.core.matrix import encode_dna, simple_mat
from ksw2_tpu.utils.stats import engine_stats, format_stats


def test_engine_stats_after_batch():
    from ksw2_tpu.batch.scheduler import AlignJob, align_batch_scores

    mat = simple_mat(5, 2, 4)
    q = encode_dna("ACGTACGTACGTACGT")
    t = encode_dna("ACGTACGAACGTACGT")
    align_batch_scores([AlignJob(q, t)] * 4, 5, mat, 4, 2, zdrop=100,
                       flag=Flag.SCORE_ONLY)
    st = engine_stats()
    assert isinstance(st["caches"], dict)
    # at least one engine builder must have been populated by the run
    assert sum(c["size"] for c in st["caches"].values()) >= 1
    rep = format_stats()
    assert "compiled variants" in rep
