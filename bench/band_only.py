"""Quick band-engine-only timing (extz + extd banded score rows)."""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from suite import read_fa, best_of  # noqa: E402

REF = "/root/reference/test"


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_ccache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    from ksw2_tpu.core.flags import Flag
    from ksw2_tpu.core.matrix import encode_dna, simple_mat
    from ksw2_tpu.ops.band_batch import (extz_band_batch_device,
                                         extd_band_batch_device)

    t50 = encode_dna(read_fa(f"{REF}/t2.fa.gz"))
    q50 = encode_dna(read_fa(f"{REF}/q2.fa.gz"))
    mat = simple_mat(5, 2, 4)

    Bb, W = 64, 751
    Lq_, Lt_ = len(q50), len(t50)
    Qb = np.tile(np.asarray(q50, np.int32), (Bb, 1))
    Tb = np.tile(np.asarray(t50, np.int32), (Bb, 1))
    qlb = np.full(Bb, Lq_, np.int32)
    tlb = np.full(Bb, Lt_, np.int32)
    wvb = np.full(Bb, W, np.int32)

    rb = np.arange(Lq_ + Lt_ - 1, dtype=np.int64)
    stb_ = np.maximum(0, np.maximum(rb - Lq_ + 1, (rb - W + 1) >> 1))
    enb_ = np.minimum(Lt_ - 1, np.minimum(rb, (rb + W) >> 1))
    bcells = Bb * int(np.maximum(0, enb_ - stb_ + 1).sum()) / 1e9

    def run_band():
        ob = extz_band_batch_device(Qb, Tb, qlb, tlb, 5, mat, 4, 2, wvb,
                                    zdrop=400, flag=Flag.SCORE_ONLY)
        assert (ob["score"] == 69932).all() and (ob["max"] == 70010).all()

    t0 = time.time()
    run_band()
    print(json.dumps({"metric": "extz_band_compile_s",
                      "value": round(time.time() - t0, 1)}), flush=True)
    print(json.dumps({"metric": "band_batch_64x50k_w751_gcells_per_s",
                      "value": round(bcells / best_of(run_band, n=3), 3)}),
          flush=True)

    def run_band_extd():
        ob = extd_band_batch_device(Qb, Tb, qlb, tlb, 5, mat, 4, 2, 13, 1,
                                    wvb, zdrop=400, flag=Flag.SCORE_ONLY)
        assert (ob["score"] == 70098).all() and (ob["max"] == 70148).all(), \
            (int(ob["score"][0]), int(ob["max"][0]))

    t0 = time.time()
    run_band_extd()
    print(json.dumps({"metric": "extd_band_compile_s",
                      "value": round(time.time() - t0, 1)}), flush=True)
    print(json.dumps({"metric": "band_batch_extd_64x50k_w751_gcells_per_s",
                      "value": round(bcells / best_of(run_band_extd, n=3), 3)}),
          flush=True)


if __name__ == "__main__":
    main()
