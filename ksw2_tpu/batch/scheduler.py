"""Pair-batch scheduler: bucketing, padding, dispatch.

The reference processes pairs serially (cli.c:220-248); the TPU-native
replacement pads and buckets pairs by length so thousands advance together
through the batched wavefront (the kalloc arena's role -- allocation reuse
across millions of calls -- becomes shape-bucketed compilation reuse: one
XLA program per bucket shape, device buffers recycled by the runtime).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.flags import Flag
from ..core.result import ExtzResult
from ..ops.batch_xla import BatchSpec, extz_batch_scores


def _bucket_len(n: int, quantum: int = 128, coarse: bool = False) -> int:
    """Round a length up to a bucket size.

    Linear 128-steps through the batched-engine range (<= 3072): the
    engines pack pairs at P = ceil(Lt/128) rows each, so a 384-bucket runs
    8/3x more pairs per launch than rounding up to 1024 would.  Geometric
    above that, and for every dimension of buckets routed to the
    single-pair kernels (``coarse``): there shape count costs minutes of
    compile each and padding costs almost nothing.
    """
    n = max(n, 1)
    if coarse:
        b = quantum
        while b < n:
            b = b * 2 if b < 2048 else b + 2048
        return b
    if n <= 3072:
        return -(-n // quantum) * quantum
    b = 4096
    while b < n:
        b += 2048
    return b


_SCORES_LT = (128, 256, 512, 768, 1024, 1280, 1536, 2048, 2560, 3072)


def _bucket_key_scores(qn: int, tn: int):
    """One-piece score-path buckets, aligned with the strips engine's
    canonical ladders: coarser than :func:`_bucket_key` so a mixed
    workload produces fewer, bigger launches (each pallas launch costs a
    fixed dispatch latency, and each distinct shape is a compiled
    variant the fresh-process warm-up pays ~5 s to load)."""
    if tn <= 3072 and qn <= 4608:
        Lq = 512
        while Lq < qn:
            Lq *= 2
        for Lt in _SCORES_LT:
            if Lt >= tn:
                return (min(Lq, 4608), Lt)
    return _bucket_key(qn, tn)


def _bucket_key(qn: int, tn: int):
    """(Lq, Lt) bucket: Lt steps linearly when the target rides the batched
    engines (P = ceil(Lt/128) rows per pair, so every 128 matters); Lq is
    ALWAYS coarse — the batched kernels never loop over Lq (query symbols
    inject per-diagonal via a gather whose cost scales with qlen+tlen, not
    the padded width), so a fine Lq quantum would only split one launch
    into several and multiply dispatches and compiled variants.  On the
    single-pair route both dims coarsen (every extra shape is a separate
    multi-minute kernel compile)."""
    Lt = _bucket_len(tn)
    if Lt > 3072:
        return (_bucket_len(qn, coarse=True), _bucket_len(tn, coarse=True))
    return (_bucket_len(qn, coarse=True), Lt)


@dataclasses.dataclass
class AlignJob:
    query: np.ndarray   # encoded uint8
    target: np.ndarray
    w: int = -1


class PendingScores:
    """Handle for an in-flight :func:`align_batch_scores_async` batch.

    All device work is enqueued and device->host copies are started at
    submit time; :meth:`result` blocks only on transfer completion.
    Submitting several batches before collecting the first overlaps each
    batch's tunnel/launch latency with the next batch's compute — the
    production serving pattern (the reference's analogue is minimap2
    calling ksw2 millions of times with zero per-call setup,
    kalloc.c:41-62).
    """

    def __init__(self, results, pending, guard, fused=None):
        self._results = results
        self._pending = pending
        self._guard = guard
        self._fused = fused            # stacked device records, one fetch
        self._done = False

    def result(self) -> List[ExtzResult]:
        if not self._done:
            _unpack_pending(self._resolve(), self._results,
                            guard=self._guard)
            self._done = True
        return self._results

    def _resolve(self):
        pending = self._pending
        if self._fused is not None:
            h = np.asarray(self._fused)         # the single fused fetch
            pending = [
                (idxs, [h[p[1]:p[1] + p[2]]
                        if isinstance(p, tuple) and p[0] == "fused"
                        else p for p in ps])
                for idxs, ps in pending]
        return pending

    def result_array(self) -> np.ndarray:
        """Bulk accessor: the whole batch's records as ONE
        ``(n_jobs, NFIELDS)`` int32 array in job order (columns =
        ``ops.batch_pallas.FIELD_ORDER``: max, max_t, max_q, mqe,
        mqe_t, mte, mte_q, score, zdropped) — skips the per-job
        ``ExtzResult`` construction (~10 us/job, a real fraction of a
        streamed batch's wall).  Empty/degenerate jobs carry reset
        rows (max 0, coords -1, NEG_INF scores).
        """
        from ..core.flags import NEG_INF

        if self._done:
            raise RuntimeError("result() already consumed this handle")
        out = np.empty((len(self._results), 9), np.int32)
        out[:, (0, 8)] = 0
        out[:, (1, 2, 4, 6)] = -1
        out[:, (3, 5, 7)] = NEG_INF
        filled = np.zeros(len(self._results), bool)
        for i, ez in enumerate(self._results):
            if ez is not None:                  # pre-reset (guard/empty)
                filled[i] = True
        for idxs, ps in self._resolve():
            off = 0
            for pce in ps:
                arr = np.asarray(pce)
                sub = np.asarray(idxs[off:off + arr.shape[0]])
                if not self._guard:
                    out[sub] = arr
                filled[sub] = True
                off += arr.shape[0]
        self._done = True
        assert filled.all()
        return out


def align_batch_scores(
    jobs: Sequence[AlignJob],
    m: int,
    mat: np.ndarray,
    q: int,
    e: int,
    zdrop: int = -1,
    flag: Flag | int = Flag.SCORE_ONLY,
    run_fn=None,
    engine: str = "auto",
) -> List[ExtzResult]:
    """Score a batch of extension jobs (one-piece affine), bucketed by shape.

    ``run_fn(spec, Q, T, qlen, tlen, w) -> dict`` defaults to the local
    single-device batched engine; :mod:`ksw2_tpu.parallel` supplies a
    mesh-sharded variant with the same signature.

    ``engine`` picks the per-bucket backend: "pallas" (the one-pair-per-row
    TPU kernel, targets <= 128 bases), "xla" (the scan engine, any shape),
    or "auto" (pallas where eligible, xla otherwise).  An explicit
    ``run_fn`` overrides the choice.
    """
    return align_batch_scores_async(jobs, m, mat, q, e, zdrop=zdrop,
                                    flag=flag, run_fn=run_fn,
                                    engine=engine).result()


def align_batch_scores_async(
    jobs: Sequence[AlignJob],
    m: int,
    mat: np.ndarray,
    q: int,
    e: int,
    zdrop: int = -1,
    flag: Flag | int = Flag.SCORE_ONLY,
    run_fn=None,
    engine: str = "auto",
) -> PendingScores:
    """Submit a score batch without waiting; see :class:`PendingScores`."""
    flag = Flag(int(flag)) | Flag.SCORE_ONLY
    mat = np.asarray(mat, dtype=np.int8).reshape(-1)
    sc_N = -e if int(mat[m * m - 1]) == 0 else int(mat[m * m - 1])
    run = run_fn or (lambda spec, *a: extz_batch_scores(spec, *a))

    results: List[Optional[ExtzResult]] = [None] * len(jobs)
    min_sc = int(mat[1:].min())
    buckets: Dict[Tuple[int, int], List[int]] = {}
    for i, job in enumerate(jobs):
        if len(job.query) == 0 or len(job.target) == 0 or -min_sc > 2 * (q + e):
            ez = ExtzResult()
            ez.reset()
            results[i] = ez
            continue
        key = _bucket_key_scores(len(job.query), len(job.target))
        buckets.setdefault(key, []).append(i)

    # Phase 1 — dispatch every bucket WITHOUT waiting: each engine returns
    # device record arrays (B_i, NFIELDS) and JAX queues the launches
    # asynchronously, heaviest bucket first.  Phase 2 starts async
    # device->host copies for every piece and unpacks — over this
    # environment's device tunnel a sync costs ~25 ms, so zero extra
    # round-trips (each piece's copy rides behind the remaining compute)
    # is the difference between losing to and beating the reference's
    # serial loop on mixed-length batches.
    def dispatch(item):
        (Lq, Lt), idxs = item
        B = len(idxs)
        qlen = np.array([len(jobs[i].query) for i in idxs], np.int32)
        tlen = np.array([len(jobs[i].target) for i in idxs], np.int32)
        wv = np.array([jobs[i].w if jobs[i].w >= 0
                       else max(len(jobs[i].query), len(jobs[i].target))
                       for i in idxs], np.int32)
        # effectively-unbanded score-only buckets of any length ride the
        # strip-tiled engine; strips buckets are PREPARED here (host-side
        # pad+pack only) and later run as ONE fused jitted execution with
        # one stacked fetch — on this environment's tunnel every separate
        # execution costs a ~29 ms non-pipelining round trip, so fusing
        # the whole bucketed workload into one program is the difference
        # between launch-count x 29 ms and compute-bound walls.  The tiny
        # row-major engine keeps priority for its envelope.  Sequences
        # pass as the raw job list so the engine packs each job ONCE into
        # its padded int8 layout (no intermediate (B, Lq) int32 stage).
        from ..ops.wavefront_rows import rows_eligible
        from ..ops.wavefront_strips import strips_eligible, strips_prep
        use_strips = (
            run_fn is None and engine in ("auto", "pallas")
            and not rows_eligible(qlen, tlen, wv, flag, zdrop, m, mat)
            and strips_eligible(qlen, tlen, wv, flag, m, mat, zdrop, q, e)
        )
        if use_strips:
            return idxs, ("strips", strips_prep(
                [jobs[i].query for i in idxs],
                [jobs[i].target for i in idxs], qlen, tlen, m, mat,
                q, e, zdrop, flag))
        Q = np.zeros((B, Lq), np.int32)
        T = np.zeros((B, Lt), np.int32)
        for k, i in enumerate(idxs):
            job = jobs[i]
            Q[k, : len(job.query)] = job.query
            T[k, : len(job.target)] = job.target
        use_band = (
            run_fn is None and engine in ("auto", "band") and Lt > 512
            and wv.min() >= 1 and wv.max() <= 1472
            and int(mat[0]) * int(min(qlen.max(), tlen.max())) < (1 << 17)
        )
        use_pallas = (
            run_fn is None and engine in ("auto", "pallas") and Lt <= 3072
            and not use_band and _pallas_zdrop_ok(Lt, mat, qlen, tlen,
                                                  zdrop, flag)
        )
        if use_pallas:
            from ..ops.batch_pallas import extz_batch_records
            pieces = extz_batch_records(Q, T, qlen, tlen, m, mat, q, e, wv,
                                        zdrop=zdrop, flag=flag)
        elif use_band:
            from ..ops.band_batch import extz_band_batch_records
            pieces = extz_band_batch_records(Q, T, qlen, tlen, m, mat, q, e,
                                             wv, zdrop=zdrop, flag=flag)
        else:
            spec = BatchSpec(Lq=Lq, Lt=Lt, m=m, sc_mch=int(mat[0]),
                             sc_mis=int(mat[1]), sc_N=sc_N, q=int(q),
                             e=int(e), zdrop=int(zdrop), flag=int(flag))
            # host arrays through run_fn: a sharded run_fn needs them on
            # the host for its own prep (a device round trip otherwise)
            out = run(spec, Q, T, qlen, tlen, wv)
            pieces = [_stack_records(out)]
        return idxs, pieces

    pending = _dispatch_all(dispatch, _heaviest_first(buckets, jobs))
    pending, fused = _fuse_strips(pending)

    # Phase 2 — per-piece async device->host copies start now; the
    # host-side unpack is deferred to PendingScores.result() (the copies
    # overlap later buckets' compute AND any work submitted after this
    # batch; no device sync beyond the last launch's own transfer)
    _start_host_copies(pending)
    return PendingScores(results, pending, guard=-min_sc > 2 * (q + e),
                         fused=fused)


def _fuse_strips(pending):
    """Replace ('strips', launches) markers with ('fused', off, n) row
    spans of ONE jitted execution over every strips launch in the batch
    (one program, one stacked record array, one fetch)."""
    from ..ops.wavefront_strips import strips_fused_call

    launches_all = []
    for _, ps in pending:
        if isinstance(ps, tuple) and ps and ps[0] == "strips":
            launches_all.extend(ps[1])
    if not launches_all:
        return pending, None
    arr = strips_fused_call(launches_all)
    cp = getattr(arr, "copy_to_host_async", None)
    if cp is not None:
        cp()
    new_pending = []
    off = 0
    for idxs, ps in pending:
        if isinstance(ps, tuple) and ps and ps[0] == "strips":
            n = sum(B for _, _, B in ps[1])
            new_pending.append((idxs, [("fused", off, n)]))
            off += n
        else:
            new_pending.append((idxs, ps))
    return new_pending, arr


def _pallas_zdrop_ok(Lt, mat, qlen, tlen, zdrop, flag) -> bool:
    """Exact-Z-drop launches pack (H, key) into int32; check the range."""
    if zdrop < 0 or (flag & Flag.APPROX_MAX):
        return True
    P = (Lt + 127) // 128
    KB = 1 << (5 * P * 128 + 2).bit_length()
    hmax = int(np.asarray(mat).max()) * min(int(qlen.max()), int(tlen.max()))
    return (hmax + 1) * KB + KB < (1 << 31)


def _dispatch_all(dispatch, items):
    """Run per-bucket dispatch, in threads when there are several buckets.

    Steady state this is pure overlap of numpy prep + enqueue (cheap
    either way); the win is the FIRST call in a process, where each
    bucket's engine compiles or loads from the persistent cache — loads
    release the GIL and parallelize (~5 s each over this environment's
    tunnel, so a 10-bucket mixed workload warms in ~1/4 the time).
    Submission order (heaviest first) seeds enqueue order; results come
    back in submission order so downstream unpack is deterministic.
    """
    items = list(items)
    if len(items) <= 1:
        return [dispatch(it) for it in items]
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=min(8, len(items))) as ex:
        return list(ex.map(dispatch, items))


def _heaviest_first(buckets: Dict[Tuple[int, int], List[int]], jobs):
    """Bucket items ordered biggest-compute-first: the device starts
    chewing the heaviest launches while the host still preps the rest,
    and their device->host copies overlap the most remaining compute."""
    def cost(kv):
        _, idxs = kv
        return -sum(len(jobs[i].query) * len(jobs[i].target) for i in idxs)
    return sorted(buckets.items(), key=cost)


def _start_host_copies(pending) -> None:
    """Begin device->host transfer of every record piece without blocking.

    Replaces the on-device concat + single blocking fetch: the device
    executes launches FIFO, so each piece's bytes travel the tunnel while
    later buckets still compute and the final np.asarray reads mostly
    land on already-arrived host buffers (only the last launch's copy is
    actually waited on).  Zero extra syncs either way."""
    for _, ps in pending:
        for p in ps:
            cp = getattr(p, "copy_to_host_async", None)
            if cp is not None:
                cp()


def _unpack_pending(pending, results, guard) -> None:
    """Read every pending record piece and fill per-job ExtzResults."""
    for idxs, ps in pending:
        if ps:
            n_rows = sum(p.shape[0] for p in ps)
            assert n_rows == len(idxs), (n_rows, len(idxs))
        off = 0
        for pce in ps:
            arr = np.asarray(pce)
            for k in range(arr.shape[0]):
                rec = arr[k]
                ez = ExtzResult()
                ez.reset()
                if not guard:
                    ez.max = int(rec[0])
                    ez.max_t = int(rec[1])
                    ez.max_q = int(rec[2])
                    ez.mqe = int(rec[3])
                    ez.mqe_t = int(rec[4])
                    ez.mte = int(rec[5])
                    ez.mte_q = int(rec[6])
                    ez.score = int(rec[7])
                    ez.zdropped = bool(rec[8])
                results[idxs[off + k]] = ez
            off += arr.shape[0]


@jax.jit
def _stack_records(out):
    """Result dict from the XLA scan engine -> (B, NFIELDS) records."""
    keys = ("max", "max_t", "max_q", "mqe", "mqe_t", "mte", "mte_q",
            "score", "zdropped")
    return jnp.stack([out[k].astype(jnp.int32) for k in keys], axis=1)


def align_batch_scores2(
    jobs: Sequence[AlignJob],
    m: int,
    mat: np.ndarray,
    q: int,
    e: int,
    q2: int,
    e2: int,
    zdrop: int = -1,
    flag: Flag | int = Flag.SCORE_ONLY,
) -> List[ExtzResult]:
    """Score a batch of two-piece (extd2) extension jobs, bucketed by shape.

    Same async single-fetch pipeline as :func:`align_batch_scores`:
    banded long buckets ride the band-relative extd engine, targets to
    3072 ride the batched extd engine, anything larger falls back to the
    single-pair kernel.
    """
    return align_batch_scores2_async(jobs, m, mat, q, e, q2, e2,
                                     zdrop=zdrop, flag=flag).result()


def align_batch_scores2_async(
    jobs: Sequence[AlignJob],
    m: int,
    mat: np.ndarray,
    q: int,
    e: int,
    q2: int,
    e2: int,
    zdrop: int = -1,
    flag: Flag | int = Flag.SCORE_ONLY,
) -> PendingScores:
    """Submit a two-piece score batch without waiting; the extd twin of
    :func:`align_batch_scores_async` with the same handle contract
    (several batches in flight overlap each batch's tunnel/launch
    latency with the next batch's compute — the production serving
    shape)."""
    from ..ops.batch_pallas import extd_batch_records

    flag = Flag(int(flag)) | Flag.SCORE_ONLY
    mat = np.asarray(mat, dtype=np.int8).reshape(-1)
    results: List[Optional[ExtzResult]] = [None] * len(jobs)
    min_sc = int(mat[1:].min())

    buckets: Dict[Tuple[int, int], List[int]] = {}
    for i, job in enumerate(jobs):
        if len(job.query) == 0 or len(job.target) == 0 or \
                -min_sc > 2 * (q + e):
            ez = ExtzResult()
            ez.reset()
            results[i] = ez
            continue
        key = _bucket_key_scores(len(job.query), len(job.target))
        buckets.setdefault(key, []).append(i)

    def dispatch(item):
        (Lq, Lt), idxs = item
        B = len(idxs)
        qlen = np.array([len(jobs[i].query) for i in idxs], np.int32)
        tlen = np.array([len(jobs[i].target) for i in idxs], np.int32)
        wv = np.array([jobs[i].w if jobs[i].w >= 0
                       else max(len(jobs[i].query), len(jobs[i].target))
                       for i in idxs], np.int32)
        # fused strips path first (see align_batch_scores_async)
        from ..ops.wavefront_strips import (strips_extd_eligible,
                                            strips_prep)
        if strips_extd_eligible(qlen, tlen, wv, flag, m, mat, zdrop,
                                q, e, q2, e2):
            return idxs, ("strips", strips_prep(
                [jobs[i].query for i in idxs],
                [jobs[i].target for i in idxs], qlen, tlen, m, mat,
                q, e, zdrop, flag, two=True, q2=q2, e2=e2))
        Q = np.zeros((B, Lq), np.int32)
        T = np.zeros((B, Lt), np.int32)
        for k, i in enumerate(idxs):
            job = jobs[i]
            Q[k, : len(job.query)] = job.query
            T[k, : len(job.target)] = job.target
        use_band = (
            Lt > 512 and wv.min() >= 1 and wv.max() <= 1472
            and int(mat[0]) * int(min(qlen.max(), tlen.max())) < (1 << 17)
        )
        use_pallas = (
            Lt <= 3072 and not use_band
            and _pallas_zdrop_ok(Lt, mat, qlen, tlen, zdrop, flag)
        )
        if use_band:
            from ..ops.band_batch import extd_band_batch_records
            pieces = extd_band_batch_records(Q, T, qlen, tlen, m, mat, q, e,
                                             q2, e2, wv, zdrop=zdrop,
                                             flag=flag)
            return idxs, pieces
        elif use_pallas:
            pieces = extd_batch_records(Q, T, qlen, tlen, m, mat, q, e,
                                        q2, e2, wv, zdrop=zdrop, flag=flag)
            return idxs, pieces
        # single-pair fallback: ez results land directly (no record pieces)
        from ..ops.extd import extd2_device
        for i in idxs:
            job = jobs[i]
            ez, _ = extd2_device(job.query, job.target, m, mat, q, e,
                                 q2, e2, w=job.w, zdrop=zdrop, flag=flag)
            results[i] = ez
        return idxs, []

    pending = _dispatch_all(dispatch, _heaviest_first(buckets, jobs))
    pending, fused = _fuse_strips(pending)
    _start_host_copies(pending)
    qc, ec = (q, e) if q + e <= q2 + e2 else (q2, e2)
    return PendingScores(results, pending, guard=-min_sc > 2 * (qc + ec),
                         fused=fused)




class PendingAligns:
    """Handle for an in-flight :func:`align_batch_async` batch (scores +
    CIGARs).  All device work (forward kernels, start cells, walkers,
    RLE pack — one fused execution for every deferred slice) is enqueued
    at submit time; :meth:`result` fetches once and assembles."""

    def __init__(self, finish):
        self._finish = finish
        self._results = None

    def result(self) -> List[ExtzResult]:
        if self._results is None:
            self._results = self._finish()
        return self._results


def align_batch_async(
    jobs: Sequence[AlignJob],
    m: int,
    mat: np.ndarray,
    q: int,
    e: int,
    q2: Optional[int] = None,
    e2: Optional[int] = None,
    zdrop: int = -1,
    end_bonus: int = 0,
    flag: Flag | int = Flag.NONE,
) -> "PendingAligns":
    """Submit a full-alignment batch without waiting; the serving twin
    of :func:`align_batch` (see :class:`PendingScores` for why
    several-in-flight matters on latency-taxed links)."""
    flag = Flag(int(flag))
    score_only = bool(flag & Flag.SCORE_ONLY)
    two_piece = q2 is not None
    if score_only and not two_piece:
        h = align_batch_scores_async(jobs, m, mat, q, e, zdrop=zdrop,
                                     flag=flag)
        return PendingAligns(h.result)
    if score_only and two_piece and end_bonus == 0 \
            and not (flag & Flag.EXTZ_ONLY):
        h2 = align_batch_scores2_async(jobs, m, mat, q, e, q2, e2,
                                       zdrop=zdrop, flag=flag)
        return PendingAligns(h2.result)
    return align_batch(jobs, m, mat, q, e, q2, e2, zdrop=zdrop,
                       end_bonus=end_bonus, flag=flag, _defer=True)


def align_batch(
    jobs: Sequence[AlignJob],
    m: int,
    mat: np.ndarray,
    q: int,
    e: int,
    q2: Optional[int] = None,
    e2: Optional[int] = None,
    zdrop: int = -1,
    end_bonus: int = 0,
    flag: Flag | int = Flag.NONE,
    _defer: bool = False,
) -> List[ExtzResult]:
    """Full alignment (scores + CIGARs) for a batch of jobs.

    The complete replacement for the reference's serial per-pair loop:
    one-piece (``q2 is None``) or two-piece gap costs, bucketed by shape.
    Short-target buckets (tlen <= 128) run through the one-pair-per-row
    batched kernels; longer pairs run the single-pair wavefront kernels
    with on-device traceback.
    """
    flag = Flag(int(flag))
    two_piece = q2 is not None
    if two_piece and e2 is None:
        raise ValueError("two-piece costs need both q2 and e2")
    mat = np.asarray(mat, dtype=np.int8).reshape(-1)
    results: List[Optional[ExtzResult]] = [None] * len(jobs)
    min_sc = int(mat[1:].min())

    score_only = bool(flag & Flag.SCORE_ONLY)
    if score_only and not two_piece:
        out = align_batch_scores(jobs, m, mat, q, e, zdrop=zdrop,
                                 flag=flag)
        return PendingAligns(lambda: out) if _defer else out
    if score_only and end_bonus == 0 and not (flag & Flag.EXTZ_ONLY):
        out = align_batch_scores2(jobs, m, mat, q, e, q2, e2, zdrop=zdrop,
                                  flag=flag)
        return PendingAligns(lambda: out) if _defer else out

    buckets: Dict[Tuple[int, int], List[int]] = {}
    for i, job in enumerate(jobs):
        if len(job.query) == 0 or len(job.target) == 0 or \
                -min_sc > 2 * (q + e):
            ez = ExtzResult()
            ez.reset()
            results[i] = ez
            continue
        key = _bucket_key(len(job.query), len(job.target))
        buckets.setdefault(key, []).append(i)

    from ..ops.batch_pallas import extd_batch_device
    from ..ops.extd import extd2_device
    from ..ops.extz import extz2_device
    from ..ops.strips_walker import (strips_cigar_eligible,
                                     strips_cigar_extd_eligible,
                                     strips_cigar_prep)

    cigar_pending: List[Tuple[List[int], list, bool]] = []
    strips_cig_pending: List[dict] = []
    for (Lq, Lt), idxs in buckets.items():
        # fused strips-CIGAR route first: EVERY eligible bucket's
        # byte-emitting forward + batched walkers later run inside ONE
        # jitted execution with ONE fetch for the whole workload (the
        # per-execution round trip is the dominant fixed cost on a
        # latency-taxed link; the strips forward is also the fastest
        # CIGAR forward per cell)
        qlens = np.array([len(jobs[i].query) for i in idxs], np.int32)
        tlens = np.array([len(jobs[i].target) for i in idxs], np.int32)
        ws = np.array([jobs[i].w if jobs[i].w >= 0 else
                       max(len(jobs[i].query), len(jobs[i].target))
                       for i in idxs], np.int32)
        if two_piece:
            strips_ok = strips_cigar_extd_eligible(
                qlens, tlens, ws, flag, m, mat, zdrop, q, e, q2, e2)
        else:
            strips_ok = strips_cigar_eligible(qlens, tlens, ws, flag,
                                              m, mat, zdrop, q, e)
        if strips_ok:
            launches = strips_cigar_prep(
                [jobs[i].query for i in idxs],
                [jobs[i].target for i in idxs], qlens, tlens, m, mat,
                q, e, zdrop, flag, end_bonus=end_bonus, two=two_piece,
                q2=q2 or 0, e2=e2 or 0)
            strips_cig_pending.append({"idxs": idxs,
                                       "launches": launches})
            continue
        batchable = (Lt <= 1536
                     and not (flag & Flag.EXTZ_ONLY))
        # long banded buckets ride the band engines (scores and CIGARs,
        # exact or approx-max)
        band_ok = (Lt > 512
                   and not (flag & Flag.EXTZ_ONLY)
                   and all(1 <= jobs[i].w <= 1472 for i in idxs)
                   and int(mat[0]) * min(
                       max(len(jobs[i].query) for i in idxs),
                       max(len(jobs[i].target) for i in idxs)) < (1 << 17))
        if band_ok:
            B = len(idxs)
            Q = np.zeros((B, Lq), np.int32)
            T = np.zeros((B, Lt), np.int32)
            qlen = np.zeros(B, np.int32)
            tlen = np.zeros(B, np.int32)
            wv = np.zeros(B, np.int32)
            for k, i in enumerate(idxs):
                job = jobs[i]
                Q[k, : len(job.query)] = job.query
                T[k, : len(job.target)] = job.target
                qlen[k] = len(job.query)
                tlen[k] = len(job.target)
                wv[k] = job.w
            if two_piece and score_only:
                from ..ops.band_batch import extd_band_batch_device
                out = extd_band_batch_device(Q, T, qlen, tlen, m, mat, q, e,
                                             q2, e2, wv, zdrop=zdrop,
                                             flag=flag)
                for k, i in enumerate(idxs):
                    ez = ExtzResult()
                    ez.reset()
                    for f in ("max", "max_t", "max_q", "mqe", "mqe_t",
                              "mte", "mte_q", "score"):
                        setattr(ez, f, int(out[f][k]))
                    ez.zdropped = bool(out["zdropped"][k])
                    results[i] = ez
            elif two_piece:
                from ..ops.band_batch import extd_band_batch_align
                ezs = extd_band_batch_align(Q, T, qlen, tlen, m, mat, q, e,
                                            q2, e2, wv, zdrop=zdrop,
                                            end_bonus=end_bonus, flag=flag)
                for k, i in enumerate(idxs):
                    results[i] = ezs[k]
            else:
                from ..ops.band_batch import extz_band_batch_align
                ezs = extz_band_batch_align(Q, T, qlen, tlen, m, mat, q, e,
                                            wv, zdrop=zdrop,
                                            end_bonus=end_bonus, flag=flag)
                for k, i in enumerate(idxs):
                    results[i] = ezs[k]
        elif batchable:
            B = len(idxs)
            Q = np.zeros((B, Lq), np.int32)
            T = np.zeros((B, Lt), np.int32)
            qlen = np.zeros(B, np.int32)
            tlen = np.zeros(B, np.int32)
            wv = np.zeros(B, np.int32)
            for k, i in enumerate(idxs):
                job = jobs[i]
                Q[k, : len(job.query)] = job.query
                T[k, : len(job.target)] = job.target
                qlen[k] = len(job.query)
                tlen[k] = len(job.target)
                wv[k] = job.w if job.w >= 0 else max(len(job.query),
                                                     len(job.target))
            if two_piece and score_only:
                out = extd_batch_device(Q, T, qlen, tlen, m, mat, q, e,
                                        q2, e2, wv, zdrop=zdrop, flag=flag)
                for k, i in enumerate(idxs):
                    ez = ExtzResult()
                    ez.reset()
                    for f in ("max", "max_t", "max_q", "mqe", "mqe_t",
                              "mte", "mte_q", "score"):
                        setattr(ez, f, int(out[f][k]))
                    ez.zdropped = bool(out["zdropped"][k])
                    results[i] = ez
            elif two_piece:
                from ..ops.batch_pallas import extd_batch_align_dispatch
                slices = extd_batch_align_dispatch(
                    Q, T, qlen, tlen, m, mat, q, e, q2, e2, wv, zdrop=zdrop,
                    end_bonus=end_bonus, flag=flag, defer=True)
                cigar_pending.append((idxs, slices, True))
            else:
                from ..ops.batch_pallas import extz_batch_align_dispatch
                slices = extz_batch_align_dispatch(
                    Q, T, qlen, tlen, m, mat, q, e, wv, zdrop=zdrop,
                    end_bonus=end_bonus, flag=flag, defer=True)
                cigar_pending.append((idxs, slices, False))
        else:
            for i in idxs:
                job = jobs[i]
                if two_piece:
                    ez, _ = extd2_device(job.query, job.target, m, mat,
                                         q, e, q2, e2, w=job.w,
                                         zdrop=zdrop,
                                         end_bonus=end_bonus, flag=flag)
                else:
                    ez, _ = extz2_device(job.query, job.target, m, mat,
                                         q, e, w=job.w, zdrop=zdrop,
                                         end_bonus=end_bonus, flag=flag)
                results[i] = ez

    # Phase 2 — ONE fused jitted execution for every deferred CIGAR
    # slice of the whole workload (forward kernels, device start cells,
    # device walkers, RLE compaction), then one truncated-slab fetch.
    # The strips buckets get their own single fused execution the same
    # way (one upload, one flat fetch).
    fused = _fuse_cigar_slices(cigar_pending)
    strips_flat = strips_spans = None
    if strips_cig_pending:
        from ..ops.strips_walker import strips_cigar_fused_call
        all_launches = [ln for g in strips_cig_pending
                        for ln in g["launches"]]
        strips_flat, strips_spans = strips_cigar_fused_call(all_launches)
        cp = getattr(strips_flat, "copy_to_host_async", None)
        if cp is not None:
            cp()

    def _finish():
        _finish_cigar_pending(cigar_pending, results, m, mat, q, e, q2,
                              e2, zdrop, end_bonus, flag, fused)
        if strips_flat is not None:
            _finish_strips_cig(strips_cig_pending, strips_flat,
                               strips_spans, results, jobs, m, mat, q,
                               e, q2, e2, zdrop, end_bonus, flag,
                               two_piece)
        return results

    if _defer:
        return PendingAligns(_finish)  # type: ignore[return-value]
    return _finish()  # type: ignore[return-value]


def _finish_strips_cig(groups, flat, spans, results, jobs, m, mat, q,
                       e, q2, e2, zdrop, end_bonus, flag, two_piece):
    """Unpack the strips buckets' single flat fetch into per-job
    results; a pair whose capped runs fetch overflowed re-walks alone
    through the uncapped per-pair path."""
    from ..ops.strips_walker import strips_cigar_align, unpack_cigar_flat

    h = np.asarray(flat)                       # the one fetch
    li = 0
    for g in groups:
        pos = 0
        for prm, _arrays, B, eb in g["launches"]:
            off, n = spans[li]
            li += 1
            sub = g["idxs"][pos:pos + B]
            pos += B

            def rewalk(p, sub=sub):
                job = jobs[sub[p]]
                out = strips_cigar_align(
                    job.query[None, :], job.target[None, :],
                    np.array([len(job.query)], np.int32),
                    np.array([len(job.target)], np.int32), m, mat, q, e,
                    zdrop=zdrop, end_bonus=end_bonus, flag=flag,
                    two=two_piece, q2=q2 or 0, e2=e2 or 0)
                return out[0].cigar

            ezs = unpack_cigar_flat(h[off:off + n], prm, B, mat, eb,
                                    flag, rewalk)
            for k, i in enumerate(sub):
                results[i] = ezs[k]


def _fuse_cigar_slices(groups):
    """Run every deferred CIGAR slice inside one jitted execution;
    attaches each slice's span in the flat output."""
    from ..ops.batch_pallas import cigar_fused_call

    pendings = [s["pending"] for _, slices, _ in groups
                for s in slices if "pending" in s]
    if not pendings:
        return None
    flat, spans = cigar_fused_call(pendings)
    cp = getattr(flat, "copy_to_host_async", None)
    if cp is not None:
        cp()
    k = 0
    for _, slices, _ in groups:
        for s in slices:
            if "pending" in s:
                s["span"] = spans[k]
                k += 1
    return flat


def _finish_cigar_pending(cigar_pending, results, m, mat, q, e, q2, e2,
                          zdrop, end_bonus, flag, fused=None):
    """Fetch all pending CIGAR slices in one transfer and assemble.

    Each slice's packed slab is (B, NFIELDS+3+MAXR); widths differ per
    bucket, so the concat jit pads every slab to the widest before the
    single device->host copy.  A slice whose device RLE compaction
    overflowed (cnt > MAXR, degenerate alignments) re-runs through the
    synchronous engine, which has the full-fetch fallback.
    """
    from ..ops.batch_pallas import (_cigar_batch_finish, extd_batch_align,
                                    extz_batch_align)

    # per-slab async device->host copies (same rationale as the score
    # path's _start_host_copies: transfers ride behind remaining compute,
    # zero extra blocking round-trips)
    for _, slices, _ in cigar_pending:
        for s in slices:
            if "packed" in s:
                s["width"] = s["packed"].shape[1]
                cp = getattr(s["packed"], "copy_to_host_async", None)
                if cp is not None:
                    cp()
    h = np.asarray(fused) if fused is not None else None   # the one fetch
    for idxs, slices, twop in cigar_pending:
        pos = 0                                # job offset inside bucket
        for s in slices:
            B = s["B"]
            sub = [idxs[pos + k] for k in range(B)]
            pos += B
            if s.get("guard"):
                for i in sub:
                    ez = ExtzResult()
                    ez.reset()
                    results[i] = ez
                continue
            if "span" in s:
                off, Bs_, W, maxr_eff = s["span"]
                slab = h[off:off + Bs_ * W].reshape(Bs_, W)[:B]
                maxr = maxr_eff
            else:
                slab = np.asarray(s["packed"])[:B]
                maxr = s["MAXR"]
            Qs, Ts, qls, tls, ws = s["args"]
            out = _cigar_batch_finish(slab, maxr, B, Qs, Ts, qls, tls,
                                      flag, end_bonus)
            if out is None:          # RLE overflow: sync re-run, full fetch
                if twop:
                    out = extd_batch_align(Qs, Ts, qls, tls, m, mat, q, e,
                                           q2, e2, ws, zdrop=zdrop,
                                           end_bonus=end_bonus, flag=flag)
                else:
                    out = extz_batch_align(Qs, Ts, qls, tls, m, mat, q, e,
                                           ws, zdrop=zdrop,
                                           end_bonus=end_bonus, flag=flag)
            for k, i in enumerate(sub):
                results[i] = out[k]




def align_batch_splice(
    jobs: Sequence[AlignJob],
    m: int,
    mat: np.ndarray,
    q: int,
    e: int,
    q2: int,
    noncan: int,
    zdrop: int = -1,
    junc_bonus: int = 0,
    flag: Flag | int = Flag.NONE,
    juncs: Optional[Sequence[Optional[np.ndarray]]] = None,
    _defer: bool = False,
) -> List[ExtzResult]:
    """Spliced (mRNA-to-genome) alignment for a batch of jobs.

    Eligible CIGAR buckets ride the fused strips route (one execution +
    one fetch for the whole workload); the rest batch through the exts
    engine or run the single-pair exts kernel.  ``juncs`` optionally
    supplies per-job junction annotation tracks.
    """
    flag = Flag(int(flag))
    mat = np.asarray(mat, dtype=np.int8).reshape(-1)
    results: List[Optional[ExtzResult]] = [None] * len(jobs)
    min_sc = int(mat[1:].min())

    buckets: Dict[Tuple[int, int], List[int]] = {}
    for i, job in enumerate(jobs):
        if len(job.query) == 0 or len(job.target) == 0 or \
                -min_sc > 2 * (q + e):
            ez = ExtzResult()
            ez.reset()
            results[i] = ez
            continue
        key = _bucket_key(len(job.query), len(job.target))
        buckets.setdefault(key, []).append(i)

    from ..ops.batch_pallas import (exts_batch_align_dispatch,
                                    exts_batch_records)
    from ..ops.exts import exts2_device
    from ..ops.strips_walker import (strips_exts_cigar_prep,
                                     strips_exts_eligible)

    with_cigar = not (flag & Flag.SCORE_ONLY)
    splice_pending: List[Tuple[List[int], list]] = []
    strips_cig_pending: List[dict] = []
    strips_score_pending: List[dict] = []
    for (Lq, Lt), idxs in buckets.items():
        # fused strips route first (one execution + one fetch for
        # every eligible bucket of the workload; CIGAR mode adds the
        # 5-state walkers with N ops for the intron carry)
        qlens = np.array([len(jobs[i].query) for i in idxs],
                         np.int32)
        tlens = np.array([len(jobs[i].target) for i in idxs],
                         np.int32)
        ws = np.array([jobs[i].w if jobs[i].w >= 0 else
                       max(len(jobs[i].query), len(jobs[i].target))
                       for i in idxs], np.int32)
        junc_any = juncs is not None and any(
            juncs[i] is not None for i in idxs)
        if strips_exts_eligible(qlens, tlens, ws, flag, m, mat,
                                zdrop, q, e, q2, junc_any,
                                junc_bonus):
            launches = strips_exts_cigar_prep(
                [jobs[i].query for i in idxs],
                [jobs[i].target for i in idxs], qlens, tlens, m,
                mat, q, e, q2, noncan, zdrop, flag, cig=with_cigar)
            if with_cigar:
                strips_cig_pending.append({"idxs": idxs,
                                           "launches": launches})
            else:
                strips_score_pending.append({"idxs": idxs,
                                             "launches": launches})
            continue
        if Lt <= 1536 and not (flag & Flag.EXTZ_ONLY):
            B = len(idxs)
            Q = np.zeros((B, Lq), np.int32)
            T = np.zeros((B, Lt), np.int32)
            qlen = np.zeros(B, np.int32)
            tlen = np.zeros(B, np.int32)
            jb = None
            if juncs is not None and any(juncs[i] is not None for i in idxs):
                jb = np.zeros((B, Lt), np.uint8)
                for k, i in enumerate(idxs):
                    if juncs[i] is not None:
                        jb[k, : len(juncs[i])] = juncs[i]
            for k, i in enumerate(idxs):
                job = jobs[i]
                Q[k, : len(job.query)] = job.query
                T[k, : len(job.target)] = job.target
                qlen[k] = len(job.query)
                tlen[k] = len(job.target)
            # async either way: dispatch every bucket's device work now,
            # fetch ALL records once at the end
            if with_cigar:
                slices = exts_batch_align_dispatch(
                    Q, T, qlen, tlen, m, mat, q, e, q2, noncan,
                    zdrop=zdrop, junc_bonus=junc_bonus, flag=flag, junc=jb,
                    defer=True)
            else:
                slices = exts_batch_records(
                    Q, T, qlen, tlen, m, mat, q, e, q2, noncan,
                    zdrop=zdrop, junc_bonus=junc_bonus, flag=flag, junc=jb)
            splice_pending.append((idxs, slices))
        else:
            for i in idxs:
                job = jobs[i]
                ez, _ = exts2_device(
                    job.query, job.target, m, mat, q, e, q2, noncan,
                    zdrop=zdrop, junc_bonus=junc_bonus, flag=flag,
                    junc=None if juncs is None else juncs[i])
                results[i] = ez
    fused = _fuse_splice_slices(splice_pending)
    strips_flat = strips_spans = None
    if strips_cig_pending:
        from ..ops.strips_walker import strips_cigar_fused_call
        all_launches = [ln for g in strips_cig_pending
                        for ln in g["launches"]]
        strips_flat, strips_spans = strips_cigar_fused_call(all_launches)
        cp = getattr(strips_flat, "copy_to_host_async", None)
        if cp is not None:
            cp()
    strips_score_rec = None
    if strips_score_pending:
        from ..ops.wavefront_strips import strips_fused_call
        score_launches = [ln for g in strips_score_pending
                          for ln in g["launches"]]
        strips_score_rec = strips_fused_call(score_launches)
        cp = getattr(strips_score_rec, "copy_to_host_async", None)
        if cp is not None:
            cp()
    def _finish():
        _finish_splice_pending(splice_pending, results, m, mat, q, e,
                               q2, noncan, zdrop, junc_bonus, flag,
                               fused)
        if strips_flat is not None:
            from ..ops.strips_walker import unpack_cigar_flat
            h = np.asarray(strips_flat)
            li = 0
            for g in strips_cig_pending:
                pos = 0
                for prm, _arrays, B, eb in g["launches"]:
                    off, n = strips_spans[li]
                    li += 1
                    sub = g["idxs"][pos:pos + B]
                    pos += B

                    def rewalk(p, sub=sub):
                        job = jobs[sub[p]]
                        ez, _ = exts2_device(
                            job.query, job.target, m, mat, q, e, q2,
                            noncan, zdrop=zdrop, junc_bonus=junc_bonus,
                            flag=flag, junc=None)
                        return ez.cigar

                    ezs = unpack_cigar_flat(h[off:off + n], prm, B,
                                            mat, eb, flag, rewalk)
                    for k, i in enumerate(sub):
                        results[i] = ezs[k]
        if strips_score_rec is not None:
            rec = np.asarray(strips_score_rec)
            off = 0
            for g in strips_score_pending:
                for k, i in enumerate(g["idxs"]):
                    r = rec[off + k]
                    ez = ExtzResult()
                    ez.reset()
                    ez.max = int(r[0])
                    ez.max_t = int(r[1])
                    ez.max_q = int(r[2])
                    ez.mqe = int(r[3])
                    ez.mqe_t = int(r[4])
                    ez.mte = int(r[5])
                    ez.mte_q = int(r[6])
                    ez.score = int(r[7])
                    ez.zdropped = bool(r[8])
                    results[i] = ez
                off += len(g["idxs"])
        return results

    if _defer:
        return PendingAligns(_finish)  # type: ignore[return-value]
    return _finish()  # type: ignore[return-value]


def align_batch_splice_async(
    jobs: Sequence[AlignJob],
    m: int,
    mat: np.ndarray,
    q: int,
    e: int,
    q2: int,
    noncan: int,
    zdrop: int = -1,
    junc_bonus: int = 0,
    flag: Flag | int = Flag.NONE,
    juncs: Optional[Sequence[Optional[np.ndarray]]] = None,
) -> "PendingAligns":
    """Submit a splice batch without waiting; the serving twin of
    :func:`align_batch_splice` (device work + async copies start at
    submit time, the fetch/unpack defers to ``.result()``)."""
    return align_batch_splice(jobs, m, mat, q, e, q2, noncan,
                              zdrop=zdrop, junc_bonus=junc_bonus,
                              flag=flag, juncs=juncs, _defer=True)


def _fuse_splice_slices(groups):
    """One jitted execution for every deferred splice CIGAR slice."""
    from ..ops.batch_pallas import cigar_fused_call

    pendings = [s["pending"] for _, slices in groups
                for s in slices if "pending" in s]
    if not pendings:
        return None
    flat, spans = cigar_fused_call(pendings)
    cp = getattr(flat, "copy_to_host_async", None)
    if cp is not None:
        cp()
    k = 0
    for _, slices in groups:
        for s in slices:
            if "pending" in s:
                s["span"] = spans[k]
                k += 1
    return flat


def _finish_splice_pending(splice_pending, results, m, mat, q, e, q2,
                           noncan, zdrop, junc_bonus, flag, fused=None):
    """Fetch all pending splice CIGAR slices in one transfer and assemble.

    Mirrors :func:`_finish_cigar_pending`; an RLE-overflow slice re-runs
    through the full-fetch host backtrack."""
    from ..ops.batch_pallas import (_cigar_batch_finish_exts,
                                    _exts_batch_align_fullfetch)

    from ..ops import wavefront_batch as wb

    # per-slab async copies (see _finish_cigar_pending)
    for _, slices in splice_pending:
        for s in slices:
            arr = s.get("packed", s.get("res"))
            if arr is not None:
                s["width"] = arr.shape[1]
                s["_slab"] = arr
                cp = getattr(arr, "copy_to_host_async", None)
                if cp is not None:
                    cp()
    h = np.asarray(fused) if fused is not None else None   # the one fetch
    for idxs, slices in splice_pending:
        pos = 0                                # job offset inside bucket
        for s in slices:
            B = s["B"]
            sub = [idxs[pos + k] for k in range(B)]
            pos += B
            if s.get("guard"):
                for i in sub:
                    ez = ExtzResult()
                    ez.reset()
                    results[i] = ez
                continue
            if "span" in s:
                off, Bs_, W, maxr_eff = s["span"]
                slab = h[off:off + Bs_ * W].reshape(Bs_, W)[:B]
                s["MAXR"] = maxr_eff
            else:
                slab = np.asarray(s["_slab"])[:B]
            if "res" in s:                     # score-only records
                for k, i in enumerate(sub):
                    ez = ExtzResult()
                    ez.reset()
                    ez.max = int(slab[k, wb.F_MAX])
                    ez.max_t = int(slab[k, wb.F_MAXT])
                    ez.max_q = int(slab[k, wb.F_MAXQ])
                    ez.mqe = int(slab[k, wb.F_MQE])
                    ez.mqe_t = int(slab[k, wb.F_MQET])
                    ez.mte = int(slab[k, wb.F_MTE])
                    ez.mte_q = int(slab[k, wb.F_MTEQ])
                    ez.score = int(slab[k, wb.F_SCORE])
                    ez.zdropped = bool(slab[k, wb.F_ZDROP])
                    results[i] = ez
                continue
            Qs, Ts, qls, tls, jn = s["args"]
            out = _cigar_batch_finish_exts(slab, s["MAXR"], B, qls, tls,
                                           flag, s["min_intron"])
            if out is None:       # RLE overflow: sync re-run, full fetch
                out = _exts_batch_align_fullfetch(
                    Qs, Ts, qls, tls, m, mat, q, e, q2, noncan,
                    zdrop=zdrop, junc_bonus=junc_bonus, flag=flag, junc=jn)
            for k, i in enumerate(sub):
                results[i] = out[k]


__all__ = ["AlignJob", "align_batch_scores", "align_batch_scores_async",
           "align_batch_scores2", "align_batch_scores2_async",
           "PendingScores", "PendingAligns", "align_batch",
           "align_batch_async", "align_batch_splice",
           "align_batch_splice_async"]
