"""Single-device batched backend: the TPU-native "NoDistribution".

Where the reference's control path runs a triple-nested host loop over
(ref file x ref x read) with one serial matrix fill per pair
(``src/sw/Distribution.java:578-616``), this backend:

- buckets reads and references by padded length (SURVEY.md §7 hard part
  (c): variable-length batching without wasted FLOPs),
- scores all (read, ref) combinations of a bucket pair in one
  ``score_grid`` call on device (O(N) memory per pair, no traceback
  state), and
- runs the O(M·N)-memory ``fill_pairs`` + traceback only for winning
  references (the reference computes tracebacks for every pair and then
  discards the losers; the surviving result set is identical).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

import jax

from sparksmithwaterman_tpu.config import AlignConfig, ScoringScheme
from sparksmithwaterman_tpu.io.fasta import READ_PAD, REF_PAD, encode_batch
from sparksmithwaterman_tpu.io.report import Site
from sparksmithwaterman_tpu.ops import fill_pairs, score_grid, sites_from_fill
from sparksmithwaterman_tpu.ops.device_traceback import (
    fill_and_trace,
    path_cap,
    sites_from_trace,
)
from sparksmithwaterman_tpu.ops.pallas_score import (
    diag_read_block as _diag_read_block,
    pallas_score_grid,
    pallas_score_grid_diag,
    pallas_score_grid_diag_chunked,
    plan_diag,
)
from sparksmithwaterman_tpu.utils.profiling import GcupsCounter

# Max-cell ties handled on device per pair; beyond this the pair falls
# back to the host walk.
_TRACE_CAPACITY = 64


@jax.jit
def _col_sums(scores):
    """(R, C) device score grid -> (C,) per-ref column sums, on device."""
    return scores.sum(axis=0)

# Element budget for the (R, C, N) DP state of one score_grid call
# (int32 words).
_SCORE_BUDGET = 1 << 24
# Element budget for the (B, M, N) fill of one traceback call.  Raised
# 2^24 -> 2^26 in round 5: at 20k reads x one ~2 kb winner the fill
# budget set b_block=32 and the winner traceback paid 625 chunk
# dispatches per pass (24% of the pipeline wall); 128-read chunks cut
# that 4x at ~870 MB of transient fill state per dispatch — well within
# HBM, and only the (B, capacity, 4m) outputs stay pinned.
_FILL_BUDGET = 1 << 26

# Per-dispatch column sums are int32 on device; a dispatch's read count
# is capped so r * match * m_pad stays below this (margin of 2^24 under
# 2^31), making the device accumulation exact.  Cross-dispatch
# accumulation is int64 on the host.
_INT32_SAFE = (1 << 31) - (1 << 24)

# Element budget for the wavefront kernel's (C, M+N, M) HBM window table
# (int32 words; 1<<27 = 512MB).  The diag kernel holds no (R, C, N)
# state, so its per-call ref count is bounded by this instead of
# _SCORE_BUDGET — fewer, larger calls amortize dispatch + table build.
_TABLE_BUDGET = 1 << 27

# Element budget for one packed dispatch's (C, ROWS, M) per-lane OUTPUT
# (int32 words; 1<<28 = 1 GB).  At small read sets the window table is
# the binding constraint, but the output scales with the pack: at 100k
# reads (47,904 rows x m=256) a table-budget chunk of 512 refs would
# materialize a 25 GB lane-best buffer — an HBM OOM the round-5
# read-scale run hit.  With the 4-deep dispatch backpressure at most a
# few of these are ever live.
_OUT_BUDGET = 1 << 28

# Beyond this padded ref length the whole-table wavefront kernel's
# (M+N, M) VMEM window no longer fits; stream it in chunks instead.
_CHUNKED_REF_N = 8192


def _pad_len(n: int, bucket: int) -> int:
    return max(bucket, -(-n // bucket) * bucket)


def _quantize(n: int, base: int) -> int:
    """Round up to base * 2^k — bounds the set of compiled batch shapes
    logarithmically (every distinct shape is a fresh XLA compile; through
    a remote-compile TPU tunnel that costs minutes)."""
    q = base
    while q < n:
        q *= 2
    return q


def _quantize_15(n: int, base: int) -> int:
    """Round up to base * {2^k or 1.5 * 2^k} (1.5 only when a multiple
    of base, i.e. from 3*base upward).

    Same O(log) bound on compiled shapes as :func:`_quantize` but the
    worst-case padding drops from 2x to 1.33x (mean ~1.15x) — on the
    totals path padding waste, not kernel rate, dominates real-cell
    GCUPS (measured 3.1x padded/real cells on mixed 80-200bp reads x
    500-4000bp refs under pure powers of two)."""
    q = base
    while q < n:
        q15 = q + q // 2
        if n <= q15 and q15 % base == 0:
            return q15
        q *= 2
    return q


def _choose_fold(c: int, rows: int) -> int:
    """References folded per program for the multi-ref chunked kernel
    (``ops.pallas_score.pallas_lane_best_packed_multi``).

    The chunked kernels' serial diagonal chain is latency-bound below
    ~256 state rows, and grid programs run sequentially on one
    TensorCore — so a few-reads dispatch (bench_longref: 64 reads -> 32
    packed rows) pays C full-length chains at a fraction of the VPU
    width.  Fold enough refs to reach ~256 rows; among folds, minimize
    serial chains first (wall time ∝ chains while latency-bound), then
    all-pad ref waste (pad refs cost a full sweep in this kernel)."""
    target = 256 // max(1, rows)
    if target < 2 or c < 2:
        return 1
    best_cf, best_cost = 1, None
    for cf in range(2, min(c, target) + 1):
        c_pad = -(-c // cf) * cf
        cost = (c_pad // cf, c_pad)
        if best_cost is None or cost < best_cost:
            best_cf, best_cost = cf, cost
    return best_cf


def _pad_rows(arr: np.ndarray, rows: int, fill: int) -> np.ndarray:
    if arr.shape[0] == rows:
        return arr
    pad = np.full((rows - arr.shape[0],) + arr.shape[1:], fill, arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def _group_by_padded_len(
    seqs: Sequence[str], bucket: int, geometric: bool = False
) -> Dict[int, List[int]]:
    """Group sequence indices by padded length.

    ``geometric=True`` pads to bucket * {1, 1.5} * 2^k instead of
    multiples of bucket: worst-case 1.33x padded FLOPs, but the number
    of groups — and with it per-dispatch overhead (host->device RTT,
    window-table builds, kernel launches; ~2-3 ms each through a remote
    TPU tunnel) — drops from O(max_len/bucket) to
    O(log(max_len/bucket)).  Measured on mixed 500-4000bp refs: linear
    buckets 93 GCUPS, pure power-of-2 geometric 154 GCUPS end-to-end;
    the 1.5-mantissa ladder cuts the ref-axis padding from a measured
    1.36x to <=1.15x at one extra group per octave.
    """
    groups: Dict[int, List[int]] = {}
    for idx, s in enumerate(seqs):
        key = _quantize_15(len(s), bucket) if geometric else _pad_len(len(s), bucket)
        groups.setdefault(key, []).append(idx)
    return groups


class BatchBackend:
    """Vectorized single-host backend (works on TPU, CPU, any JAX device)."""

    def __init__(self, config: AlignConfig):
        self.scoring: ScoringScheme = config.scoring
        self.read_bucket = config.read_bucket
        self.ref_bucket = config.ref_bucket
        self.read_block = config.read_block
        # The Pallas kernel runs compiled on TPU; elsewhere (CPU tests)
        # the lax implementation is the fast path.
        self.use_pallas = config.use_pallas and jax.default_backend() == "tpu"
        self.kernel = config.kernel
        self.pack = config.pack_reads
        self._params = tuple(
            np.int32(v) for v in (self.scoring.match, self.scoring.mismatch, self.scoring.gap)
        )
        # Python-int copy for static (compile-time) kernel parameters.
        self._params_static = (
            self.scoring.match, self.scoring.mismatch, self.scoring.gap
        )
        # DP-fill performance counter (real cells = sum |read|*|ref|,
        # excluding padding — the honest GCUPS of SURVEY.md §5).
        self.gcups = GcupsCounter()
        # Corrected unroll per kernel-shape key after a real Mosaic
        # scoped-VMEM RESOURCE_EXHAUSTED (the VMEM model mispredicted);
        # see _vmem_retry.  VERDICT r2 task 5.
        self._unroll_override: Dict[tuple, int] = {}
        # Pack cache for the LAST reads batch (identity + len + total-bp
        # checked): the pipeline calls totals/best_of once per ref-file
        # flush with the SAME reads list for a whole input file, and
        # first-fit packing 100K reads in Python per flush would
        # dominate host time.  The total-bp fingerprint catches in-place
        # element mutation of the same list object (same id, same len —
        # the advisor-flagged silent-stale hazard) for any edit that
        # changes a length; same-length content swaps remain covered
        # only by the frozen-list contract in the docstring.
        self._pack_cache: Tuple[object, int, int, int, List[dict]] = (
            None, -1, -1, 0, []
        )

    @staticmethod
    def _is_vmem_oom(e: Exception) -> bool:
        """True only for Mosaic SCOPED-VMEM exhaustion ("Ran out of
        memory in memory space vmem") — the one failure a smaller
        unroll can fix.  A generic RESOURCE_EXHAUSTED (e.g. HBM OOM
        while allocating a device buffer) must propagate immediately:
        halving the unroll cannot shrink HBM outputs, and the retry
        ladder would just burn compile cycles before re-raising."""
        s = str(e)
        return "RESOURCE_EXHAUSTED" in s and "vmem" in s.lower()

    def _vmem_retry(self, key: tuple, fn):
        """Run ``fn(unroll)``, halving the unroll on a Mosaic scoped-VMEM
        RESOURCE_EXHAUSTED until the kernel compiles (mispredictions of
        the calibrated model on untested chip generations degrade to a
        smaller unroll instead of crashing the pipeline).  The correction
        is cached per shape key for the session."""
        unroll = self._unroll_override.get(key, 64)
        while True:
            try:
                return fn(unroll)
            except Exception as e:  # noqa: BLE001 - filtered below
                if not self._is_vmem_oom(e) or unroll <= 2:
                    raise
                unroll = max(2, unroll // 2)
                self._unroll_override[key] = unroll

    def _score_grid_dev(self, reads_enc: np.ndarray, refs_enc: np.ndarray):
        """(R_pad, C_pad) score grid as a DEVICE array (not fetched).

        Ref rows quantize to 8*2^k; read rows to the 1.5-mantissa
        ladder 8*{2^k, 1.5*2^k} (see ``_quantize_15`` — row padding
        costs real FLOPs there).  Padding rows/cols score exactly 0 —
        pad codes match nothing and mismatch/gap < 0 — so repeated
        calls with ragged batch sizes reuse a small set of compiled
        programs.  Callers slice the padding off after fetching (or
        never: padded rows contribute 0 to column sums).
        """
        r, c = reads_enc.shape[0], refs_enc.shape[0]
        refs_enc = _pad_rows(refs_enc, _quantize_15(c, 8), REF_PAD)
        if self.use_pallas and self.kernel == "diag":
            # Wavefront kernel: rows quantize on the finer 1.5-mantissa
            # ladder (row padding costs real FLOPs; see _quantize_15)
            # and the read block is the largest fitting divisor.
            m_pad, n_pad = reads_enc.shape[1], refs_enc.shape[1]
            r_q = _quantize_15(r, 8)
            rb = _diag_read_block(r_q, m_pad)
            reads_enc = _pad_rows(reads_enc, r_q, READ_PAD)
            # Stream the window when the whole-table form can't fit
            # scoped VMEM (long refs, or wide reads where the
            # triple-buffered (t_pad, m) window alone blows the limit).
            if n_pad > _CHUNKED_REF_N or plan_diag(rb, m_pad, n_pad) is None:
                return self._vmem_retry(
                    ("chunked", rb, m_pad, n_pad),
                    lambda u: pallas_score_grid_diag_chunked(
                        reads_enc, refs_enc, *self._params,
                        read_block=rb, unroll=u,
                    ),
                )
            return self._vmem_retry(
                ("whole", rb, m_pad, n_pad),
                lambda u: pallas_score_grid_diag(
                    reads_enc, refs_enc, *self._params,
                    read_block=rb, unroll=u,
                ),
            )
        if self.use_pallas:
            reads_enc = _pad_rows(
                reads_enc, _quantize(r, self.read_block), READ_PAD
            )
            return pallas_score_grid(
                reads_enc, refs_enc, *self._params, read_block=self.read_block
            )
        reads_enc = _pad_rows(reads_enc, _quantize(r, 8), READ_PAD)
        return score_grid(reads_enc, refs_enc, *self._params)

    def _col_sums_dev(self, reads_enc: np.ndarray, refs_enc: np.ndarray):
        """(C_pad,) per-reference column sums as a DEVICE array.

        The dispatch unit of ``totals``; ShardedBackend overrides this
        with the mesh-sharded psum merge."""
        return _col_sums(self._score_grid_dev(reads_enc, refs_enc))

    # -- hot path ---------------------------------------------------------

    def totals(self, reads: Sequence[str], ref_seqs: Sequence[str]) -> np.ndarray:
        """Per-reference totals with PIPELINED dispatch.

        Each chunk's column sums are reduced on device and fetched only
        after every chunk has been dispatched: the host never blocks
        between chunks, so encoding/window-table prep of chunk k+1
        overlaps device compute of chunk k (a fetch-per-chunk version
        measured 25 GCUPS on mixed-length workloads where this one
        reaches the kernel rate).  Padded read ROWS score exactly 0, so
        they are harmless in the column sums; padded ref COLUMNS are
        dropped by indexing with the real chunk indices.
        """
        totals = np.zeros(len(ref_seqs), dtype=np.int64)
        if not reads or not ref_seqs:
            return totals
        with self.gcups.measure_lazy() as done:
            pending, total_cells = self._dispatch_cols(reads, ref_seqs)
            # ONE device concat + ONE fetch: each np.asarray is a
            # blocking round-trip (tens of ms via a remote TPU tunnel).
            if len(pending) == 1:
                cols = [np.asarray(pending[0][1])]
            elif pending:
                import jax.numpy as jnp

                flat = np.asarray(jnp.concatenate([col for _, col in pending]))
                cols, off = [], 0
                for _, col in pending:
                    cols.append(flat[off : off + col.shape[0]])
                    off += col.shape[0]
            for (chunk, _), col in zip(pending, cols):
                # Exact: the dispatch loop bounds each int32 sum.
                totals[chunk] += col[: len(chunk)].astype(np.int64)
            done(total_cells)
        return totals

    def best_of(
        self, reads: Sequence[str], ref_seqs: Sequence[str]
    ) -> Tuple[int, List[int]]:
        """(best_total, tie_indices) with the winner reduction ON DEVICE.

        Host traffic is one scalar + a C-byte tie mask instead of C
        int64 totals — the DistributeReference merge
        (``src/sw/Distribution.java:341-353``) without collecting every
        (score, ref, sites) tuple to the driver.  Tie indices ascend =
        encounter order (the reference's ``==``-appends).
        """
        return self.best_of_async(reads, ref_seqs)()

    def best_of_async(self, reads, ref_seqs):
        """Dispatch ``best_of`` and return a ``resolve() -> (best,
        ties)`` closure that blocks on the single host fetch.

        The fetch round-trip through a remote-TPU tunnel costs tens of
        ms regardless of payload; the pipeline double-buffers flushes by
        resolving flush k only after dispatching flush k+1, hiding the
        device tail + fetch latency behind the next flush's host work
        (measured ~60 ms/flush of upload+RTT residual on the bench
        workload, experiments/profile_varlen_budget.py).  The GCUPS
        counter records the dispatch window only — the pipeline-level
        wall time lives in the report's exec-time line.
        """
        if not reads or not ref_seqs:
            return lambda: (0, list(range(len(ref_seqs))))
        import jax.numpy as jnp

        with self.gcups.measure_lazy() as done:
            pending, total_cells = self._dispatch_cols(reads, ref_seqs)
            # Device-side per-ref accumulation.  A ref's total can span
            # several read-chunk dispatches and exceed int32 (the same
            # bound the host path handles in int64); with x64 disabled
            # the accumulator is a (uint32 lo, int32 hi) carry pair —
            # each dispatch's col is < 2^31 by the r_limit guard.
            c = len(ref_seqs)
            lo = jnp.zeros(c, jnp.uint32)
            hi = jnp.zeros(c, jnp.int32)
            for chunk, col in pending:
                idx = jnp.asarray(np.asarray(chunk))
                add = col[: len(chunk)].astype(jnp.uint32)
                new_lo = lo.at[idx].add(add)
                carry = (new_lo < lo).astype(jnp.int32)
                lo, hi = new_lo, hi + carry
            # Lexicographic (hi, lo) max + tie mask, packed into ONE
            # fetch (a host round-trip costs ~43ms through the remote
            # TPU tunnel; three scalar fetches would triple that).
            best_hi = jnp.max(hi)
            mask_hi = hi == best_hi
            best_lo = jnp.max(jnp.where(mask_hi, lo, 0))
            combined_dev = jnp.concatenate(
                [
                    (mask_hi & (lo == best_lo)).astype(jnp.int32),
                    jnp.stack([best_hi, best_lo.astype(jnp.int32)]),
                ]
            )
            try:  # start the host copy while the caller keeps working
                combined_dev.copy_to_host_async()
            except Exception:  # pragma: no cover - backend-dependent
                pass
            done(total_cells)

        def resolve() -> Tuple[int, List[int]]:
            combined = np.asarray(combined_dev)
            mask = combined[:c]
            best = (int(combined[c]) << 32) | (
                int(combined[c + 1]) & 0xFFFFFFFF
            )
            return best, [int(i) for i in np.flatnonzero(mask)]

        return resolve

    def _dispatch_cols(self, reads, ref_seqs):
        """Dispatch every (read-chunk x ref-chunk) scoring call, PIPELINED
        (device col sums are not fetched here), and return
        ([(ref_chunk_indices, device_col_sums), ...], total_real_cells).

        The packed wavefront path bins reads into kernel rows
        (``ops/packing``) — one dispatch per ref chunk regardless of
        read-length spread; other paths bucket reads by padded length.
        int32 overflow guard: each dispatch's read set is capped so
        r * match * m_pad < 2^31 - 2^24 keeps device sums exact.
        """
        diag_path = self.use_pallas and self.kernel == "diag"
        ref_groups = _group_by_padded_len(ref_seqs, self.ref_bucket, geometric=True)
        total_cells = 0
        pending: List[Tuple[List[int], object]] = []
        r_limit = max(1, _INT32_SAFE // max(1, self.scoring.match))
        if diag_path and self.pack and self._use_varlen:
            # VARLEN dispatch: no length-ladder grouping.  References
            # sorted by descending length are chunked only by the
            # byte-packed window-table budget; the kernel runs each
            # reference's true diagonal count (scalar-prefetched loop
            # bounds), so a mixed flush is ONE dispatch per read tier
            # with ~zero ref-length padding — the ladder's measured
            # ~17% padded waste plus ~2.8 ms/dispatch fixed cost
            # collapse to one.
            packs = self._pack_chunks(reads, r_limit)
            order = sorted(
                range(len(ref_seqs)), key=lambda i: (-len(ref_seqs[i]), i)
            )
            for pack in packs:
                m_pack = pack["m_pack"]
                # Corpus-scale flushes (more refs than one table-budget
                # chunk) use ONE global n_pad: every dispatch of the
                # flush then shares a single (rows, C, t4) kernel shape
                # and a single window-build shape.  Per-tier n_pads
                # minted ~6 Mosaic + ~6 XLA shapes per corpus run, each
                # costing a remote compile-service round trip per
                # process (~244 s of warmup measured, 57% of a 1 Gbp
                # run); the price is REF_PAD-wider encodes/uploads for
                # short refs (~+0.3 s per 31 Mbp flush at ~65 MB/s) —
                # the kernel itself runs per-ref loop bounds either
                # way, so its time is unchanged.  Small ref sets keep
                # the per-chunk n_pad (tight windows, one chunk).
                n_pad_g = _quantize_15(
                    max(self.ref_bucket, len(ref_seqs[order[0]])),
                    self.ref_bucket,
                )
                words_g = max(1, (n_pad_g + m_pack) * m_pack // 4)
                out_per_ref = max(1, pack["rows"] * m_pack)
                c_block_g = max(
                    1,
                    min(
                        _TABLE_BUDGET // words_g,
                        _OUT_BUDGET // out_per_ref,
                    ),
                )
                canonical = len(order) > c_block_g
                start = 0
                while start < len(order):
                    if canonical:
                        n_pad, c_block = n_pad_g, c_block_g
                    else:
                        n_pad = _quantize_15(
                            max(self.ref_bucket, len(ref_seqs[order[start]])),
                            self.ref_bucket,
                        )
                        words_per_ref = max(
                            1, (n_pad + m_pack) * m_pack // 4
                        )
                        c_block = max(
                            1,
                            min(
                                _TABLE_BUDGET // words_per_ref,
                                _OUT_BUDGET // out_per_ref,
                            ),
                        )
                    # One maximal chunk per table budget — splitting at
                    # length-halving boundaries (smaller window DMA per
                    # short-ref program) was measured WORSE: ~17 ms of
                    # per-dispatch fixed cost per extra chunk vs ~1 ms
                    # of window traffic saved.
                    chunk = order[start : start + c_block]
                    start += len(chunk)
                    refs_enc = encode_batch(
                        [ref_seqs[i] for i in chunk], n_pad, REF_PAD
                    )
                    lens = np.array(
                        [len(ref_seqs[i]) for i in chunk], np.int32
                    )
                    total_cells += pack["read_bp"] * int(lens.sum())
                    # Canonical chunk shape per length tier: a TAIL
                    # chunk pads up to the tier's full chunk size (pad
                    # refs cost ONE loop body each).  Without this,
                    # every flush of a corpus-scale run mints fresh
                    # tail (C, n_pad) compile shapes — measured
                    # hundreds of seconds of compile-service round
                    # trips over a 1 Gbp corpus.  min(len(order), ...)
                    # keeps small total ref sets (e.g. the bench e2e
                    # workload) at their own ladder shape.
                    c_target = min(c_block, len(order))
                    pending.append(
                        (
                            chunk,
                            self._packed_col_sums_varlen(
                                pack, refs_enc, lens, c_target=c_target
                            ),
                        )
                    )
                    # Backpressure: each queued dispatch pins its
                    # window table (~570 MB at the canonical corpus
                    # shape) in HBM until executed; an unbounded host
                    # lead OOM'd the runtime at ~28 in-flight
                    # dispatches (FailedPrecondition on a 1 Gbp flush).
                    # Waiting on the dispatch 4 back keeps at most a
                    # few tables live while preserving the pipeline.
                    if len(pending) >= 4:
                        jax.block_until_ready(pending[-4][1])
            return pending, total_cells
        if diag_path and self.pack:
            # Grouped (length-ladder) packed dispatch: the sharded
            # backend's path (its _packed_col_sums runs on the mesh).
            packs = self._pack_chunks(reads, r_limit)
            for n_pad, ref_idx in sorted(ref_groups.items()):
                for pack in packs:
                    m_pack = pack["m_pack"]
                    budget = min(
                        _TABLE_BUDGET // max(1, (n_pad + m_pack) * m_pack),
                        _OUT_BUDGET // max(1, pack["rows"] * m_pack),
                    )
                    c_block = max(1, min(len(ref_idx), budget))
                    for start in range(0, len(ref_idx), c_block):
                        chunk = ref_idx[start : start + c_block]
                        refs_enc = encode_batch(
                            [ref_seqs[i] for i in chunk], n_pad, REF_PAD
                        )
                        total_cells += pack["read_bp"] * sum(
                            len(ref_seqs[i]) for i in chunk
                        )
                        pending.append(
                            (chunk, self._packed_col_sums(pack, refs_enc))
                        )
            return pending, total_cells
        read_groups = _group_by_padded_len(reads, self.read_bucket)
        for n_pad, ref_idx in sorted(ref_groups.items()):
            for m_pad, all_read_idx in sorted(read_groups.items()):
                r_block = max(1, r_limit // m_pad)
                for rs in range(0, len(all_read_idx), r_block):
                    read_idx = all_read_idx[rs : rs + r_block]
                    r = len(read_idx)
                    reads_enc = encode_batch(
                        [reads[i] for i in read_idx], m_pad, READ_PAD
                    )
                    if diag_path:
                        budget = _TABLE_BUDGET // max(1, (n_pad + m_pad) * m_pad)
                    else:
                        budget = _SCORE_BUDGET // max(1, r * n_pad)
                    c_block = max(1, min(len(ref_idx), budget))
                    for start in range(0, len(ref_idx), c_block):
                        chunk = ref_idx[start : start + c_block]
                        refs_enc = encode_batch(
                            [ref_seqs[i] for i in chunk], n_pad, REF_PAD
                        )
                        total_cells += sum(
                            len(reads[i]) for i in read_idx
                        ) * sum(len(ref_seqs[i]) for i in chunk)
                        pending.append(
                            (chunk, self._col_sums_dev(reads_enc, refs_enc))
                        )
        return pending, total_cells

    # -- packed wavefront path ---------------------------------------------

    # Packed rows must divide evenly into per-device shards on the
    # sharded backend; 8 is the Pallas grid divisor on one device.
    _pack_row_multiple = 8

    # Every backend takes the varlen dispatch (scalar-prefetched
    # per-ref loop bounds, no length ladder): ShardedBackend inherits
    # _use_varlen=True and overrides _packed_col_sums_varlen with its
    # mesh-sharded form (parallel/engine.py), so the round-3 hot path
    # runs ON the mesh there — do not "fix" this flag off for the
    # sharded backend; that would silently drop its hot path.
    _use_varlen = True

    @staticmethod
    def _pack_read_block(rows: int, m_pack: int) -> int:
        """Largest read_block (multiple of 8) dividing ``rows`` within
        the rb*m VMEM heuristic."""
        from sparksmithwaterman_tpu.ops.pallas_score import diag_read_block

        rb = diag_read_block(rows, m_pack)
        while rows % rb:
            rb -= 8
        return max(8, rb)

    def _pack_chunks(self, reads: Sequence[str], r_limit: int) -> List[dict]:
        """Bin reads into packed kernel rows (``ops/packing``), split
        into chunks whose total base pairs respect the int32 bound.

        Memoized on the reads OBJECT (`is`-checked): one pack per input
        file, not one per (input file x ref-file flush).  A REBUILT
        list repacks; in-place mutation of the same list would NOT be
        seen by the identity check alone, so the key also carries
        len(reads) and the total base-pair count as cheap tripwires —
        callers must still treat a reads list as frozen once dispatched
        (the pipeline builds a fresh list per input file); a same-length
        same-bp content swap is the one mutation the fingerprint cannot
        see."""
        from sparksmithwaterman_tpu.ops.packing import pack_reads

        total_bp = sum(len(r) for r in reads)
        (
            cached_obj, cached_len, cached_bp, cached_limit, cached_packs,
        ) = self._pack_cache
        if (
            cached_obj is reads
            and cached_len == len(reads)
            and cached_bp == total_bp
            and cached_limit == r_limit
        ):
            return cached_packs

        # Single tier: every read packs at one lane width sized by the
        # longest read.  A dual-tier split (<=128bp reads at m=128 for
        # the single-tile roll geometry) was measured WORSE on the
        # mixed 80-150bp workload: removing the short reads from the
        # wide rows destroys the bin-packing fill (129-150bp reads
        # cannot pair within 256 lanes -> 1.92x lane waste vs 1.07x
        # mixed), costing more than the faster geometry recovers.  The
        # interleaved lane layout (ops/pallas_score) attacks the wide-
        # row roll cost directly instead.
        import os

        # SWTPU_DUAL_TIER=1: the A/B knob for re-testing the rejected
        # per-length tier split at read scale (experiments/
        # dualtier_ab.py; VERDICT r4 task 5).  The dual config drops the
        # tier floor to one 128-lane tile so <=128bp reads take the
        # single-tile roll geometry — the round-3 hypothesis — while
        # the shipped single-tier config packs everything at the widest
        # tier (the 512-read measurement showed the split destroys
        # bin-packing fill: 129-150bp reads cannot pair in 256 lanes).
        dual = bool(os.environ.get("SWTPU_DUAL_TIER"))
        m_floor = max(self.read_bucket if dual else 2 * self.read_bucket, 128)
        tiers: Dict[int, List[int]] = {}
        for i, r in enumerate(reads):
            m_tier = m_floor
            while m_tier < len(r):
                m_tier *= 2
            tiers.setdefault(m_tier, []).append(i)
        if len(tiers) > 1 and not dual:
            # collapse to the widest tier (see above)
            m_top = max(tiers)
            tiers = {m_top: sorted(i for t in tiers.values() for i in t)}

        packs: List[dict] = []

        def close(m_pack: int, chunk_idx: List[int]):
            if not chunk_idx:
                return
            # Round the row multiple up toward the kernel's preferred
            # read block so big packs land on a divisible row count
            # (47880 rows from a 100K-read pack would otherwise force
            # read_block down to an awkward divisor); all-pad rows
            # score exactly 0.
            from sparksmithwaterman_tpu.ops.pallas_score import (
                diag_read_block,
            )

            est_rows = max(
                1, sum(max(1, len(reads[i])) for i in chunk_idx) // m_pack
            )
            rb_t = diag_read_block(
                -(-est_rows // 8) * 8, m_pack
            )
            row_multiple = self._pack_row_multiple
            # lcm-round the row count toward the kernel's preferred
            # block ONLY for multi-block packs (rounding adds < rb_t
            # rows, ~free at est_rows >> rb_t).  At est_rows ~ rb_t a
            # single natural block is already ideal — the old
            # `est_rows >= rb_t` trigger DOUBLED a 248-row pack to 464
            # (2.0x lane waste) the moment read bp crossed the est_rows
            # == rb_t edge: the round-4 corpus read set sat one row
            # past it and every flush paid 2x padded kernel work.
            if est_rows >= 4 * rb_t and rb_t > row_multiple:
                row_multiple = int(
                    rb_t * row_multiple // np.gcd(rb_t, row_multiple)
                )
            packed, start_idx = pack_reads(
                [reads[i] for i in chunk_idx], m_pack,
                row_multiple=row_multiple,
            )
            # Upload once; every ref-group dispatch reuses the device
            # array (a fresh numpy arg would re-upload per dispatch —
            # ~7.5ms of host blocking each through the remote tunnel).
            packs.append(
                dict(
                    m_pack=m_pack,
                    rows=packed.shape[0],
                    packed=jax.device_put(packed),
                    start_idx=jax.device_put(start_idx),
                    read_idx=list(chunk_idx),
                    read_bp=sum(len(reads[i]) for i in chunk_idx),
                )
            )

        for m_pack, tier_idx in sorted(tiers.items()):
            budget = max(m_pack, r_limit)  # sum of lens per dispatch
            chunk_idx: List[int] = []
            chunk_bp = 0
            for i in tier_idx:
                if chunk_idx and chunk_bp + max(1, len(reads[i])) > budget:
                    close(m_pack, chunk_idx)
                    chunk_idx = []
                    chunk_bp = 0
                chunk_idx.append(i)
                chunk_bp += max(1, len(reads[i]))
            close(m_pack, chunk_idx)
        self._pack_cache = (reads, len(reads), total_bp, r_limit, packs)
        return packs

    def _start_phys(self, pack: dict):
        """Physical (interleaved-layout) start indices, cached on the
        pack — the free alternative to de-interleaving kernel output."""
        if "start_phys" not in pack:
            from sparksmithwaterman_tpu.ops.pallas_score import (
                varlen_start_phys,
            )

            pack["start_phys"] = jax.device_put(
                varlen_start_phys(
                    np.asarray(pack["start_idx"]), pack["m_pack"]
                )
            )
        return pack["start_phys"]

    def _packed_col_sums(self, pack: dict, refs_enc: np.ndarray):
        """(C_pad,) per-ref column sums for one packed read chunk."""
        from sparksmithwaterman_tpu.ops.packing import packed_col_sums
        from sparksmithwaterman_tpu.ops.pallas_score import (
            pallas_lane_best_packed,
            pallas_lane_best_packed_multi,
            plan_multi,
        )

        from sparksmithwaterman_tpu.ops.pallas_score import plan_diag

        rows, m_pack = pack["rows"], pack["m_pack"]
        rb = self._pack_read_block(rows, m_pack)
        # Few-rows dispatches (long-ref workloads: few reads, the varlen
        # plan can't fit) FOLD several refs into one program so their
        # wavefronts share a serial diagonal chain — the chunked kernel
        # is latency-bound below ~256 rows (measured 54.5 -> 200+ GCUPS
        # on the 64-read x 8x131kb bench shape).  Even at cf=1, a ref
        # past the whole-table regime takes the multi kernel: its BYTE-
        # PACKED window is 4x smaller than the legacy chunked kernel's
        # unpacked table (1.07 GB per 1 Mb ref — several in the 4-deep
        # pipeline OOM'd HBM on the round-5 mixed-long-ref run).
        cf = _choose_fold(refs_enc.shape[0], rows)
        use_multi = plan_multi(rb, m_pack, cf) is not None and (
            cf > 1
            or refs_enc.shape[1] > _CHUNKED_REF_N
            or plan_diag(rb, m_pack, refs_enc.shape[1]) is None
        )
        if use_multi:
            c_pad = -(-refs_enc.shape[0] // cf) * cf
            refs_enc = _pad_rows(refs_enc, c_pad, REF_PAD)
            lane = self._vmem_retry(
                ("multi", rb, cf, m_pack, refs_enc.shape[1]),
                lambda u: pallas_lane_best_packed_multi(
                    pack["packed"], refs_enc, *self._params_static,
                    read_block=rb, cf=cf, unroll=u, deinterleave=False,
                ),
            )
            return packed_col_sums(lane, self._start_phys(pack))
        # C pads to ceil-8 (not the 1.5 ladder): big flushes dispatch
        # fixed c_block chunks anyway (compile-stable), and ladder
        # padding on the LAST chunk costs real window+kernel work
        # (33 refs -> 48 = +45%); the compile cache absorbs the
        # residual shape variety.
        refs_enc = _pad_rows(
            refs_enc, -(-refs_enc.shape[0] // 8) * 8, REF_PAD
        )
        lane = self._vmem_retry(
            ("packed", rb, pack["m_pack"], refs_enc.shape[1]),
            lambda u: pallas_lane_best_packed(
                pack["packed"], refs_enc, *self._params_static,
                read_block=rb, unroll=u,
            ),
        )
        return packed_col_sums(lane, pack["start_idx"])

    def _packed_col_sums_varlen(
        self, pack: dict, refs_enc: np.ndarray, lens: np.ndarray,
        c_target: int = 0,
    ):
        """(C_pad,) per-ref column sums for one packed read chunk vs a
        MIXED-length ref chunk (one varlen dispatch; see
        ``ops.pallas_score.pallas_lane_best_packed_varlen``).

        ``c_target``: pad the ref count at least this far (ladder-
        quantized) so tail chunks reuse their tier's full-chunk compile
        shape — see the canonical-shape note in ``_dispatch_cols``."""
        from sparksmithwaterman_tpu.ops.packing import packed_col_sums
        from sparksmithwaterman_tpu.ops.pallas_score import (
            pallas_lane_best_packed_varlen,
        )

        from sparksmithwaterman_tpu.ops.pallas_score import plan_varlen

        rb_probe = self._pack_read_block(pack["rows"], pack["m_pack"])
        if plan_varlen(rb_probe, pack["m_pack"], refs_enc.shape[1]) is None:
            # Giant-read corner: no varlen config fits scoped VMEM
            # (e.g. m_pack >= 8k lanes).  The grouped kernel's chunked
            # window form still works — correctness over speed.
            return self._packed_col_sums(pack, refs_enc)
        c = refs_enc.shape[0]
        c_pad = _quantize_15(max(c, c_target, 8), 8)
        if c_pad != c:
            # Padding refs cost ONE loop body each (the varlen wrapper
            # pins nb=1 for lens==0 — all-REF_PAD windows score 0), so
            # the ladder-quantized C keeps compile shapes few at ~zero
            # device cost (unlike the table kernel, where a pad ref
            # costs the full diagonal sweep).
            refs_enc = _pad_rows(refs_enc, c_pad, REF_PAD)
            lens = np.concatenate(
                [lens, np.zeros(c_pad - c, np.int32)]
            )
        rb = self._pack_read_block(pack["rows"], pack["m_pack"])
        lane = self._vmem_retry(
            ("varlen", rb, pack["m_pack"], refs_enc.shape[1]),
            lambda u: pallas_lane_best_packed_varlen(
                pack["packed"], refs_enc, lens, *self._params_static,
                read_block=rb, unroll=u, deinterleave=False,
            ),
        )
        # Gather with PHYSICAL indices instead of de-interleaving the
        # (C, ROWS, M) output — the transpose's bytes scale with C
        # (measured ~50 ms at C=576 on the equal-work scan).
        return packed_col_sums(lane, self._start_phys(pack))

    # -- traceback path ----------------------------------------------------

    def sites_for_ref(self, ref_seq: str, reads: Sequence[str]) -> List[Site]:
        per_read: List[List[Site]] = [[] for _ in reads]
        if not reads:
            return []
        n_pad = _pad_len(len(ref_seq), self.ref_bucket) if ref_seq else self.ref_bucket
        # Windowed/batched mode: find max cells with ONE device argmax
        # pass and re-fill only bounded windows (ops/longseq.py).  Taken
        # (a) for long references — whenever fewer than 8 pairs fit one
        # full-matrix fill budget; the normal path would degenerate to
        # per-read O(m*n) lax fills (a 131 kb ref sat EXACTLY on the old
        # `n*m > budget` boundary and took ~65 s for one winner) — and
        # (b) for LARGE READ SETS against any reference (round 5): the
        # fill+trace chunk path's max-cell extraction is an argwhere
        # over every (B, M, N) cell whose cost scales with the batch
        # (measured 78 s per winner at 20k reads x 2 kb — 24% of the
        # read-scale pipeline wall), while the argmax kernel pass costs
        # one sweep of the grid at kernel rate.
        max_m = max((len(r) for r in reads), default=0)
        if max_m and (
            8 * n_pad * _pad_len(max_m, self.read_bucket) > _FILL_BUDGET
            or len(reads) >= 1024
        ):
            from sparksmithwaterman_tpu.ops.longseq import (
                find_max_cells_batched,
                sites_for_ref_long_batched,
            )

            # One batched kernel pass finds every read's max cells
            # (vs R sequential row-scan dispatches), then ALL reads'
            # max-cell windows fill in batched dispatches with only the
            # int8 direction planes fetched (the per-read loop paid one
            # dispatch + fetch round trip per read — ~1.1 s each
            # through a remote-TPU tunnel).
            cell_lists = find_max_cells_batched(
                list(reads), ref_seq, self._params,
                backend="pallas" if self.use_pallas else "scan",
            )
            per_read = sites_for_ref_long_batched(
                ref_seq, list(reads), self._params,
                gap_char=self.scoring.gap_char,
                ref_bucket=self.ref_bucket,
                cell_lists=cell_lists,
                tie_semantics=self.scoring.tie_semantics,
            )
            merged: List[Site] = []
            for sites in per_read:
                merged.extend(sites)
            merged.sort(key=lambda s: s[0])
            return merged
        read_groups = _group_by_padded_len(reads, self.read_bucket)
        # PIPELINED: dispatch every chunk's on-device fill+trace first,
        # start all host copies async, resolve after — per-chunk
        # synchronous fetches serialized ~5 round trips each through a
        # remote-TPU tunnel (measured 11.9 s to trace ONE 3.8 kb winner
        # against 512 reads at corpus scale; ~0.6 s pipelined).
        dispatched = []  # (chunk, m_pad, reads_enc, refs_enc, outputs)
        for m_pad, read_idx in sorted(read_groups.items()):
            b_block = max(1, _FILL_BUDGET // max(1, m_pad * n_pad))
            for start in range(0, len(read_idx), b_block):
                chunk = read_idx[start : start + b_block]
                b_q = _quantize(len(chunk), 8)  # stabilize compile shapes
                reads_enc = _pad_rows(
                    encode_batch([reads[i] for i in chunk], m_pad, READ_PAD),
                    b_q,
                    READ_PAD,
                )
                refs_enc = encode_batch([ref_seq] * b_q, n_pad, REF_PAD)
                # On-device traceback: only (cells, begins, path codes)
                # cross to the host.  Pairs whose tie count overflows the
                # capacity fall back to the full-matrix host walk.
                outs = fill_and_trace(
                    reads_enc,
                    refs_enc,
                    *self._params,
                    capacity=_TRACE_CAPACITY,
                    cap=path_cap(m_pad),
                    tie_semantics=self.scoring.tie_semantics,
                )
                dispatched.append((chunk, m_pad, reads_enc, refs_enc, outs))
        for _, _, _, _, outs in dispatched:
            for arr in outs:
                try:
                    arr.copy_to_host_async()
                except Exception:  # pragma: no cover - backend-dependent
                    break
        for chunk, m_pad, reads_enc, refs_enc, outs in dispatched:
            best, counts, cells, begins, codes = outs
            best, counts = np.asarray(best), np.asarray(counts)
            cells, begins = np.asarray(cells), np.asarray(begins)
            codes = np.asarray(codes)
            overflow = [
                k
                for k in range(len(chunk))
                if best[k] > 0 and counts[k] > _TRACE_CAPACITY
            ]
            for k, ridx in enumerate(chunk):
                if k in overflow:
                    continue
                per_read[ridx] = sites_from_trace(
                    int(best[k]),
                    int(counts[k]),
                    cells[k],
                    begins[k],
                    codes[k],
                    ref_seq,
                    reads[ridx],
                    self.scoring.gap_char,
                )
            if overflow:
                h, dirs = fill_pairs(
                    reads_enc,
                    refs_enc,
                    *self._params,
                    tie_semantics=self.scoring.tie_semantics,
                )
                h, dirs = np.asarray(h), np.asarray(dirs)
                for k in overflow:
                    ridx = chunk[k]
                    per_read[ridx] = sites_from_fill(
                        h[k], dirs[k], ref_seq, reads[ridx], self.scoring.gap_char
                    )
        merged: List[Site] = []
        for sites in per_read:  # read order (Distribution.java:589-597)
            merged.extend(sites)
        merged.sort(key=lambda s: s[0])  # stable MatchSiteComp sort
        return merged
