"""Headline benchmark: end-to-end mixed-length alignment throughput.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

- ``value`` is the REAL-cell GCUPS (sum |read|*|ref| / wall time) of the
  shipped hot path — ``BatchBackend.totals`` on a mixed-length workload
  (512 reads of 80-150bp x 256 refs of 500-4000bp), i.e. what
  ``swtpu align`` actually delivers, padding waste and dispatch overhead
  included.  The round-1 headline was the uniform-batch kernel rate,
  which overstated the pipeline by ~3.5x; that rate is still reported as
  ``kernel_gcups``.
- ``vs_baseline`` is the speedup over a measured serial-oracle cell rate
  — the same engine semantics as the reference's ``SmithWaterman``
  control path (``src/sw/Distribution.java:482-634``); the reference
  publishes no numbers of its own (BASELINE.md).
- ``kernel_pct_vpu_sol`` tracks the kernel against a chip-MEASURED
  roofline: the exact wavefront step chain with its window held in
  registers (``ops/microbench.vpu_step_roofline``), not a hand model.
- ``pipeline_gcups`` is the SUSTAINED shipped-pipeline rate (real
  ``run_pipeline`` over a 64 Mbp generated corpus, multi-flush,
  double-buffered); ``longref_gcups`` covers the 131 kb-ref chunked
  path (BASELINE config 5).

Robustness (VERDICT r2 task 1): every rate is measured over REPEATS
independent passes and the JSON carries median + min/max spread plus an
unconditional ``thresholds`` pass/fail status — a degraded environment
(the r02 driver capture ran 4x below the committed floor with
``padding_waste`` < 1, which is physically impossible for a healthy
run) is now distinguishable from a code regression by the spread and
the ``env_suspect`` flag.  ``--check`` additionally exits nonzero on a
threshold failure (the perf gate of VERDICT r1 task 10).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# Committed TPU expectations (v5e, warm).  A failed check means a real
# regression: these were measured on hardware with margin (~10%) below
# the observed steady-state rates.
THRESHOLDS = {
    "kernel_gcups": 330.0,
    "e2e_gcups": 200.0,
    # Sustained run_pipeline over the 64 Mbp generated corpus — measured
    # 238-242 in round 4 (~10% margin).
    "pipeline_gcups": 215.0,
    # 131 kb refs via the round-5 multi-ref folded kernel, SUSTAINED
    # (pipeline-protocol best_of_async overlap; see bench_longref) —
    # measured 248.1 with the eager window build (round 4 shipped 54.5
    # on this workload; the jitted shear build measured 196-207).
    "longref_gcups": 200.0,
    # Same workload, sequential totals() calls (RTT-bound single-flush;
    # measured 85-107 — the spread is the tunnel round trip itself).
    "longref_single_gcups": 60.0,
    # 256 Mbp x 512 reads through run_pipeline — measured 280.3.
    "corpus_gcups": 240.0,
    # 20k reads x 8 Mbp refs through run_pipeline — measured 273.0.
    "readscale_gcups": 230.0,
}

# Upper bounds for latency metrics (warm): regression gates in the
# other direction.  Warm 64-read x 131 kb traceback measured ~1.1 s.
THRESHOLD_CEILINGS = {"longref_traceback_ms": 2500.0}

# Independent measurement passes per metric (each pass itself averages
# or bests several device iterations); the JSON reports the MEDIAN with
# min/max spread so a one-off environment stall cannot masquerade as a
# regression (BENCH_r02 post-mortem).
REPEATS = 3

_BASES = np.array(list("ACGT"))


def _mixed_workload(rng):
    reads = [
        "".join(rng.choice(_BASES, size=int(l)))
        for l in rng.integers(80, 151, size=512)
    ]
    refs = [
        "".join(rng.choice(_BASES, size=int(l)))
        for l in rng.integers(500, 4000, size=256)
    ]
    return reads, refs


def bench_kernel(params, iters=20):
    """Uniform-batch wavefront kernel rate: 512x128bp vs 64x2kb."""
    import jax

    from sparksmithwaterman_tpu.io.fasta import READ_PAD, REF_PAD, encode_batch
    from sparksmithwaterman_tpu.ops.pallas_score import pallas_score_grid_diag
    from sparksmithwaterman_tpu.ops.recurrence import score_grid

    rng = np.random.default_rng(0)
    reads = ["".join(rng.choice(_BASES, size=128)) for _ in range(512)]
    refs = ["".join(rng.choice(_BASES, size=2048)) for _ in range(64)]
    reads_enc = encode_batch(reads, 128, READ_PAD)
    refs_enc = encode_batch(refs, 2048, REF_PAD)
    on_tpu = jax.default_backend() == "tpu"

    def run():
        if on_tpu:
            return pallas_score_grid_diag(
                reads_enc, refs_enc, *params, read_block=512
            )
        return score_grid(reads_enc, refs_enc, *params)

    out = np.asarray(run())  # compile + settle (async dispatch means
    # block_until_ready can return before remote execution finishes;
    # a host fetch is the reliable fence).
    t0 = time.perf_counter()
    outs = [run() for _ in range(iters)]
    out = np.asarray(outs[-1])  # programs execute in order on the one
    # device stream, so fetching the last output fences all of them.
    dt = (time.perf_counter() - t0) / iters
    cells = reads_enc.size * refs_enc.size
    return cells / dt / 1e9, (reads, refs, out)


def bench_pipeline(params, total_bp=64_000_000, n_reads=512, passes=2):
    """SUSTAINED shipped-pipeline rate (VERDICT r3 task 2, scaled): the
    real `run_pipeline` (parse -> pack -> double-buffered flushes ->
    device winner reduce -> traceback -> report) over a RefSeq-shaped
    generated corpus, multiple flushes, so flush k's fetch round-trip
    hides behind flush k+1's host work — the rate `swtpu align`
    actually sustains, not the single-flush latency-bound `e2e_gcups`.

    The corpus is generated once and cached under /tmp (content keyed
    by size/seed); only rates are recorded.
    """
    import json
    import os

    from sparksmithwaterman_tpu.config import AlignConfig, ScoringScheme
    from sparksmithwaterman_tpu.metrics.engineer_data import (
        reads_file,
        refseq_like,
    )
    from sparksmithwaterman_tpu.models.pipeline import run_pipeline

    root = os.path.join(
        os.environ.get("SWTPU_BENCH_CORPUS", "/tmp/swtpu_bench_corpus"),
        f"p{total_bp}_{n_reads}",
    )
    marker = os.path.join(root, ".done")
    if not os.path.exists(marker):
        # Generate into a temp dir and rename into place: the corpus
        # becomes visible all-or-nothing, so a crashed earlier run (or
        # a concurrent bench) can never hand this one a half-written
        # corpus with a valid path (the marker-last ordering alone
        # still left a window for readers of partial ref files).
        import shutil
        import tempfile

        parent = os.path.dirname(root) or "."
        os.makedirs(parent, exist_ok=True)
        tmp = tempfile.mkdtemp(prefix=os.path.basename(root) + ".tmp", dir=parent)
        meta = refseq_like(os.path.join(tmp, "refs"), total_bp)
        meta["read_bp"] = reads_file(
            os.path.join(tmp, "inputs", "input1.fa"), n_reads
        )
        with open(os.path.join(tmp, ".done"), "w") as f:
            json.dump(meta, f)
        if os.path.isdir(root) and not os.path.exists(marker):
            shutil.rmtree(root)  # stale partial from a crashed run
        try:
            os.rename(tmp, root)
        except OSError:
            # A concurrent bench won the rename race; use its corpus.
            shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.exists(marker):
            raise RuntimeError(f"corpus generation failed: {root}")
    meta = json.load(open(marker))
    real_cells = meta["read_bp"] * meta["ref_bp"]
    scoring = ScoringScheme(
        match=int(params[0]), mismatch=int(params[1]), gap=int(params[2])
    )

    def one_pass(tag):
        config = AlignConfig(
            ref_dir=os.path.join(root, "refs"),
            in_dir=os.path.join(root, "inputs"),
            out_dir=os.path.join(root, f"out_{tag}"),
            scoring=scoring,
        )
        t0 = time.perf_counter()
        run_pipeline(config)
        return real_cells / (time.perf_counter() - t0) / 1e9

    one_pass("warm")  # compile + persistent-cache warm
    rate = max(one_pass(i) for i in range(passes))
    return rate, meta


def bench_corpus(params):
    """>= 0.25 Gbp corpus regime, threshold-gated every round (VERDICT
    r4 task 7 — the round-4 corpus-only bugs lived here): 256 Mbp
    RefSeq-shaped refs x 512 reads through ``run_pipeline`` (8 flushes,
    double-buffered), warm pass + best of 2 measured passes (a
    single-pass metric once recorded a 35% one-off stall that standalone
    re-runs could not reproduce — the gate must not fail on those)."""
    return bench_pipeline(
        params, total_bp=256_000_000, n_reads=512, passes=2
    )


def bench_readscale(params):
    """Read-scale regime (VERDICT r4 task 1): 20,000 reads (~2.3 Mbp —
    the reference's FIRST benchmark axis,
    ``src/metrics/EngineerData.java:54-78``, scaled 12x past its
    1,624-read sweep) x 8 Mbp refs through ``run_pipeline`` — exercises
    ~9k-row packs, big-grid kernel dispatches, and the winner traceback
    + report at 20k reads.  Best of 2 measured passes (see
    ``bench_corpus`` on one-off stalls)."""
    return bench_pipeline(
        params, total_bp=8_000_000, n_reads=20_000, passes=2
    )


def bench_longref(params, iters=5):
    """Long-reference mixed case (VERDICT r3 task 10, BASELINE config
    5): 131 kb references through the shipped path — the varlen plan
    cannot fit, so this exercises the round-5 multi-ref FOLDED chunked
    kernel — plus the windowed long-ref traceback.

    Two rates (VERDICT r4 tasks 2/3):
    - ``longref_gcups``: SUSTAINED pipeline protocol — ``iters``
      ``best_of_async`` flushes dispatched back-to-back, resolved after
      (exactly how ``run_pipeline``'s DoubleBufferedFlushes overlaps a
      long-ref corpus), wall/iters.  The single-call ``totals`` rate is
      RTT-bound through the remote tunnel (~23-40 ms per fetch against
      a ~50 ms compute) and is reported separately.
    - ``longref_single_gcups``: best-of-``iters`` sequential
      ``totals()`` calls — the cold-path latency a one-shot caller sees.

    The traceback is timed WARM (first call pays compile + cache load;
    the returned number is the steady-state cost a pipeline pays per
    winning reference) — the r4 bench timed it cold and recorded
    34,048 ms against a 1.08 s committed hot rate.
    """
    from sparksmithwaterman_tpu.config import AlignConfig, ScoringScheme
    from sparksmithwaterman_tpu.models.batch_backend import BatchBackend

    rng = np.random.default_rng(5)
    reads = ["".join(rng.choice(_BASES, size=128)) for _ in range(64)]
    refs = [
        "".join(rng.choice(_BASES, size=131_072)) for _ in range(8)
    ]
    # Embed one read so the traceback pass has a real winner site.
    refs[0] = refs[0][:50_000] + reads[0] + refs[0][50_000 + 128 :]
    real_cells = sum(map(len, reads)) * sum(map(len, refs))
    scoring = ScoringScheme(
        match=int(params[0]), mismatch=int(params[1]), gap=int(params[2])
    )
    be = BatchBackend(
        AlignConfig(ref_dir=".", in_dir=".", out_dir=".", scoring=scoring)
    )
    totals = be.totals(reads, refs)  # warm/compile
    be.best_of(reads, refs)  # warm the async winner-reduce op chain too:
    # its eager carry-pair/mask ops each cost a compile-service round
    # trip on first use (~10 s total through the remote tunnel) that
    # totals() does not touch.
    assert int(totals[0]) >= 5 * 128, "embedded read must win"
    single = 0.0
    for _ in range(iters):
        t0 = time.perf_counter()
        be.totals(reads, refs)
        single = max(single, real_cells / (time.perf_counter() - t0) / 1e9)
    t0 = time.perf_counter()
    resolvers = [be.best_of_async(reads, refs) for _ in range(iters)]
    best_seen = max(r()[0] for r in resolvers)
    sustained = real_cells * iters / (time.perf_counter() - t0) / 1e9
    assert best_seen == int(totals.max()), "async winner disagrees"
    # Windowed long-ref traceback, ALL 64 reads: warm pass timed (the
    # round-4 batched longseq path — one argmax pass + batched window
    # fills + batched tie fallback).
    be.sites_for_ref(refs[0], reads)  # compile warm
    t0 = time.perf_counter()
    sites = be.sites_for_ref(refs[0], reads)
    tb_ms = (time.perf_counter() - t0) * 1e3
    assert any(s[1][1] == reads[0] for s in sites), "traceback missed it"
    return sustained, (single, tb_ms)


def bench_e2e(params, iters=5):
    """Shipped-path rate: BatchBackend.totals on mixed lengths."""
    from sparksmithwaterman_tpu.config import AlignConfig, ScoringScheme
    from sparksmithwaterman_tpu.models.batch_backend import BatchBackend

    rng = np.random.default_rng(1)
    reads, refs = _mixed_workload(rng)
    real_cells = sum(map(len, reads)) * sum(map(len, refs))
    scoring = ScoringScheme(
        match=int(params[0]), mismatch=int(params[1]), gap=int(params[2])
    )
    be = BatchBackend(
        AlignConfig(ref_dir=".", in_dir=".", out_dir=".", scoring=scoring)
    )
    totals = be.totals(reads, refs)  # warm/compile
    best = 0.0
    for _ in range(iters):
        t0 = time.perf_counter()
        totals = be.totals(reads, refs)
        dt = time.perf_counter() - t0
        best = max(best, real_cells / dt / 1e9)
    return best, (reads, refs, totals)


def _oracle_rate(reads, refs, params):
    from sparksmithwaterman_tpu.config import ScoringScheme
    from sparksmithwaterman_tpu.core import oracle

    scoring = ScoringScheme(
        match=int(params[0]), mismatch=int(params[1]), gap=int(params[2])
    )
    cells = 0
    scores = {}
    t0 = time.perf_counter()
    for ri, read in enumerate(reads):
        for ci, ref in enumerate(refs):
            scores[(ri, ci)] = oracle.opt_alignments(ref, read, scoring)[0]
            cells += len(read) * len(ref)
    dt = time.perf_counter() - t0
    return cells / dt, scores


def run_smoke():
    """Compiled-mode parity smoke of EVERY kernel variant (VERDICT r2
    task 6): row, whole-table diag, chunked diag, packed whole, packed
    chunked, packed stream, chunked argmax — each at small shapes,
    checked against the serial oracle (small grids) or the lax
    recurrence (larger ones; itself oracle-pinned by the CPU suite).
    Runs on every ``python bench.py`` invocation on TPU (compiles cache
    across runs); returns "pass" or "fail:<variant>: <error>".  Both
    round-2 hardware-only bugs (i1 rotate, scoped-VMEM OOM at wide
    reads) were in classes this catches.
    """
    import jax

    if jax.default_backend() != "tpu":
        return "skipped:not-tpu"

    from sparksmithwaterman_tpu.config import ScoringScheme
    from sparksmithwaterman_tpu.core import oracle
    from sparksmithwaterman_tpu.io.fasta import READ_PAD, REF_PAD, encode_batch
    from sparksmithwaterman_tpu.ops.packing import pack_reads, read_best
    from sparksmithwaterman_tpu.ops.pallas_score import (
        pallas_argmax_grid_diag_chunked,
        pallas_lane_best_packed,
        pallas_score_grid,
        pallas_score_grid_diag,
        pallas_score_grid_diag_chunked,
    )
    from sparksmithwaterman_tpu.ops.recurrence import score_grid

    rng = np.random.default_rng(42)
    params = (np.int32(5), np.int32(-3), np.int32(-4))

    def seqs(r, m, c, n, ragged=False):
        reads = [
            "".join(rng.choice(_BASES, size=int(l)))
            for l in (
                rng.integers(max(1, m // 2), m + 1, size=r)
                if ragged
                else [m] * r
            )
        ]
        refs = ["".join(rng.choice(_BASES, size=n)) for _ in range(c)]
        return reads, refs

    def lax_want(reads, refs, m_pad, n_pad):
        return np.asarray(
            score_grid(
                encode_batch(reads, m_pad, READ_PAD),
                encode_batch(refs, n_pad, REF_PAD),
                *params,
            )
        )

    def oracle_want(reads, refs):
        s = ScoringScheme()
        return np.array(
            [
                [oracle.opt_alignments(ref, read, s)[0] for ref in refs]
                for read in reads
            ]
        )

    checks = []

    # row kernel — oracle-exact at tiny shapes
    reads, refs = seqs(16, 16, 4, 64)
    checks.append(
        (
            "row",
            lambda reads=reads, refs=refs: (
                np.asarray(
                    pallas_score_grid(
                        encode_batch(reads, 16, READ_PAD),
                        encode_batch(refs, 64, REF_PAD),
                        *(int(p) for p in params),
                        read_block=8,
                    )
                )[: len(reads)],
                oracle_want(reads, refs),
            ),
        )
    )

    # whole-table diag — two shapes (narrow + wide reads)
    for m, n, label in ((64, 512, "diag_whole"), (256, 1024, "diag_whole_wide")):
        reads, refs = seqs(8, m, 4, n)
        checks.append(
            (
                label,
                lambda reads=reads, refs=refs, m=m, n=n: (
                    np.asarray(
                        pallas_score_grid_diag(
                            encode_batch(reads, m, READ_PAD),
                            encode_batch(refs, n, REF_PAD),
                            *params,
                            read_block=8,
                        )
                    ),
                    lax_want(reads, refs, m, n),
                ),
            )
        )

    # chunked diag — n spans several window chunks
    reads, refs = seqs(8, 128, 2, 3072)
    checks.append(
        (
            "diag_chunked",
            lambda reads=reads, refs=refs: (
                np.asarray(
                    pallas_score_grid_diag_chunked(
                        encode_batch(reads, 128, READ_PAD),
                        encode_batch(refs, 3072, REF_PAD),
                        *params,
                        read_block=8,
                        chunk=1024,
                    )
                ),
                lax_want(reads, refs, 128, 3072),
            ),
        )
    )

    # packed kernels (ragged reads): whole + stream at 512bp refs vs
    # the oracle; chunked via a ref long enough that the whole-table
    # window cannot fit scoped VMEM (auto falls to the chunked form),
    # checked against the lax recurrence.
    reads, refs = seqs(24, 64, 4, 512, ragged=True)
    packed, start_idx = pack_reads(reads, 128, row_multiple=8)
    refs_enc = encode_batch(refs, 512, REF_PAD)
    want_packed = oracle_want(reads, refs)
    for mode in ("whole", "stream"):
        def run_packed(mode=mode):
            lane = pallas_lane_best_packed(
                packed,
                refs_enc,
                *(int(p) for p in params),
                read_block=8,
                mode=mode,
            )
            return np.asarray(read_best(lane, start_idx)), want_packed

        checks.append((f"packed_{mode}", run_packed))

    refs_long = ["".join(rng.choice(_BASES, size=12288)) for _ in range(2)]

    # NB: bind data as default args — ``reads`` is rebound below for the
    # argmax check, and these callables run only after the whole list is
    # built (a late-binding slip here once compared the packed result
    # against the argmax check's reads: 16 false mismatches).
    def run_packed_chunked(reads=reads, refs_long=refs_long):
        lane = pallas_lane_best_packed(
            packed,
            encode_batch(refs_long, 12288, REF_PAD),
            *(int(p) for p in params),
            read_block=8,
            mode="auto",
        )
        got = np.asarray(read_best(lane, start_idx))
        return got, lax_want(reads, refs_long, 128, 12288)

    checks.append(("packed_chunked", run_packed_chunked))

    # varlen packed (mixed-length refs, one dispatch; interleaved lane
    # layout at m=256) — the e2e hot path since round 3.
    from sparksmithwaterman_tpu.ops.pallas_score import (
        pallas_lane_best_packed_varlen,
    )

    reads_v = [
        "".join(rng.choice(_BASES, size=int(l)))
        for l in rng.integers(80, 257, size=24)
    ]
    refs_v = [
        "".join(rng.choice(_BASES, size=int(l)))
        for l in (64, 200, 511, 1024, 2048, 333, 767, 96)
    ]
    packed_v, si_v = pack_reads(reads_v, 256, row_multiple=8)

    def run_varlen(reads_v=reads_v, refs_v=refs_v):
        lane = pallas_lane_best_packed_varlen(
            packed_v,
            encode_batch(refs_v, 2048, REF_PAD),
            [len(r) for r in refs_v],
            *(int(p) for p in params),
            read_block=8,
        )
        got = np.asarray(read_best(lane, si_v))
        return got, lax_want(reads_v, refs_v, 256, 2048)

    checks.append(("packed_varlen", run_varlen))

    # multi-ref FOLDED chunked kernel (round-5 long-ref path): few
    # packed rows, refs folded into the row dim, interleaved m=256.
    from sparksmithwaterman_tpu.ops.pallas_score import (
        pallas_lane_best_packed_multi,
        varlen_start_phys,
    )

    reads_f = [
        "".join(rng.choice(_BASES, size=int(l)))
        for l in rng.integers(100, 257, size=8)
    ]
    refs_f = ["".join(rng.choice(_BASES, size=6000)) for _ in range(4)]
    packed_f, si_f = pack_reads(reads_f, 256, row_multiple=8)

    def run_multi(reads_f=reads_f, refs_f=refs_f):
        lane = pallas_lane_best_packed_multi(
            packed_f,
            encode_batch(refs_f, 6144, REF_PAD),
            *(int(p) for p in params),
            read_block=8,
            cf=2,
            deinterleave=False,
        )
        got = np.asarray(
            read_best(lane, varlen_start_phys(si_f, 256))
        )
        return got, lax_want(reads_f, refs_f, 256, 6144)

    checks.append(("packed_multi", run_multi))

    # chunked argmax (longseq max-cell kernel)
    reads, refs = seqs(8, 64, 1, 2048)
    def run_argmax(reads=reads, refs=refs):
        best, bestd, count = pallas_argmax_grid_diag_chunked(
            encode_batch(reads, 64, READ_PAD),
            encode_batch(refs, 2048, REF_PAD),
            *(int(p) for p in params),
            read_block=8,
        )
        got = np.asarray(best).max(axis=2)[: len(reads)]  # (R, C)
        return got, lax_want(reads, refs, 64, 2048)

    checks.append(("argmax_chunked", run_argmax))

    for name, fn in checks:
        try:
            got, want = fn()
            got = np.asarray(got)[: want.shape[0], : want.shape[1]]
            if not np.array_equal(got, want):
                bad = int(np.sum(got != want))
                return f"fail:{name}: {bad} mismatched scores"
        except Exception as e:  # noqa: BLE001 - report, don't crash bench
            return f"fail:{name}: {type(e).__name__}: {str(e)[:160]}"
    return "pass"


# The smoke pass compiles fresh kernel shapes; a degraded remote Mosaic
# compile service can HANG such compiles indefinitely (observed 2026-08-20:
# trivial fresh pallas compiles blocked > 400s while cached executables and
# plain XLA compiles worked).  Running smoke in a subprocess with a hard
# timeout keeps the driver's bench from wedging; compiled results persist
# in the XLA cache, so a later healthy run completes instantly.
SMOKE_TIMEOUT_S = 600


def _smoke_subprocess() -> str:
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, __file__, "--smoke-only"],
            capture_output=True,
            text=True,
            timeout=SMOKE_TIMEOUT_S,
        )
    except subprocess.TimeoutExpired:
        return "skipped:compile-timeout (degraded remote compile service?)"
    lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
    if proc.returncode != 0 or not lines:
        return f"fail:smoke-subprocess rc={proc.returncode}: " + (
            proc.stderr.strip().splitlines()[-1][:160] if proc.stderr else "?"
        )
    return lines[-1]


def _repeat(fn, repeats=REPEATS):
    """Run ``fn`` ``repeats`` times; return (median_rate, rates, payload).

    The payload returned is the one from the median-rate pass."""
    results = [fn() for _ in range(repeats)]
    rates = sorted(r for r, _ in results)
    median = rates[len(rates) // 2]
    payload = next(p for r, p in results if r == median)
    return median, rates, payload


def main(argv):
    from sparksmithwaterman_tpu.cli import enable_compile_cache

    enable_compile_cache()
    if "--smoke-only" in argv:
        print(run_smoke())
        return 0
    params = (np.int32(5), np.int32(-3), np.int32(-4))

    import jax as _jax

    _on_tpu = _jax.default_backend() == "tpu"

    kernel_gcups, kernel_rates, (kreads, krefs, kgrid) = _repeat(
        lambda: bench_kernel(params)
    )
    e2e_gcups, e2e_rates, (ereads, erefs, etotals) = _repeat(
        lambda: bench_e2e(params)
    )
    # Heavy TPU-only metrics (sustained pipeline, long-ref, measured
    # roofline) — each measured once (they already repeat internally).
    pipeline_gcups = longref_gcups = longref_tb_ms = roofline_gcups = None
    longref_single = corpus_gcups = readscale_gcups = None
    if _on_tpu:
        pipeline_gcups, _pmeta = bench_pipeline(params)
        longref_gcups, (longref_single, longref_tb_ms) = bench_longref(
            params
        )
        corpus_gcups, _cmeta = bench_corpus(params)
        readscale_gcups, _rmeta = bench_readscale(params)
        from sparksmithwaterman_tpu.ops.microbench import vpu_step_roofline

        roofline_gcups = vpu_step_roofline(rb=512, m=128)

    # Parity spot-check against the serial oracle (the reference's
    # control semantics): 2x2 of the kernel grid + 2 e2e totals.
    oracle_rate, want = _oracle_rate(kreads[:2], krefs[:2], params)
    for (ri, ci), w in want.items():
        got = int(kgrid[ri, ci])
        if got != w:
            raise SystemExit(f"PARITY FAIL kernel ({ri},{ci}): {got} != {w}")
    _, w_tot = _oracle_rate(ereads, erefs[:2], params)
    for ci in range(2):
        w = sum(w_tot[(ri, ci)] for ri in range(len(ereads)))
        if int(etotals[ci]) != w:
            raise SystemExit(
                f"PARITY FAIL e2e totals[{ci}]: {int(etotals[ci])} != {w}"
            )

    import jax

    on_tpu = jax.default_backend() == "tpu"
    smoke = _smoke_subprocess() if "--no-smoke" not in argv else "skipped:flag"
    measured = {"kernel_gcups": kernel_gcups, "e2e_gcups": e2e_gcups}
    if pipeline_gcups is not None:
        measured["pipeline_gcups"] = pipeline_gcups
    if longref_gcups is not None:
        measured["longref_gcups"] = longref_gcups
        measured["longref_single_gcups"] = longref_single
    if corpus_gcups is not None:
        measured["corpus_gcups"] = corpus_gcups
    if readscale_gcups is not None:
        measured["readscale_gcups"] = readscale_gcups
    bad = {
        k: (round(measured[k], 1), floor)
        for k, floor in THRESHOLDS.items()
        if k in measured and measured[k] < floor
    }
    # Ceilings (upper bounds): latency metrics regress UPWARD — the r4
    # bench had no gate here and a 30x traceback regression would have
    # passed unnoticed (VERDICT r4 weak-1).
    if longref_tb_ms is not None and longref_tb_ms > THRESHOLD_CEILINGS[
        "longref_traceback_ms"
    ]:
        bad["longref_traceback_ms"] = (
            round(longref_tb_ms, 1),
            THRESHOLD_CEILINGS["longref_traceback_ms"],
        )
    result = {
        "metric": "e2e_real_cell_rate",
        "value": round(e2e_gcups, 1),
        "unit": "GCUPS",
        "vs_baseline": round(e2e_gcups * 1e9 / oracle_rate, 1),
        "kernel_gcups": round(kernel_gcups, 1),
        # Sustained shipped-pipeline rate over a 64 Mbp RefSeq-shaped
        # corpus (multi-flush, double-buffered — the rate `swtpu align`
        # sustains; e2e_gcups is the single-flush latency-bound call).
        "pipeline_gcups": (
            round(pipeline_gcups, 1) if pipeline_gcups is not None else None
        ),
        # 131 kb refs through the chunked-window kernel + one windowed
        # long-ref traceback (BASELINE config 5).
        "longref_gcups": (
            round(longref_gcups, 1) if longref_gcups is not None else None
        ),
        "longref_single_gcups": (
            round(longref_single, 1) if longref_single is not None else None
        ),
        # >= 0.25 Gbp corpus regime (256 Mbp x 512 reads, 8 flushes) and
        # the 20k-read regime (the reference's first bench axis) — both
        # through the real run_pipeline, warm + 1 measured pass.
        "corpus_gcups": (
            round(corpus_gcups, 1) if corpus_gcups is not None else None
        ),
        "readscale_gcups": (
            round(readscale_gcups, 1) if readscale_gcups is not None else None
        ),
        "longref_traceback_ms": (
            round(longref_tb_ms, 1) if longref_tb_ms is not None else None
        ),
        # Chip-MEASURED step-chain ceiling (ops/microbench.py): the
        # exact wavefront step with the window held in registers — the
        # VPU roofline for this recurrence at the kernel-bench shape.
        "roofline_gcups": (
            round(roofline_gcups, 1) if roofline_gcups is not None else None
        ),
        # STEP-rate comparison: the kernel bench counts r*m*c*n cells
        # but the wavefront executes (m+n-1)/n more diagonal steps than
        # columns at its m=128/n=2048 shape; the roofline measures step
        # throughput, so compare step rates.
        "kernel_pct_vpu_sol": (
            round(
                kernel_gcups * (128 + 2048 - 1) / 2048
                / roofline_gcups * 100,
                1,
            )
            if roofline_gcups
            else None
        ),
        # kernel/e2e ratio (geometry + aux + latency; the measured
        # decomposition is docs/kernels.md "The e2e-vs-kernel budget").
        "kernel_vs_e2e": round(kernel_gcups / max(e2e_gcups, 1e-9), 2),
        # Robustness telemetry (min..max over REPEATS passes) and the
        # unconditional gate verdict — "fail" on TPU means either a code
        # regression or a degraded environment; env_suspect separates
        # them: wide spread (>25%) or an impossible kernel<e2e ordering
        # points at the environment, not the code.
        "kernel_spread": [round(r, 1) for r in kernel_rates],
        "e2e_spread": [round(r, 1) for r in e2e_rates],
        "thresholds": (
            ("pass" if not bad else "fail") if on_tpu else "skipped:not-tpu"
        ),
        # Compiled-mode parity of every kernel variant (see run_smoke).
        "smoke": smoke,
        "threshold_detail": bad or None,
        "env_suspect": bool(
            on_tpu
            and (
                min(kernel_rates) < 0.75 * max(kernel_rates)
                or min(e2e_rates) < 0.75 * max(e2e_rates)
                or kernel_gcups < e2e_gcups
            )
        ),
    }
    print(json.dumps(result))

    if "--check" in argv:
        if not on_tpu:
            print("check skipped: not on TPU", file=sys.stderr)
            return 0
        if bad:
            print(f"PERF REGRESSION: {bad}", file=sys.stderr)
            return 1
        if smoke.startswith("fail"):
            print(f"SMOKE FAILURE: {smoke}", file=sys.stderr)
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
