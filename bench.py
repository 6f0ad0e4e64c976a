"""Headline benchmark: DP-fill GCUPS on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is
the speedup over a measured serial-oracle cell rate — the same engine
semantics as the reference's ``SmithWaterman`` control path
(``src/sw/Distribution.java:482-634``), which is its own baseline
strategy ("no distribution" control).
"""

from __future__ import annotations

import json
import time

import numpy as np


def _measure_device(reads_enc, refs_enc, params, iters=20):
    import jax

    from sparksmithwaterman_tpu.ops.pallas_score import pallas_score_grid_diag
    from sparksmithwaterman_tpu.ops.recurrence import score_grid

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
    # device stream, so fetching the last output fences all of them —
    # without paying a host round-trip per iteration.
    dt = (time.perf_counter() - t0) / iters
    r, m = reads_enc.shape
    c, n = refs_enc.shape
    cells = r * m * c * n
    return cells / dt, np.asarray(out)


def _measure_oracle(reads, refs, params):
    from sparksmithwaterman_tpu.config import ScoringScheme
    from sparksmithwaterman_tpu.core import oracle

    scoring = ScoringScheme(match=int(params[0]), mismatch=int(params[1]), gap=int(params[2]))
    cells = 0
    t0 = time.perf_counter()
    scores = {}
    for ri, read in enumerate(reads):
        for ci, ref in enumerate(refs):
            scores[(ri, ci)] = oracle.opt_alignments(ref, read, scoring)[0]
            cells += len(read) * len(ref)
    dt = time.perf_counter() - t0
    return cells / dt, scores


def main():
    from sparksmithwaterman_tpu.cli import enable_compile_cache
    from sparksmithwaterman_tpu.io.fasta import READ_PAD, REF_PAD, encode_batch

    enable_compile_cache()

    rng = np.random.default_rng(0)
    alphabet = np.array(list("ACGT"))
    params = (np.int32(5), np.int32(-3), np.int32(-4))

    # Device workload: 512 reads x 128bp vs 64 refs x 2kb  (~8.6e9 cells)
    reads = ["".join(rng.choice(alphabet, size=128)) for _ in range(512)]
    refs = ["".join(rng.choice(alphabet, size=2048)) for _ in range(64)]
    reads_enc = encode_batch(reads, 128, READ_PAD)
    refs_enc = encode_batch(refs, 2048, REF_PAD)

    device_rate, device_scores = _measure_device(reads_enc, refs_enc, params)

    # Oracle sample: 2 reads x 2 refs, extrapolated (the serial path is
    # ~1e6 cells/s; a full grid would take hours).
    oracle_rate, oracle_scores = _measure_oracle(reads[:2], refs[:2], params)
    for (ri, ci), want in oracle_scores.items():
        got = int(device_scores[ri, ci])
        if got != want:
            raise SystemExit(
                f"PARITY FAIL at read {ri} x ref {ci}: device {got} != oracle {want}"
            )

    print(
        json.dumps(
            {
                "metric": "dp_fill_rate",
                "value": round(device_rate / 1e9, 3),
                "unit": "GCUPS",
                "vs_baseline": round(device_rate / oracle_rate, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
