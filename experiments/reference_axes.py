"""Rates along the reference's remaining two benchmark axes (round 5).

The reference's ExecutionTimes harnesses sweep four factors
(`src/metrics/EngineerData.java`): read count (round-5 runs at 20k/100k,
BASELINE.md), read length (20-500 bp, :87-104), ref count (1-40,000 x
400 bp, :116-169), and ref length (80 bp-131 kb, bench_longref).  This
script measures the shipped `BatchBackend.totals` rate along the two
axes not yet covered by a committed number, at scales well past the
reference's own sweeps.

Run: python experiments/reference_axes.py
"""

import time

import numpy as np

from sparksmithwaterman_tpu.cli import enable_compile_cache
from sparksmithwaterman_tpu.config import AlignConfig, ScoringScheme
from sparksmithwaterman_tpu.models.batch_backend import BatchBackend

_BASES = np.array(list("ACGT"))


def _refs(rng, total_bp, lo=500, hi=4000):
    refs, total = [], 0
    while total < total_bp:
        n = int(rng.integers(lo, hi))
        refs.append("".join(rng.choice(_BASES, size=n)))
        total += n
    return refs


def rate(be, reads, refs, iters=2):
    real = sum(map(len, reads)) * sum(map(len, refs))
    be.totals(reads, refs)  # warm
    best = 0.0
    for _ in range(iters):
        t0 = time.perf_counter()
        be.totals(reads, refs)
        best = max(best, real / (time.perf_counter() - t0) / 1e9)
    return best


def main():
    enable_compile_cache()
    cfg = AlignConfig(
        ref_dir=".", in_dir=".", out_dir=".", scoring=ScoringScheme()
    )

    # Axis: read LENGTH (reference sweep 2: 20-500 bp step 20, 5 reads;
    # here 2000 reads per point vs 8 Mbp of mixed refs).
    rng = np.random.default_rng(41)
    refs = _refs(rng, 8_000_000)
    print("read-length axis (2000 reads x 8 Mbp refs):")
    for read_len in (20, 60, 100, 200, 350, 500):
        reads = [
            "".join(rng.choice(_BASES, size=read_len)) for _ in range(2000)
        ]
        be = BatchBackend(cfg)
        r = rate(be, reads, refs)
        print(f"  L={read_len:>3} bp: {r:7.1f} real GCUPS")

    # Axis: ref COUNT (reference sweep 3: 1-40,000 x 400 bp; here x 512
    # mixed reads).
    rng = np.random.default_rng(43)
    reads = [
        "".join(rng.choice(_BASES, size=int(l)))
        for l in rng.integers(80, 151, size=512)
    ]
    print("ref-count axis (512 reads x C 400bp refs):")
    for c in (1000, 10_000, 40_000):
        refs_c = [
            "".join(rng.choice(_BASES, size=400)) for _ in range(c)
        ]
        be = BatchBackend(cfg)
        r = rate(be, reads, refs_c)
        print(f"  C={c:>6}: {r:7.1f} real GCUPS")


if __name__ == "__main__":
    main()
