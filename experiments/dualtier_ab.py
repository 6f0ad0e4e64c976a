"""Dual-tier read packing A/B at read scale (VERDICT r4 task 5).

Round 3 rejected splitting reads into per-length lane tiers (<=128bp at
m=128, the rest at m=256) because at 512 mixed 80-150bp reads the split
destroys bin-packing fill: 129-150bp reads cannot pair within 256
lanes -> 1.92x lane waste vs 1.07x mixed.  The objection is
fill-statistics, so it can invert at read scale where both tiers are
deep.  This script A/Bs `BatchBackend.totals` single- vs dual-tier
(`SWTPU_DUAL_TIER=1`) at 512 and 20,000 reads, reporting the pack fill
and the real-cell rate for each.

Run: python experiments/dualtier_ab.py
"""

import os
import time

import numpy as np

from sparksmithwaterman_tpu.cli import enable_compile_cache
from sparksmithwaterman_tpu.config import AlignConfig, ScoringScheme

_BASES = np.array(list("ACGT"))


def workload(rng, n_reads, ref_bp=4_000_000):
    reads = [
        "".join(rng.choice(_BASES, size=int(l)))
        for l in rng.integers(80, 151, size=n_reads)
    ]
    refs = []
    total = 0
    while total < ref_bp:
        n = int(rng.integers(500, 4000))
        refs.append("".join(rng.choice(_BASES, size=n)))
        total += n
    return reads, refs


def fill_stats(be, reads):
    packs = be._pack_chunks(reads, 1 << 30)
    lanes = sum(p["rows"] * p["m_pack"] for p in packs)
    bp = sum(p["read_bp"] for p in packs)
    tiers = sorted({p["m_pack"] for p in packs})
    return bp / lanes, tiers, sum(p["rows"] for p in packs)


def run(n_reads, dual):
    os.environ.pop("SWTPU_DUAL_TIER", None)
    if dual:
        os.environ["SWTPU_DUAL_TIER"] = "1"
    from sparksmithwaterman_tpu.models.batch_backend import BatchBackend

    rng = np.random.default_rng(3)
    reads, refs = workload(rng, n_reads)
    real = sum(map(len, reads)) * sum(map(len, refs))
    be = BatchBackend(
        AlignConfig(ref_dir=".", in_dir=".", out_dir=".",
                    scoring=ScoringScheme())
    )
    fill, tiers, rows = fill_stats(be, reads)
    be.totals(reads, refs)  # warm
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        be.totals(reads, refs)
        best = max(best, real / (time.perf_counter() - t0) / 1e9)
    tag = "dual " if dual else "single"
    print(
        f"{tag} tier, {n_reads:>6} reads: {best:7.1f} real GCUPS | "
        f"lane fill {fill:.3f} | tiers {tiers} | rows {rows}"
    )
    return best


def main():
    enable_compile_cache()
    for n_reads in (512, 20_000):
        a = run(n_reads, dual=False)
        b = run(n_reads, dual=True)
        print(f"  -> dual/single = {b/a:.3f}x at {n_reads} reads")


if __name__ == "__main__":
    main()
