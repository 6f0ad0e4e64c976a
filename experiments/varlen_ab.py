"""A/B: table whole (u=8) vs varlen (u=64) at uniform n=4096, plus
varlen with all-short lens to sanity-check the early-exit."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

from sparksmithwaterman_tpu.cli import enable_compile_cache

enable_compile_cache()

from sparksmithwaterman_tpu.io.fasta import REF_PAD, encode_batch
from sparksmithwaterman_tpu.ops.packing import pack_reads, packed_col_sums
from sparksmithwaterman_tpu.ops.pallas_score import (
    pallas_lane_best_packed,
    pallas_lane_best_packed_varlen,
    plan_varlen,
)

_BASES = np.array(list("ACGT"))
rng = np.random.default_rng(1)
reads = ["".join(rng.choice(_BASES, size=int(l))) for l in rng.integers(80, 151, size=512)]
packed, start_idx = pack_reads(reads, 256, row_multiple=8)
rows, m = packed.shape
packed_dev = jax.device_put(packed.astype(np.int32))
start_dev = jax.device_put(start_idx)

n_pad, c = 4096, 72
refs = ["".join(rng.choice(_BASES, size=n_pad)) for _ in range(c)]
refs_enc = jax.device_put(encode_batch(refs, n_pad, REF_PAD).astype(np.int32))
lens_full = np.full(c, n_pad, np.int32)
print("plan_varlen:", plan_varlen(rows, m, n_pad))


def bench(fn, label, cells):
    np.asarray(fn())
    iters = 8
    t0 = time.perf_counter()
    outs = [fn() for _ in range(iters)]
    np.asarray(outs[-1])
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {1e3*dt:7.2f}ms {cells/dt/1e9:6.1f} padded GCUPS")


cells = c * n_pad * rows * m
bench(
    lambda: packed_col_sums(
        pallas_lane_best_packed(packed_dev, refs_enc, 5, -3, -4, read_block=rows, mode="whole"),
        start_dev,
    ),
    "table whole   (u=8)",
    cells,
)
bench(
    lambda: packed_col_sums(
        pallas_lane_best_packed_varlen(packed_dev, refs_enc, lens_full, 5, -3, -4, read_block=rows),
        start_dev,
    ),
    "varlen uniform(u=64)",
    cells,
)
# half-length lens: device work should halve
lens_half = np.full(c, n_pad // 2, np.int32)
bench(
    lambda: packed_col_sums(
        pallas_lane_best_packed_varlen(packed_dev, refs_enc, lens_half, 5, -3, -4, read_block=rows),
        start_dev,
    ),
    "varlen half   (u=64)",
    cells // 2,
)
