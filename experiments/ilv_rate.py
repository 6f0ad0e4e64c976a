"""Interleaved varlen rate at the e2e-critical shape vs unroll."""
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
from sparksmithwaterman_tpu.ops.pallas_score import pallas_lane_best_packed_varlen

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
lens = np.full(c, n_pad, np.int32)

for unroll in (16, 32):
    try:
        def run(u=unroll):
            lane = pallas_lane_best_packed_varlen(
                packed_dev, refs_enc, lens, 5, -3, -4, read_block=rows,
                unroll=u,
            )
            return packed_col_sums(lane, start_dev)
        t0 = time.perf_counter()
        np.asarray(run())
        print(f"u={unroll}: compile+first {time.perf_counter()-t0:.0f}s")
        iters = 8
        t0 = time.perf_counter()
        outs = [run() for _ in range(iters)]
        np.asarray(outs[-1])
        dt = (time.perf_counter() - t0) / iters
        cells = c * n_pad * rows * m
        print(f"u={unroll}: {1e3*dt:7.2f}ms {cells/dt/1e9:6.1f} padded GCUPS")
    except Exception as e:
        print(f"u={unroll}: {type(e).__name__}: {str(e)[:160]}")
