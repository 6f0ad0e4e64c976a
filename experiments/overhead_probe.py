"""Fixed-cost probe: rate vs C at n=768 and n=4096 (table mode),
plus unroll sensitivity at n=768."""
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
from sparksmithwaterman_tpu.ops.pallas_score import pallas_lane_best_packed

_BASES = np.array(list("ACGT"))
rng = np.random.default_rng(1)
reads = ["".join(rng.choice(_BASES, size=int(l))) for l in rng.integers(80, 151, size=512)]
packed, start_idx = pack_reads(reads, 256, row_multiple=8)
rows, m = packed.shape
packed_dev = jax.device_put(packed.astype(np.int32))
start_dev = jax.device_put(start_idx)


def run(refs_enc, mode="whole"):
    lane = pallas_lane_best_packed(
        packed_dev, refs_enc, 5, -3, -4, read_block=rows, mode=mode,
    )
    return packed_col_sums(lane, start_dev)


def measure(n_pad, c, iters=10, mode="whole"):
    refs = ["".join(rng.choice(_BASES, size=n_pad)) for _ in range(c)]
    refs_enc = jax.device_put(
        encode_batch(refs, n_pad, REF_PAD).astype(np.int32)
    )
    np.asarray(run(refs_enc, mode))
    t0 = time.perf_counter()
    outs = [run(refs_enc, mode) for _ in range(iters)]
    np.asarray(outs[-1])
    dt = (time.perf_counter() - t0) / iters
    cells = c * n_pad * rows * m
    print(
        f"mode={mode} n={n_pad:5d} c={c:3d} t={1e3*dt:7.2f}ms "
        f"padded={cells/dt/1e9:6.1f} GCUPS per_ref={1e3*dt/c:.3f}ms"
    )
    return dt


for c in (8, 24, 48, 96, 192):
    measure(768, c)
for c in (24, 48):
    measure(4096, c)
