"""Rate vs unroll at the e2e-critical shape (m=256, n=4096, rb=248),
overriding the VMEM model to see where Mosaic actually OOMs."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if len(sys.argv) > 1:
    os.environ["SWTPU_VMEM_LIMIT"] = sys.argv[1]
import numpy as np
import jax

from sparksmithwaterman_tpu.cli import enable_compile_cache

enable_compile_cache()

from sparksmithwaterman_tpu.io.fasta import REF_PAD, encode_batch
from sparksmithwaterman_tpu.ops.packing import pack_reads, packed_col_sums
from sparksmithwaterman_tpu.ops.pallas_score import pallas_lane_best_packed, plan_diag

_BASES = np.array(list("ACGT"))
rng = np.random.default_rng(1)
reads = ["".join(rng.choice(_BASES, size=int(l))) for l in rng.integers(80, 151, size=512)]
packed, start_idx = pack_reads(reads, 256, row_multiple=8)
rows, m = packed.shape
packed_dev = jax.device_put(packed.astype(np.int32))
start_dev = jax.device_put(start_idx)

n_pad, c = 4096, 69
refs = ["".join(rng.choice(_BASES, size=n_pad)) for _ in range(c)]
refs_enc = encode_batch(refs, n_pad, REF_PAD)
refs_enc = np.concatenate([refs_enc, np.full((3, n_pad), REF_PAD, refs_enc.dtype)])

for unroll in (8, 16, 24, 32, 40, 64):
    plan = plan_diag(rows, m, n_pad, unroll)
    if plan is None or plan[0] != unroll:
        print(f"unroll={unroll}: model rejects (plan={plan})")
        continue
    try:
        def run(u=unroll):
            lane = pallas_lane_best_packed(
                packed_dev, refs_enc, 5, -3, -4, read_block=rows,
                mode="whole", unroll=u,
            )
            return packed_col_sums(lane, start_dev)
        np.asarray(run())  # compile+warm
        iters = 8
        t0 = time.perf_counter()
        outs = [run() for _ in range(iters)]
        np.asarray(outs[-1])
        dt = (time.perf_counter() - t0) / iters
        cells = (c + 3) * n_pad * rows * m
        print(f"unroll={unroll}: {1e3*dt:7.2f}ms {cells/dt/1e9:6.1f} padded GCUPS")
    except Exception as e:
        print(f"unroll={unroll}: {type(e).__name__}: {str(e)[:140]}")
