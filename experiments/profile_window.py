"""Measure window-table build cost vs kernel cost for the e2e dispatch
shapes (m_pack=256, rows=248, the bench_e2e group census)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from sparksmithwaterman_tpu.cli import enable_compile_cache

enable_compile_cache()

from sparksmithwaterman_tpu.io.fasta import REF_PAD, encode_batch
from sparksmithwaterman_tpu.ops.pallas_score import (
    _diag_windows,
    _lane_best_call,
    plan_diag,
    pallas_lane_best_packed,
)
from sparksmithwaterman_tpu.ops.packing import pack_reads

_BASES = np.array(list("ACGT"))
rng = np.random.default_rng(1)
reads = ["".join(rng.choice(_BASES, size=int(l))) for l in rng.integers(80, 151, size=512)]
packed, start_idx = pack_reads(reads, 256, row_multiple=8)
rows, m = packed.shape
packed_dev = jax.device_put(packed.astype(np.int32))
rb = rows  # 248
print(f"rows={rows} m={m} rb={rb}")

groups = {768: 32, 1024: 24, 1536: 40, 2048: 32, 3072: 80, 4096: 72}
params = (5, -3, -4)

def timeit(fn, iters=10):
    fn()  # warm
    np.asarray(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(iters)]
    np.asarray(jax.tree_util.tree_leaves(outs[-1])[0])
    return (time.perf_counter() - t0) / iters

tot_win = tot_kern = tot_full = 0.0
for n_pad, c in sorted(groups.items()):
    refs = ["".join(rng.choice(_BASES, size=n_pad)) for _ in range(c)]
    refs_enc = jax.device_put(encode_batch(refs, n_pad, REF_PAD).astype(np.int32))
    plan = plan_diag(rb, m, n_pad, 64)
    assert plan, (rb, m, n_pad)
    unroll, t_pad = plan
    diags = m + n_pad - 1
    t_win = timeit(lambda: _diag_windows(refs_enc, m, t_pad))
    windows = jax.block_until_ready(_diag_windows(refs_enc, m, t_pad))
    t_kern = timeit(
        lambda: _lane_best_call(
            packed_dev, windows, match=5, mismatch=-3, gap=-4,
            read_block=rb, diags=diags, unroll=unroll, interpret=False,
        )
    )
    t_full = timeit(
        lambda: pallas_lane_best_packed(
            packed_dev, refs_enc, *params, read_block=rb, mode="auto"
        )
    )
    cells = c * n_pad * rows * m
    print(
        f"n={n_pad:5d} c={c:3d} unroll={unroll:3d} win={1e3*t_win:6.2f}ms "
        f"kern={1e3*t_kern:7.2f}ms full={1e3*t_full:7.2f}ms "
        f"kern_gcups={cells/t_kern/1e9:6.1f} full_gcups={cells/t_full/1e9:6.1f}"
    )
    tot_win += t_win
    tot_kern += t_kern
    tot_full += t_full
print(f"total: win={1e3*tot_win:.1f}ms kern={1e3*tot_kern:.1f}ms full={1e3*tot_full:.1f}ms")
