"""Reproduce the smoke's packed_chunked compiled-mode mismatch; dump data."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import numpy as np
from bench import _BASES
from sparksmithwaterman_tpu.io.fasta import READ_PAD, REF_PAD, encode_batch
from sparksmithwaterman_tpu.ops.packing import pack_reads, read_best
from sparksmithwaterman_tpu.ops.pallas_score import pallas_lane_best_packed
from sparksmithwaterman_tpu.ops.recurrence import score_grid
from sparksmithwaterman_tpu.cli import enable_compile_cache

enable_compile_cache()
rng = np.random.default_rng(42)

def seqs(r, m, c, n, ragged=False):
    reads = ["".join(rng.choice(_BASES, size=int(l)))
             for l in (rng.integers(max(1, m//2), m+1, size=r) if ragged else [m]*r)]
    refs = ["".join(rng.choice(_BASES, size=n)) for _ in range(c)]
    return reads, refs

_ = seqs(16, 16, 4, 64)
_ = seqs(8, 64, 4, 512); _ = seqs(8, 256, 4, 1024)
_ = seqs(8, 128, 2, 3072)
reads, refs = seqs(24, 64, 4, 512, ragged=True)
refs_long = ["".join(rng.choice(_BASES, size=12288)) for _ in range(2)]

packed, start_idx = pack_reads(reads, 128, row_multiple=8)
print("packed rows:", packed.shape, flush=True)
lane = pallas_lane_best_packed(
    packed, encode_batch(refs_long, 12288, REF_PAD), 5, -3, -4,
    read_block=8, mode="auto")
got = np.asarray(read_best(lane, start_idx))[:24, :2]
print("kernel done", flush=True)
want = np.asarray(score_grid(
    encode_batch(reads, 128, READ_PAD),
    encode_batch(refs_long, 12288, REF_PAD),
    np.int32(5), np.int32(-3), np.int32(-4)))
print("mismatches:", int((got != want).sum()), "of", want.size, flush=True)
bad = np.argwhere(got != want)
rows = start_idx // 128
lanes = start_idx % 128
for r_, c_ in bad:
    print(f"read {r_} ref {c_}: got {got[r_, c_]} want {want[r_, c_]} "
          f"row {rows[r_]} lane {lanes[r_]} len {len(reads[r_])}", flush=True)
json.dump({"reads": reads, "refs": refs_long},
          open("/root/repo/experiments/smoke_data.json", "w"))
print("DUMPED", flush=True)
