"""Budget of the e2e-vs-kernel gap (VERDICT r3 task 1): times every
component of one bench_e2e flush in isolation so the factors SUM to the
measured kernel/e2e ratio.

Components (hot path = BatchBackend.totals -> _packed_col_sums_varlen):
  geometry  - lane fill waste (packed rows vs real read bp)
            - wavefront triangle + unroll rounding (padded steps vs ref bp)
  device    - _diag_windows_packed4 build (byte-packed Toeplitz table)
            - _ilv_jit of the window (+ packed reads, cached per flush)
            - _varlen_call kernel proper
            - packed_col_sums epilogue (gather + segment sums)
  host      - ref encode_batch + chunking/dispatch Python

Each device component is timed over ITERS queued calls fenced by a tiny
scalar fetch of the LAST output (axon tunnel: block_until_ready is not a
reliable fence and big fetches distort; the device stream is in-order).

Usage: python experiments/profile_varlen_budget.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from sparksmithwaterman_tpu.cli import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from sparksmithwaterman_tpu.config import AlignConfig, ScoringScheme
from sparksmithwaterman_tpu.io.fasta import REF_PAD, encode_batch
from sparksmithwaterman_tpu.models.batch_backend import (
    BatchBackend,
    _quantize_15,
)
from sparksmithwaterman_tpu.ops.packing import packed_col_sums
from sparksmithwaterman_tpu.ops.pallas_score import (
    _diag_windows_packed4,
    _ilv_jit,
    _varlen_call,
    plan_varlen,
    varlen_start_phys,
)

_BASES = np.array(list("ACGT"))
ITERS = 20

rng = np.random.default_rng(1)
reads = ["".join(rng.choice(_BASES, size=int(l))) for l in rng.integers(80, 151, size=512)]
refs = ["".join(rng.choice(_BASES, size=int(l))) for l in rng.integers(500, 4000, size=256)]
read_bp = sum(map(len, reads))
ref_bp = sum(map(len, refs))
real_cells = read_bp * ref_bp

be = BatchBackend(AlignConfig(ref_dir=".", in_dir=".", out_dir=".", scoring=ScoringScheme()))
be.totals(reads, refs)  # warm + fill pack cache

pack = be._pack_chunks(reads, 10**9)[0]
m = pack["m_pack"]
rows = pack["rows"]
rb = be._pack_read_block(rows, m)

# Reproduce the dispatch's ref prep exactly (descending length, one chunk).
order = sorted(range(len(refs)), key=lambda i: (-len(refs[i]), i))
n_pad = _quantize_15(max(be.ref_bucket, len(refs[order[0]])), be.ref_bucket)
lens = np.array([len(refs[i]) for i in order], np.int32)

u, t4 = plan_varlen(rb, m, n_pad, 64)
nb_host = np.where(lens > 0, -(-(m + lens - 1) // u), 1).astype(np.int32)
padded_steps = int(nb_host.sum()) * u
padded_cells = rows * m * padded_steps

print(f"workload: rows={rows} m={m} rb={rb} C={len(refs)} n_pad={n_pad} u={u} t4={t4}")
print(f"geometry: lane_fill={rows*m/read_bp:.3f}x  "
      f"triangle+rounding={padded_steps/ref_bp:.3f}x  "
      f"combined={padded_cells/real_cells:.3f}x")


def fence(x):
    return float(np.asarray(jnp.ravel(x)[0]))


def timeit(name, fn, iters=ITERS):
    fence(fn())  # warm/compile
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    fence(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {1e3*dt:8.2f} ms")
    return dt


# -- host side ----------------------------------------------------------
t0 = time.perf_counter()
for _ in range(ITERS):
    refs_enc = encode_batch([refs[i] for i in order], n_pad, REF_PAD)
t_enc = (time.perf_counter() - t0) / ITERS
print(f"{'host: ref encode_batch':28s} {1e3*t_enc:8.2f} ms")

refs_i = jnp.asarray(refs_enc).astype(jnp.int32)
nb = jnp.asarray(nb_host)

# -- device components --------------------------------------------------
t_win = timeit("dev: window build (packed4)", lambda: _diag_windows_packed4(refs_i, m, t4))
win4 = _diag_windows_packed4(refs_i, m, t4)
win4.block_until_ready()
t_ilv = timeit("dev: ilv(win4)", lambda: _ilv_jit(win4))
win4_i = _ilv_jit(win4)
packed_i = _ilv_jit(jnp.asarray(pack["packed"], jnp.int32))
fence(packed_i)

kern = lambda: _varlen_call(
    nb, packed_i, win4_i, match=5, mismatch=-3, gap=-4,
    read_block=rb, unroll=u, interleaved=True, interpret=False,
)
t_kern = timeit("dev: varlen kernel", kern)
lane = kern()
lane.block_until_ready()
sp = jnp.asarray(varlen_start_phys(np.asarray(pack["start_idx"]), m))
t_epi = timeit("dev: col-sums epilogue", lambda: packed_col_sums(lane, sp))

# -- whole path for comparison -----------------------------------------
for _ in range(2):
    t0 = time.perf_counter()
    be.totals(reads, refs)
    t_tot = time.perf_counter() - t0
print(f"{'whole totals() pass':28s} {1e3*t_tot:8.2f} ms")

kernel_padded_gcups = padded_cells / t_kern / 1e9
print()
print(f"kernel padded rate: {kernel_padded_gcups:.1f} GCUPS")
print(f"kernel real-cell rate (geometry only): {real_cells/t_kern/1e9:.1f} GCUPS")
dev_sum = t_win + t_ilv + t_kern + t_epi
print(f"device components sum: {1e3*dev_sum:.1f} ms "
      f"(+host {1e3*t_enc:.1f} ms = {1e3*(dev_sum+t_enc):.1f} ms vs whole {1e3*t_tot:.1f} ms)")
print(f"e2e budget: real rate if only kernel ran: {real_cells/t_kern/1e9:.1f}; "
      f"with all components: {real_cells/(dev_sum+t_enc)/1e9:.1f}")
