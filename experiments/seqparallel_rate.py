"""Measured SeqParallelBackend.totals rates (VERDICT r2 task 4 record).

Run twice:
  python experiments/seqparallel_rate.py            # real chip, seq=1
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python experiments/seqparallel_rate.py        # virtual 8-dev mesh
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

from sparksmithwaterman_tpu.cli import enable_compile_cache

enable_compile_cache()

from sparksmithwaterman_tpu.config import AlignConfig, ScoringScheme
from sparksmithwaterman_tpu.parallel.seqparallel import SeqParallelBackend

_BASES = np.array(list("ACGT"))
rng = np.random.default_rng(1)
n_reads = int(os.environ.get("SEQ_READS", 16))
n_refs = int(os.environ.get("SEQ_REFS", 8))
reads = ["".join(rng.choice(_BASES, size=128)) for _ in range(n_reads)]
refs = ["".join(rng.choice(_BASES, size=3072)) for _ in range(n_refs)]
real_cells = sum(map(len, reads)) * sum(map(len, refs))

be = SeqParallelBackend(
    AlignConfig(ref_dir=".", in_dir=".", out_dir=".", scoring=ScoringScheme())
)
print(f"devices={len(jax.devices())} backend={jax.default_backend()}")
t0 = time.perf_counter()
be.totals(reads, refs)  # compile + warm
print(f"warm: {time.perf_counter()-t0:.1f}s")
best = 0.0
for _ in range(3):
    t0 = time.perf_counter()
    be.totals(reads, refs)
    dt = time.perf_counter() - t0
    best = max(best, real_cells / dt / 1e9)
print(f"seqparallel totals: {best:.2f} real GCUPS ({real_cells/1e9:.2f} Gcells)")
