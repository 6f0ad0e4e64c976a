"""Per-group timing of the backend's real packed dispatch, fencing on
the tiny (C,) col sums only."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

from sparksmithwaterman_tpu.cli import enable_compile_cache

enable_compile_cache()

from sparksmithwaterman_tpu.config import AlignConfig, ScoringScheme
from sparksmithwaterman_tpu.io.fasta import REF_PAD, encode_batch
from sparksmithwaterman_tpu.models.batch_backend import BatchBackend

_BASES = np.array(list("ACGT"))
rng = np.random.default_rng(1)
reads = ["".join(rng.choice(_BASES, size=int(l))) for l in rng.integers(80, 151, size=512)]

be = BatchBackend(AlignConfig(ref_dir=".", in_dir=".", out_dir=".", scoring=ScoringScheme()))
packs = be._pack_chunks(reads, 10**9)
pack = packs[0]
rows, m = pack["rows"], pack["m_pack"]
print(f"rows={rows} m={m}")

groups = {768: 25, 1024: 21, 1536: 33, 2048: 32, 3072: 76, 4096: 69}

for n_pad, c in sorted(groups.items()):
    refs = ["".join(rng.choice(_BASES, size=n_pad)) for _ in range(c)]
    refs_enc = encode_batch(refs, n_pad, REF_PAD)
    np.asarray(be._packed_col_sums(pack, refs_enc))  # warm
    iters = 10
    t0 = time.perf_counter()
    outs = [be._packed_col_sums(pack, refs_enc) for _ in range(iters)]
    np.asarray(outs[-1])
    dt = (time.perf_counter() - t0) / iters
    cells = c * n_pad * rows * m
    print(
        f"n={n_pad:5d} c={c:3d} t={1e3*dt:7.2f}ms padded_gcups={cells/dt/1e9:6.1f}"
    )
