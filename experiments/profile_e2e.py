"""Breakdown of one bench_e2e totals() pass: host dispatch vs device wait.

Usage: python experiments/profile_e2e.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from sparksmithwaterman_tpu.cli import enable_compile_cache

enable_compile_cache()

from sparksmithwaterman_tpu.config import AlignConfig, ScoringScheme
from sparksmithwaterman_tpu.models.batch_backend import BatchBackend

_BASES = np.array(list("ACGT"))
rng = np.random.default_rng(1)
reads = ["".join(rng.choice(_BASES, size=int(l))) for l in rng.integers(80, 151, size=512)]
refs = ["".join(rng.choice(_BASES, size=int(l))) for l in rng.integers(500, 4000, size=256)]
real_cells = sum(map(len, reads)) * sum(map(len, refs))

be = BatchBackend(AlignConfig(ref_dir=".", in_dir=".", out_dir=".", scoring=ScoringScheme()))

# warm
be.totals(reads, refs)

for it in range(3):
    t0 = time.perf_counter()
    pending, total_cells = be._dispatch_cols(reads, refs)
    t1 = time.perf_counter()
    import jax.numpy as jnp
    flat = np.asarray(jnp.concatenate([col for _, col in pending]))
    t2 = time.perf_counter()
    padded = 0
    print(
        f"pass {it}: dispatches={len(pending)} "
        f"host_dispatch={1e3*(t1-t0):.1f}ms device_wait={1e3*(t2-t1):.1f}ms "
        f"total={1e3*(t2-t0):.1f}ms real_gcups={real_cells/(t2-t0)/1e9:.1f}"
    )

# shape census of dispatches
from collections import Counter
shapes = Counter()
# re-derive what was dispatched: group refs
from sparksmithwaterman_tpu.models.batch_backend import _group_by_padded_len
ref_groups = _group_by_padded_len(refs, be.ref_bucket, geometric=True)
for n_pad, idx in sorted(ref_groups.items()):
    shapes[n_pad] = len(idx)
print("ref groups (n_pad -> count):", dict(shapes))
packs = be._pack_chunks(reads, 10**9)
for p in packs:
    print(f"pack: rows={p['rows']} m_pack={p['m_pack']} read_bp={p['read_bp']}")
    real_read_bp = p["read_bp"]
    print(f"  pack lane waste: {p['rows']*p['m_pack']/real_read_bp:.2f}x")
tot_real_ref = sum(map(len, refs))
tot_pad_ref = sum(n_pad * len(idx) for n_pad, idx in ref_groups.items())
print(f"ref padding: {tot_pad_ref/tot_real_ref:.3f}x")
