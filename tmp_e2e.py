import time, numpy as np
from sparksmithwaterman_tpu.config import AlignConfig, ScoringScheme
from sparksmithwaterman_tpu.models.batch_backend import BatchBackend
rng = np.random.default_rng(0)
BASES="ACGT"
def seq(n): return "".join(BASES[i] for i in rng.integers(0,4,size=n))
reads = [seq(int(l)) for l in rng.integers(80,151,size=512)]
refs  = [seq(int(l)) for l in rng.integers(500,4000,size=256)]
cells = sum(map(len,reads))*sum(map(len,refs))
be = BatchBackend(AlignConfig(ref_dir=".", in_dir=".", out_dir="."))
t=be.totals(reads, refs)  # warm/compile
for it in range(3):
    t0=time.perf_counter(); t=be.totals(reads, refs); dt=time.perf_counter()-t0
    print(f"iter{it}: {cells/dt/1e9:.0f} GCUPS real cells  ({dt*1e3:.0f} ms)", flush=True)
