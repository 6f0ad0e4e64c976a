"""Window-build cost alone, fenced with block_until_ready."""
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
from sparksmithwaterman_tpu.ops.pallas_score import _diag_windows, plan_diag

_BASES = np.array(list("ACGT"))
rng = np.random.default_rng(1)
groups = {768: 32, 1024: 24, 1536: 40, 2048: 32, 3072: 80, 4096: 72}
m = 256
tot = 0.0
for n_pad, c in sorted(groups.items()):
    refs = ["".join(rng.choice(_BASES, size=n_pad)) for _ in range(c)]
    refs_enc = jax.device_put(
        encode_batch(refs, n_pad, REF_PAD).astype(np.int32)
    )
    plan = plan_diag(248, m, n_pad, 64)
    unroll, t_pad = plan
    fence = jax.jit(lambda w: w[0, 0, 0] + w[-1, -1, -1])
    np.asarray(fence(_diag_windows(refs_enc, m, t_pad)))  # warm
    iters = 10
    t0 = time.perf_counter()
    outs = [fence(_diag_windows(refs_enc, m, t_pad)) for _ in range(iters)]
    np.asarray(outs[-1])
    dt = (time.perf_counter() - t0) / iters
    mb = c * t_pad * m * 4 / 1e6
    tot += dt
    print(f"n={n_pad:5d} c={c:3d} t_pad={t_pad} {1e3*dt:7.2f}ms table={mb:.0f}MB bw={mb/1e3/dt:.0f}GB/s")
print(f"total build: {1e3*tot:.1f}ms")
