"""Long-reference e2e budget + the round-5 multi-ref fold (VERDICT r4
task 2).

The shipped long-ref path (bench_longref: 64 reads x 128bp vs 8 refs x
131 kb through ``BatchBackend.totals``) recorded 54.5 GCUPS in round 4
against a committed 251-253 GCUPS chunked-kernel rate at the same ref
length.  This script decomposes one totals() pass into components that
SUM (like experiments/profile_varlen_budget.py for the varlen path) and
A/Bs the round-5 fix: folding all C refs into the row dimension of one
program (``pallas_lane_best_packed_multi``) so their serial diagonal
chains collapse into one with C x the ILP.

Run:  python experiments/profile_longref_budget.py
"""

import time

import numpy as np

import jax

from sparksmithwaterman_tpu.cli import enable_compile_cache
from sparksmithwaterman_tpu.config import AlignConfig, ScoringScheme
from sparksmithwaterman_tpu.io.fasta import REF_PAD, encode_batch
from sparksmithwaterman_tpu.models.batch_backend import (
    BatchBackend,
    _choose_fold,
)
from sparksmithwaterman_tpu.ops import pallas_score as ps
from sparksmithwaterman_tpu.ops.packing import pack_reads

_BASES = np.array(list("ACGT"))


def _fence(x):
    # block_until_ready can return before remote execution finishes on
    # the axon tunnel; a host fetch of a SMALL output is the fence.  The
    # fetch must be tiny: np.asarray of a whole array ships it through
    # the tunnel (~30 MB/s — a 269 MB window table "fence" measured
    # 8.6 s and swamped the build timing on the first run).
    leaf = jax.tree_util.tree_leaves(x)[-1]
    return np.asarray(leaf.ravel()[:1] if hasattr(leaf, "ravel") else leaf)


def timed(fn, iters=5, warm=1):
    for _ in range(warm):
        _fence(fn())
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _fence(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    enable_compile_cache()
    rng = np.random.default_rng(5)
    reads = ["".join(rng.choice(_BASES, size=128)) for _ in range(64)]
    refs = ["".join(rng.choice(_BASES, size=131_072)) for _ in range(8)]
    real_cells = sum(map(len, reads)) * sum(map(len, refs))
    params = (5, -3, -4)

    packed, si = pack_reads(reads, 256, row_multiple=8)
    rows, m = packed.shape
    c = len(refs)
    cf = _choose_fold(c, rows)
    print(f"rows={rows} m={m} c={c} -> fold cf={cf}")
    plan = ps.plan_multi(
        BatchBackend._pack_read_block(rows, m), m, cf, 64
    )
    print(f"plan_multi: unroll={plan[0]} chunk4={plan[1]}")

    n_pad = 131_072
    refs_enc = encode_batch(refs, n_pad, REF_PAD)
    refs_dev = jax.device_put(refs_enc)
    packed_dev = jax.device_put(packed)

    diags = m + n_pad - 1
    u, c4 = plan
    num_chunks = -(-diags // (4 * c4))
    t4 = num_chunks * c4

    # -- component: window build (byte-packed, interleaved order) -------
    build = jax.jit(
        lambda r: ps._diag_windows_packed4(
            r.astype(np.int32), m, t4, ilv=True
        )
    )
    t_build = timed(lambda: build(refs_dev))
    win4 = build(refs_dev)
    gb = win4.size * 4 / 1e9
    print(f"window build: {t_build*1e3:.1f} ms ({gb:.2f} GB table)")

    # -- component: folded kernel proper (window prebuilt) --------------
    rb = BatchBackend._pack_read_block(rows, m)
    packed_ilv = ps._ilv_jit(jax.numpy.asarray(packed_dev, np.int32))
    _fence(packed_ilv)

    def kern():
        return ps._multi_call(
            packed_ilv, win4,
            match=5, mismatch=-3, gap=-4,
            read_block=rb, cf=cf, chunk4=c4, unroll=u,
            num_chunks=num_chunks, interleaved=True, interpret=False,
        )

    t_kern = timed(kern)
    padded_cells = (4 * t4) * rows * m * (c // cf)  # steps x state lanes
    print(
        f"folded kernel: {t_kern*1e3:.1f} ms "
        f"({real_cells/t_kern/1e9:.1f} real GCUPS, "
        f"{padded_cells/t_kern/1e9:.1f} padded)"
    )

    # -- component: bare dispatch+fetch round trip (the tunnel floor) ---
    trivial = jax.jit(lambda x: x + 1)
    t_rtt = timed(lambda: trivial(jax.numpy.int32(1)))
    print(f"dispatch+fetch RTT floor: {t_rtt*1e3:.1f} ms")

    # -- e2e A/B through the backend ------------------------------------
    scoring = ScoringScheme(match=5, mismatch=-3, gap=-4)
    cfg = AlignConfig(ref_dir=".", in_dir=".", out_dir=".", scoring=scoring)

    be_new = BatchBackend(cfg)
    t_new = timed(lambda: be_new.totals(reads, refs), iters=5)
    print(
        f"totals() WITH fold: {t_new*1e3:.1f} ms "
        f"= {real_cells/t_new/1e9:.1f} real GCUPS"
    )

    # -- sustained: back-to-back best_of_async (the pipeline's protocol:
    # flush k+1 dispatches before flush k resolves, hiding the RTT) ----
    be_new.best_of(reads, refs)  # warm
    iters = 5
    t0 = time.perf_counter()
    resolvers = [be_new.best_of_async(reads, refs) for _ in range(iters)]
    for r in resolvers:
        r()
    t_sus = (time.perf_counter() - t0) / iters
    print(
        f"sustained best_of_async x{iters}: {t_sus*1e3:.1f} ms/call "
        f"= {real_cells/t_sus/1e9:.1f} real GCUPS"
    )

    # old path: disable the fold
    import sparksmithwaterman_tpu.models.batch_backend as bb

    old = bb._choose_fold
    bb._choose_fold = lambda c_, rows_: 1
    try:
        be_old = BatchBackend(cfg)
        t_old = timed(lambda: be_old.totals(reads, refs), iters=3)
        print(
            f"totals() OLD (cf=1): {t_old*1e3:.1f} ms "
            f"= {real_cells/t_old/1e9:.1f} real GCUPS"
        )
    finally:
        bb._choose_fold = old

    print(
        f"residual (e2e - kernel - build): "
        f"{(t_new - t_kern - t_build)*1e3:.1f} ms "
        f"(dispatch/fetch round-trip latency through the tunnel)"
    )


if __name__ == "__main__":
    main()
