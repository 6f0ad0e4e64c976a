"""Isolate the packed-kernel slowdown: step variants A-E at one shape."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparksmithwaterman_tpu.ops.pallas_score import (
    _START_BIT, _diag_windows, plan_diag, _segmented_suffix_max,
)
from sparksmithwaterman_tpu.io.fasta import REF_PAD, encode_batch
from sparksmithwaterman_tpu.cli import enable_compile_cache

M, MM, G = 5, -3, -4


def make_kernel(variant, diags, unroll):
    def kern(reads_ref, win_ref, out_ref):
        rb, m = reads_ref.shape
        dt = jnp.int32
        raw = reads_ref[:]
        reads_block = raw & (_START_BIT - 1)
        startm = raw >= _START_BIT
        lane0 = jax.lax.broadcasted_iota(jnp.int32, (rb, m), dimension=1) == 0
        nonstart = (~startm).astype(dt)       # 0/1 int mask
        match_c, mismatch_c, gap_c, zero_c = (
            jnp.asarray(M, dt), jnp.asarray(MM, dt), jnp.asarray(G, dt), jnp.asarray(0, dt))

        def step(d1, r1, r2, refwin):
            sub = jnp.where(reads_block == refwin.astype(dt), match_c, mismatch_c)
            gterm = jnp.maximum(r1, d1) + gap_c
            c1 = jnp.maximum(jnp.maximum(r2 + sub, gterm), zero_c)
            if variant == "A":      # current: select with loaded i1 mask
                rc = jnp.where(startm, zero_c, pltpu.roll(c1, shift=1, axis=1))
            elif variant == "B":    # iota mask (wrong semantics, perf only)
                rc = jnp.where(lane0, zero_c, pltpu.roll(c1, shift=1, axis=1))
            elif variant == "C":    # int multiply mask
                rc = pltpu.roll(c1, shift=1, axis=1) * nonstart
            elif variant == "D":    # no mask at all (wrong, perf only)
                rc = pltpu.roll(c1, shift=1, axis=1)
            return c1, rc

        def body(t, carry):
            d1, r1, r2, best = carry
            base = unroll * t
            bm = None; prev = None
            for k in range(unroll):
                c1, rc = step(d1, r1, r2, win_ref[0, pl.ds(base + k, 1), :])
                if prev is None:
                    prev = c1
                else:
                    pair = jnp.maximum(prev, c1)
                    bm = pair if bm is None else jnp.maximum(bm, pair)
                    prev = None
                d1, r2, r1 = c1, r1, rc
            if prev is not None:
                bm = prev if bm is None else jnp.maximum(bm, prev)
            return d1, r1, r2, jnp.maximum(best, bm)

        zeros = jnp.zeros((rb, m), dt)
        _, _, _, best = jax.lax.fori_loop(
            0, -(-diags // unroll), body, (zeros, zeros, zeros, zeros))
        if variant == "E":
            out_ref[0, :, :] = best  # skip suffix max (use with A step? no: E uses A-step below)
        else:
            out_ref[0, :, :] = _segmented_suffix_max(best, startm)
    return kern


def run(variant, rows=248, m=256, c=64, n=1024, rb=248, iters=8, unroll=16):
    rng = np.random.default_rng(0)
    packed = rng.integers(65, 85, size=(rows, m)).astype(np.int32)
    packed[:, 0] |= _START_BIT
    refs = ["".join(rng.choice(np.array(list("ACGT")), size=n)) for _ in range(c)]
    refs_enc = encode_batch(refs, n, REF_PAD)
    diags = m + n - 1
    _, t_pad = plan_diag(rb, m, n, unroll)
    windows = _diag_windows(jnp.asarray(refs_enc).astype(jnp.int32), m, t_pad)
    packed_j = jnp.asarray(packed)
    kern = make_kernel(variant, diags, unroll)

    @jax.jit
    def call(packed_j, windows):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((c, rows, m), jnp.int32),
            grid=(c, rows // rb),
            in_specs=[
                pl.BlockSpec((rb, m), lambda ci, ri: (ri, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, t_pad, m), lambda ci, ri: (ci, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, rb, m), lambda ci, ri: (ci, ri, 0), memory_space=pltpu.VMEM),
            cost_estimate=pl.CostEstimate(
                flops=10 * rows * m * c * n,
                bytes_accessed=4 * (rows * m + c * t_pad * m + c * rows * m),
                transcendentals=0),
        )(packed_j, windows)

    np.asarray(call(packed_j, windows))
    t0 = time.perf_counter()
    outs = [call(packed_j, windows) for _ in range(iters)]
    np.asarray(outs[-1])
    dt = (time.perf_counter() - t0) / iters
    cells = rows * m * c * n
    print(f"variant {variant} u={unroll}: {dt*1000:.1f}ms padded={cells/dt/1e9:.0f} G/s")


if __name__ == "__main__":
    enable_compile_cache()
    for v in ["A", "B", "C", "D", "E"]:
        run(v)
