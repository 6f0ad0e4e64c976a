"""Ref time-packing (the 1.128x triangle lever) re-measured at read
scale — VERDICT r4 task 8 (2026-08-21).

The e2e budget names the triangle + unroll-rounding factor (1.128x at
the bench shape; (m + n - 1)/n geometry per reference) the largest
remaining geometric lever.  The only way to remove it is ref
TIME-PACKING: chain references along the diagonal axis of one program
so the m-1-diagonal ramp is paid once per chain instead of once per
ref.  Chaining needs either

  a) a decay SPACER of REF_PAD columns long enough for every lane's
     score to drain to zero (5m/4 columns at +5/-4 scoring: ~320 for
     m=256 — MORE than the m-1 ramp it saves: arithmetically a loss,
     no kernel needed), or
  b) a MOVING boundary mask: per step, lanes past the current ref's end
     must read 0 through the rolls — one iota compare + two full-width
     selects per step.

This script measures (b)'s tax directly on the register-resident step
chain (`ops/microbench` form, no DMA): the exact `_make_step` chain
vs the same chain with the moving-boundary masking added, at the e2e
read-scale shape (rb=248, m=256) and the fold shape (rb=256, m=256).

Decision rule: the mask pays only if tax < the 1.128x triangle gain.

Run: python experiments/triangle_timepack.py
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from sparksmithwaterman_tpu.cli import enable_compile_cache
from sparksmithwaterman_tpu.ops.pallas_score import _START_BIT, _make_step


def _chain_kernel(
    reads_ref, out_ref, *, steps, unroll, masked,
):
    rb, m = reads_ref.shape
    dt = jnp.int32
    raw = reads_ref[:]
    reads_block = raw & (_START_BIT - 1)
    startm = raw >= _START_BIT
    step = _make_step(reads_block, startm, 5, -3, -4, dt)
    refwin = reads_ref[pl.ds(0, 1), :] & 255
    col = jax.lax.broadcasted_iota(jnp.int32, (rb, m), dimension=1)
    zero = jnp.asarray(0, dt)

    def body(t, carry):
        d1, r1, r2, best = carry
        base = t * unroll
        bm = None
        prev = None
        for k in range(unroll):
            c1, rc = step(d1, r1, r2, refwin)
            if masked:
                # Moving ref boundary: lanes whose diagonal clock has
                # left the current reference must hold 0 so the next
                # chained ref's DP restarts cleanly through the rolls —
                # one compare + two full-width selects per step, the
                # honest per-step cost of time-packing.
                b = (base + k) & 1023  # traced, step-dependent boundary
                live = col < b
                c1 = jnp.where(live, c1, zero)
                rc = jnp.where(live, rc, zero)
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
        0, steps // unroll, body, (zeros, zeros, zeros, zeros)
    )
    out_ref[...] = best


@functools.partial(jax.jit, static_argnames=("steps", "unroll", "masked"))
def _chain_call(reads_i, *, steps, unroll, masked):
    rb, m = reads_i.shape
    return pl.pallas_call(
        functools.partial(
            _chain_kernel, steps=steps, unroll=unroll, masked=masked
        ),
        out_shape=jax.ShapeDtypeStruct((rb, m), jnp.int32),
    )(reads_i)


def rate(rb, m, masked, steps=131_072, unroll=64, iters=20):
    rng = np.random.default_rng(0)
    reads_i = jnp.asarray(rng.integers(2, 6, size=(rb, m)), jnp.int32)
    out = _chain_call(reads_i, steps=steps, unroll=unroll, masked=masked)
    float(np.asarray(out)[0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = _chain_call(reads_i, steps=steps, unroll=unroll, masked=masked)
    float(np.asarray(out)[0, 0])
    dt = (time.perf_counter() - t0) / iters
    return rb * m * steps / dt / 1e9


def main():
    enable_compile_cache()
    for rb, m in ((248, 256), (256, 256)):
        plain = rate(rb, m, masked=False)
        taxed = rate(rb, m, masked=True)
        tax = plain / taxed
        print(
            f"rb={rb} m={m}: plain {plain:.1f} GCUPS | "
            f"masked {taxed:.1f} GCUPS | tax {tax:.3f}x "
            f"(triangle gain at e2e geometry: 1.128x -> "
            f"{'WIN' if tax < 1.128 else 'DEAD END'})"
        )


if __name__ == "__main__":
    main()
