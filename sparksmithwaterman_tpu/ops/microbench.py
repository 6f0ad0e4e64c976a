"""Measured VPU roofline for the wavefront step (VERDICT r3 task 7).

`vpu_step_roofline` runs the EXACT step chain of the wavefront kernels
(`pallas_score._make_step`: substitution select, gap max-add, NW add,
relu-max, lane shift) with the substitution row held constant in
registers — no window DMA, no byte-unpack, no boundary selects.  Its
cell rate is therefore the chip-measured ceiling for this recurrence:
the fastest any wavefront variant could go on this VPU with zero memory
traffic.  ``kernel_pct_vpu_sol`` in bench.py divides the real kernel's
padded rate by this number, replacing the round-1 hand model
("~10 vector ops/cell against ~4e12 int ops/s") with a measurement.
"""

from __future__ import annotations

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roofline_kernel(
    reads_ref, out_ref, *, steps, match, mismatch, gap, unroll
):
    from sparksmithwaterman_tpu.ops.pallas_score import (
        _START_BIT,
        _make_step,
    )

    rb, m = reads_ref.shape
    dt = jnp.int32
    raw = reads_ref[:]
    reads_block = raw & (_START_BIT - 1)
    startm = raw >= _START_BIT
    step = _make_step(reads_block, startm, match, mismatch, gap, dt)
    refwin = reads_ref[pl.ds(0, 1), :] & 255  # any (1, M) register row

    def body(t, carry):
        d1, r1, r2, best = carry
        bm = None
        prev = None
        for _ in range(unroll):
            c1, rc = step(d1, r1, r2, refwin)
            if prev is None:
                prev = c1
            else:
                pair = jnp.maximum(prev, c1)
                bm = pair if bm is None else jnp.maximum(bm, pair)
                prev = None
            d1, r2, r1 = c1, r1, rc
        return d1, r1, r2, jnp.maximum(best, bm)

    zeros = jnp.zeros((rb, m), dt)
    _, _, _, best = jax.lax.fori_loop(
        0, steps // unroll, body, (zeros, zeros, zeros, zeros)
    )
    out_ref[...] = best


@functools.partial(
    jax.jit, static_argnames=("steps", "match", "mismatch", "gap", "unroll")
)
def _roofline_call(reads_i, *, steps, match, mismatch, gap, unroll):
    rb, m = reads_i.shape
    return pl.pallas_call(
        functools.partial(
            _roofline_kernel,
            steps=steps, match=match, mismatch=mismatch, gap=gap,
            unroll=unroll,
        ),
        out_shape=jax.ShapeDtypeStruct((rb, m), jnp.int32),
    )(reads_i)


def vpu_step_roofline(
    rb: int = 248,
    m: int = 256,
    steps: int = 131_072,
    iters: int = 20,
    unroll: int = 64,
    params=(5, -3, -4),
) -> float:
    """Measured step-chain ceiling in (padded) GCUPS at kernel shapes.

    ``steps`` must be large enough that one call runs tens of ms of
    pure VPU work (at 8k steps the measurement was dispatch-latency
    bound through the remote tunnel and read 3x BELOW the real kernel)
    and ``unroll`` matches the real kernels' 64 (a 16-step body
    measured ~13% below the kernel itself — too little ILP to be a
    ceiling).  Defaults mirror the e2e hot dispatch.  Fenced by a
    tiny host fetch of the last queued output (remote-tunnel contract).
    """
    rng = np.random.default_rng(0)
    reads_i = jnp.asarray(rng.integers(2, 6, size=(rb, m)), jnp.int32)
    kw = dict(
        steps=steps, match=int(params[0]), mismatch=int(params[1]),
        gap=int(params[2]), unroll=unroll,
    )
    out = _roofline_call(reads_i, **kw)
    float(np.asarray(out)[0, 0])  # compile + settle
    t0 = time.perf_counter()
    for _ in range(iters):
        out = _roofline_call(reads_i, **kw)
    float(np.asarray(out)[0, 0])
    dt = (time.perf_counter() - t0) / iters
    return rb * m * steps / dt / 1e9
