"""Pallas TPU kernel for the Smith-Waterman score pass.

This is the performance-critical DP fill as a real on-device Mosaic
kernel (the TPU-native replacement for the reference's per-diagonal Spark
jobs, ``src/sw/DistributedSW.java:192-245``).  Design:

- Grid ``(C, R/RB)``: each program scores one reference row against a
  block of RB reads.  The reference block is reused across the inner
  read-block grid dimension (Mosaic revisits the same ref block, so the
  HBM->VMEM copy is amortized).
- DP state is two (RB, N) int32 registers/VMEM values carried through a
  ``fori_loop`` over read positions — the anti-diagonal "broadcast to
  S/E/SE neighbors" of the reference becomes lane-shifted vector reads.
- The within-row W-dependency is the linear-gap prefix max
  (see ops/recurrence.py), computed by log2(N) masked lane rolls.

Padding contract: reads are 0-padded, refs 1-padded; pad codes match
nothing and mismatch/gap are negative, so padded regions strictly decay
and never affect the maximum (see ops/recurrence.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -(2**30)  # plain int: jnp scalars would be captured consts


def _shift_right_fill(x, shift, fill):
    """Shift x right along lanes by `shift`, filling vacated columns."""
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=x.ndim - 1)
    rolled = pltpu.roll(x, shift=shift, axis=x.ndim - 1)
    return jnp.where(col >= shift, rolled, fill)


def _lane_cummax(x, window=None):
    """Cumulative max along the last axis via log-doubling rolls.

    ``window`` truncates the doubling: the result is then a sliding-
    window max of width >= window, which equals the true prefix max
    whenever no value can influence cells further than ``window`` lanes
    away (see ``_propagation_window``).
    """
    n = x.shape[-1]
    limit = n if window is None else min(n, window)
    shift = 1
    while shift < limit:
        x = jnp.maximum(x, _shift_right_fill(x, shift, _NEG_INF))
        shift *= 2
    return x


def _propagation_window(m: int, match: int, gap: int) -> int:
    """Max lanes a row candidate can influence under a linear gap.

    A candidate A[k] <= match*m propagated to column j contributes
    ``A[k] - |gap|*(j-k)``; the local candidate is >= 0, so influence
    dies beyond ``match*m/|gap|`` lanes.  Exact for positive match and
    negative gap (asserted by config); the truncated cummax is then
    identical to the full prefix max.
    """
    return (match * m) // (-gap) + 2


def _score_kernel(reads_ref, refs_ref, out_ref, *, match, mismatch, gap):
    """One program: scores RB reads against one reference sequence.

    reads_ref:  (RB, M) int32 VMEM
    refs_ref:   (1, 1, N) int32 VMEM (leading dim = ref grid axis)
    out_ref:    (1, R/RB, RB) int32 VMEM — the whole slab for this ref
                stays resident across the inner (read-block) grid dim;
                each program writes its own row.

    Scoring parameters are compile-time constants: they fold into the
    vector ops and make the cummax propagation window static.
    """
    rb, m = reads_ref.shape
    n = refs_ref.shape[2]
    window = _propagation_window(m, match, gap)

    ref_row = refs_ref[0, :, :]  # (1, N)
    col = jax.lax.broadcasted_iota(jnp.int32, (rb, n), dimension=1)
    ramp = gap * col  # (RB, N)

    reads_block = reads_ref[:]  # (RB, M), loaded once
    read_lane = jax.lax.broadcasted_iota(jnp.int32, (rb, m), dimension=1)

    def body(i, carry):
        h_prev, best = carry
        # Dynamic lane extraction via masked reduction: Mosaic cannot load
        # a single dynamically-indexed lane column from VMEM.
        read_c = jnp.sum(
            jnp.where(read_lane == i, reads_block, 0), axis=1, keepdims=True
        )  # (RB, 1)
        sub = jnp.where(ref_row == read_c, match, mismatch)  # (RB, N)
        nw = _shift_right_fill(h_prev, 1, 0)
        a = nw + sub
        ins = h_prev + gap
        cand = jnp.maximum(jnp.maximum(a, ins), 0)
        h = _lane_cummax(cand - ramp, window) + ramp
        best = jnp.maximum(best, jnp.max(h, axis=1, keepdims=True))
        return h, best

    h0 = jnp.zeros((rb, n), jnp.int32)
    best0 = jnp.zeros((rb, 1), jnp.int32)
    _, best = jax.lax.fori_loop(0, m, body, (h0, best0))
    out_ref[0, pl.program_id(1), :] = best[:, 0]


@functools.partial(
    jax.jit,
    static_argnames=("match", "mismatch", "gap", "read_block", "interpret"),
)
def pallas_score_grid(
    reads,
    refs,
    match,
    mismatch,
    gap,
    *,
    read_block: int = 64,
    interpret: bool = False,
):
    """Max SW score for every (read, ref) combination via the TPU kernel.

    Args:
      reads: (R, M) uint8, R a multiple of read_block.
      refs:  (C, N) uint8.
      match/mismatch/gap: STATIC ints (one compile per scoring scheme).
    Returns:
      (R, C) int32 scores.
    """
    r, m = reads.shape
    c, n = refs.shape
    if r % read_block != 0:
        raise ValueError(f"R={r} must be a multiple of read_block={read_block}")
    match, mismatch, gap = int(match), int(mismatch), int(gap)
    reads_i = reads.astype(jnp.int32)
    # 3-D shapes so the block's last two dims equal the array dims
    # (Mosaic tiling constraint: last two block dims must be (8k, 128k)
    # or match the array).
    refs_i = refs.astype(jnp.int32)[:, None, :]  # (C, 1, N)

    grid = (c, r // read_block)
    kernel = functools.partial(
        _score_kernel, match=match, mismatch=mismatch, gap=gap
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((c, r // read_block, read_block), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (read_block, m), lambda ci, ri: (ri, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, n), lambda ci, ri: (ci, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, r // read_block, read_block),
            lambda ci, ri: (ci, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        cost_estimate=pl.CostEstimate(
            # ~20 int ops per DP cell (shift/max/select chains).
            flops=20 * r * m * c * n,
            bytes_accessed=r * m + c * n + 4 * c * r,
            transcendentals=0,
        ),
        interpret=interpret,
    )(reads_i, refs_i)
    return out.reshape(c, r).T  # (R, C)


def _diag_kernel(
    reads_ref, win_ref, out_ref, *, match, mismatch, gap, diags, dtype, unroll
):
    """Anti-diagonal program: RB reads vs one reference sequence.

    The reference's wavefront fills one anti-diagonal per *Spark job*
    with S/E/SE broadcasts into the next two diagonals
    (``src/sw/DistributedSW.java:192-245``, ``Broadcast`` :364-417).
    Here one diagonal is one ``fori_loop`` step: the predecessor-diagonal
    state is loop-carried VMEM registers and the S/E/SE broadcast is a
    single lane shift.  Unlike the row kernel above there is **no
    intra-step dependence** (the within-row gap chain never appears on an
    anti-diagonal), so no prefix-max: ~10 vector ops per DP cell.

    reads_ref: (RB, M) int32 VMEM — lane = read position i.
    win_ref:   (1, T, M) int32 VMEM — win[d, i] = ref[d-i] (REF_PAD when
               out of range), i.e. the diagonal's substitution column,
               pre-gathered by XLA so the kernel never does a dynamic
               lane extraction.
    out_ref:   (1, R/RB, RB) int32 — best score per read for this ref.

    Cell (i, j) lives on diagonal d = i + j at lane i:
        D_d[i] = max(0, D_{d-2}[i-1] + sub(read[i], ref[d-i]),
                        D_{d-1}[i-1] + gap,   # N  (insertion)
                        D_{d-1}[i]   + gap)   # W  (deletion)
    The i-1 lane shift of a diagonal is consumed twice (as the N term of
    d+1 and the NW term of d+2), so the carry holds the PRE-SHIFTED
    values rm(D) = shift(D) with lane 0 zeroed — one roll+mask per
    diagonal instead of two (measured 237 -> ~300 GCUPS on v5e).
    Lane-0 zero fill encodes the H[-1, *] = 0 boundary row; the
    H[*, -1] = 0 boundary column falls out of the invalid-lane region
    (lanes i > d) holding exactly 0 — pad codes match nothing and
    mismatch/gap < 0, so those lanes can never go positive.
    """
    rb, m = reads_ref.shape
    dt = dtype
    reads_block = reads_ref[:].astype(dt)  # (RB, M), loaded once
    lane0 = (
        jax.lax.broadcasted_iota(jnp.int32, (rb, m), dimension=1) == 0
    )
    match_c = jnp.asarray(match, dt)
    mismatch_c = jnp.asarray(mismatch, dt)
    gap_c = jnp.asarray(gap, dt)
    zero_c = jnp.asarray(0, dt)

    def step(d1, r1, r2, d):
        # d1 = D_{d-1};  r1 = rm(D_{d-1});  r2 = rm(D_{d-2})
        refwin = win_ref[0, pl.ds(d, 1), :]  # (1, M) sublane-dynamic slice
        sub = jnp.where(reads_block == refwin.astype(dt), match_c, mismatch_c)
        gterm = jnp.maximum(r1, d1) + gap_c  # N and W share the gap add
        c1 = jnp.maximum(jnp.maximum(r2 + sub, gterm), zero_c)
        rc = jnp.where(lane0, zero_c, pltpu.roll(c1, shift=1, axis=1))
        return c1, rc

    # `unroll` diagonals per fori_loop iteration (must be even so every
    # carry output is a computed value — a pure pass-through slot keeps
    # the replicated layout of the splat-zero init while receiving a
    # concrete-layout value, which Mosaic rejects: "Invalid relayout:
    # ... '{0,0}' -> '{*,*}'").  Unrolling amortizes loop/bounds
    # overhead and lets Mosaic software-pipeline the window loads:
    # measured 157 -> 246 GCUPS going from 2 to 32 on v5e.  The window
    # table has >= unroll-1 spare PAD rows (t_pad in the wrapper), so
    # overshoot diagonals are harmless all-decay steps.
    def body(t, carry):
        d1, r1, r2, best = carry
        base = unroll * t
        # Pairwise-fold the running max so only O(1) diagonals stay live:
        # keeping all `unroll` outputs for a balanced max tree costs
        # unroll * RB * M * 4 bytes of VMEM stack (16MB at 64 x 256 x 256
        # — a scoped-vmem OOM); one extra max per EVEN diagonal keeps the
        # best-chain off the critical path at depth unroll/2 + 1.
        bm = None
        prev = None
        for k in range(unroll):
            c1, rc = step(d1, r1, r2, base + k)
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
        0, -(-diags // unroll), body, (zeros, zeros, zeros, zeros)
    )
    # Widen before the lane reduction: Mosaic has no int16 reductions.
    out_ref[0, pl.program_id(1), :] = jnp.max(best.astype(jnp.int32), axis=1)


def _vmem_limit() -> float:
    """Scoped-VMEM budget for the unroll model, by chip generation.

    The r2 calibration (16 MB) was done on v5e; v4/v5p share the 16 MB
    per-core VMEM while v6e doubles it (public TPU system specs).  The
    table errs to 16 MB for unknown kinds; ``SWTPU_VMEM_LIMIT`` (bytes)
    overrides everything — and the runtime fallback in
    ``models/batch_backend._vmem_retry`` catches a misprediction on the
    actual Mosaic RESOURCE_EXHAUSTED instead of crashing (VERDICT r2
    task 5).
    """
    import os

    env = os.environ.get("SWTPU_VMEM_LIMIT")
    if env:
        return float(env)
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return 16.0e6
    if "v6" in kind:
        return 32.0e6
    return 16.0e6


def _auto_unroll(
    unroll: int, rb: int, m: int, win_rows: int, extra_regs: int = 0
) -> int:
    """Largest even unroll <= requested that fits Mosaic's scoped VMEM,
    or 0 if no even unroll >= 2 fits (callers must then shrink the
    window — smaller chunk — or fall back to the chunked kernel).

    The kernel's scoped-vmem stack is ~(0.65*unroll + 4 + extra_regs)
    (RB, M) int32 values (the unrolled diagonal chain — Mosaic keeps each
    unrolled c1 in its own stack slot despite the pairwise fold) plus
    the window block, which budgets as TRIPLE-buffered.  Calibrated on
    v5e against three hardware observations: rb=512/m=128/u=64/t=2240
    fits (the bench config; model 15.6MB), rb=256/m=256/u=64/t=2368
    OOMs at a reported 17.89MB (model 19.5MB), rb=192/m=256/u=64/t=2368
    OOMs at a reported 16.05MB (model 16.4MB) — the model errs
    conservative on both failures.  Without this cap, read batches
    padded past 128bp crash the whole-table kernel at the default
    unroll=64.  The limit is per-generation (``_vmem_limit``), and a
    runtime fallback covers mispredictions (VERDICT r2 task 5).
    """
    limit = _vmem_limit()
    unroll &= ~1  # the diag kernels require an even unroll (see _diag_kernel)
    while unroll >= 2:
        est = 4 * (
            (0.65 * unroll + 4 + extra_regs) * rb * m + 3 * win_rows * m
        )
        if est <= limit:
            return unroll
        # Descend in even steps of 8 (not halving): at rb=256/m=256 the
        # largest fitting unroll is 40 (287 GCUPS) vs 32 from halving
        # (278 GCUPS).  Below 8, halve with evenness forced.
        unroll = unroll - 8 if unroll > 8 else (unroll // 2) & ~1
    return 0


def diag_read_block(r_pad: int, m_pad: int) -> int:
    """Wavefront read block: largest halving of ``r_pad`` that stays a
    multiple of 8, subject to rb * m <= 64k int32 elements.

    (For 1.5-mantissa ladder row counts like 384 the result is 192 —
    not a power of two; the invariant is divisibility by 8, the Pallas
    grid divisor.)  Bigger blocks feed the serial diagonal chain more
    ILP (rb=512 at m=128 measures 331-354 GCUPS vs 82 at rb=64), but
    past rb*m = 64k the scoped-VMEM cap forces the unroll down faster
    than the extra rows pay (rb=512/m=256 measured 253 vs 284 at
    rb=256/m=256)."""
    rb = r_pad
    while rb > 8 and rb * m_pad > 65536 and (rb // 2) % 8 == 0:
        rb //= 2
    if rb * m_pad > 65536:
        # Halving stalled on a non-power-of-two row count (e.g. 47880
        # rows from a 100K-read pack): fall to the largest multiple of
        # 8 under the cap, then step down until it DIVIDES r_pad — the
        # kernels raise on r_pad % read_block != 0 and two of the three
        # callers pass rb straight through (e.g. r_pad=24 with a giant
        # m_pad would otherwise get the non-divisor 16).
        rb = max(8, (65536 // max(1, m_pad)) & ~7)
        while rb > 8 and r_pad % rb:
            rb -= 8
    return rb


def plan_diag(read_block: int, m: int, n: int, unroll: int = 64):
    """Resolve (unroll, t_pad) for the whole-table diag kernel.

    Returns None when no even unroll >= 2 fits the scoped-VMEM model —
    the triple-buffered (t_pad, m) window alone can exceed the limit for
    long refs x wide reads, in which case callers must stream the window
    (``pallas_score_grid_diag_chunked``) instead of dispatching a config
    the model says cannot fit.
    """
    diags = m + n - 1
    t_pad = -(-(diags + unroll - 1) // 8) * 8
    u = _auto_unroll(unroll, read_block, m, t_pad)
    if u == 0:
        return None
    t_pad = -(-(diags + u - 1) // 8) * 8
    return u, t_pad


def plan_carry(read_block: int, m: int, diags: int, unroll: int = 64):
    """(unroll, num_bodies) for the CARRY-window kernels, or None.

    The carry form holds no (T, M) window in VMEM — only the DP state
    and a tiny (T/unroll, M) entrants block — so the unroll budget is
    governed by the diagonal-chain state alone and stays at 64 for any
    reference length (the whole-table form decays to unroll 8 by
    n=4096 at m=256: the triple-buffered window eats 13.4 of 16 MB)."""
    u = unroll & ~1
    limit = _vmem_limit()
    while u >= 2:
        nb = -(-diags // u)
        est = 4 * ((0.65 * u + 6) * read_block * m + 3 * nb * m)
        if est <= limit:
            return u, nb
        u = u - 8 if u > 8 else (u // 2) & ~1
    return None


@functools.partial(jax.jit, static_argnames=("m", "unroll", "num_bodies"))
def _entrants(refs_i, m: int, unroll: int, num_bodies: int):
    """(C, N) int32 refs -> (C, NB, M) entrant rows for the carry
    kernels: row t holds ref[unroll*t + k] at lane k (k < unroll),
    REF_PAD (=1) past the reference end and at lanes >= unroll.

    This replaces the O((M+N)·M) `_diag_windows` Toeplitz table with an
    O(N) reshape: the kernel reconstructs each diagonal's substitution
    column in registers by rolling the previous one and inserting one
    entrant base per step.  Its own jit for the same layout reason as
    `_diag_windows`."""
    c, n = refs_i.shape
    if unroll > m:
        raise ValueError(f"unroll={unroll} must be <= m={m}")
    t_total = num_bodies * unroll
    padded = jnp.pad(
        refs_i, ((0, 0), (0, t_total - n)), constant_values=jnp.int32(1)
    )
    ent = padded.reshape(c, num_bodies, unroll)
    return jnp.pad(
        ent, ((0, 0), (0, 0), (0, m - unroll)), constant_values=jnp.int32(1)
    )


def _carry_body(step, ent_ref, lane0_row, unroll):
    """fori_loop body shared by the carry-window kernels.

    Carry layout: (d1, r1, r2, best, refwin) — the wavefront state of
    `_make_step` plus the carried (1, M) substitution column
    refwin[i] = ref[d - i].  Advancing one diagonal is
        refwin <- insert(ref[d+1] at lane 0, roll(refwin, 1))
    — 3 single-sublane ops per step (two rolls + a select) against the
    step's ~8 full-(RB, M) ops, i.e. ~1% overhead, in exchange for no
    (T, M) window in VMEM at all."""

    def body(t, carry):
        d1, r1, r2, best, refwin = carry
        er = ent_ref[0, pl.ds(t, 1), :]  # ONE sublane slice per body
        bm = None
        prev = None
        for k in range(unroll):
            refwin = jnp.where(
                lane0_row, er, pltpu.roll(refwin, shift=1, axis=1)
            )
            er = pltpu.roll(er, shift=er.shape[-1] - 1, axis=1)
            c1, rc = step(d1, r1, r2, refwin)
            if prev is None:
                prev = c1
            else:
                pair = jnp.maximum(prev, c1)
                bm = pair if bm is None else jnp.maximum(bm, pair)
                prev = None
            d1, r2, r1 = c1, r1, rc
        if prev is not None:
            bm = prev if bm is None else jnp.maximum(bm, prev)
        return d1, r1, r2, jnp.maximum(best, bm), refwin

    return body


def _diag_kernel_packed_carry(
    reads_ref, ent_ref, out_ref, *, match, mismatch, gap, unroll, num_bodies
):
    """Carry-window variant of `_diag_kernel_packed`: same recurrence
    and packed-segment semantics, the ref window carried in registers
    instead of loaded from a (T, M) table (see `_entrants`)."""
    rb, m = reads_ref.shape
    dt = jnp.int32
    raw = reads_ref[:]
    reads_block = raw & (_START_BIT - 1)
    startm = raw >= _START_BIT
    step = _make_step(reads_block, startm, match, mismatch, gap, dt)
    lane0_row = jax.lax.broadcasted_iota(jnp.int32, (1, m), dimension=1) == 0
    body = _carry_body(step, ent_ref, lane0_row, unroll)
    zeros = jnp.zeros((rb, m), dt)
    pad_row = jnp.full((1, m), 1, dt)  # REF_PAD
    _, _, _, best, _ = jax.lax.fori_loop(
        0, num_bodies, body, (zeros, zeros, zeros, zeros, pad_row)
    )
    out_ref[0, :, :] = _segmented_suffix_max(best, startm)


def _diag_kernel_carry(
    reads_ref, ent_ref, out_ref, *, match, mismatch, gap, unroll, num_bodies
):
    """Carry-window variant of `_diag_kernel` (unpacked reads)."""
    rb, m = reads_ref.shape
    dt = jnp.int32
    reads_block = reads_ref[:]
    lane0 = jax.lax.broadcasted_iota(jnp.int32, (rb, m), dimension=1) == 0
    step = _make_step(reads_block, lane0, match, mismatch, gap, dt)
    lane0_row = jax.lax.broadcasted_iota(jnp.int32, (1, m), dimension=1) == 0
    body = _carry_body(step, ent_ref, lane0_row, unroll)
    zeros = jnp.zeros((rb, m), dt)
    pad_row = jnp.full((1, m), 1, dt)  # REF_PAD
    _, _, _, best, _ = jax.lax.fori_loop(
        0, num_bodies, body, (zeros, zeros, zeros, zeros, pad_row)
    )
    out_ref[0, pl.program_id(1), :] = jnp.max(best, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "match", "mismatch", "gap", "read_block", "unroll", "num_bodies",
        "diags", "packed", "interpret",
    ),
)
def _carry_call(
    reads_i, ents, *, match, mismatch, gap, read_block, unroll, num_bodies,
    diags, packed, interpret,
):
    """pallas_call wrapper shared by the carry-window kernels.

    Returns (C, ROWS, M) per-lane best for packed=True, else
    (C, R/RB, RB) per-read best."""
    rows, m = reads_i.shape
    c = ents.shape[0]
    n = diags - m + 1
    grid = (c, rows // read_block)
    kern = _diag_kernel_packed_carry if packed else _diag_kernel_carry
    kernel = functools.partial(
        kern,
        match=match, mismatch=mismatch, gap=gap, unroll=unroll,
        num_bodies=num_bodies,
    )
    out_shape = (
        jax.ShapeDtypeStruct((c, rows, m), jnp.int32)
        if packed
        else jax.ShapeDtypeStruct((c, rows // read_block, read_block), jnp.int32)
    )
    out_spec = (
        pl.BlockSpec(
            (1, read_block, m), lambda ci, ri: (ci, ri, 0),
            memory_space=pltpu.VMEM,
        )
        if packed
        else pl.BlockSpec(
            (1, rows // read_block, read_block), lambda ci, ri: (ci, 0, 0),
            memory_space=pltpu.VMEM,
        )
    )
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (read_block, m), lambda ci, ri: (ri, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, num_bodies, m), lambda ci, ri: (ci, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=out_spec,
        cost_estimate=pl.CostEstimate(
            flops=10 * rows * m * c * n,
            bytes_accessed=4 * (rows * m + c * num_bodies * m + c * rows * m),
            transcendentals=0,
        ),
        interpret=interpret,
    )(reads_i, ents)


@functools.partial(jax.jit, static_argnames=("m", "t4", "ilv"))
def _diag_windows_packed4(refs_i, m: int, t4: int, ilv: bool = False):
    """(C, N) int32 refs -> (C, T4, M) windows BYTE-PACKED 4 diagonals
    per int32 word along T: word[c, t, i] packs win[c, 4t+k, i] (base
    codes are <= 255) into byte k.

    4x less VMEM than `_diag_windows` for the same diagonal span — the
    triple-buffered whole-table window at m=256/n=4096 eats 13.4 of
    16 MB and forces the unroll to 8; byte-packed it is 3.4 MB and the
    unroll stays 64.  Unpacking costs a shift+mask on a (1, M) row per
    diagonal, independent across steps (unlike the carry-window's
    serial roll chain, measured 5-15% SLOWER than the table — these
    extracts pipeline).  Own jit for the `_diag_windows` layout
    reason."""
    # Byte-pack the PADDED REF STREAM once (tiny), then build each
    # window column from CONTIGUOUS word slices + shift/or.  Two
    # rejected forms: (a) reshape (C, T4, 4, M) + unstack makes XLA
    # materialize s32[C, T4, 4, 1] remat copies whose minor dim pads
    # 128x (408 MB per temp at C=192 -> HBM OOM); (b) four stride-4 T
    # slices of the full (C, 4*T4, M) table cost ~57 ms at the e2e
    # flush shape (strided HBM reads).
    c, n = refs_i.shape
    l_total = (m - 1) + 4 * t4
    w = -(-l_total // 4)
    pad_byte = jnp.int32(1)  # REF_PAD
    padded = jnp.pad(
        refs_i, ((0, 0), (m - 1, 4 * w - n - (m - 1))),
        constant_values=pad_byte,
    ).astype(jnp.uint32)
    parts = [
        jax.lax.slice_in_dim(padded, k, 4 * w, stride=4, axis=1)
        for k in range(4)
    ]
    p4 = parts[0] | (parts[1] << 8) | (parts[2] << 16) | (parts[3] << 24)
    p4 = jnp.pad(
        p4, ((0, 0), (0, 1)), constant_values=jnp.uint32(0x01010101)
    )  # one spare word of REF_PAD bytes for the r>0 carry slice
    cols = []
    # ``ilv``: emit the columns directly in the `_ilv_lanes` physical
    # order (phys p = hh*128 + l holds logical lane l*h + hh) — a pure
    # permutation of this python list, so the interleaved table costs
    # the SAME build as the plain one and the separate `_ilv_jit` pass
    # (~4 ms + a dispatch round-trip per flush) disappears.
    h = m // 128
    order = (
        [(p % 128) * h + p // 128 for p in range(m)]
        if ilv and m % 128 == 0 and h > 1
        else range(m)
    )
    for i in order:
        x = m - 1 - i  # byte offset of lane i's diagonal-0 base
        r = x % 4
        q0 = x // 4
        a = jax.lax.slice_in_dim(p4, q0, q0 + t4, axis=1)
        if r == 0:
            col = a
        else:
            b = jax.lax.slice_in_dim(p4, q0 + 1, q0 + 1 + t4, axis=1)
            col = (a >> (8 * r)) | (b << (32 - 8 * r))
        cols.append(col)
    return jnp.stack(cols, axis=2).astype(jnp.int32)  # (C, T4, M)


def _diag_windows_packed4_shear(refs_i, m: int, t4: int, ilv: bool = False):
    """`_diag_windows_packed4` rebuilt from a SHEAR instead of M column
    slices (round 5).

    The column build stacks M per-lane word slices; XLA serializes the
    stack into minor-dim strided writes that measure ~10 GB/s — at the
    131 kb fold shape (C=8, T4=33024, M=256) the 269 MB table costs
    ~26 ms, as much as the folded kernel itself.  This form builds every
    shifted view at once: broadcasting the packed ref stream A to
    (Q, L+Q) rows and reshaping through a width-(L+1) flat buffer yields
    S[q, t] = A[q + t] (the classic as-strided shear) in a handful of
    ops; the 4 byte phases are then vectorized shift/ors of S against
    its +1-word neighbor, and ONE transpose assembles (C, T4, M) — in
    the interleaved lane order directly, since the H-tile layout is a
    pure regrouping of the (shear-row, phase) index pair.

    Valid for m % 128 == 0 with m//128 in {1, 2, 4, 8} (every packed
    lane tier); callers fall back to the column build otherwise.
    """
    c, n = refs_i.shape
    if m % 128 or not (1 <= m // 128 <= 8) or (m // 128 & (m // 128 - 1)):
        raise ValueError(f"shear build needs m=128*2^k, got m={m}")
    # Byte-packed padded ref stream, exactly as the column build.
    l_total = (m - 1) + 4 * t4
    w = -(-l_total // 4)
    pad_byte = jnp.int32(1)  # REF_PAD
    padded = jnp.pad(
        refs_i, ((0, 0), (m - 1, 4 * w - n - (m - 1))),
        constant_values=pad_byte,
    ).astype(jnp.uint32)
    parts = [
        jax.lax.slice_in_dim(padded, k, 4 * w, stride=4, axis=1)
        for k in range(4)
    ]
    p4 = parts[0] | (parts[1] << 8) | (parts[2] << 16) | (parts[3] << 24)

    q_rows = m // 4 + 1  # shear rows: q0 in [0, m/4 - 1] plus q0+1
    lp = t4 + q_rows
    pad_word = jnp.uint32(0x01010101)  # REF_PAD bytes
    a = jnp.pad(
        p4, ((0, 0), (0, lp - p4.shape[1])), constant_values=pad_word
    )
    # S[c, q, t] = a[c, q + t]: flatten a (Q, LP) broadcast and re-cut it
    # at width LP+1 — each row starts one element later.
    flat = jnp.broadcast_to(a[:, None, :], (c, q_rows, lp)).reshape(
        c, q_rows * lp
    )
    flat = jnp.pad(flat, ((0, 0), (0, q_rows)), constant_values=pad_word)
    s = flat.reshape(c, q_rows, lp + 1)[:, :, :t4]
    # Lane i = 4*sa + ph maps to x = m-1-i = 4*(m/4-1-sa) + (3-ph):
    # shear row q0 = m/4-1-sa (a FLIP over sa) and byte phase r = 3-ph.
    y0 = jnp.flip(s[:, : q_rows - 1, :], axis=1)  # [sa] = S[m/4-1-sa]
    y1 = jnp.flip(s[:, 1:q_rows, :], axis=1)      # [sa] = S[m/4-sa]
    phases = []
    for ph in range(4):
        r = 3 - ph
        if r == 0:
            phases.append(y0)
        else:
            phases.append((y0 >> (8 * r)) | (y1 << (32 - 8 * r)))
    h = m // 128
    if not ilv or h <= 1:
        z = jnp.stack(phases, axis=2)  # (C, M/4, 4, T4)
        win = jnp.transpose(z, (0, 3, 1, 2)).reshape(c, t4, m)
    elif h == 2:
        # phys tile hh holds logical i ≡ hh (mod 2) = phase parity,
        # ordered by l = i//2 = 2*sa + ph//2.
        t0 = jnp.stack([phases[0], phases[2]], axis=2)
        t1 = jnp.stack([phases[1], phases[3]], axis=2)
        win = jnp.concatenate(
            [
                jnp.transpose(t0, (0, 3, 1, 2)).reshape(c, t4, m // 2),
                jnp.transpose(t1, (0, 3, 1, 2)).reshape(c, t4, m // 2),
            ],
            axis=2,
        )
    elif h == 4:
        # i % 4 = ph: tile hh IS phase hh, ordered by sa.
        win = jnp.concatenate(
            [
                jnp.transpose(phases[ph], (0, 2, 1))
                for ph in range(4)
            ],
            axis=2,
        )
    else:  # h == 8: i % 8 = 4*(sa % 2) + ph -> strided sa slices
        tiles = []
        for hh in range(8):
            ph, b = hh % 4, hh // 4
            tiles.append(
                jnp.transpose(phases[ph][:, b::2, :], (0, 2, 1))
            )
        win = jnp.concatenate(tiles, axis=2)
    return win.astype(jnp.int32)


def _windows_packed4_best(refs_i, m: int, t4: int, ilv: bool = False):
    """Shear build where its layout preconditions hold, else the column
    build — one entry point for the jitted wrapper below."""
    h = m // 128
    if m % 128 == 0 and 1 <= h <= 8 and not (h & (h - 1)):
        return _diag_windows_packed4_shear(refs_i, m, t4, ilv)
    return _diag_windows_packed4(refs_i, m, t4, ilv)


# Jitted shear form — used ONLY inside the shard_map band path (where
# the column stack's 128x-padded per-lane temps OOM under the SPMD
# partitioner) and available for probes.  The EAGER column build stays
# the shipped form for the varlen/multi/engine call sites: context A/Bs
# on hardware measured it FASTER than this jit despite isolated probes
# favoring the shear (e2e 230.7 vs 220.3, long-ref sustained 248.1 vs
# 205.1 GCUPS) — the eager ops' host dispatch overlaps device
# execution, while the jitted program serializes a slower device-side
# build (~10 GB/s strided-relayout wall at the 269 MB shape) into the
# stream.
_diag_windows_packed4_jit = jax.jit(
    _windows_packed4_best, static_argnames=("m", "t4", "ilv")
)


def plan_varlen(read_block: int, m: int, n_max: int, unroll: int = 64):
    """(unroll, t4) for the varlen packed kernel, or None.

    t4 counts byte-packed window rows; the scoped-VMEM budget uses the
    packed (4x smaller) window, so unroll=64 holds to far longer
    references than `plan_diag` (v5e: n=4096/m=256 plans u=8 whole vs
    u=64 here)."""
    u = min(unroll, m) & ~7
    while u >= 8:
        nb = -(-(m + n_max - 1) // u)
        t4 = -(-(nb * u) // 4)
        t4 = -(-t4 // 8) * 8
        if 4 * ((0.65 * u + 4) * read_block * m + 3 * t4 * m) <= _vmem_limit():
            return u, t4
        u -= 8
    return None


def _ilv_lanes(arr):
    """Interleave the last (lane) dim for the H-tile layout: logical
    lane i = l*H + h  ->  physical lane h*128 + l  (H = m // 128).

    In this layout the wavefront's logical shift-by-1 becomes a tile
    PERMUTE (free — register renaming) plus ONE single-tile lane roll,
    instead of a roll across H lane tiles: on v5e the m=256 two-tile
    roll costs the kernel ~20% of its step rate (354 padded GCUPS at
    m=128 vs 275 at m=256, same rb*m)."""
    m = arr.shape[-1]
    if m % 128:
        raise ValueError(f"interleave needs m % 128 == 0, got m={m}")
    h = m // 128
    if h <= 1:
        return arr
    lead = arr.shape[:-1]
    return (
        arr.reshape(*lead, 128, h)
        .swapaxes(-1, -2)
        .reshape(*lead, m)
    )


def _deilv_lanes(arr):
    """Inverse of `_ilv_lanes`."""
    m = arr.shape[-1]
    if m % 128:
        raise ValueError(f"interleave needs m % 128 == 0, got m={m}")
    h = m // 128
    if h <= 1:
        return arr
    lead = arr.shape[:-1]
    return (
        arr.reshape(*lead, h, 128)
        .swapaxes(-1, -2)
        .reshape(*lead, m)
    )


_ilv_jit = jax.jit(_ilv_lanes)
_deilv_jit = jax.jit(_deilv_lanes)


def _ilv_tiles(x, h):
    return [x[:, j * 128 : (j + 1) * 128] for j in range(h)]


def _make_ilv_shift1(h):
    """Logical i-1 shift in the interleaved layout (lane 0 garbage —
    callers mask it, same contract as the plain roll)."""

    def shift1(x):
        ts = _ilv_tiles(x, h)
        first = pltpu.roll(ts[h - 1], shift=1, axis=1)
        return jnp.concatenate([first] + ts[: h - 1], axis=1)

    return shift1


def _ilv_logical_col(shape, h):
    """(..., M) LOGICAL lane index at each physical position of the
    interleaved layout: phys = hh*128 + l  ->  logical l*h + hh."""
    phys = jax.lax.broadcasted_iota(jnp.int32, shape, dimension=len(shape) - 1)
    return (phys % 128) * h + phys // 128


def _make_ilv_shift_left(h, col_log):
    """Logical left-shift-by-s with fill, interleaved layout.

    Output tile j's source for logical lane i = l*h + j is logical
    i + s = (l + (j+s)//h)*h + (j+s)%h, i.e. source tile (j+s) % h
    advanced by (j+s)//h lanes — a roll by 128 - advance.  When s is a
    multiple of h the advance is the uniform s//h and each tile is its
    own source (pure single-tile rolls); otherwise the advance still
    varies per tile and can exceed 1 for s > h (e.g. h=3, s=4: tile 2
    advances 2 lanes) — the general form below handles every (h, s),
    including non-power-of-two h from m = 384, 768 lane widths."""

    def shift_left(x, s, fill):
        m = x.shape[-1]
        ts = _ilv_tiles(x, h)
        parts = []
        for j in range(h):
            src = ts[(j + s) % h]
            adv = ((j + s) // h) % 128
            if adv:
                src = pltpu.roll(src, shift=128 - adv, axis=1)
            parts.append(src)
        rolled = jnp.concatenate(parts, axis=1)
        return jnp.where(col_log < m - s, rolled, fill)

    return shift_left


def _plain_shift_left(x, s, fill):
    return _shift_left_fill(x, s, fill)


def _diag_kernel_packed_varlen(
    nb_ref, reads_ref, win_ref, out_ref, *, match, mismatch, gap, unroll,
    interleaved,
):
    """Varlen packed wavefront: per-REFERENCE loop bounds via scalar
    prefetch + byte-packed window.

    Each grid program runs only ceil((m + n_c - 1)/unroll) bodies for
    ITS reference (`nb_ref`, prefetched to SMEM) — short references in
    a mixed batch cost their true diagonal count, not the longest
    reference's, so the backend needs NO length-ladder grouping: one
    dispatch scores every reference of an input flush and the ladder's
    ~17% padded-FLOP waste disappears (the reference's analogue is one
    Spark job per DIAGONAL, `src/sw/DistributedSW.java:192-245`).

    With ``interleaved`` the inputs (reads, window) arrive in the
    `_ilv_lanes` layout and the output stays in it (the wrapper
    de-interleaves): every lane roll in the hot loop is single-tile."""
    rb, m = reads_ref.shape
    dt = jnp.int32
    raw = reads_ref[:]
    reads_block = raw & (_START_BIT - 1)
    startm = raw >= _START_BIT
    h = m // 128
    if interleaved and h > 1:
        shift1 = _make_ilv_shift1(h)
        col_log = _ilv_logical_col((rb, m), h)
        shift_left = _make_ilv_shift_left(h, col_log)
    else:
        shift1 = None
        shift_left = _plain_shift_left
    step = _make_step(
        reads_block, startm, match, mismatch, gap, dt, shift1=shift1
    )
    words = unroll // 4

    def body(t, carry):
        d1, r1, r2, best = carry
        base = words * t
        bm = None
        prev = None
        w = None
        for k in range(unroll):
            if k % 4 == 0:
                w = win_ref[0, pl.ds(base + k // 4, 1), :]  # (1, M) word row
                refwin = w & 255
            else:
                refwin = (w >> (8 * (k % 4))) & 255
            c1, rc = step(d1, r1, r2, refwin)
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

    nb = nb_ref[pl.program_id(0)]
    zeros = jnp.zeros((rb, m), dt)
    _, _, _, best = jax.lax.fori_loop(
        0, nb, body, (zeros, zeros, zeros, zeros)
    )
    out_ref[0, :, :] = _segmented_suffix_max(
        best, startm, shift_left=shift_left
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "match", "mismatch", "gap", "read_block", "unroll", "interleaved",
        "interpret",
    ),
)
def _varlen_call(
    nb, packed, win4, *, match, mismatch, gap, read_block, unroll,
    interleaved, interpret,
):
    rows, m = packed.shape
    c, t4, _ = win4.shape
    grid = (c, rows // read_block)
    kernel = functools.partial(
        _diag_kernel_packed_varlen,
        match=match, mismatch=mismatch, gap=gap, unroll=unroll,
        interleaved=interleaved,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (read_block, m), lambda ci, ri, nb_ref: (ri, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, t4, m), lambda ci, ri, nb_ref: (ci, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, read_block, m), lambda ci, ri, nb_ref: (ci, ri, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((c, rows, m), jnp.int32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=10 * rows * m * c * 4 * t4,
            bytes_accessed=4 * (rows * m + c * t4 * m + c * rows * m),
            transcendentals=0,
        ),
        interpret=interpret,
    )(nb, packed, win4)


def pallas_lane_best_packed_varlen(
    packed,
    refs,
    lens,
    match,
    mismatch,
    gap,
    *,
    read_block: int = 8,
    unroll: int = 64,
    interpret: bool = False,
    deinterleave: bool = True,
):
    """(C, ROWS, M) per-lane maxima for packed read rows vs MIXED-length
    references in ONE dispatch.

    Same output contract as :func:`pallas_lane_best_packed`; `refs` is
    (C, N_max) padded with REF_PAD and `lens` the true lengths.  Each
    reference's wavefront stops after its own diagonal count (scalar-
    prefetched loop bounds) and the window is byte-packed, so a mixed
    batch needs no length grouping and pays no length-ladder padding.

    ``deinterleave=False`` returns the (C, ROWS, M) output in the RAW
    `_ilv_lanes` physical layout when m > 128: the de-interleave
    transpose costs ~0.25 ms per 10 MB of output (its bytes scale with
    C), while a caller that only gathers start lanes can instead map
    its indices to the physical layout for free (see
    `varlen_start_phys`) — the hot-path backends do exactly that.
    """
    rows, m = packed.shape
    c, n_max = refs.shape
    if rows % read_block != 0:
        raise ValueError(
            f"ROWS={rows} must be a multiple of read_block={read_block}"
        )
    match, mismatch, gap = int(match), int(mismatch), int(gap)
    plan = plan_varlen(read_block, m, n_max, unroll)
    if plan is None:
        raise ValueError(
            f"varlen packed kernel cannot fit VMEM at "
            f"read_block={read_block}, m={m}, n_max={n_max}"
        )
    u, t4 = plan
    lens = jnp.asarray(lens, jnp.int32)
    # Padding refs (lens == 0) run exactly ONE loop body: their window
    # is all REF_PAD, which scores 0 everywhere, so the remaining
    # ceil(m/u) bodies a real zero-length sweep would run are pure
    # waste — this is what makes ladder-quantizing C nearly free.
    nb = jnp.where(lens > 0, -(-(m + lens - 1) // u), 1)
    # Interleaving needs the lane count to split into whole 128-lane
    # tiles; any tile count h >= 2 (incl. non-powers-of-two, e.g.
    # m=384 -> h=3) is handled by the generalized tile-permute shifts.
    ilv = m % 128 == 0 and m // 128 > 1
    # The window builds DIRECTLY in the interleaved lane order (a pure
    # permutation of the build's column list — same cost as the plain
    # layout, no separate transpose pass).  The packed reads still take
    # the standalone `_ilv_jit` (tiny, and fusing a lane transpose into
    # other jits wedges the remote XLA compile helper at these shapes).
    # EAGER on purpose — see `_diag_windows_packed4_jit`'s context A/B.
    win4 = _diag_windows_packed4(
        jnp.asarray(refs).astype(jnp.int32), m, t4, ilv=ilv
    )
    packed_i = jnp.asarray(packed, jnp.int32)
    if ilv:
        packed_i = _ilv_jit(packed_i)
    out = _varlen_call(
        nb, packed_i, win4,
        match=match, mismatch=mismatch, gap=gap,
        read_block=read_block, unroll=u, interleaved=ilv,
        interpret=interpret,
    )
    # Back to logical lane order so read_best / packed_col_sums gather
    # with logical flat indices unchanged.
    return _deilv_jit(out) if (ilv and deinterleave) else out


def varlen_start_phys(start_idx, m: int):
    """Map flat logical start indices (row*m + lane) to the varlen
    kernel's physical (interleaved) layout — the free alternative to
    ``deinterleave=True`` for gather-only consumers.  Identity when the
    kernel does not interleave (same gate: m a multiple of 128 with
    at least two tiles)."""
    h = m // 128
    if m % 128 or h <= 1:
        return np.asarray(start_idx)
    row, lane = np.divmod(np.asarray(start_idx), m)
    return row * m + (lane % h) * 128 + lane // h


def _plan_chunk(
    read_block: int, m: int, chunk: int, unroll: int, extra_regs: int
):
    """Resolve (chunk, unroll) for the chunked diag kernels.

    Halves the chunk until some even unroll fits scoped VMEM (the
    triple-buffered (chunk, m) window is the dominant term for wide
    reads), then shrinks the unroll to a divisor of the chunk.
    """
    while True:
        u = _auto_unroll(unroll, read_block, m, chunk, extra_regs=extra_regs)
        if u:
            break
        if chunk <= 8:
            raise ValueError(
                f"no chunked-kernel config fits scoped VMEM at "
                f"read_block={read_block}, m={m}"
            )
        chunk //= 2
    while u > 2 and chunk % u != 0:
        u -= 2  # the chunked grid needs unroll | chunk
    if chunk % u != 0 or chunk % 8 != 0:
        raise ValueError(f"chunk={chunk} must be a multiple of unroll and 8")
    return chunk, u


@functools.partial(jax.jit, static_argnames=("m", "t_pad"))
def _diag_windows(refs_i, m: int, t_pad: int):
    """(C, N) int32 refs -> (C, T, M) per-diagonal substitution windows.

    win[c, d, i] = refs[c, d-i], REF_PAD (=1, matches no read code)
    outside [0, N).  The table is Toeplitz along (d, i), so column i is
    just the padded ref shifted by i: M static contiguous slices of a
    padded row, stacked — O(C·T·M) sequential HBM writes.  (The obvious
    elementwise gather with a (T, M) index matrix is ~70x slower at
    N ~ 131kb.)

    This is its OWN jit on purpose: called inside the score jit, XLA
    assigns the stack output a non-default layout and the Pallas window
    input DMA goes strided (measured 235 -> 136 GCUPS).  A jit boundary
    forces the default major-to-minor layout.
    """
    n = refs_i.shape[1]
    # padded[c, x] = refs[c, x-(m-1)], PAD outside; len = (m-1) + t_pad
    # (t_pad >= m+n-1 always, so right pad >= m-1 >= 0).
    padded = jnp.pad(
        refs_i, ((0, 0), (m - 1, t_pad - n)), constant_values=jnp.int32(1)
    )
    cols = [
        jax.lax.slice_in_dim(padded, m - 1 - i, m - 1 - i + t_pad, axis=1)
        for i in range(m)
    ]
    return jnp.stack(cols, axis=2)  # (C, T, M)


def pallas_score_grid_diag(
    reads,
    refs,
    match,
    mismatch,
    gap,
    *,
    read_block: int = 256,
    interpret: bool = False,
    state_dtype: str = "auto",
    unroll: int = 64,
    window_mode: str = "auto",
):
    """Max SW score for every (read, ref) pair via the wavefront kernel.

    Same contract as :func:`pallas_score_grid`; ~3x fewer vector ops per
    cell (no prefix-max), at the cost of a (C, M+N-1, M) window gather.
    Best for the common read-vs-gene regime (M ~ 1e2, N ~ 1e3..1e4).

    ``state_dtype``: 'int32', 'int16', or 'auto'.  Scores are bounded by
    ``match * M``, so for real read lengths int16 state is exact and
    would pack two DP cells per 32-bit VPU lane — but the current
    Mosaic/TPU target supports none of the needed 16-bit vector ops
    (measured on v5e: lane rotate "Rotate with non-32-bit data"; compare
    "Target does not support this comparison"; max "failed to legalize
    arith.maxsi"; i1 mask relayout (8,128)->(16,128) "Invalid relayout").
    A sublane-packed roll workaround exists (bitcast int16->int32, lane
    roll, bitcast back — int16 packs sublane PAIRS, so lanes are
    preserved), but without 16-bit max/select the recurrence itself
    cannot run packed.  'auto' therefore resolves to int32 on TPU; the
    int16 path runs in interpret mode and is kept for future targets.
    """
    r, m = reads.shape
    c, n = refs.shape
    if r % read_block != 0:
        raise ValueError(f"R={r} must be a multiple of read_block={read_block}")
    match, mismatch, gap = int(match), int(mismatch), int(gap)
    if state_dtype == "auto":
        state_dtype = "int32"
    dtype = jnp.int16 if state_dtype == "int16" else jnp.int32
    if unroll < 2 or unroll % 2 != 0:
        raise ValueError(f"unroll={unroll} must be an even integer >= 2")
    diags = m + n - 1
    if window_mode == "carry" and state_dtype == "int32":
        # Explicit mode only (measured slower than the table form; see
        # pallas_lane_best_packed).
        cplan = plan_carry(read_block, m, diags, unroll)
        if cplan is None:
            raise ValueError(
                f"carry-window diag kernel cannot fit VMEM at "
                f"read_block={read_block}, m={m}"
            )
        if cplan is not None:
            u, nb = cplan
            ents = _entrants(jnp.asarray(refs).astype(jnp.int32), m, u, nb)
            out = _carry_call(
                jnp.asarray(reads).astype(jnp.int32), ents,
                match=match, mismatch=mismatch, gap=gap,
                read_block=read_block, unroll=u, num_bodies=nb,
                diags=diags, packed=False, interpret=interpret,
            )
            return out.reshape(c, r).T  # (R, C)
    # Sublane-align the table AND guarantee spare PAD rows for the
    # kernel's unroll-diagonals-per-step overshoot.
    plan = plan_diag(read_block, m, n, unroll)
    if plan is None:
        raise ValueError(
            f"whole-table diag kernel cannot fit scoped VMEM at "
            f"read_block={read_block}, m={m}, n={n}; use "
            f"pallas_score_grid_diag_chunked"
        )
    unroll, t_pad = plan
    reads_i = jnp.asarray(reads).astype(jnp.int32)
    # Built OUTSIDE the score jit (see _diag_windows: layout forcing).
    windows = _diag_windows(jnp.asarray(refs).astype(jnp.int32), m, t_pad)
    return _score_diag_call(
        reads_i, windows,
        match=match, mismatch=mismatch, gap=gap, read_block=read_block,
        diags=diags, dtype=dtype, unroll=unroll, interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "match", "mismatch", "gap", "read_block", "diags", "dtype", "unroll",
        "interpret",
    ),
)
def _score_diag_call(
    reads_i, windows, *, match, mismatch, gap, read_block, diags, dtype,
    unroll, interpret,
):
    r, m = reads_i.shape
    c, t_pad, _ = windows.shape
    n = diags - m + 1
    grid = (c, r // read_block)
    kernel = functools.partial(
        _diag_kernel,
        match=match,
        mismatch=mismatch,
        gap=gap,
        diags=diags,
        dtype=dtype,
        unroll=unroll,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((c, r // read_block, read_block), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (read_block, m), lambda ci, ri: (ri, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, t_pad, m), lambda ci, ri: (ci, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, r // read_block, read_block),
            lambda ci, ri: (ci, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        cost_estimate=pl.CostEstimate(
            # ~10 int ops per DP cell (shift + max chains, no cummax).
            flops=10 * r * m * c * n,
            bytes_accessed=4 * (r * m + c * t_pad * m + c * r),
            transcendentals=0,
        ),
        interpret=interpret,
    )(reads_i, windows)
    return out.reshape(c, r).T  # (R, C)


# Segment-start marker for PACKED read rows: lane codes are
# ``base_code | _START_BIT`` at the first lane of each read segment
# (including lane 0 and the first trailing-pad lane).  See
# ``ops/packing.pack_reads`` and ``_diag_kernel_packed``.
_START_BIT = 1 << 8


def _shift_left_fill(x, shift, fill):
    """Shift x left along lanes by ``shift``, filling vacated columns."""
    n = x.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=x.ndim - 1)
    rolled = pltpu.roll(x, shift=n - shift, axis=x.ndim - 1)
    return jnp.where(col < n - shift, rolled, fill)


def _segmented_suffix_max(x, startm, shift_left=None):
    """Per-lane suffix max WITHIN segments: lane i becomes
    max(x[i .. end-of-segment)), segments delimited by ``startm``.

    ``shift_left(x, s, fill)`` overrides the lane-shift primitive (the
    interleaved layout substitutes `_make_ilv_shift_left`; the doubling
    algorithm only needs LOGICAL adjacency, so it is layout-agnostic).

    Log-doubling with a blocked-mask carry: b_s[i] = "a segment start
    lies in lanes (i, i+s]"; the doubling step takes from lane i+s only
    when not blocked.  After this, a segment's START lane holds the max
    over its whole segment — the per-read score — recoverable by a tiny
    gather instead of a 16M-element scatter-max (XLA segment_max
    epilogues measured as the packed path's dominant non-kernel cost).
    """
    m = x.shape[-1]
    if shift_left is None:
        shift_left = _plain_shift_left
    # The blocked mask is carried as int32, not i1: Mosaic cannot rotate
    # non-32-bit vectors ("tpu.dynamic_rotate ... vector<...xi1>").
    one = jnp.asarray(1, jnp.int32)
    blocked = shift_left(startm.astype(jnp.int32), 1, one)
    shift = 1
    while shift < m:
        cand = shift_left(x, shift, jnp.asarray(0, x.dtype))
        x = jnp.where(blocked > 0, x, jnp.maximum(x, cand))
        if 2 * shift < m:
            blocked = blocked | shift_left(blocked, shift, one)
        shift *= 2
    return x


def _diag_kernel_packed(
    reads_ref, win_ref, out_ref, *, match, mismatch, gap, diags, unroll
):
    """Anti-diagonal program over PACKED read rows: one row carries
    several reads back-to-back in its lanes.

    Identical recurrence to ``_diag_kernel`` with one generalization:
    the zero-fill that encodes the H[-1, *] = 0 boundary row is applied
    at every segment-start lane (bit 8 of the input codes), not just
    lane 0 — each read's DP restarts cleanly at its first lane.  The
    window term needs no change: a read starting at lane ``o`` sees
    ``win[d, o+i'] = ref[d-o-i'] = ref[d'-i']`` in its own shifted
    diagonal clock ``d' = d - o``, exactly the unpacked geometry.

    Packing exists because real read batches are ragged: per-read
    padding to the lane width wastes 1.6-2x of the DP work the
    unpacked kernel does (measured on the mixed-length e2e workload),
    while packed rows waste only the trailing lanes of each row.

    Output is the PER-LANE best (1, RB, M) — the per-read maxima are a
    segment reduction over lanes, done by XLA outside the kernel.
    """
    rb, m = reads_ref.shape
    dt = jnp.int32
    raw = reads_ref[:]
    reads_block = raw & (_START_BIT - 1)
    startm = raw >= _START_BIT  # (RB, M) segment-start lanes
    step = _make_step(reads_block, startm, match, mismatch, gap, dt)

    def body(t, carry):
        d1, r1, r2, best = carry
        base = unroll * t
        bm = None
        prev = None
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
        0, -(-diags // unroll), body, (zeros, zeros, zeros, zeros)
    )
    # block is per (ref, read-block) program
    out_ref[0, :, :] = _segmented_suffix_max(best, startm)


def _chunked_kernel_packed(
    reads_ref, win_ref, out_ref, d1_s, r1_s, r2_s, best_s,
    *, match, mismatch, gap, chunk, unroll, num_chunks,
):
    """Chunked variant of ``_diag_kernel_packed`` (streamed window) —
    long references with packed read rows; per-lane best output."""
    rb, m = reads_ref.shape
    dt = jnp.int32
    tc = pl.program_id(2)

    @pl.when(tc == 0)
    def _init():
        d1_s[...] = jnp.zeros((rb, m), dt)
        r1_s[...] = jnp.zeros((rb, m), dt)
        r2_s[...] = jnp.zeros((rb, m), dt)
        best_s[...] = jnp.zeros((rb, m), dt)

    raw = reads_ref[:]
    reads_block = raw & (_START_BIT - 1)
    startm = raw >= _START_BIT
    step = _make_step(reads_block, startm, match, mismatch, gap, dt)

    def body(t, carry):
        d1, r1, r2, best = carry
        base = unroll * t
        bm = None
        prev = None
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

    d1, r1, r2, best = jax.lax.fori_loop(
        0, chunk // unroll, body,
        (d1_s[...], r1_s[...], r2_s[...], best_s[...]),
    )
    d1_s[...] = d1
    r1_s[...] = r1
    r2_s[...] = r2
    best_s[...] = best

    @pl.when(tc == num_chunks - 1)
    def _emit():
        # block is per (ref, read-block) program
        out_ref[0, :, :] = _segmented_suffix_max(best, startm)


def _stream_kernel_packed(
    reads_ref, win_hbm, out_ref, *, match, mismatch, gap, stream_chunk,
    unroll, num_blocks,
):
    """Packed wavefront with the window STREAMED from HBM by explicit
    double-buffered DMA (pallas_guide.md: Patterns/Double Buffering).

    The whole-table form triple-buffers the entire (T, M) window in
    VMEM, which at m=256 squeezes the diagonal unroll to 8-24 for long
    refs (measured 238-250 padded GCUPS); streaming keeps only
    2 x (stream_chunk, M) resident (~1MB), freeing the state budget for
    unroll=64 at any reference length.

    win_hbm: (C, T, M) int32, memory_space=ANY (stays in HBM); this
    program DMAs blocks of ``stream_chunk`` diagonals for ref
    ``program_id(0)``.
    """
    rb, m = reads_ref.shape
    dt = jnp.int32
    ci = pl.program_id(0)
    raw = reads_ref[:]
    reads_block = raw & (_START_BIT - 1)
    startm = raw >= _START_BIT
    step = _make_step(reads_block, startm, match, mismatch, gap, dt)

    def body(scratch, sem):
        def get_dma(slot, blk):
            return pltpu.make_async_copy(
                win_hbm.at[ci, pl.ds(blk * stream_chunk, stream_chunk), :],
                scratch.at[slot],
                sem.at[slot],
            )

        get_dma(0, 0).start()

        def blk_loop(blk, carry):
            slot = jax.lax.rem(blk, 2)

            @pl.when(blk + 1 < num_blocks)
            def _():
                get_dma(jax.lax.rem(blk + 1, 2), blk + 1).start()

            get_dma(slot, blk).wait()
            win_blk = scratch.at[slot]

            def inner(t, carry):
                d1, r1, r2, best = carry
                base = unroll * t
                bm = None
                prev = None
                for k in range(unroll):
                    c1, rc = step(
                        d1, r1, r2, win_blk[pl.ds(base + k, 1), :]
                    )
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

            return jax.lax.fori_loop(
                0, stream_chunk // unroll, inner, carry
            )

        zeros = jnp.zeros((rb, m), dt)
        _, _, _, best = jax.lax.fori_loop(
            0, num_blocks, blk_loop, (zeros, zeros, zeros, zeros)
        )
        out_ref[0, :, :] = _segmented_suffix_max(best, startm)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((2, stream_chunk, m), jnp.int32),
        sem=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "match", "mismatch", "gap", "read_block", "stream_chunk", "unroll",
        "num_blocks", "interpret",
    ),
)
def _lane_best_stream_call(
    packed, windows, *, match, mismatch, gap, read_block, stream_chunk,
    unroll, num_blocks, interpret,
):
    rows, m = packed.shape
    c, t_pad, _ = windows.shape
    n = t_pad - m + 1
    grid = (c, rows // read_block)
    kernel = functools.partial(
        _stream_kernel_packed,
        match=match, mismatch=mismatch, gap=gap,
        stream_chunk=stream_chunk, unroll=unroll, num_blocks=num_blocks,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((c, rows, m), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (read_block, m), lambda ci, ri: (ri, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),  # window stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, read_block, m), lambda ci, ri: (ci, ri, 0),
            memory_space=pltpu.VMEM,
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * rows * m * c * n,
            bytes_accessed=4 * (rows * m + c * t_pad * m + c * rows * m),
            transcendentals=0,
        ),
        interpret=interpret,
    )(packed, windows)
    return out  # (C, ROWS, M)


def pallas_lane_best_packed(
    packed,
    refs,
    match,
    mismatch,
    gap,
    *,
    read_block: int = 8,
    mode: str = "auto",
    unroll: int = 64,
    interpret: bool = False,
):
    """(C, ROWS, M) per-segment maxima for packed read rows.

    Each read's score against ref c sits at its START lane (the kernels
    finish with an in-register segmented suffix max); other lanes hold
    partial suffix maxima.  Recover per-read scores with
    ``ops.packing.read_best`` (a tiny gather at the start-lane indices).

    Args:
      packed: (ROWS, M) int32 — base codes | _START_BIT at segment
        starts (``ops.packing.pack_reads``); ROWS % read_block == 0.
      refs: (C, N) uint8/int32.
      mode: 'whole' | 'chunked' | 'auto' (auto uses the whole-table form
        whenever its VMEM plan fits: measured on v5e it beats the
        streamed form at EVERY e2e shape, even at unroll=8 vs the
        chunked kernel's unroll=32 — 238 vs 196 padded GCUPS at
        m=256/n=4096).
    """
    rows, m = packed.shape
    c, n = refs.shape
    if rows % read_block != 0:
        raise ValueError(
            f"ROWS={rows} must be a multiple of read_block={read_block}"
        )
    match, mismatch, gap = int(match), int(mismatch), int(gap)
    diags = m + n - 1
    if mode == "carry":
        # Explicit mode only: measured 5-15% SLOWER than the table form
        # on v5e at every e2e shape (the carried refwin roll is a serial
        # chain the table's per-step slice doesn't have) — kept as the
        # measured record; see docs/kernels.md.
        plan = plan_carry(read_block, m, diags, unroll)
        if plan is None:
            raise ValueError(
                f"carry-window packed kernel cannot fit VMEM at "
                f"read_block={read_block}, m={m}"
            )
        if plan is not None:
            u, nb = plan
            ents = _entrants(jnp.asarray(refs).astype(jnp.int32), m, u, nb)
            return _carry_call(
                jnp.asarray(packed, jnp.int32), ents,
                match=match, mismatch=mismatch, gap=gap,
                read_block=read_block, unroll=u, num_bodies=nb,
                diags=diags, packed=True, interpret=interpret,
            )
    if mode == "stream":
        # Manual double-buffered DMA (~1MB window VMEM at any ref
        # length, unroll budget governed by state alone).  Measured on
        # v5e this LOSES to the Mosaic-pipelined whole-table form at
        # every e2e shape (172-196 vs 231-240 padded GCUPS; 8 GCUPS on
        # small grids — per-program DMA-wait overhead is not hidden),
        # so 'auto' never selects it; kept as an explicit mode for
        # other topologies and as the measured record.
        stream_chunk = 512
        unroll = _auto_unroll(
            64, read_block, m, 0,
            extra_regs=2 * stream_chunk // max(1, read_block),
        )
        while unroll > 2 and stream_chunk % unroll != 0:
            unroll -= 2
        if unroll < 2:
            raise ValueError("streamed packed kernel cannot fit VMEM")
        num_blocks = -(-diags // stream_chunk)
        windows = _diag_windows(
            jnp.asarray(refs).astype(jnp.int32), m,
            num_blocks * stream_chunk,
        )
        return _lane_best_stream_call(
            jnp.asarray(packed, jnp.int32), windows,
            match=match, mismatch=mismatch, gap=gap,
            read_block=read_block, stream_chunk=stream_chunk,
            unroll=unroll, num_blocks=num_blocks, interpret=interpret,
        )
    plan = (
        plan_diag(read_block, m, n, unroll)
        if mode in ("auto", "whole")
        else None
    )
    if mode == "whole" and plan is None:
        raise ValueError("whole-table packed kernel cannot fit VMEM")
    if plan is not None:
        unroll, t_pad = plan
        windows = _diag_windows(jnp.asarray(refs).astype(jnp.int32), m, t_pad)
        return _lane_best_call(
            jnp.asarray(packed, jnp.int32), windows,
            match=match, mismatch=mismatch, gap=gap, read_block=read_block,
            diags=diags, unroll=unroll, interpret=interpret,
        )
    chunk, unroll = _plan_chunk(read_block, m, 2048, unroll, extra_regs=6)
    num_chunks = -(-diags // chunk)
    windows = _diag_windows(
        jnp.asarray(refs).astype(jnp.int32), m, num_chunks * chunk
    )
    return _lane_best_chunked_call(
        jnp.asarray(packed, jnp.int32), windows,
        match=match, mismatch=mismatch, gap=gap, read_block=read_block,
        chunk=chunk, unroll=unroll, num_chunks=num_chunks,
        interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "match", "mismatch", "gap", "read_block", "diags", "unroll",
        "interpret",
    ),
)
def _lane_best_call(
    packed, windows, *, match, mismatch, gap, read_block, diags, unroll,
    interpret,
):
    rows, m = packed.shape
    c, t_pad, _ = windows.shape
    n = diags - m + 1
    grid = (c, rows // read_block)
    kernel = functools.partial(
        _diag_kernel_packed,
        match=match, mismatch=mismatch, gap=gap, diags=diags, unroll=unroll,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((c, rows, m), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (read_block, m), lambda ci, ri: (ri, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, t_pad, m), lambda ci, ri: (ci, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, read_block, m), lambda ci, ri: (ci, ri, 0),
            memory_space=pltpu.VMEM,
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * rows * m * c * n,
            bytes_accessed=4 * (rows * m + c * t_pad * m + c * rows * m),
            transcendentals=0,
        ),
        interpret=interpret,
    )(packed, windows)
    return out  # (C, ROWS, M)


@functools.partial(
    jax.jit,
    static_argnames=(
        "match", "mismatch", "gap", "read_block", "chunk", "unroll",
        "num_chunks", "interpret",
    ),
)
def _lane_best_chunked_call(
    packed, windows, *, match, mismatch, gap, read_block, chunk, unroll,
    num_chunks, interpret,
):
    rows, m = packed.shape
    c, t_pad, _ = windows.shape
    n = t_pad - m + 1
    grid = (c, rows // read_block, num_chunks)
    kernel = functools.partial(
        _chunked_kernel_packed,
        match=match, mismatch=mismatch, gap=gap,
        chunk=chunk, unroll=unroll, num_chunks=num_chunks,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((c, rows, m), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (read_block, m), lambda ci, ri, tc: (ri, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, chunk, m), lambda ci, ri, tc: (ci, tc, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, read_block, m), lambda ci, ri, tc: (ci, ri, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((read_block, m), jnp.int32),
            pltpu.VMEM((read_block, m), jnp.int32),
            pltpu.VMEM((read_block, m), jnp.int32),
            pltpu.VMEM((read_block, m), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=11 * rows * m * c * n,
            bytes_accessed=4 * (rows * m + c * t_pad * m + c * rows * m),
            transcendentals=0,
        ),
        interpret=interpret,
    )(packed, windows)
    return out  # (C, ROWS, M)


def plan_multi(
    read_block: int, m: int, cf: int, unroll: int = 32, chunk4: int = 256
):
    """(unroll, chunk4) for the multi-ref FOLDED chunked kernel, or None.

    The folded kernel's DP state is (cf * read_block, m) — cf references'
    independent wavefronts advance in ONE serial diagonal chain — and its
    window block is (cf, chunk4, m) byte-packed words (triple-buffered by
    Mosaic's grid pipeline).  unroll must be a multiple of 4 (byte
    unpack) and divide the 4*chunk4 diagonals of a chunk.

    The search maximizes the UNROLL across chunk sizes (a smaller chunk
    costs only more grid programs — scratch save/restore is ~2 MB of
    VMEM traffic each — while unroll feeds the serial chain its ILP:
    first-fit on the largest chunk picked (u=32, c4=256) at the 131 kb
    bench shape where (u=64, c4=128) also fits)."""
    rows = cf * read_block
    limit = _vmem_limit()
    best = None
    c4 = chunk4
    while c4 >= 8:
        u = min(unroll, 4 * c4) & ~3
        while u >= 4:
            est = 4 * (
                (0.65 * u + 6) * rows * m
                + 3 * cf * c4 * m
                + read_block * m
            )
            if est <= limit and (4 * c4) % u == 0:
                if best is None or (u, c4) > best:
                    best = (u, c4)
                break
            u -= 4
        c4 //= 2
    return best


def _chunked_kernel_packed_multi(
    reads_ref, win_ref, out_ref, d1_s, r1_s, r2_s, best_s,
    *, match, mismatch, gap, cf, chunk4, unroll, num_chunks, interleaved,
):
    """Chunked packed wavefront with CF references FOLDED into the row
    dimension of one program.

    Motivation (round 5): the chunked kernels' serial diagonal chain is
    latency-bound below ~256 state rows, and grid programs on one
    TensorCore run sequentially — so a few-reads x long-refs dispatch
    (e.g. 64 reads -> 32 packed rows vs 8 x 131 kb refs) pays C
    independent full-length chains at a fraction of the VPU's width
    (measured 54.5 GCUPS e2e vs the 251 committed at 256 rows).  Folding
    CF refs' row blocks into one (CF*RB, M) state runs their wavefronts
    in lockstep on ONE chain: same recurrence, CF x the ILP per step,
    CF x fewer serial steps in total.

    The per-step substitution operand differs per row group: word
    ``win[g, t4, :]`` broadcasts over row group g's RB rows (a sublane
    broadcast + static concat — no extra HBM traffic; the byte unpack
    shift/mask happens after the fold, once per 4 diagonals).

    Parity contract is identical to ``_chunked_kernel_packed`` per row
    group; the reference analogue is still one Spark job per diagonal
    (``src/sw/DistributedSW.java:192-245``) — the fold has no analogue
    there because Spark parallelizes ACROSS cells of one diagonal, not
    across matrices.
    """
    rb, m = reads_ref.shape
    rows = cf * rb
    dt = jnp.int32
    tc = pl.program_id(2)

    @pl.when(tc == 0)
    def _init():
        z = jnp.zeros((rows, m), dt)
        d1_s[...] = z
        r1_s[...] = z
        r2_s[...] = z
        best_s[...] = z

    raw = reads_ref[:]
    raw_x = (
        jnp.concatenate([raw] * cf, axis=0) if cf > 1 else raw
    )  # (CF*RB, M): same packed reads face every folded ref
    reads_block = raw_x & (_START_BIT - 1)
    startm = raw_x >= _START_BIT
    h = m // 128
    if interleaved and h > 1:
        shift1 = _make_ilv_shift1(h)
        col_log = _ilv_logical_col((rows, m), h)
        shift_left = _make_ilv_shift_left(h, col_log)
    else:
        shift1 = None
        shift_left = _plain_shift_left
    step = _make_step(
        reads_block, startm, match, mismatch, gap, dt, shift1=shift1
    )
    words = unroll // 4

    def load_words(base_word):
        """(CF, 1, M) window words -> (CF*RB, M): row group g gets
        win[g] (sublane broadcast; static concat across groups)."""
        parts = []
        for g in range(cf):
            wg = win_ref[g, pl.ds(base_word, 1), :]  # (1, M)
            parts.append(jnp.broadcast_to(wg, (rb, m)))
        return parts[0] if cf == 1 else jnp.concatenate(parts, axis=0)

    def body(t, carry):
        d1, r1, r2, best = carry
        base = words * t
        bm = None
        prev = None
        w = None
        for k in range(unroll):
            if k % 4 == 0:
                w = load_words(base + k // 4)
                refwin = w & 255
            else:
                refwin = (w >> (8 * (k % 4))) & 255
            c1, rc = step(d1, r1, r2, refwin)
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

    d1, r1, r2, best = jax.lax.fori_loop(
        0, (4 * chunk4) // unroll, body,
        (d1_s[...], r1_s[...], r2_s[...], best_s[...]),
    )
    d1_s[...] = d1
    r1_s[...] = r1
    r2_s[...] = r2
    best_s[...] = best

    @pl.when(tc == num_chunks - 1)
    def _emit():
        sm = _segmented_suffix_max(best, startm, shift_left=shift_left)
        for g in range(cf):
            out_ref[g, :, :] = sm[g * rb : (g + 1) * rb, :]


@functools.partial(
    jax.jit,
    static_argnames=(
        "match", "mismatch", "gap", "read_block", "cf", "chunk4", "unroll",
        "num_chunks", "interleaved", "interpret",
    ),
)
def _multi_call(
    packed, win4, *, match, mismatch, gap, read_block, cf, chunk4, unroll,
    num_chunks, interleaved, interpret,
):
    rows, m = packed.shape
    c, t4, _ = win4.shape
    n = 4 * t4 - m + 1
    grid = (c // cf, rows // read_block, num_chunks)
    kernel = functools.partial(
        _chunked_kernel_packed_multi,
        match=match, mismatch=mismatch, gap=gap, cf=cf, chunk4=chunk4,
        unroll=unroll, num_chunks=num_chunks, interleaved=interleaved,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((c, rows, m), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (read_block, m), lambda ci, ri, tc: (ri, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (cf, chunk4, m), lambda ci, ri, tc: (ci, tc, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (cf, read_block, m), lambda ci, ri, tc: (ci, ri, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((cf * read_block, m), jnp.int32) for _ in range(4)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * rows * m * c * n,
            bytes_accessed=4 * (rows * m + c * t4 * m + c * rows * m),
            transcendentals=0,
        ),
        interpret=interpret,
    )(packed, win4)
    return out  # (C, ROWS, M)


def pallas_lane_best_packed_multi(
    packed,
    refs,
    match,
    mismatch,
    gap,
    *,
    read_block: int,
    cf: int,
    unroll: int = 32,
    chunk4: int = 256,
    interpret: bool = False,
    deinterleave: bool = True,
):
    """(C, ROWS, M) per-lane maxima with CF refs folded per program.

    Same output contract as :func:`pallas_lane_best_packed` (use
    ``read_best`` / ``packed_col_sums`` with the start indices —
    physical-layout indices via :func:`varlen_start_phys` when
    ``deinterleave=False`` and m interleaves).  Requirements:
    ``rows % read_block == 0`` and ``C % cf == 0`` (pad refs with
    all-REF_PAD rows; they score 0 but cost a full sweep — callers
    should pick cf to divide the padded C with little waste).
    """
    rows, m = packed.shape
    c, n = refs.shape
    if rows % read_block != 0:
        raise ValueError(
            f"ROWS={rows} must be a multiple of read_block={read_block}"
        )
    if c % cf != 0:
        raise ValueError(f"C={c} must be a multiple of cf={cf}")
    match, mismatch, gap = int(match), int(mismatch), int(gap)
    plan = plan_multi(read_block, m, cf, unroll, chunk4)
    if plan is None:
        raise ValueError(
            f"multi-ref folded kernel cannot fit VMEM at "
            f"read_block={read_block}, m={m}, cf={cf}"
        )
    u, c4 = plan
    diags = m + n - 1
    num_chunks = -(-diags // (4 * c4))
    t4 = num_chunks * c4
    ilv = m % 128 == 0 and m // 128 > 1
    # EAGER column build — see `_diag_windows_packed4_jit`'s context A/B.
    win4 = _diag_windows_packed4(
        jnp.asarray(refs).astype(jnp.int32), m, t4, ilv=ilv
    )
    packed_i = jnp.asarray(packed, jnp.int32)
    if ilv:
        packed_i = _ilv_jit(packed_i)
    out = _multi_call(
        packed_i, win4,
        match=match, mismatch=mismatch, gap=gap,
        read_block=read_block, cf=cf, chunk4=c4, unroll=u,
        num_chunks=num_chunks, interleaved=ilv, interpret=interpret,
    )
    return _deilv_jit(out) if (ilv and deinterleave) else out


def _make_step(reads_block, lane0, match, mismatch, gap, dt, shift1=None):
    """Shared wavefront recurrence step (see ``_diag_kernel``).

    Carries (d1, r1, r2) = (D_{d-1}, rm(D_{d-1}), rm(D_{d-2})) where
    rm(x) = lane shift of x with lane 0 zeroed — the pre-shifted form is
    consumed by the next TWO diagonals, so each diagonal pays one roll.

    ``shift1`` overrides the i-1 lane shift (the interleaved layout
    passes `_make_ilv_shift1`, whose only roll is single-tile).
    """
    match_c = jnp.asarray(match, dt)
    mismatch_c = jnp.asarray(mismatch, dt)
    gap_c = jnp.asarray(gap, dt)
    zero_c = jnp.asarray(0, dt)
    if shift1 is None:
        shift1 = lambda x: pltpu.roll(x, shift=1, axis=1)  # noqa: E731

    def step(d1, r1, r2, refwin):
        sub = jnp.where(reads_block == refwin.astype(dt), match_c, mismatch_c)
        gterm = jnp.maximum(r1, d1) + gap_c
        c1 = jnp.maximum(jnp.maximum(r2 + sub, gterm), zero_c)
        rc = jnp.where(lane0, zero_c, shift1(c1))
        return c1, rc

    return step


def _chunked_kernel(
    reads_ref, win_ref, out_ref, d1_s, r1_s, r2_s, best_s,
    *, match, mismatch, gap, chunk, unroll, num_chunks,
):
    """Chunked wavefront program: RB reads vs one LONG reference.

    Same recurrence as ``_diag_kernel``, but the per-diagonal window
    table is streamed from HBM in ``chunk``-diagonal blocks (grid dim 2)
    instead of loaded whole — the whole-table form needs O((M+N)·M) VMEM
    and dies around N ~ 20kb; this form needs O(chunk·M) and handles
    100kb+ references (the reference's only long-sequence mechanism is
    this same wavefront decomposition, ``src/sw/DistributedSW.java:164-245``,
    with full O(m·n) matrices).  The live diagonal state + running best
    persist across chunks in VMEM scratch.
    """
    rb, m = reads_ref.shape
    dt = jnp.int32
    tc = pl.program_id(2)
    ri = pl.program_id(1)  # hoisted: program_id inside a pl.when body
    # has no lowering rule in interpret mode

    @pl.when(tc == 0)
    def _init():
        d1_s[...] = jnp.zeros((rb, m), dt)
        r1_s[...] = jnp.zeros((rb, m), dt)
        r2_s[...] = jnp.zeros((rb, m), dt)
        best_s[...] = jnp.zeros((rb, m), dt)

    reads_block = reads_ref[:].astype(dt)
    lane0 = jax.lax.broadcasted_iota(jnp.int32, (rb, m), dimension=1) == 0
    step = _make_step(reads_block, lane0, match, mismatch, gap, dt)

    def body(t, carry):
        d1, r1, r2, best = carry
        base = unroll * t
        # Pairwise best-fold: O(1) live diagonals (see _diag_kernel).
        bm = None
        prev = None
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

    d1, r1, r2, best = jax.lax.fori_loop(
        0, chunk // unroll, body,
        (d1_s[...], r1_s[...], r2_s[...], best_s[...]),
    )
    d1_s[...] = d1
    r1_s[...] = r1
    r2_s[...] = r2
    best_s[...] = best

    @pl.when(tc == num_chunks - 1)
    def _emit():
        out_ref[0, ri, :] = jnp.max(best, axis=1)


def pallas_score_grid_diag_chunked(
    reads,
    refs,
    match,
    mismatch,
    gap,
    *,
    read_block: int = 256,
    chunk: int = 2048,
    unroll: int = 64,
    interpret: bool = False,
):
    """Max SW score per (read, ref) pair for arbitrarily long refs.

    Same contract as :func:`pallas_score_grid_diag`; use this form when
    the per-ref window table exceeds VMEM (N beyond ~8-16kb).
    """
    r, m = reads.shape
    c, n = refs.shape
    if r % read_block != 0:
        raise ValueError(f"R={r} must be a multiple of read_block={read_block}")
    chunk, unroll = _plan_chunk(read_block, m, chunk, unroll, extra_regs=4)
    match, mismatch, gap = int(match), int(mismatch), int(gap)
    diags = m + n - 1
    num_chunks = -(-diags // chunk)
    t_pad = num_chunks * chunk
    reads_i = jnp.asarray(reads).astype(jnp.int32)
    windows = _diag_windows(jnp.asarray(refs).astype(jnp.int32), m, t_pad)
    return _score_chunked_call(
        reads_i, windows,
        match=match, mismatch=mismatch, gap=gap, read_block=read_block,
        chunk=chunk, unroll=unroll, num_chunks=num_chunks,
        interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "match", "mismatch", "gap", "read_block", "chunk", "unroll",
        "num_chunks", "interpret",
    ),
)
def _score_chunked_call(
    reads_i, windows, *, match, mismatch, gap, read_block, chunk, unroll,
    num_chunks, interpret,
):
    r, m = reads_i.shape
    c, t_pad, _ = windows.shape
    n = t_pad - m + 1
    grid = (c, r // read_block, num_chunks)
    kernel = functools.partial(
        _chunked_kernel,
        match=match,
        mismatch=mismatch,
        gap=gap,
        chunk=chunk,
        unroll=unroll,
        num_chunks=num_chunks,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((c, r // read_block, read_block), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (read_block, m), lambda ci, ri, tc: (ri, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, chunk, m), lambda ci, ri, tc: (ci, tc, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, r // read_block, read_block),
            lambda ci, ri, tc: (ci, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((read_block, m), jnp.int32),
            pltpu.VMEM((read_block, m), jnp.int32),
            pltpu.VMEM((read_block, m), jnp.int32),
            pltpu.VMEM((read_block, m), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=11 * r * m * c * n,
            bytes_accessed=4 * (r * m + c * t_pad * m + c * r),
            transcendentals=0,
        ),
        interpret=interpret,
    )(reads_i, windows)
    return out.reshape(c, r).T  # (R, C)


def _chunked_argmax_kernel(
    reads_ref, win_ref, best_ref, bestd_ref, count_ref, d1_s, r1_s, r2_s,
    *, match, mismatch, gap, chunk, unroll, num_chunks,
):
    """Chunked wavefront with per-lane argmax + tie-count tracking.

    Output lane i of pair (read, ref) reports the running max over that
    read position's DP row: its value, the anti-diagonal d = i + j where
    it was FIRST reached, and how many cells of the row reach it.  The
    host reconstructs all global max cells (i, bestd-i) exactly whenever
    every winning lane has count == 1 (the overwhelmingly common case)
    and falls back to the exact scan otherwise — co-optimal-cell
    enumeration is the contract of the traceback path
    (``SmithWaterman.java:176-185``: strict > clears, == appends).
    """
    rb, m = reads_ref.shape
    dt = jnp.int32
    tc = pl.program_id(2)

    @pl.when(tc == 0)
    def _init():
        d1_s[...] = jnp.zeros((rb, m), dt)
        r1_s[...] = jnp.zeros((rb, m), dt)
        r2_s[...] = jnp.zeros((rb, m), dt)
        best_ref[...] = jnp.zeros((1, rb, m), dt)
        bestd_ref[...] = jnp.zeros((1, rb, m), dt)
        count_ref[...] = jnp.zeros((1, rb, m), dt)

    reads_block = reads_ref[:].astype(dt)
    lane0 = jax.lax.broadcasted_iota(jnp.int32, (rb, m), dimension=1) == 0
    step = _make_step(reads_block, lane0, match, mismatch, gap, dt)
    one = jnp.asarray(1, dt)

    def body(t, carry):
        d1, r1, r2, best, bestd, count = carry
        base = unroll * t
        for k in range(unroll):
            c1, rc = step(d1, r1, r2, win_ref[0, pl.ds(base + k, 1), :])
            d_glob = tc * chunk + base + k
            gt = c1 > best
            eq = (c1 == best) & (best > 0)
            best = jnp.where(gt, c1, best)
            bestd = jnp.where(gt, d_glob, bestd)
            count = jnp.where(gt, one, count + eq.astype(dt))
            d1, r2, r1 = c1, r1, rc
        return d1, r1, r2, best, bestd, count

    d1, r1, r2, best, bestd, count = jax.lax.fori_loop(
        0, chunk // unroll, body,
        (d1_s[...], r1_s[...], r2_s[...],
         best_ref[0], bestd_ref[0], count_ref[0]),
    )
    d1_s[...] = d1
    r1_s[...] = r1
    r2_s[...] = r2
    best_ref[0] = best
    bestd_ref[0] = bestd
    count_ref[0] = count


def pallas_argmax_grid_diag_chunked(
    reads,
    refs,
    match,
    mismatch,
    gap,
    *,
    read_block: int = 256,
    chunk: int = 2048,
    unroll: int = 64,
    interpret: bool = False,
):
    """Per-lane (best, first-diag, tie-count) for every (read, ref) pair.

    Returns three (R, C, M) int32 arrays; lane i of pair (r, c) covers
    DP row i+1 (read position i).  See ``_chunked_argmax_kernel``.
    """
    r, m = reads.shape
    c, n = refs.shape
    if r % read_block != 0:
        raise ValueError(f"R={r} must be a multiple of read_block={read_block}")
    chunk, unroll = _plan_chunk(read_block, m, chunk, unroll, extra_regs=8)
    match, mismatch, gap = int(match), int(mismatch), int(gap)
    diags = m + n - 1
    num_chunks = -(-diags // chunk)
    t_pad = num_chunks * chunk
    reads_i = jnp.asarray(reads).astype(jnp.int32)
    windows = _diag_windows(jnp.asarray(refs).astype(jnp.int32), m, t_pad)
    return _argmax_chunked_call(
        reads_i, windows,
        match=match, mismatch=mismatch, gap=gap, read_block=read_block,
        chunk=chunk, unroll=unroll, num_chunks=num_chunks,
        interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "match", "mismatch", "gap", "read_block", "chunk", "unroll",
        "num_chunks", "interpret",
    ),
)
def _argmax_chunked_call(
    reads_i, windows, *, match, mismatch, gap, read_block, chunk, unroll,
    num_chunks, interpret,
):
    r, m = reads_i.shape
    c, t_pad, _ = windows.shape
    n = t_pad - m + 1
    grid = (c, r // read_block, num_chunks)
    kernel = functools.partial(
        _chunked_argmax_kernel,
        match=match,
        mismatch=mismatch,
        gap=gap,
        chunk=chunk,
        unroll=unroll,
        num_chunks=num_chunks,
    )
    out_spec = pl.BlockSpec(
        (1, read_block, m), lambda ci, ri, tc: (ci, ri, 0),
        memory_space=pltpu.VMEM,
    )
    shape = jax.ShapeDtypeStruct((c, r, m), jnp.int32)
    best, bestd, count = pl.pallas_call(
        kernel,
        out_shape=(shape, shape, shape),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (read_block, m), lambda ci, ri, tc: (ri, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, chunk, m), lambda ci, ri, tc: (ci, tc, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(out_spec, out_spec, out_spec),
        scratch_shapes=[
            pltpu.VMEM((read_block, m), jnp.int32),
            pltpu.VMEM((read_block, m), jnp.int32),
            pltpu.VMEM((read_block, m), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=19 * r * m * c * n,
            bytes_accessed=4 * (r * m + c * t_pad * m + 3 * c * r * m),
            transcendentals=0,
        ),
        interpret=interpret,
    )(reads_i, windows)
    return (
        best.transpose(1, 0, 2),
        bestd.transpose(1, 0, 2),
        count.transpose(1, 0, 2),
    )


# -- banded wavefront with boundary columns (sequence parallelism) -------


def _diag_kernel_packed_band(
    reads_ref, win_ref, bnd_ref, out_ref, bout_ref,
    d1_s, r1_s, r2_s, best_s, bout_s,
    *, match, mismatch, gap, unroll, bodies_per_chunk, num_chunks, ns,
    interleaved,
):
    """Packed wavefront over ONE reference SEGMENT with a left boundary
    column in and a right boundary column out — the intra-chip band fill
    of the cross-chip sequence-parallel strategy (the reference's
    ``DistributedSW`` wavefront, ``src/sw/DistributedSW.java:118-252``,
    whose S/E/SE ``Broadcast`` across the segment edge becomes these two
    (ROWS, M) columns riding a ``ppermute`` ring).

    Boundary mechanics (linear gap, exact): the left column
    ``H[i, -1] = bnd[i]`` lives on packed diagonal d = lane(i) - 1, so at
    global step d it is injected into the previous-diagonal buffer at
    lane d (the W dependency of cell (i, 0)) and, pre-shifted with
    segment-start zeroing, into the shifted grandparent buffer (the NW
    dependency) — two lane-masked selects per step, self-guarding: for
    d >= M the mask ``col == d`` is everywhere-false.  Symmetrically the
    right column ``H[i, ns-1]`` is peeled off the fresh diagonal at lane
    d - (ns - 1) (everywhere-false until the wavefront reaches the last
    segment column).  Window streaming and cross-chunk DP state follow
    `_chunked_kernel` (scratch persists across the innermost grid dim).
    """
    rb, m = reads_ref.shape
    dt = jnp.int32
    tc = pl.program_id(1)
    raw = reads_ref[:]
    reads_block = raw & (_START_BIT - 1)
    startm = raw >= _START_BIT
    h = m // 128
    if interleaved and h > 1:
        shift1 = _make_ilv_shift1(h)
        col_log = _ilv_logical_col((rb, m), h)
        shift_left = _make_ilv_shift_left(h, col_log)
    else:
        shift1 = None
        col_log = jax.lax.broadcasted_iota(jnp.int32, (rb, m), dimension=1)
        shift_left = _plain_shift_left
    step = _make_step(
        reads_block, startm, match, mismatch, gap, dt, shift1=shift1
    )
    base_shift1 = shift1 or (lambda x: pltpu.roll(x, shift=1, axis=1))

    @pl.when(tc == 0)
    def _init():
        zeros = jnp.zeros((rb, m), dt)
        d1_s[...] = zeros
        r1_s[...] = zeros
        r2_s[...] = zeros
        best_s[...] = zeros
        bout_s[...] = zeros

    bnd = bnd_ref[:]
    # rm(bnd): the NW-injection form (shift with segment-start zeroing —
    # a read's first row has NW = H[-1, -1] = 0, the matrix-edge zero).
    bnd_s = jnp.where(startm, jnp.asarray(0, dt), base_shift1(bnd))
    words = unroll // 4
    chunk_steps = bodies_per_chunk * unroll

    def body(t, carry):
        d1, r1, r2, best, bout = carry
        base = words * t
        d_base = tc * chunk_steps + unroll * t
        bm = None
        prev = None
        w = None
        for k in range(unroll):
            if k % 4 == 0:
                w = win_ref[0, pl.ds(base + k // 4, 1), :]
                refwin = w & 255
            else:
                refwin = (w >> (8 * (k % 4))) & 255
            d = d_base + k
            # Left-boundary injection (self-guarding masks, see above).
            d1 = jnp.where(col_log == d, bnd, d1)
            r2 = jnp.where(col_log == d, bnd_s, r2)
            c1, rc = step(d1, r1, r2, refwin)
            # Right-boundary extraction.
            bout = jnp.where(col_log == d - (ns - 1), c1, bout)
            if prev is None:
                prev = c1
            else:
                pair = jnp.maximum(prev, c1)
                bm = pair if bm is None else jnp.maximum(bm, pair)
                prev = None
            d1, r2, r1 = c1, r1, rc
        if prev is not None:
            bm = prev if bm is None else jnp.maximum(bm, prev)
        return d1, r1, r2, jnp.maximum(best, bm), bout

    d1, r1, r2, best, bout = jax.lax.fori_loop(
        0, bodies_per_chunk, body,
        (d1_s[...], r1_s[...], r2_s[...], best_s[...], bout_s[...]),
    )
    d1_s[...] = d1
    r1_s[...] = r1
    r2_s[...] = r2
    best_s[...] = best
    bout_s[...] = bout

    @pl.when(tc == num_chunks - 1)
    def _emit():
        out_ref[0, :, :] = _segmented_suffix_max(
            best, startm, shift_left=shift_left
        )
        bout_ref[0, :, :] = bout


def plan_band(read_block: int, m: int, unroll: int = 64):
    """(unroll, words_per_chunk) for the band kernel, or raises.

    The window streams in chunks (innermost grid dim), so only the
    triple-buffered chunk block plus the DP state must fit scoped VMEM;
    any segment length works at a fixed plan.  words_per_chunk is a
    multiple of unroll/4 so each chunk runs whole unrolled bodies.
    """
    limit = _vmem_limit()
    u = min(unroll, m) & ~7
    while u >= 8:
        state = (0.65 * u + 9) * read_block * m * 4
        w_budget = (limit - state) / (12 * m)  # 3 buffers x 4 bytes
        wq = max(1, u // 4)
        words = int(w_budget // wq) * wq
        if words >= wq:
            return u, min(words, 2048)
        u -= 8
    raise ValueError(
        f"no band-kernel config fits scoped VMEM at "
        f"read_block={read_block}, m={m}"
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "match", "mismatch", "gap", "read_block", "unroll",
        "words_per_chunk", "ns", "interleaved", "interpret",
    ),
)
def _band_call(
    packed_i, win4, bnd, *, match, mismatch, gap, read_block, unroll,
    words_per_chunk, ns, interleaved, interpret,
):
    """(lane_best, bnd_out), both (ROWS, M) in the kernel's layout.

    ``packed_i``/``win4``/``bnd`` must already be in the kernel layout
    (interleaved when m > 128); see :func:`pallas_band_lane_best` for
    the converting wrapper."""
    rows, m = packed_i.shape
    _, t4, _ = win4.shape
    num_chunks = t4 // words_per_chunk
    grid = (rows // read_block, num_chunks)
    kernel = functools.partial(
        _diag_kernel_packed_band,
        match=match, mismatch=mismatch, gap=gap, unroll=unroll,
        bodies_per_chunk=4 * words_per_chunk // unroll,
        num_chunks=num_chunks, ns=ns, interleaved=interleaved,
    )
    out_shape = (
        jax.ShapeDtypeStruct((1, rows, m), jnp.int32),
        jax.ShapeDtypeStruct((1, rows, m), jnp.int32),
    )
    out_spec = (
        pl.BlockSpec(
            (1, read_block, m), lambda ri, tc: (0, ri, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, read_block, m), lambda ri, tc: (0, ri, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    lane, bout = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (read_block, m), lambda ri, tc: (ri, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, words_per_chunk, m), lambda ri, tc: (0, tc, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (read_block, m), lambda ri, tc: (ri, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((read_block, m), jnp.int32) for _ in range(5)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=13 * rows * m * 4 * t4,
            bytes_accessed=4 * (3 * rows * m + t4 * m),
            transcendentals=0,
        ),
        interpret=interpret,
    )(packed_i, win4, bnd)
    return lane[0], bout[0]


def band_chunk_plan(read_block: int, m: int, ns: int, unroll: int = 64):
    """(unroll, words_per_chunk, t4) for the band kernel over an
    ``ns``-column segment — the ONE source of the chunk arithmetic
    (`_band_call` derives num_chunks = t4 // words, so every caller
    must agree on the same rounding).

    The chunk shrinks to the band's true diagonal count in whole
    unrolled bodies: short segments must not pay the full VMEM-sized
    chunk's step budget."""
    u, words = plan_band(read_block, m, unroll)
    wq = max(1, u // 4)
    diags = m + ns - 1
    need = -(-(-(-diags // 4)) // wq) * wq
    words = min(words, need)
    t4 = words * max(1, -(-diags // (4 * words)))
    return u, words, t4


def band_plan_windows(
    seg_i, m: int, read_block: int, unroll: int = 64, ilv: bool = False
):
    """Byte-packed window + plan for one segment batch: returns
    (win4 (C, T4, M), unroll, words_per_chunk, ns).

    ``seg_i``: (C, NS) int32 segment codes (REF_PAD-padded)."""
    ns = seg_i.shape[1]
    u, words, t4 = band_chunk_plan(read_block, m, ns, unroll)
    win4 = _diag_windows_packed4(seg_i, m, t4, ilv=ilv)
    return win4, u, words, ns


def pallas_band_lane_best(
    packed,
    seg,
    bnd,
    match,
    mismatch,
    gap,
    *,
    read_block: int = 8,
    unroll: int = 64,
    interpret: bool = False,
):
    """(lane_best, bnd_out) for packed reads vs ONE reference segment
    with a LEFT boundary column — logical layouts in and out.

    ``lane_best`` is segment-suffix-maxed per packed read (the
    :func:`pallas_lane_best_packed` contract); ``bnd_out`` holds
    ``H[i, ns-1]`` per packed lane, feeding the next segment's ``bnd``.
    Chaining segments left-to-right with zero initial boundary and
    taking the elementwise max of lane bests equals the unsegmented
    kernel on the concatenated reference exactly.
    """
    rows, m = packed.shape
    if rows % read_block != 0:
        raise ValueError(
            f"ROWS={rows} must be a multiple of read_block={read_block}"
        )
    match, mismatch, gap = int(match), int(mismatch), int(gap)
    seg_i = jnp.asarray(seg, jnp.int32).reshape(1, -1)
    ilv = m % 128 == 0 and m // 128 > 1
    win4, u, words, ns = band_plan_windows(
        seg_i, m, read_block, unroll, ilv=ilv
    )
    packed_i = jnp.asarray(packed, jnp.int32)
    bnd_i = jnp.asarray(bnd, jnp.int32)
    if ilv:
        packed_i = _ilv_jit(packed_i)
        bnd_i = _ilv_jit(bnd_i)
    lane, bout = _band_call(
        packed_i, win4, bnd_i,
        match=match, mismatch=mismatch, gap=gap,
        read_block=read_block, unroll=u, words_per_chunk=words,
        ns=ns, interleaved=ilv, interpret=interpret,
    )
    if ilv:
        lane, bout = _deilv_jit(lane), _deilv_jit(bout)
    return lane, bout


def default_interpret() -> bool:
    """Pallas TPU kernels need interpret mode off-TPU (tests run on CPU)."""
    return jax.default_backend() != "tpu"
