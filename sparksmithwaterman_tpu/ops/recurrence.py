"""Batched Smith-Waterman DP fill as vectorized JAX (XLA) code.

This is the TPU-native restatement of the reference's two engines
(``src/sw/SmithWaterman.java:129-190`` serial fill and
``src/sw/DistributedSW.java:143-251`` wavefront fill).  The reference's
wavefront processes one anti-diagonal per Spark job with S/E/SE score
broadcasts into the next two diagonals; here the same data dependence is
restructured around a property of the *linear* gap penalty:

    H[i][j] = max(A[j], H[i][j-1] + gap)           (within-row recurrence)
  where
    A[j] = max(0, H[i-1][j-1] + sub(i,j), H[i-1][j] + gap)

unrolls to

    H[i][j] = max_{k<=j} ( A[k] + gap * (j-k) )
            = cummax_j ( A[k] - gap*k ) + gap*j,

i.e. one cumulative max per row.  The whole fill is a ``lax.scan`` over
read positions with O(log N)-depth vector work per row — no serial inner
loop, no per-diagonal host round-trips (the pathology of
``DistributedSW.java:186-245``).

Scores are int32 on device; scoring parameters are traced scalars so a
single compilation serves every ScoringScheme.

Direction-code contract matches the oracle
(:mod:`sparksmithwaterman_tpu.core.oracle`): 0 none, 1 align, 2 ins,
3 del, with tie priority a > i > d and the zero-overwrite quirk resolved
identically (a cell with score 0 whose best candidate is 0 still gets that
candidate's code, but the *effective* traceback code stored here is 0 for
all zero-score cells, since traceback stops there —
``SmithWaterman.java:380-409`` never reads the type of a zero cell).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Keep in sync with core.oracle.
DIR_NONE = 0
DIR_ALIGN = 1
DIR_INS = 2
DIR_DEL = 3

# Plain int, not jnp.int32: a concrete jnp scalar at module level would
# initialize the XLA backend at import time, which breaks
# jax.distributed.initialize (must run before any backend init) for any
# process that merely imports this package.
_NEG_INF = -(2**30)


def _shift_right(x: jnp.ndarray, fill=0) -> jnp.ndarray:
    """Shift along the last axis by one, filling the first column."""
    pad = jnp.full(x.shape[:-1] + (1,), fill, dtype=x.dtype)
    return jnp.concatenate([pad, x[..., :-1]], axis=-1)


def _row_update(h_prev, sub, gap, ramp):
    """One DP row: from H[i-1] (…, N) and substitution scores to H[i].

    ``ramp`` is ``gap * arange(N)`` (int32).  Returns (H_i, a, ins) so the
    caller can derive direction codes without recompute.
    """
    nw = _shift_right(h_prev)
    a = nw + sub
    ins = h_prev + gap
    cand = jnp.maximum(jnp.maximum(a, ins), 0)
    h = jax.lax.cummax(cand - ramp, axis=cand.ndim - 1) + ramp
    return h, a, ins


def _sub_scores(ref_row, read_char, match, mismatch):
    """Match/mismatch per reference position; equality on uint8 codes ==
    the reference's case-insensitive char compare (encode upper-cases)."""
    return jnp.where(ref_row == read_char, match, mismatch)


@functools.partial(jax.jit, static_argnames=())
def score_pairs(reads, refs, match, mismatch, gap):
    """Max local-alignment score for each (read, ref) pair.

    Args:
      reads: (B, M) uint8 encoded reads (0-padded).
      refs:  (B, N) uint8 encoded refs (1-padded).
      match/mismatch/gap: int32 scalars.
    Returns:
      (B,) int32 max scores.

    Padding needs no masking: pad codes match nothing, and with
    mismatch/gap < 0 a padded region strictly decays, so it can neither
    create nor tie a positive maximum (SURVEY.md §7 hard part (c)).
    """
    B, N = refs.shape
    ramp = gap * jnp.arange(N, dtype=jnp.int32)
    refs_i = refs.astype(jnp.int32)

    def body(carry, read_col):
        h_prev, best = carry
        sub = _sub_scores(refs_i, read_col[:, None].astype(jnp.int32), match, mismatch)
        h, _, _ = _row_update(h_prev, sub, gap, ramp)
        best = jnp.maximum(best, jnp.max(h, axis=-1))
        return (h, best), None

    init = (jnp.zeros((B, N), jnp.int32), jnp.zeros((B,), jnp.int32))
    (_, best), _ = jax.lax.scan(body, init, reads.T)
    return best


@functools.partial(jax.jit, static_argnames=())
def score_grid(reads, refs, match, mismatch, gap):
    """Max score for every (read, ref) combination.

    Args:
      reads: (R, M) uint8; refs: (C, N) uint8.
    Returns:
      (R, C) int32.

    The (R, C, N) DP state lives only on device; callers chunk R and C to
    bound memory.  This is the hot-path layout: one ref row is shared by
    all reads in the block (the Pallas kernel exploits the same reuse).
    """
    R = reads.shape[0]
    C, N = refs.shape
    ramp = gap * jnp.arange(N, dtype=jnp.int32)
    refs_i = refs.astype(jnp.int32)[None, :, :]  # (1, C, N)

    def body(carry, read_col):
        h_prev, best = carry
        read_c = read_col[:, None, None].astype(jnp.int32)  # (R, 1, 1)
        sub = jnp.where(refs_i == read_c, match, mismatch)
        h, _, _ = _row_update(h_prev, sub, gap, ramp)
        best = jnp.maximum(best, jnp.max(h, axis=-1))
        return (h, best), None

    init = (jnp.zeros((R, C, N), jnp.int32), jnp.zeros((R, C), jnp.int32))
    (_, best), _ = jax.lax.scan(body, init, reads.T)
    return best


@functools.partial(jax.jit, static_argnames=("tie_semantics",))
def fill_pairs(reads, refs, match, mismatch, gap, tie_semantics: str = "serial"):
    """Full fill for the traceback pass: score matrix + effective dirs.

    Returns:
      H:    (B, M, N) int32 — scores for rows 1..M (row 0 boundary omitted)
      dirs: (B, M, N) int8  — effective traceback codes (0 for score-0
            cells; 1/2/3 otherwise, tie priority per ``tie_semantics``).

    ``tie_semantics`` mirrors the reference's two engines (scores agree;
    only tied-path direction codes differ — see core.oracle):
      "serial":       '>=' in order d, i, a — last equal wins, ties
                      a > i > d (SmithWaterman.java:217-252).
      "distributed":  strict '>' in the same order — first equal wins,
                      ties d > i > a (DistributedSW.java:305-330).
    Zero-score cells store DIR_NONE under both (traceback stops there).
    """
    B, N = refs.shape
    ramp = gap * jnp.arange(N, dtype=jnp.int32)
    refs_i = refs.astype(jnp.int32)
    serial = tie_semantics != "distributed"

    def body(h_prev, read_col):
        sub = _sub_scores(refs_i, read_col[:, None].astype(jnp.int32), match, mismatch)
        h, a, ins = _row_update(h_prev, sub, gap, ramp)
        d = _shift_right(h) + gap
        if serial:
            # Tie priority a > i > d (GetCellScore evaluates d, i, a with
            # >=, so the last equal candidate wins —
            # SmithWaterman.java:217-252).
            dir_raw = jnp.where(
                a == h,
                DIR_ALIGN,
                jnp.where(ins == h, DIR_INS, jnp.where(d == h, DIR_DEL, DIR_NONE)),
            )
        else:
            # Strict '>': the FIRST candidate reaching h wins, ties
            # d > i > a (DistributedSW.java:305-330).  For h > 0 one of
            # d/ins/a always equals h; h == 0 cells are masked below.
            dir_raw = jnp.where(
                d == h,
                DIR_DEL,
                jnp.where(ins == h, DIR_INS, jnp.where(a == h, DIR_ALIGN, DIR_NONE)),
            )
        eff = jnp.where(h > 0, dir_raw, DIR_NONE).astype(jnp.int8)
        return h, (h, eff)

    _, (h_all, dir_all) = jax.lax.scan(
        body, jnp.zeros((B, N), jnp.int32), reads.T
    )
    # scan stacks on axis 0 -> (M, B, N); present as (B, M, N).
    return jnp.moveaxis(h_all, 0, 1), jnp.moveaxis(dir_all, 0, 1)


def encode_padded(seqs, pad_to: int, pad_value: int) -> np.ndarray:
    """Host-side helper: encode strings into (len(seqs), pad_to) uint8."""
    from sparksmithwaterman_tpu.io.fasta import encode_batch

    return encode_batch(list(seqs), pad_to, pad_value)
