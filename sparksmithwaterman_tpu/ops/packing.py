"""Lane packing: several reads per kernel row.

The wavefront kernels put the read in the LANE dimension, so an
unpacked batch pads every read to the row width — on real ragged
batches that wastes 1.6-2x of the DP work (e.g. 129-150bp reads in
256-lane rows).  Packing bins reads back-to-back into rows and marks
each read's first lane with ``_START_BIT``; the kernel restarts the DP
boundary at marked lanes (``ops/pallas_score._diag_kernel_packed``), so
per-row waste is only the trailing lanes.

This subsumes the reference's variable-length handling (it had none:
one Java matrix per pair, any length — SURVEY.md §7 hard part (c) is
ours alone) and collapses the per-read-length compile shapes into one.

The per-read maxima are recovered from the kernel's per-lane best with
a segment max (:func:`segment_best`).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from sparksmithwaterman_tpu.io.fasta import READ_PAD, encode_seq
from sparksmithwaterman_tpu.ops.pallas_score import _START_BIT


def pack_reads(
    reads: Sequence[str],
    m_pack: int,
    row_multiple: int = 8,
) -> Tuple[np.ndarray, np.ndarray]:
    """Bin-pack reads into ``m_pack``-lane rows (best-fit decreasing).

    Returns:
      packed: (ROWS, m_pack) int32 — ASCII codes with ``_START_BIT`` on
        each read's first lane (and on the first trailing-pad lane, so
        trailing lanes form their own all-pad segment scoring exactly 0).
      start_idx: (len(reads),) int32 — FLAT lane index (row * m_pack +
        lane) of each read's first lane.  The packed kernels finish with
        a segmented suffix max, so the per-read score sits exactly at
        these indices (``read_best``).

    ROWS is padded to a multiple of ``row_multiple`` with all-pad rows.
    Empty reads get one pad lane (their segment scores 0, the oracle's
    score for an empty read).
    """
    n_reads = len(reads)
    lens = [max(1, len(s)) for s in reads]  # empty read -> 1 pad lane
    if any(l > m_pack for l in lens):
        raise ValueError(f"read longer than m_pack={m_pack}")
    order = sorted(range(n_reads), key=lambda i: -lens[i])
    # Best-fit decreasing via a residual-capacity bucket list: for each
    # read, take a row whose free space is the TIGHTEST adequate fit
    # (scan buckets lens[i]..m_pack, FIFO within a bucket).  O(n*m_pack)
    # worst case — a naive first-fit scan over open rows is O(n^2) and
    # takes HOURS at the reference's 100K-read benchmark scale.
    rows: List[List[int]] = []
    space: List[int] = []
    by_residual: List[List[int]] = [[] for _ in range(m_pack + 1)]
    for i in order:
        li = lens[i]
        for res in range(li, m_pack + 1):
            if by_residual[res]:
                r = by_residual[res].pop()
                rows[r].append(i)
                space[r] = res - li
                by_residual[res - li].append(r)
                break
        else:
            rows.append([i])
            space.append(m_pack - lens[i])
            by_residual[m_pack - lens[i]].append(len(rows) - 1)
    n_rows = -(-max(1, len(rows)) // row_multiple) * row_multiple
    packed = np.full((n_rows, m_pack), READ_PAD, np.int32)
    start_idx = np.zeros(n_reads, np.int32)
    packed[:, 0] |= _START_BIT  # all-pad rows: one harmless segment
    for r, members in enumerate(rows):
        o = 0
        for i in members:
            enc = encode_seq(reads[i])
            packed[r, o : o + max(1, enc.size)] = (
                enc if enc.size else READ_PAD
            )
            packed[r, o] |= _START_BIT
            start_idx[i] = r * m_pack + o
            o += lens[i]
        if o < m_pack:
            packed[r, o] |= _START_BIT  # isolate trailing pad lanes
    return packed, start_idx


def read_best(lane_best, start_idx: np.ndarray):
    """(C, ROWS, M) kernel output -> (num_reads, C) per-read best.

    A gather of one lane per read (the segmented suffix max already
    happened in-kernel at zero marginal cost — an XLA segment_max
    epilogue was measured as the packed path's dominant non-kernel
    cost)."""
    import jax.numpy as jnp

    c = lane_best.shape[0]
    flat = lane_best.reshape(c, -1)
    return jnp.take(flat, jnp.asarray(start_idx), axis=1).T  # (R, C)


def packed_col_sums(lane_best, start_idx: np.ndarray):
    """(C, ROWS, M) kernel output -> (C,) per-ref column sums (int32)."""
    import jax.numpy as jnp

    c = lane_best.shape[0]
    flat = lane_best.reshape(c, -1)
    return jnp.take(flat, jnp.asarray(start_idx), axis=1).sum(
        axis=1, dtype=jnp.int32
    )
