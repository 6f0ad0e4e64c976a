"""On-device traceback: vmapped walks over direction bits.

TPU-native re-design of the reference's parallel traceback
(``DistributedSW.GetAlignments``, ``src/sw/DistributedSW.java:432-494``:
one RDD element per max cell, each mapped through a ``GetMatchSite``
backtrack).  Here:

- the fill's direction codes stay in device memory (the reference
  captures BOTH full matrices into every per-cell tuple,
  ``DistributedSW.java:463-468``);
- per-pair max cells are extracted with a fixed-capacity argwhere
  (row-major — the oracle's discovery order);
- every (pair, max-cell) walk runs as a masked ``lax.scan`` of gathers,
  vmapped over cells and pairs;
- only (cells, beginnings, path codes) cross to the host — O(k * 4m)
  instead of O(B * m * n) — where strings are assembled vectorized.

The path-length cap is sound for the same reason as the long-ref window
(ops/longseq.py): a positive-score path of a length-m read has fewer
than ``m + 8m/3 < 4m`` steps.
"""

from __future__ import annotations

import functools
from typing import List

import numpy as np

import jax
import jax.numpy as jnp

from sparksmithwaterman_tpu.io.report import Site
from sparksmithwaterman_tpu.ops.recurrence import fill_pairs


def path_cap(m: int) -> int:
    return 4 * max(m, 1)


def _trace_one(dirs, cell, cap: int):
    """Walk one start cell over one pair's (M, N) dirs.

    Returns (beginning, codes): codes are emitted end-to-start (the
    walk order; the Java version pops a stack to reverse,
    ``SmithWaterman.java:418-427``), 0-padded after the stop.
    """

    def step(carry, _):
        i, j, beg = carry
        in_bounds = (i > 0) & (j > 0)
        d = jnp.where(
            in_bounds,
            dirs[jnp.maximum(i - 1, 0), jnp.maximum(j - 1, 0)],
            jnp.int8(0),
        )
        active = in_bounds & (d != 0)
        beg = jnp.where(active, j, beg)
        move_i = active & ((d == 1) | (d == 2))  # align/insertion consume read
        move_j = active & ((d == 1) | (d == 3))  # align/deletion consume ref
        i = jnp.where(move_i, i - 1, i)
        j = jnp.where(move_j, j - 1, j)
        return (i, j, beg), jnp.where(active, d, jnp.int8(0))

    init = (cell[0] + 1, cell[1] + 1, jnp.int32(0))
    (_, _, beg), codes = jax.lax.scan(step, init, None, length=cap)
    return beg, codes


@functools.partial(
    jax.jit, static_argnames=("capacity", "cap", "tie_semantics")
)
def fill_and_trace(
    reads,
    refs,
    match,
    mismatch,
    gap,
    *,
    capacity: int,
    cap: int,
    tie_semantics: str = "serial",
):
    """Fill + max-cell extraction + traceback, all on device.

    Args:
      reads: (B, M) uint8; refs: (B, N) uint8.
    Returns:
      best:   (B,) int32 max score per pair
      counts: (B,) int32 number of max cells (may exceed capacity —
              caller falls back for those pairs)
      cells:  (B, capacity, 2) int32 row-major max cells, -1-filled
      begins: (B, capacity) int32 1-based start columns
      codes:  (B, capacity, cap) int8 walk codes (end-to-start)
    """
    h, dirs = fill_pairs(
        reads, refs, match, mismatch, gap, tie_semantics=tie_semantics
    )

    def per_pair(h_b, dirs_b):
        best = jnp.max(h_b)
        eq = h_b == best
        counts = jnp.sum(eq)
        cells = jnp.argwhere(eq, size=capacity, fill_value=-1).astype(jnp.int32)
        begins, codes = jax.vmap(lambda c: _trace_one(dirs_b, c, cap))(cells)
        return best, counts.astype(jnp.int32), cells, begins, codes

    return jax.vmap(per_pair)(h, dirs)


def assemble_site(
    codes: np.ndarray,
    begin: int,
    cell,
    ref_seq: str,
    read_seq: str,
    gap_char: str = "_",
) -> Site:
    """Host assembly of one site from walk codes (vectorized numpy)."""
    nz = np.flatnonzero(codes == 0)
    length = int(nz[0]) if nz.size else codes.shape[0]
    if length == 0:
        return (0, ("", ""))
    c = codes[:length].astype(np.int64)
    move_i = (c == 1) | (c == 2)
    move_j = (c == 1) | (c == 3)
    i_end, j_end = int(cell[0]) + 1, int(cell[1]) + 1
    # Position BEFORE each step (walk emits end-to-start).
    i_pos = i_end - np.concatenate([[0], np.cumsum(move_i)[:-1]])
    j_pos = j_end - np.concatenate([[0], np.cumsum(move_j)[:-1]])
    ref_arr = np.frombuffer(ref_seq.encode("latin-1"), dtype="S1")
    read_arr = np.frombuffer(read_seq.encode("latin-1"), dtype="S1")
    gap_b = gap_char.encode("latin-1")
    ref_chars = np.where(c == 2, gap_b, ref_arr[j_pos - 1])
    read_chars = np.where(c == 3, gap_b, read_arr[i_pos - 1])
    return (
        int(begin),
        (
            ref_chars[::-1].tobytes().decode("latin-1"),
            read_chars[::-1].tobytes().decode("latin-1"),
        ),
    )


def sites_from_trace(
    best: int,
    count: int,
    cells: np.ndarray,
    begins: np.ndarray,
    codes: np.ndarray,
    ref_seq: str,
    read_seq: str,
    gap_char: str = "_",
) -> List[Site]:
    """Per-pair site list from device outputs (oracle-parity ordering).

    Only consults cells inside the real (m, n) region — padded regions
    can tie a zero max but never a positive one.
    """
    m, n = len(read_seq), len(ref_seq)
    if m == 0 or n == 0:
        return []
    if best == 0:
        from sparksmithwaterman_tpu.ops.traceback import degenerate_sites

        return degenerate_sites(m, n)
    sites: List[Site] = []
    for t in range(count):
        sites.append(
            assemble_site(codes[t], int(begins[t]), cells[t], ref_seq, read_seq, gap_char)
        )
    return sites
