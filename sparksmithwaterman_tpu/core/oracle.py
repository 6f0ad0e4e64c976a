"""Serial Smith-Waterman parity oracle.

An exact re-statement of the reference's serial engine semantics
(``src/sw/SmithWaterman.java``) in NumPy.  Every later component (the JAX
recurrence, the Pallas kernels, the distributed engine) is tested against
this module.

Numerical contract (reference ``SmithWaterman.java:198-252``):

- Candidates are evaluated in the order deletion (W + gap), insertion
  (N + gap), alignment (NW + match/mismatch), each compared with ``>=``
  against a running max that starts at ``(0, '-')``.
- Tie priority is therefore alignment > insertion > deletion > none, and a
  ZERO-valued del/ins/align candidate still overwrites the '-' type (the
  "zero-overwrite quirk").
- Max-cell tracking (``SmithWaterman.java:152-185``): row-major discovery;
  strict ``>`` clears the list, ``==`` appends.  If the global max stays 0,
  every cell is a "max cell" (each with an empty traceback).
- Traceback (``SmithWaterman.java:354-436``): from each max cell, walk while
  the current cell's score is > 0; record ``beginning = j`` before each
  move; 'a' consumes both chars, 'i' consumes the read char (gap in ref),
  anything else consumes the ref char (gap in read).  Gap char is '_'.
- Base comparison is case-insensitive (``SmithWaterman.java:311-312``).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from sparksmithwaterman_tpu.config import ScoringScheme

Site = Tuple[int, Tuple[str, str]]

# Direction codes used in the int direction matrix (shared with ops/).
DIR_NONE = 0
DIR_ALIGN = 1
DIR_INS = 2
DIR_DEL = 3


def fill_matrices(
    ref_seq: str,
    read_seq: str,
    scoring: ScoringScheme = ScoringScheme(),
    tie_semantics: str = "serial",
) -> Tuple[np.ndarray, np.ndarray, int, List[Tuple[int, int]]]:
    """Fill the (m+1, n+1) score and direction matrices.

    Returns (scores, dirs, max_score, max_cells) where ``dirs`` holds raw
    direction codes including the zero-overwrite quirk, and ``max_cells``
    is the row-major list of (i, j) with score == max_score (empty only
    when the read or ref is empty).

    ``tie_semantics`` selects which of the reference's TWO cell-score
    engines to mirror (their scores are identical; only the recorded
    direction — hence the alignment *string* on tied paths — differs):

    - ``"serial"``: ``SmithWaterman.GetCellScore``
      (``SmithWaterman.java:217-252``) — candidates compared with ``>=``
      in order deletion, insertion, alignment, so ties resolve
      alignment > insertion > deletion, and a ZERO-valued candidate
      still overwrites '-'.  This is the engine behind NoDistribution
      and DistributeReference, and the project-wide parity oracle.
    - ``"distributed"``: ``DistributedSW.GetCellScore``
      (``DistributedSW.java:305-330``) — strict ``>`` in the same
      order, so ties resolve deletion > insertion > alignment and
      zero-score cells keep '-'.
    """
    ref = ref_seq.upper()
    read = read_seq.upper()
    m, n = len(read), len(ref)
    scores = np.zeros((m + 1, n + 1), dtype=np.int64)
    dirs = np.zeros((m + 1, n + 1), dtype=np.int8)

    match, mismatch, gap = scoring.match, scoring.mismatch, scoring.gap
    if tie_semantics not in ("serial", "distributed"):
        raise ValueError(f"unknown tie_semantics: {tie_semantics!r}")
    strict = tie_semantics == "distributed"

    max_score = 0
    max_cells: List[Tuple[int, int]] = []
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            # Candidate order mirrors both engines (deletion, insertion,
            # alignment); '>=' vs '>' is the whole difference.
            best, direction = 0, DIR_NONE
            d = scores[i, j - 1] + gap
            if d > best or (not strict and d == best):
                best, direction = d, DIR_DEL
            ins = scores[i - 1, j] + gap
            if ins > best or (not strict and ins == best):
                best, direction = ins, DIR_INS
            a = scores[i - 1, j - 1] + (match if ref[j - 1] == read[i - 1] else mismatch)
            if a > best or (not strict and a == best):
                best, direction = a, DIR_ALIGN
            scores[i, j] = best
            dirs[i, j] = direction
            if best > max_score:
                max_score = int(best)
                max_cells = [(i, j)]
            elif best == max_score:
                max_cells.append((i, j))
    return scores, dirs, int(max_score), max_cells


def traceback_one(
    cell: Tuple[int, int],
    scores: np.ndarray,
    dirs: np.ndarray,
    ref_seq: str,
    read_seq: str,
    gap_char: str = "_",
) -> Site:
    """Trace one optimal alignment from ``cell``.

    Mirrors ``GetAlignment`` (SmithWaterman.java:354-436): stops at the
    first zero-score cell; ``beginning`` is the 1-based reference column of
    the last positive-score cell visited (0 if the start cell scores 0).
    """
    i, j = cell
    beginning = 0
    ref_parts: List[str] = []
    read_parts: List[str] = []
    while scores[i, j] > 0:
        beginning = j
        d = dirs[i, j]
        if d == DIR_ALIGN:
            ref_parts.append(ref_seq[j - 1])
            read_parts.append(read_seq[i - 1])
            i -= 1
            j -= 1
        elif d == DIR_INS:
            ref_parts.append(gap_char)
            read_parts.append(read_seq[i - 1])
            i -= 1
        else:  # deletion (the reference's final 'else' branch)
            ref_parts.append(ref_seq[j - 1])
            read_parts.append(gap_char)
            j -= 1
    return beginning, ("".join(reversed(ref_parts)), "".join(reversed(read_parts)))


def opt_alignments(
    ref_seq: str,
    read_seq: str,
    scoring: ScoringScheme = ScoringScheme(),
    tie_semantics: str = "serial",
) -> Tuple[int, List[Site]]:
    """Score one (ref, read) pair and trace all optimal alignments.

    Mirrors ``SmithWaterman.OptAlignments.call`` (SmithWaterman.java:62-92):
    returns (max_score, [(beginning, (aligned_ref, aligned_read)), ...])
    with one site per max cell in row-major discovery order.
    ``tie_semantics="distributed"`` selects the reference's second engine
    (``DistributedSW.OptAlignments``) — see :func:`fill_matrices`.
    """
    scores, dirs, max_score, max_cells = fill_matrices(
        ref_seq, read_seq, scoring, tie_semantics
    )
    sites = [
        traceback_one(cell, scores, dirs, ref_seq, read_seq, scoring.gap_char)
        for cell in max_cells
    ]
    return max_score, sites


def align_chars(dirs: np.ndarray, scoring: ScoringScheme = ScoringScheme()) -> np.ndarray:
    """Render a direction matrix as the reference's char matrix
    ('a'/'i'/'d'/'-' by default) for ``format_matrices`` golden tests."""
    lut = np.array(
        [scoring.types[3], scoring.types[0], scoring.types[1], scoring.types[2]]
    )
    return lut[dirs]
