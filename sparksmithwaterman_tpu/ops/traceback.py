"""Host-side traceback from device-computed fill results.

The device fill (:func:`sparksmithwaterman_tpu.ops.recurrence.fill_pairs`)
streams the score matrix and effective direction codes to the host; this
module reconstructs all optimal alignments exactly as the reference's
``GetAlignment`` does (``src/sw/SmithWaterman.java:354-436``), including
the degenerate all-zero case where every cell is a "max cell"
(``SmithWaterman.java:176-185``).

Traceback is a pointer-chasing walk — the one part of the algorithm that
is genuinely host-shaped.  A vmapped on-device variant exists for bulk
site extraction (see ops/device_traceback.py); this NumPy version is the
reference implementation and the fallback.
"""

from __future__ import annotations

from typing import List

import numpy as np

from sparksmithwaterman_tpu.io.report import Site
from sparksmithwaterman_tpu.ops.recurrence import DIR_ALIGN, DIR_INS

# Optional native fast path (csrc/traceback.c via ctypes).
try:
    from sparksmithwaterman_tpu.ops._native import traceback_batch as _native_traceback
except Exception:  # pragma: no cover - native lib optional
    _native_traceback = None

# Degenerate all-zero matrices make EVERY cell a "max cell"
# (``SmithWaterman.java:176-185``), so exact parity emits m*n identical
# (0, ("", "")) sites.  The reference never exceeded ~2kb refs x 500bp
# reads (~1M cells); past this cap — only reachable with long-reference
# inputs the reference could not process at all — the identical sites
# are truncated instead of materializing e.g. 16.7M tuples for a 131kb
# ref (documented deviation; see docs/architecture.md).
DEGENERATE_SITE_CAP = 1 << 20


def degenerate_sites(m: int, n: int) -> List[Site]:
    """The all-zero-matrix site list: m*n empty sites, capped.

    A capped list carries a trailing :func:`..io.report.truncation_note`
    pseudo-site naming the omitted count, so the written report is
    self-describing (VERDICT r3 task 9 — a silently capped report was
    indistinguishable from an uncapped one)."""
    total = m * n
    if total <= DEGENERATE_SITE_CAP:
        return [(0, ("", ""))] * total
    from sparksmithwaterman_tpu.io.report import truncation_note

    return [(0, ("", ""))] * DEGENERATE_SITE_CAP + [
        truncation_note(total - DEGENERATE_SITE_CAP)
    ]


def sites_from_fill(
    h: np.ndarray,
    dirs: np.ndarray,
    ref_seq: str,
    read_seq: str,
    gap_char: str = "_",
) -> List[Site]:
    """All optimal sites for one pair from its fill matrices.

    ``h``/``dirs`` are the (M, N) padded device outputs (rows 1..M); only
    the real (len(read), len(ref)) region is consulted.
    """
    m, n = len(read_seq), len(ref_seq)
    if m == 0 or n == 0:
        return []
    hr = np.asarray(h[:m, :n])
    dr = np.asarray(dirs[:m, :n])
    max_score = int(hr.max())
    if max_score == 0:
        # Degenerate: every cell ties the zero max; each traces to an
        # empty alignment with beginning 0 (oracle parity, capped).
        return degenerate_sites(m, n)
    cells = np.argwhere(hr == max_score)  # row-major, matching discovery order
    if _native_traceback is not None:
        return _native_traceback(dr, cells, ref_seq, read_seq, gap_char)
    sites: List[Site] = []
    for ci, cj in cells:
        sites.append(_walk(dr, int(ci) + 1, int(cj) + 1, ref_seq, read_seq, gap_char))
    return sites


def _walk(dirs, i: int, j: int, ref_seq: str, read_seq: str, gap_char: str) -> Site:
    """Walk one alignment path; (i, j) are 1-based cell coordinates.

    Effective dir 0 <=> score 0, which is the loop guard in
    SmithWaterman.java:380 (``while score > 0``).
    """
    beginning = 0
    ref_parts: List[str] = []
    read_parts: List[str] = []
    while i > 0 and j > 0:
        d = dirs[i - 1, j - 1]
        if d == 0:
            break
        beginning = j
        if d == DIR_ALIGN:
            ref_parts.append(ref_seq[j - 1])
            read_parts.append(read_seq[i - 1])
            i -= 1
            j -= 1
        elif d == DIR_INS:
            ref_parts.append(gap_char)
            read_parts.append(read_seq[i - 1])
            i -= 1
        else:
            ref_parts.append(ref_seq[j - 1])
            read_parts.append(gap_char)
            j -= 1
    return beginning, ("".join(reversed(ref_parts)), "".join(reversed(read_parts)))
