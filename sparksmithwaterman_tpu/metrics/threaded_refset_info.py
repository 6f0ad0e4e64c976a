"""Threaded reference-dataset statistics.

The reference contains an *abandoned* threaded rewrite of its dataset
statistics tool: ``threadedMetrics.InfoRefSet`` is an empty skeleton
whose constructor does nothing (``src/threadedMetrics/InfoRefSet.java:1-19``).
This module is that component actually built: the directory crawl and
FASTA parse are fanned out over a thread pool (the parse is I/O- and
C-parser-bound, so threads — not processes — are the right tool under
the GIL), per-file partials are merged deterministically, and the result
is bit-identical to the serial :func:`..metrics.refset_info.get_info`.

Median note: the serial path streams the median through a two-heap
:class:`RunningMedian` (``src/metrics/RunningMedian.java``).  Two-heap
states do not merge, so the threaded path instead collects per-file
length arrays and takes the exact median at the end — same value, and
the arrays double as the min/max/total reduction input.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import List, Tuple

import numpy as np

from sparksmithwaterman_tpu.io import get_ref_seqs, iter_files
from sparksmithwaterman_tpu.io.report import write_str_to_file
from sparksmithwaterman_tpu.metrics.refset_info import RefSetInfo, format_info


def _file_stats(path: str, delimiter: str) -> Tuple[str, int, np.ndarray]:
    seqs = get_ref_seqs(path, delimiter)
    lengths = np.asarray([len(seq) for _, seq in seqs], dtype=np.int64)
    return os.path.basename(path), len(seqs), lengths


def get_info_threaded(
    directory: str,
    delimiter: str = ">gi",
    workers: int = 8,
) -> RefSetInfo:
    """Crawl ``directory`` with a thread pool; same result as ``get_info``.

    Files are submitted in the crawler's sorted-DFS order and results are
    consumed in that same order, so the per-file table is deterministic
    regardless of thread scheduling.
    """
    paths = list(iter_files(directory))
    files: List[Tuple[str, int]] = []
    all_lengths: List[np.ndarray] = []
    with ThreadPoolExecutor(max_workers=max(1, workers)) as pool:
        for name, count, lengths in pool.map(
            lambda p: _file_stats(p, delimiter), paths
        ):
            files.append((name, count))
            all_lengths.append(lengths)
    lengths = (
        np.concatenate(all_lengths)
        if all_lengths
        else np.zeros((0,), np.int64)
    )
    num_seqs = int(lengths.size)
    total_bp = int(lengths.sum())
    return RefSetInfo(
        directory=directory,
        num_files=len(paths),
        num_seqs=num_seqs,
        total_bp=total_bp,
        min_bp=int(lengths.min()) if num_seqs else 0,
        max_bp=int(lengths.max()) if num_seqs else 0,
        mean_bp=total_bp / num_seqs if num_seqs else 0.0,
        median_bp=float(np.median(lengths)) if num_seqs else 0.0,
        files=files,
    )


def print_all_info_threaded(
    directory: str,
    out_file: str,
    delimiter: str = ">gi",
    workers: int = 8,
) -> RefSetInfo:
    info = get_info_threaded(directory, delimiter, workers)
    write_str_to_file(out_file, format_info(info))
    return info
