"""The directory pipeline: crawl inputs, score against the reference set,
reduce to the best-matching reference(s), write reports.

TPU-native re-design of the reference's strategy drivers
(``src/sw/Distribution.java:63-213`` DistributeAlgorithm,
``:227-373`` DistributeReference, ``:482-634`` NoDistribution): all three
share this driver; only the backend differs.

Reduction semantics (parity, with one documented intent-fix):

- The running max over references uses ``>`` to replace and ``==`` to
  append (``Distribution.java:601-613``), so the final winner set is every
  reference whose total equals the global max, in encounter order.
- ``DistributeReference`` in the reference reads ``first()`` of an
  *unsorted* RDD (``Distribution.java:341-342``; the ``sortByKey`` result
  is discarded), which can pick a non-optimal reference.  SURVEY.md §3.2
  documents this as a defect; we implement the intent (true max), which
  also matches the serial control.
- The winner list is sorted by reference metadata before reporting
  (``OptSeqsComp``, ``Distribution.java:647-665``; Python's stable sort
  matches ``Collections.sort``).
- Execution time covers reference parsing + scoring + traceback, not
  report formatting (``Distribution.java:567,620``).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Tuple

from sparksmithwaterman_tpu.config import AlignConfig
from sparksmithwaterman_tpu.io import get_reads, get_ref_seqs, iter_files
from sparksmithwaterman_tpu.io.report import OptEntry, build_report, write_str_to_file
from sparksmithwaterman_tpu.models.aligner import get_backend

_JOURNAL = ".journal.jsonl"


class DoubleBufferedFlushes:
    """Encounter-order winner merge over device-reduced scoring flushes,
    DOUBLE-BUFFERED: flush k's (best, tie-indices) fetch resolves only
    after flush k+1 has been dispatched, hiding the device tail + the
    fetch round trip (tens of ms through a remote-TPU tunnel) behind
    the next flush's parse/encode host work.  Resolution stays in
    dispatch order, so the ``>`` replaces / ``==`` appends bookkeeping
    sees entries in exact encounter order
    (``src/sw/Distribution.java:601-613``).

    Shared by the single-host pipeline and the multi-host shard driver
    (entries are opaque: (metadata, seq) pairs there, (file_idx,
    seq_idx) here).  Backends without ``best_of_async`` (serial, seq)
    fall back to a synchronous resolve.
    """

    def __init__(self, backend, reads):
        self.best = 0
        self.winners: list = []
        self._in_flight: list = []
        self._reads = reads
        async_fn = getattr(backend, "best_of_async", None)
        if async_fn is None:
            def async_fn(reads_, seqs, _b=backend):
                res = _b.best_of(reads_, seqs)
                return lambda: res

        self._async = async_fn

    def dispatch(self, entries: list, seqs: list) -> None:
        if not entries:
            return
        self._in_flight.append(
            (entries, self._async(self._reads, seqs))
        )
        while len(self._in_flight) > 1:
            self._drain_one()

    def _drain_one(self) -> None:
        entries, resolve = self._in_flight.pop(0)
        best, ties = resolve()
        if best > self.best:
            self.best = best
            self.winners = [entries[i] for i in ties]
        elif best == self.best:
            self.winners.extend(entries[i] for i in ties)

    def finish(self) -> None:
        while self._in_flight:
            self._drain_one()


def _journal_path(config: AlignConfig) -> str:
    return os.path.join(config.out_dir, _JOURNAL)


def _load_journal(config: AlignConfig) -> Dict[str, dict]:
    """Completed input files from a previous run (checkpoint/resume —
    the reference has none; its only resume granularity is the
    one-report-per-input incremental write, SURVEY.md §5)."""
    path = _journal_path(config)
    done: Dict[str, dict] = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    entry = json.loads(line)
                    done[entry["input"]] = entry
    return done


def _journal_append(config: AlignConfig, entry: dict) -> None:
    path = _journal_path(config)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps(entry) + "\n")


def run_pipeline(config: AlignConfig, backend=None, resume: bool = False) -> List[str]:
    """Run the full comparison for every input file; return report paths.

    With ``resume=True``, input files already recorded in the out-dir
    journal (same path + mtime) are skipped and their prior report paths
    returned — idempotent restart after interruption.
    """
    if backend is None:
        backend = get_backend(config)
    done = _load_journal(config) if resume else {}

    out_paths: List[str] = []
    input_num = 0
    for in_file in iter_files(config.in_dir):
        input_num += 1
        prior = done.get(in_file)
        if (
            prior
            and prior.get("mtime") == os.path.getmtime(in_file)
            and os.path.exists(prior["report"])
        ):
            out_paths.append(prior["report"])
            continue
        reads = get_reads(in_file, config.delimiter)

        t0 = time.monotonic()
        num_refs = 0

        # Stream reference files (the reference streams too,
        # Distribution.java:578-616), but accumulate sequences across
        # files up to ref_batch_bp base pairs per scoring dispatch —
        # per-file dispatch leaves small files under-batched and the
        # device idle between launches.  Device-side winner reduction:
        # only (best, tie indices) cross to the host — O(shards), not
        # O(C), per dispatch (the intent of Distribution.java:341-353
        # without its collect-everything driver merge).
        merge = DoubleBufferedFlushes(backend, reads)
        pending: List[Tuple[str, str]] = []
        pending_bp = 0

        def flush():
            nonlocal pending, pending_bp
            merge.dispatch(pending, [seq for _, seq in pending])
            pending = []
            pending_bp = 0

        for ref_file in iter_files(config.ref_dir):
            ref_seqs = get_ref_seqs(ref_file, config.delimiter)
            num_refs += len(ref_seqs)
            for metadata, seq in ref_seqs:
                pending.append((metadata, seq))
                pending_bp += len(seq)
                if pending_bp >= config.ref_batch_bp:
                    flush()
        flush()
        merge.finish()
        global_max = merge.best
        winners = merge.winners

        # Traceback pass: only the winning references (the reference
        # computes these inline per pair; the result set is identical).
        opt: List[OptEntry] = [
            ((metadata, seq), backend.sites_for_ref(seq, reads))
            for metadata, seq in winners
        ]
        exec_ms = int((time.monotonic() - t0) * 1000)

        opt.sort(key=lambda entry: entry[0][0])
        report = build_report(
            reads=reads,
            num_refs=num_refs,
            num_reads=len(reads),
            max_score=global_max,
            exec_time_ms=exec_ms,
            opt=opt,
        )
        out_path = os.path.join(
            config.out_dir, f"{config.out_name}{input_num}{config.out_ext}"
        )
        write_str_to_file(out_path, report)
        _journal_append(
            config,
            {
                "input": in_file,
                "mtime": os.path.getmtime(in_file),
                "report": out_path,
                "max_score": global_max,
                "exec_ms": exec_ms,
            },
        )
        out_paths.append(out_path)
    return out_paths
