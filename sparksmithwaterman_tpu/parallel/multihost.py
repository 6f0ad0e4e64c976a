"""Multi-host execution: reference manifest sharding + global merge.

TPU-pod re-design of the reference's cluster path
(``Distribution.DistributeReference``, ``src/sw/Distribution.java:227-373``):

- ONE ``jax.distributed.initialize`` per process (vs. one SparkContext
  per job, ``src/sw/DistributedSW.java:186`` — "Not optimal");
- the reference *file manifest* is sharded per host (reference files are
  independent, so this axis rides DCN with zero communication during
  scoring); within a host the chip mesh shards sequences/reads over ICI
  (parallel/engine.py);
- the driver-side ``sortByKey/first/lookup`` reduce
  (``Distribution.java:341-353``) becomes a ``process_allgather`` of
  per-host best scores + shared-filesystem candidate assembly with
  deterministic (file, sequence) ordering — implementing the *intent*
  (true max; the reference's unsorted-``first()`` defect is documented
  in SURVEY.md §3.2 and not reproduced).

Runs unchanged at ``num_processes=1`` (the test path; real pods pass
coordinator/process info or rely on TPU auto-detection).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import List, Optional, Sequence, Tuple

import numpy as np

from sparksmithwaterman_tpu.config import AlignConfig
from sparksmithwaterman_tpu.io import get_reads, get_ref_seqs, iter_files
from sparksmithwaterman_tpu.io.report import OptEntry, build_report, write_str_to_file
from sparksmithwaterman_tpu.models.aligner import get_backend


@dataclasses.dataclass(frozen=True)
class HostConfig:
    """Distributed-process topology (None fields = single process)."""

    num_processes: int = 1
    process_id: int = 0
    coordinator_address: Optional[str] = None  # e.g. "10.0.0.1:8476"

    def initialize(self) -> None:
        if self.num_processes > 1:
            import jax

            jax.distributed.initialize(
                coordinator_address=self.coordinator_address,
                num_processes=self.num_processes,
                process_id=self.process_id,
            )


def shard_manifest(files: Sequence[str], num_hosts: int, host_id: int) -> List[Tuple[int, str]]:
    """Deterministic round-robin assignment of reference files to hosts.

    Returns (global_file_index, path) so cross-host winner assembly can
    reproduce the serial encounter order exactly.
    """
    return [(i, f) for i, f in enumerate(files) if i % num_hosts == host_id]


def _allgather_best(local_best: int, host: HostConfig) -> np.ndarray:
    if host.num_processes == 1:
        return np.asarray([local_best], np.int64)
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.process_allgather(np.asarray([local_best], np.int64))
    ).reshape(-1)


def _barrier(host: HostConfig, name: str) -> None:
    if host.num_processes == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def _shard_key(in_file: str, my_files: Sequence[Tuple[int, str]]) -> str:
    """Identity of one (input, manifest shard) scoring task.

    Idempotence contract: the shard result is a pure function of the
    input file and the shard's reference files, so the journal entry is
    valid iff none of them changed (mtimes).  This is the per-shard
    result journal SURVEY.md §5 calls for — the reference's only fault
    tolerance was Spark's implicit lineage re-execution.
    """
    import hashlib

    h = hashlib.sha256()
    h.update(f"{in_file}:{os.path.getmtime(in_file)}".encode())
    for idx, f in my_files:
        h.update(f"{idx}:{f}:{os.path.getmtime(f)}".encode())
    return h.hexdigest()[:16]


def run_multihost_pipeline(
    config: AlignConfig,
    host: HostConfig = HostConfig(),
    backend=None,
    resume: bool = False,
) -> List[str]:
    """Full pipeline with the reference set sharded across hosts.

    All hosts see the same in_dir/ref_dir/out_dir (shared filesystem —
    the HDFS assumption of the reference's Spark design).  Process 0
    writes the final reports; every process returns their paths.

    With ``resume=True``, a host whose per-shard journal matches the
    current (input, shard manifest) skips rescoring its shard and
    replays the journaled partial result — elastic restart after a host
    failure costs only the failed shard's work.
    """
    if backend is None:
        backend = get_backend(config)
    files = list(iter_files(config.ref_dir))
    my_files = shard_manifest(files, host.num_processes, host.process_id)
    partial_dir = os.path.join(config.out_dir, ".partial")

    out_paths: List[str] = []
    input_num = 0
    for in_file in iter_files(config.in_dir):
        input_num += 1
        reads = get_reads(in_file, config.delimiter)
        t0 = time.monotonic()

        journal_path = os.path.join(
            partial_dir, f"input{input_num}.host{host.process_id}.journal.json"
        )
        shard_key = _shard_key(in_file, my_files)
        journaled = None
        if resume and os.path.exists(journal_path):
            try:
                with open(journal_path) as f:
                    entry = json.load(f)
                if entry.get("key") == shard_key:
                    journaled = entry
            except (json.JSONDecodeError, OSError):
                journaled = None  # truncated write — redo the shard

        local_refs = 0
        # Winner candidates: (file_idx, seq_idx) ONLY — journals and
        # candidate files are O(winners) small; sequences are re-read
        # from the (shared) reference files at merge time.  Storing the
        # full strings was unbounded on RefSeq-scale ties (VERDICT r2
        # task 7).  Device-side winner reduction + double-buffered
        # resolution shared with the single-host pipeline
        # (VERDICT r3 task 5): only (best, tie indices) cross to the
        # host per flush, and flush k's fetch round trip hides behind
        # flush k+1's parse/encode.
        from sparksmithwaterman_tpu.models.pipeline import (
            DoubleBufferedFlushes,
        )

        merge = DoubleBufferedFlushes(backend, reads)
        pending: List[Tuple[int, int, str]] = []  # (file_idx, seq_idx, seq)
        pending_bp = 0

        def flush():
            nonlocal pending, pending_bp
            merge.dispatch(
                [(f, s) for f, s, _ in pending],
                [seq for _, _, seq in pending],
            )
            pending = []
            pending_bp = 0

        if journaled is not None:
            local_max = int(journaled["local_max"])
            local_refs = int(journaled["local_refs"])
            winners = [tuple(w) for w in journaled["winners"]]
        else:
            for file_idx, ref_file in my_files:
                ref_seqs = get_ref_seqs(ref_file, config.delimiter)
                local_refs += len(ref_seqs)
                for seq_idx, (_, seq) in enumerate(ref_seqs):
                    pending.append((file_idx, seq_idx, seq))
                    pending_bp += len(seq)
                    if pending_bp >= config.ref_batch_bp:
                        flush()
            flush()
            merge.finish()
            local_max = merge.best
            winners = merge.winners
            os.makedirs(partial_dir, exist_ok=True)
            tmp = journal_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(
                    {
                        "key": shard_key,
                        "local_max": local_max,
                        "local_refs": local_refs,
                        "winners": winners,
                    },
                    f,
                )
            os.replace(tmp, journal_path)  # atomic: no torn journals

        all_best = _allgather_best(local_max, host)
        global_max = int(all_best.max())
        all_refs = _allgather_best(local_refs, host).sum() if host.num_processes > 1 else local_refs

        # Shared-filesystem exchange of winning candidates (the
        # TPU-native "lookup": scores met in the allgather; ragged
        # alignment payloads assemble host-side, SURVEY.md §2b).
        mine = winners if local_max == global_max else []
        os.makedirs(partial_dir, exist_ok=True)
        part_path = os.path.join(
            partial_dir, f"input{input_num}.host{host.process_id}.json"
        )
        with open(part_path, "w") as f:
            json.dump(mine, f)
        _barrier(host, f"candidates-{input_num}")

        out_path = os.path.join(
            config.out_dir, f"{config.out_name}{input_num}{config.out_ext}"
        )
        if host.process_id == 0:
            merged: List[Tuple[int, int]] = []
            for pid in range(host.num_processes):
                p = os.path.join(partial_dir, f"input{input_num}.host{pid}.json")
                with open(p) as f:
                    merged.extend(tuple(x) for x in json.load(f))
            # Serial encounter order, then the report's metadata sort.
            merged.sort()
            # Re-read winning sequences by (file_idx, seq_idx) — the
            # shared-fs analogue of the reference's driver-side
            # ``lookup`` (Distribution.java:348-352), O(winner files)
            # instead of shipping every winning sequence as JSON.
            parsed_files: dict = {}
            opt: List[OptEntry] = []
            for file_idx, seq_idx in merged:
                if file_idx not in parsed_files:
                    parsed_files[file_idx] = get_ref_seqs(
                        files[file_idx], config.delimiter
                    )
                metadata, seq = parsed_files[file_idx][seq_idx]
                opt.append(
                    ((metadata, seq), backend.sites_for_ref(seq, reads))
                )
            exec_ms = int((time.monotonic() - t0) * 1000)
            opt.sort(key=lambda entry: entry[0][0])
            report = build_report(
                reads=reads,
                num_refs=int(all_refs),
                num_reads=len(reads),
                max_score=global_max,
                exec_time_ms=exec_ms,
                opt=opt,
            )
            write_str_to_file(out_path, report)
        _barrier(host, f"report-{input_num}")
        out_paths.append(out_path)
    return out_paths
