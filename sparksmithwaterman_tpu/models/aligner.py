"""Alignment backends: the engines behind the pipeline strategies.

The reference exposes three working strategies with a common driver shape
(``src/sw/Distribution.java``): NoDistribution (serial control),
DistributeReference (shard the reference set), DistributeAlgorithm
(wavefront inside one matrix), plus a declared-but-unimplemented
DistributeReads.  Here every strategy is a backend with one contract:

- ``totals(reads, ref_seqs) -> np.ndarray``: per-reference total score,
  summed over all reads (the hot path; reference ``Distribution.java:414-426``).
- ``sites_for_ref(ref_seq, reads) -> List[Site]``: all optimal alignment
  sites of every read against one (winning) reference, merged in read
  order and stably sorted by beginning index (reference
  ``Distribution.java:428``, ``MatchSiteComp``).

The serial backend is the parity oracle.  The batch/sharded backends
(JAX/Pallas) implement the same contract on TPU.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from sparksmithwaterman_tpu.config import AlignConfig, ScoringScheme
from sparksmithwaterman_tpu.core import oracle
from sparksmithwaterman_tpu.io.report import Site


class SerialBackend:
    """Pure-NumPy serial engine — the control / parity oracle.

    TPU-native analogue of ``Distribution.NoDistribution``
    (``Distribution.java:482-634``).
    """

    def __init__(self, scoring: ScoringScheme = ScoringScheme()):
        self.scoring = scoring

    def totals(self, reads: Sequence[str], ref_seqs: Sequence[str]) -> np.ndarray:
        out = np.zeros(len(ref_seqs), dtype=np.int64)
        for k, ref in enumerate(ref_seqs):
            out[k] = sum(
                oracle.opt_alignments(ref, read, self.scoring)[0] for read in reads
            )
        return out

    def sites_for_ref(self, ref_seq: str, reads: Sequence[str]) -> List[Site]:
        sites: List[Site] = []
        for read in reads:
            _, read_sites = oracle.opt_alignments(
                ref_seq, read, self.scoring,
                tie_semantics=self.scoring.tie_semantics,
            )
            sites.extend(read_sites)
        # Stable sort by beginning index == Collections.sort + MatchSiteComp
        # (Distribution.java:676-695): ties keep (read order, row-major cell
        # order).
        sites.sort(key=lambda s: s[0])
        return sites

    def best_of(
        self, reads: Sequence[str], ref_seqs: Sequence[str]
    ) -> Tuple[int, List[int]]:
        """(best_total, tie_indices): the driver-side reduce of one batch
        (``Distribution.java:601-613`` semantics: ties in encounter
        order)."""
        totals = self.totals(reads, ref_seqs)
        if len(totals) == 0:
            return 0, []
        best = int(totals.max())
        return best, [int(i) for i in np.flatnonzero(totals == best)]


def get_backend(config: AlignConfig):
    """Resolve the configured strategy to a backend instance."""
    if config.strategy == "serial":
        return SerialBackend(config.scoring)
    if config.strategy in ("batch", "wavefront"):
        from sparksmithwaterman_tpu.models.batch_backend import BatchBackend

        # 'wavefront' (the reference's DistributeAlgorithm,
        # Distribution.java:63-213) PINS the anti-diagonal kernel;
        # 'batch' honors config.kernel ('diag' default — fastest — or
        # 'row' for the prefix-max kernel).
        if config.strategy == "wavefront" and config.kernel != "diag":
            import dataclasses

            config = dataclasses.replace(config, kernel="diag")
        return BatchBackend(config)
    if config.strategy in ("shard_refs", "shard_reads"):
        from sparksmithwaterman_tpu.parallel.engine import ShardedBackend

        return ShardedBackend(config)
    if config.strategy == "shard_seq":
        from sparksmithwaterman_tpu.parallel.seqparallel import (
            SeqParallelBackend,
        )

        return SeqParallelBackend(config)
    raise ValueError(f"Unknown strategy: {config.strategy!r}")
