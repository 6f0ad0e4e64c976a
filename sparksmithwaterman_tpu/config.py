"""Typed configuration for the alignment engine.

The reference keeps all parameters as hardcoded private constants with
nullable positional overrides (reference ``src/sw/Distribution.java:36-50``,
``:103-128``).  Here the same parameter set is a real dataclass:
{match, mismatch, gap, align-type chars, delimiter, ref_dir, in_dir,
out_dir, out_name, out_ext}.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class ScoringScheme:
    """Smith-Waterman scoring parameters.

    Mirrors ``ALIGN_SCORES = {5,-3,-4}`` (match, mismatch, gap) and
    ``ALIGN_TYPES = {'a','i','d','-'}`` (alignment, insertion, deletion,
    none) from reference ``src/sw/Distribution.java:36-37``.  The gap
    penalty is linear (no affine gaps), matching
    ``src/sw/SmithWaterman.java:263-281``.
    """

    match: int = 5
    mismatch: int = -3
    gap: int = -4
    # alignment-type characters: (alignment, insertion, deletion, none)
    types: Tuple[str, str, str, str] = ("a", "i", "d", "-")
    gap_char: str = "_"  # reference src/sw/SmithWaterman.java:356
    # Which of the reference's TWO cell-score engines to mirror on tied
    # paths (scores are identical either way; only alignment STRINGS
    # differ).  "serial" = SmithWaterman.GetCellScore ('>=', ties
    # a > i > d — SmithWaterman.java:217-252), the engine behind
    # NoDistribution and DistributeReference.  "distributed" =
    # DistributedSW.GetCellScore (strict '>', ties d > i > a —
    # DistributedSW.java:305-330), the engine behind DistributeAlgorithm.
    # Default "serial" for EVERY strategy: unlike the reference, output
    # never silently depends on the strategy; pass
    # ``--tie-semantics distributed`` to reproduce DistributeAlgorithm's
    # strings byte-for-byte.
    tie_semantics: str = "serial"

    def __post_init__(self):
        if self.match <= 0:
            raise ValueError("match score must be positive")
        if self.gap >= 0 or self.mismatch >= 0:
            raise ValueError("gap and mismatch scores must be negative")
        if self.tie_semantics not in ("serial", "distributed"):
            raise ValueError(
                f"tie_semantics must be 'serial' or 'distributed', "
                f"got {self.tie_semantics!r}"
            )

    @property
    def align_scores(self) -> Tuple[int, int, int]:
        return (self.match, self.mismatch, self.gap)


@dataclasses.dataclass(frozen=True)
class AlignConfig:
    """End-to-end pipeline configuration.

    IO defaults mirror reference ``src/sw/Distribution.java:40-50``
    (paths are required here instead of hardcoded AWS paths).
    """

    ref_dir: str
    in_dir: str
    out_dir: str
    out_name: str = "result"  # OUT_FILE, Distribution.java:40
    out_ext: str = ".txt"  # OUT_EXT, Distribution.java:41
    delimiter: str = ">gi"  # DELIMITER, Distribution.java:46
    scoring: ScoringScheme = dataclasses.field(default_factory=ScoringScheme)

    # Engine knobs (no equivalent in the reference; TPU-native additions).
    strategy: str = "batch"  # serial | batch | shard_refs | shard_reads | shard_seq
    read_bucket: int = 128  # pad reads up to multiples of this
    ref_bucket: int = 256  # pad refs up to multiples of this
    use_pallas: bool = True  # Pallas kernel on TPU; lax fallback elsewhere
    kernel: str = "diag"  # 'diag' (wavefront, fast) | 'row' (prefix-max)
    # Bin-pack several reads per kernel row (ops/packing): removes the
    # per-read lane padding waste on ragged batches (measured 1.6-2x of
    # the DP work) and collapses read-length compile shapes into one.
    pack_reads: bool = True
    # shard_seq: read positions processed per ppermute round (the stripe
    # of the band-boundary ring schedule, parallel/seqparallel.py).
    seq_stripe: int = 8
    read_block: int = 64  # 'row' kernel read-block (pairs per program)
    # Accumulate reference sequences across files up to this many base
    # pairs before each scoring dispatch.  The reference corpus is 518
    # files averaging ~50 Mbp (README.md:36-38); scoring strictly
    # per-file (as the reference's loop does, Distribution.java:578)
    # leaves small files under-batched.  Memory: ~2 bytes/bp held.
    ref_batch_bp: int = 32_000_000
