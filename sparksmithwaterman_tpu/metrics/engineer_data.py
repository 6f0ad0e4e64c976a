"""Synthetic benchmark-corpus generator.

Capability mirror of the reference's ``metrics.EngineerData``
(``src/metrics/EngineerData.java:1-308``), which writes four controlled
sweeps (one factor varied at a time):

- **read_num** — input files with 20, then 50..1624-step-50 reads of 80bp
  (``EngineerData.java:51-79``)
- **read_len** — input files with 5 reads of 20..500bp step 20
  (``EngineerData.java:87-104``)
- **ref_num**  — subdirs ``ref1..refK`` whose single file holds
  {1,10,30,50,100,500,1000,1500,2000, then +2000 each up to 40000}
  sequences of 400bp (``EngineerData.java:116-169``)
- **ref_len**  — subdirs whose single file holds one sequence of
  {1,5,10,20, then 50-line steps}x80bp (``EngineerData.java:178-224``)

Differences by design: sequences are drawn from a seeded RNG rather than
one hardcoded 80bp string repeated (random content exercises the scoring
path realistically; the reference's repeated line makes every alignment
degenerate), and every sweep takes a ``scale`` to shrink the corpus for
tests.  File formats are identical (``>gi|...`` metadata, ``.fa`` inputs,
``.rna.fna`` refs).
"""

from __future__ import annotations

import os
from typing import List, Sequence

import numpy as np

IN_NAME, IN_EXT = "input", ".fa"
REF_NAME, REF_EXT = "ref", ".rna.fna"
DELIMITER = ">gi"
_ALPHABET = np.array(list("ACGT"))


def _rand_seq(rng: np.random.Generator, length: int) -> str:
    return "".join(rng.choice(_ALPHABET, size=length))


def _write(path: str, text: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(text.strip())


def change_read_num(directory: str, scale: float = 1.0, seed: int = 0) -> List[str]:
    """Input files varying #reads: 20, then 50..1624 step 50 (scaled)."""
    rng = np.random.default_rng(seed)
    counts = [20] + list(range(50, 1625, 50))
    counts = counts[: max(2, int(len(counts) * scale))]
    paths = []
    for k, n in enumerate(counts, start=1):
        reads = "\n".join(_rand_seq(rng, 80) for _ in range(n))
        path = os.path.join(directory, f"{IN_NAME}{k}{IN_EXT}")
        _write(path, reads)
        paths.append(path)
    return paths


def change_read_len(directory: str, scale: float = 1.0, seed: int = 1) -> List[str]:
    """Input files varying read length: 20..500bp step 20, 5 reads each."""
    rng = np.random.default_rng(seed)
    lengths = list(range(20, 501, 20))
    lengths = lengths[: max(2, int(len(lengths) * scale))]
    paths = []
    for k, length in enumerate(lengths, start=1):
        reads = "\n".join(_rand_seq(rng, length) for _ in range(5))
        path = os.path.join(directory, f"{IN_NAME}{k}{IN_EXT}")
        _write(path, reads)
        paths.append(path)
    return paths


def _ref_file(rng, num_seqs: int, seq_len: int, start_id: int = 1) -> str:
    parts = []
    for i in range(num_seqs):
        parts.append(f"{DELIMITER}|{REF_NAME}{start_id + i}")
        parts.append(_rand_seq(rng, seq_len))
    return "\n".join(parts)


def change_ref_num(directory: str, scale: float = 1.0, seed: int = 2) -> List[str]:
    """Subdirs ref1..refK, one file each, varying #sequences (400bp)."""
    rng = np.random.default_rng(seed)
    counts = [1, 10, 30, 50, 100, 500, 1000, 1500, 2000]
    counts += list(range(4000, 40001, 2000))  # 28 dirs total
    counts = counts[: max(2, int(len(counts) * scale))]
    paths = []
    for k, n in enumerate(counts, start=1):
        path = os.path.join(
            directory, f"{REF_NAME}{k}", f"{REF_NAME}{k}{REF_EXT}"
        )
        _write(path, _ref_file(rng, n, 400))
        paths.append(path)
    return paths


def change_ref_len(directory: str, scale: float = 1.0, seed: int = 3) -> List[str]:
    """Subdirs ref1..refK, one single-sequence file each, varying length.

    Lengths: {1,5,10,20} lines, then 50..1600 step 50 lines of 80bp
    (36 dirs; the reference's max is ~131kbp).
    """
    rng = np.random.default_rng(seed)
    line_counts = [1, 5, 10, 20] + list(range(50, 1601, 50))
    line_counts = line_counts[: max(2, int(len(line_counts) * scale))]
    paths = []
    for k, lines in enumerate(line_counts, start=1):
        path = os.path.join(
            directory, f"{REF_NAME}{k}", f"{REF_NAME}{k}{REF_EXT}"
        )
        _write(path, _ref_file(rng, 1, lines * 80))
        paths.append(path)
    return paths


# Fixed corpora used as the constant factor of sweeps 3 and 4 (the
# reference points them at a small fixed input dir, `.../input/ref`).
def fixed_input(directory: str, num_reads: int = 5, read_len: int = 80, seed: int = 4) -> str:
    rng = np.random.default_rng(seed)
    path = os.path.join(directory, f"{IN_NAME}1{IN_EXT}")
    _write(path, "\n".join(_rand_seq(rng, read_len) for _ in range(num_reads)))
    return path


def fixed_refs(directory: str, num_seqs: int = 20, seq_len: int = 400, seed: int = 5) -> str:
    rng = np.random.default_rng(seed)
    path = os.path.join(directory, f"{REF_NAME}1{REF_EXT}")
    _write(path, _ref_file(rng, num_seqs, seq_len))
    return path


def _fast_seq(rng: np.random.Generator, n: int) -> str:
    """Vectorized random sequence (bytes-table lookup) — ~50x the
    per-char join for Gbp-scale corpora."""
    table = np.frombuffer(b"ACGT", np.uint8)
    return table[rng.integers(0, 4, size=n)].tobytes().decode()


def refseq_like(
    directory: str,
    total_bp: int,
    *,
    file_bp: int = 2_000_000,
    min_len: int = 500,
    max_len: int = 4000,
    seed: int = 7,
) -> dict:
    """RefSeq-SHAPED corpus: many multi-sequence files whose sequence
    lengths draw uniformly from [min_len, max_len) (mean ~2250,
    matching the real RefSeq mean of 2,160 bp/seq,
    ``/root/reference/README.md:39``), ~``file_bp`` per file.

    Returns {"ref_bp", "files", "seqs"}.  This is the corpus-scale /
    sustained-pipeline workload generator (bench.py `pipeline` metric
    and experiments/corpus_scale.py); the four reference sweeps above
    vary one factor at a time instead.
    """
    rng = np.random.default_rng(seed)
    os.makedirs(directory, exist_ok=True)
    written = 0
    seqs = 0
    fi = 0
    while written < total_bp:
        fi += 1
        parts: List[str] = []
        bp = 0
        while bp < file_bp and written + bp < total_bp:
            n = int(rng.integers(min_len, max_len))
            parts.append(
                f">gi|{fi}|{len(parts)}|synthetic\n{_fast_seq(rng, n)}"
            )
            bp += n
        with open(os.path.join(directory, f"{REF_NAME}{fi}{REF_EXT}"), "w") as f:
            f.write("\n".join(parts))
        written += bp
        seqs += len(parts)
    return {"ref_bp": written, "files": fi, "seqs": seqs}


def reads_file(
    path: str, num_reads: int, *, min_len: int = 80, max_len: int = 151,
    seed: int = 11,
) -> int:
    """One reads input file with lengths in [min_len, max_len); returns
    total read bp."""
    rng = np.random.default_rng(seed)
    reads = [
        _fast_seq(rng, int(l))
        for l in rng.integers(min_len, max_len, size=num_reads)
    ]
    _write(path, "\n".join(reads))
    return sum(map(len, reads))


SWEEPS = {
    "read_num": change_read_num,
    "read_len": change_read_len,
    "ref_num": change_ref_num,
    "ref_len": change_ref_len,
}


def generate(out_dir: str, sweeps: Sequence[str] = tuple(SWEEPS), scale: float = 1.0) -> None:
    """Generate the requested sweep corpora under ``out_dir`` (CLI `gen`).

    Layout: ``out_dir/{input/readNum, input/readLen, testRef/refNum,
    testRef/refLen, input/ref, testRef/in}`` — mirroring the reference's
    benchmark tree (``ExecutionTimesControl.java:16-33``).
    """
    if "read_num" in sweeps:
        change_read_num(os.path.join(out_dir, "input", "readNum"), scale)
    if "read_len" in sweeps:
        change_read_len(os.path.join(out_dir, "input", "readLen"), scale)
    if "ref_num" in sweeps:
        change_ref_num(os.path.join(out_dir, "testRef", "refNum"), scale)
    if "ref_len" in sweeps:
        change_ref_len(os.path.join(out_dir, "testRef", "refLen"), scale)
    # Constant-factor corpora for the sweeps.
    fixed_input(os.path.join(out_dir, "input", "ref"))
    fixed_refs(os.path.join(out_dir, "testRef", "in"))
