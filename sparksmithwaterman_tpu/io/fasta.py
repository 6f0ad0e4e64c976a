"""FASTA-ish parsing with the reference's exact line semantics.

Parity notes (vs reference ``src/sw/InOutOps.java``):

- ``get_reads`` (``InOutOps.java:49-89``): every *line* of a reads file is
  one read (lines are NOT joined); every line is ``trim()``-ed; the first
  line is skipped only if it is metadata.  Empty lines therefore become
  empty reads, as in the reference.
- ``get_ref_seqs`` (``InOutOps.java:100-169``): a metadata line starts a new
  (metadata, sequence) record; sequence lines are concatenated WITHOUT
  trimming; the delimiter test is a prefix match (``InOutOps.java:394-412``).
  A non-empty file whose first line is not metadata crashes the reference
  with a NullPointerException; here it raises :class:`ValueError`.
- Base-pair comparison in the engine is case-insensitive
  (``SmithWaterman.java:311-312`` upper-cases both chars at compare time);
  we implement this by upper-casing at encode time, which is equivalent
  because alignment output echoes the original-case sequence only via the
  raw strings, never via the encoded bytes.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

# Padding codes: chosen below any printable ASCII so a padded position can
# never equal a real base (or the other pad code).
READ_PAD = 0
REF_PAD = 1


def is_metadata(line: str, delimiter: str) -> bool:
    """Prefix-match metadata test (reference ``InOutOps.java:394-412``)."""
    return line.startswith(delimiter)


def get_reads(path: str | os.PathLike, delimiter: str) -> List[str]:
    """Extract all reads from an input file, one read per line.

    Mirrors ``InOutOps.GetReads`` (``InOutOps.java:49-89``).
    """
    with open(path, "r") as f:
        lines = f.read().splitlines()
    if not lines:
        raise ValueError(f"Input file is empty: {path}")
    reads: List[str] = []
    first = lines[0].strip()
    if not is_metadata(first, delimiter):
        reads.append(first)
    for line in lines[1:]:
        reads.append(line.strip())
    return reads


# Set False to force the pure-Python parser (parity tests, debugging).
USE_NATIVE_PARSER = True


def get_ref_seqs(path: str | os.PathLike, delimiter: str) -> List[Tuple[str, str]]:
    """Extract (metadata, sequence) records from a reference file.

    Mirrors ``InOutOps.GetRefSeqs`` (``InOutOps.java:100-169``).  Large
    files go through the native parser (csrc/fasta.c, ~12x faster);
    any native-side unavailability falls back to the Python path.
    """
    if USE_NATIVE_PARSER:
        try:
            from sparksmithwaterman_tpu.io._native_io import parse_ref_native

            return parse_ref_native(path, delimiter)
        except ValueError:
            raise  # same contract as the Python path
        except Exception:
            pass  # no toolchain / load failure: pure-Python fallback
    return _get_ref_seqs_py(path, delimiter)


def _get_ref_seqs_py(
    path: str | os.PathLike, delimiter: str
) -> List[Tuple[str, str]]:
    sequences: List[Tuple[str, str]] = []
    meta = None
    chunks: List[str] = []
    with open(path, "r") as f:
        for raw in f.read().splitlines():
            if is_metadata(raw, delimiter):
                if meta is not None:
                    sequences.append((meta, "".join(chunks)))
                meta = raw
                chunks = []
            else:
                if meta is None:
                    raise ValueError(
                        f"Reference file does not start with metadata "
                        f"(delimiter {delimiter!r}): {path}"
                    )
                chunks.append(raw)
    if meta is None:
        raise ValueError(f"Reference file has no metadata lines: {path}")
    sequences.append((meta, "".join(chunks)))
    return sequences


def encode_seq(seq: str) -> np.ndarray:
    """Encode a sequence to upper-cased ASCII uint8 codes.

    Upper-casing here == the reference's ``Character.toUpperCase`` on both
    operands at compare time (``SmithWaterman.java:311-312``).
    """
    return np.frombuffer(seq.upper().encode("latin-1"), dtype=np.uint8).copy()


def decode_seq(codes: np.ndarray) -> str:
    return codes.tobytes().decode("latin-1")


def encode_batch(seqs: List[str], pad_to: int, pad_value: int) -> np.ndarray:
    """Encode sequences into a (len(seqs), pad_to) uint8 array.

    Vectorized: one join + one ``bytes.upper`` + one fancy-index scatter
    over the whole batch (the per-sequence Python loop was measured as
    the dominant serial host cost at 100K-read scale — VERDICT r2 task
    2).  ``bytes.upper`` maps only a-z -> A-Z, identical to
    ``str.upper`` (and the reference's ``Character.toUpperCase`` compare,
    ``SmithWaterman.java:311-312``) on ASCII; non-ASCII content takes the
    exact per-sequence path.
    """
    out = np.full((len(seqs), pad_to), pad_value, dtype=np.uint8)
    if not seqs:
        return out
    blob = "".join(seqs)
    if not blob.isascii():  # exotic content: exact str.upper semantics
        for i, s in enumerate(seqs):
            enc = encode_seq(s)
            if enc.size > pad_to:
                raise ValueError(
                    f"sequence length {enc.size} exceeds pad_to={pad_to}"
                )
            out[i, : enc.size] = enc
        return out
    lens = np.fromiter((len(s) for s in seqs), np.int64, count=len(seqs))
    max_len = int(lens.max())
    if max_len > pad_to:
        raise ValueError(f"sequence length {max_len} exceeds pad_to={pad_to}")
    flat = np.frombuffer(blob.encode("latin-1").upper(), dtype=np.uint8)
    row = np.repeat(np.arange(len(seqs)), lens)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    col = np.arange(flat.size) - np.repeat(starts, lens)
    out[row, col] = flat
    return out
