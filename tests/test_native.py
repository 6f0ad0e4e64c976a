"""Native (C) traceback parity vs the pure-Python walk and the oracle."""

import numpy as np
import pytest

from sparksmithwaterman_tpu.core import oracle
from sparksmithwaterman_tpu.io.fasta import READ_PAD, REF_PAD, encode_batch
from sparksmithwaterman_tpu.ops.recurrence import fill_pairs

native = pytest.importorskip("sparksmithwaterman_tpu.ops._native")

PARAMS = (np.int32(5), np.int32(-3), np.int32(-4))


def _python_sites(h, dirs, ref, read):
    from sparksmithwaterman_tpu.ops import traceback as tb

    m, n = len(read), len(ref)
    hr, dr = np.asarray(h[:m, :n]), np.asarray(dirs[:m, :n])
    cells = np.argwhere(hr == hr.max())
    return [tb._walk(dr, int(ci) + 1, int(cj) + 1, ref, read, "_") for ci, cj in cells]


@pytest.mark.parametrize("seed", range(5))
def test_native_matches_python_walk(make_seq, seed):
    rng = np.random.default_rng(seed)
    read = make_seq(int(rng.integers(1, 40)))
    ref = make_seq(int(rng.integers(5, 80)))
    reads_enc = encode_batch([read], 40, READ_PAD)
    refs_enc = encode_batch([ref], 80, REF_PAD)
    h, dirs = fill_pairs(reads_enc, refs_enc, *PARAMS)
    h, dirs = np.asarray(h[0]), np.asarray(dirs[0])
    m, n = len(read), len(ref)
    cells = np.argwhere(h[:m, :n] == h[:m, :n].max())
    got = native.traceback_batch(dirs, cells, ref, read)
    want = _python_sites(h, dirs, ref, read)
    assert got == want


def test_native_matches_oracle(make_seq):
    read, ref = "ACGTACGT", "TTACGTACGTAA"
    reads_enc = encode_batch([read], 8, READ_PAD)
    refs_enc = encode_batch([ref], 16, REF_PAD)
    h, dirs = fill_pairs(reads_enc, refs_enc, *PARAMS)
    h, dirs = np.asarray(h[0]), np.asarray(dirs[0])
    m, n = len(read), len(ref)
    cells = np.argwhere(h[:m, :n] == h[:m, :n].max())
    got = native.traceback_batch(dirs, cells, ref, read)
    _, want = oracle.opt_alignments(ref, read)
    assert got == want
