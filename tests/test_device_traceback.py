"""On-device traceback parity tests."""

import numpy as np
import pytest

from sparksmithwaterman_tpu.core import oracle
from sparksmithwaterman_tpu.io.fasta import READ_PAD, REF_PAD, encode_batch
from sparksmithwaterman_tpu.ops.device_traceback import (
    fill_and_trace,
    path_cap,
    sites_from_trace,
)

PARAMS = (np.int32(5), np.int32(-3), np.int32(-4))


def _device_sites(reads, refs, m_pad, n_pad, capacity=64):
    reads_enc = encode_batch(reads, m_pad, READ_PAD)
    refs_enc = encode_batch(refs, n_pad, REF_PAD)
    best, counts, cells, begins, codes = fill_and_trace(
        reads_enc, refs_enc, *PARAMS, capacity=capacity, cap=path_cap(m_pad)
    )
    out = []
    for k in range(len(reads)):
        assert int(counts[k]) <= capacity or int(best[k]) == 0
        out.append(
            sites_from_trace(
                int(best[k]),
                min(int(counts[k]), capacity),
                np.asarray(cells[k]),
                np.asarray(begins[k]),
                np.asarray(codes[k]),
                refs[k],
                reads[k],
            )
        )
    return out


@pytest.mark.parametrize("seed", range(6))
def test_matches_oracle_random(make_seq, seed):
    rng = np.random.default_rng(seed)
    reads = [make_seq(int(rng.integers(1, 30))) for _ in range(6)]
    refs = [make_seq(int(rng.integers(10, 90))) for _ in range(6)]
    got = _device_sites(reads, refs, 32, 96)
    for k in range(6):
        _, want = oracle.opt_alignments(refs[k], reads[k])
        assert got[k] == want, k


def test_tied_sites():
    # Read planted twice -> two co-optimal sites, row-major order.
    reads = ["ACGTACGT"]
    refs = ["TTACGTACGTAATTACGTACGTAA"]
    got = _device_sites(reads, refs, 8, 24)
    _, want = oracle.opt_alignments(refs[0], reads[0])
    assert got[0] == want
    assert len(want) >= 2


def test_degenerate_zero_matrix():
    reads = ["AAAA"]
    refs = ["CCCCCC"]
    got = _device_sites(reads, refs, 8, 8)
    _, want = oracle.opt_alignments(refs[0], reads[0])
    assert got[0] == want == [(0, ("", ""))] * 24


def test_backend_uses_device_traceback(make_seq):
    from sparksmithwaterman_tpu.config import AlignConfig
    from sparksmithwaterman_tpu.models.aligner import SerialBackend
    from sparksmithwaterman_tpu.models.batch_backend import BatchBackend

    rng = np.random.default_rng(42)
    reads = [make_seq(int(rng.integers(1, 25))) for _ in range(9)]
    ref = make_seq(200)
    config = AlignConfig(
        ref_dir=".", in_dir=".", out_dir=".", read_bucket=32, ref_bucket=64
    )
    got = BatchBackend(config).sites_for_ref(ref, reads)
    want = SerialBackend().sites_for_ref(ref, reads)
    assert got == want
