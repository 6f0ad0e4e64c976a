"""Pallas kernel parity tests (interpreter mode on CPU)."""

import numpy as np
import pytest

from sparksmithwaterman_tpu.core import oracle
from sparksmithwaterman_tpu.io.fasta import READ_PAD, REF_PAD, encode_batch
from sparksmithwaterman_tpu.ops.pallas_score import (
    pallas_score_grid,
    pallas_score_grid_diag,
)
from sparksmithwaterman_tpu.ops.recurrence import score_grid

PARAMS = (np.int32(5), np.int32(-3), np.int32(-4))


def test_pallas_score_grid_matches_oracle(make_seq):
    reads = [make_seq(12) for _ in range(7)] + [""]
    refs = [make_seq(50) for _ in range(3)]
    reads_enc = encode_batch(reads, 16, READ_PAD)
    refs_enc = encode_batch(refs, 64, REF_PAD)
    got = np.asarray(
        pallas_score_grid(reads_enc, refs_enc, *PARAMS, read_block=8, interpret=True)
    )
    assert got.shape == (8, 3)
    for r, read in enumerate(reads):
        for c, ref in enumerate(refs):
            assert got[r, c] == oracle.opt_alignments(ref, read)[0], (r, c)


def test_pallas_matches_lax_reference(make_seq):
    # Randomized cross-check against the lax implementation (which is
    # itself oracle-checked in test_recurrence.py).  Sizes kept small:
    # interpreter mode is slow.
    reads = [make_seq(int(l)) for l in np.random.default_rng(3).integers(1, 24, 8)]
    refs = [make_seq(int(l)) for l in np.random.default_rng(4).integers(8, 60, 3)]
    reads_enc = encode_batch(reads, 24, READ_PAD)
    refs_enc = encode_batch(refs, 64, REF_PAD)
    got = np.asarray(
        pallas_score_grid(reads_enc, refs_enc, *PARAMS, read_block=8, interpret=True)
    )
    want = np.asarray(score_grid(reads_enc, refs_enc, *PARAMS))
    np.testing.assert_array_equal(got, want)


def test_diag_kernel_matches_oracle(make_seq):
    reads = [make_seq(12) for _ in range(7)] + [""]
    refs = [make_seq(50) for _ in range(3)]
    reads_enc = encode_batch(reads, 16, READ_PAD)
    refs_enc = encode_batch(refs, 64, REF_PAD)
    got = np.asarray(
        pallas_score_grid_diag(
            reads_enc, refs_enc, *PARAMS, read_block=8, interpret=True
        )
    )
    assert got.shape == (8, 3)
    for r, read in enumerate(reads):
        for c, ref in enumerate(refs):
            assert got[r, c] == oracle.opt_alignments(ref, read)[0], (r, c)


def test_diag_kernel_matches_lax_reference(make_seq):
    # Ragged lengths + padding on both axes; ref shorter than read and
    # non-multiple-of-8 diagonal count exercise the window clamps.
    reads = [make_seq(int(l)) for l in np.random.default_rng(5).integers(1, 24, 8)]
    refs = [make_seq(int(l)) for l in np.random.default_rng(6).integers(4, 60, 3)]
    reads_enc = encode_batch(reads, 24, READ_PAD)
    refs_enc = encode_batch(refs, 60, REF_PAD)
    got = np.asarray(
        pallas_score_grid_diag(
            reads_enc, refs_enc, *PARAMS, read_block=4, interpret=True
        )
    )
    want = np.asarray(score_grid(reads_enc, refs_enc, *PARAMS))
    np.testing.assert_array_equal(got, want)


def test_pallas_rejects_bad_block():
    reads_enc = encode_batch(["ACG"] * 6, 8, READ_PAD)
    refs_enc = encode_batch(["ACGT"], 8, REF_PAD)
    with pytest.raises(ValueError):
        pallas_score_grid(reads_enc, refs_enc, *PARAMS, read_block=4, interpret=True)


def test_chunked_kernel_matches_lax_reference(make_seq):
    from sparksmithwaterman_tpu.ops.pallas_score import (
        pallas_score_grid_diag_chunked,
    )

    reads = [make_seq(int(l)) for l in np.random.default_rng(5).integers(1, 24, 8)]
    refs = [make_seq(int(l)) for l in np.random.default_rng(6).integers(80, 300, 3)]
    reads_enc = encode_batch(reads, 24, READ_PAD)
    refs_enc = encode_batch(refs, 300, REF_PAD)
    got = np.asarray(
        pallas_score_grid_diag_chunked(
            reads_enc, refs_enc, *PARAMS,
            read_block=8, chunk=64, unroll=4, interpret=True,
        )
    )
    want = np.asarray(score_grid(reads_enc, refs_enc, *PARAMS))
    np.testing.assert_array_equal(got, want)


def test_chunked_argmax_reconstructs_max_cells(make_seq):
    from sparksmithwaterman_tpu.ops.pallas_score import (
        pallas_argmax_grid_diag_chunked,
    )

    rng = np.random.default_rng(9)
    reads = [make_seq(int(l)) for l in rng.integers(4, 24, 8)]
    refs = [make_seq(int(l)) for l in rng.integers(60, 290, 2)]
    reads_enc = encode_batch(reads, 24, READ_PAD)
    refs_enc = encode_batch(refs, 290, REF_PAD)
    best, bestd, count = pallas_argmax_grid_diag_chunked(
        reads_enc, refs_enc, *PARAMS,
        read_block=8, chunk=64, unroll=4, interpret=True,
    )
    best, bestd, count = map(np.asarray, (best, bestd, count))
    for r, read in enumerate(reads):
        for c, ref in enumerate(refs):
            h, _, max_score, _ = oracle.fill_matrices(ref, read)
            h = h[1:, 1:]
            assert best[r, c].max() == max_score
            if max_score == 0:
                continue
            want = np.argwhere(h == max_score)
            lanes = np.flatnonzero(best[r, c] == max_score)
            # per-lane tie counts must match the oracle row tallies
            for lane in lanes:
                assert count[r, c, lane] == (want[:, 0] == lane).sum()
            if (count[r, c, lanes] == 1).all():
                rec = np.stack(
                    [lanes, bestd[r, c, lanes] - lanes], axis=1
                )
                np.testing.assert_array_equal(rec, want)
