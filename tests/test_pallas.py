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


def test_auto_unroll_vmem_model():
    """Regression: read batches padded past 128bp must not blow scoped VMEM.

    Two v5e-measured anchor points (docstring of ``_auto_unroll``): the
    bench config rb=512/m=128 fits at unroll=64, while rb=256/m=256 at
    unroll=64 OOMed on hardware (reported 17.89MB vs the 16MB scoped
    limit) and must be capped.
    """
    from sparksmithwaterman_tpu.ops.pallas_score import _auto_unroll

    # Bench config keeps its measured-good unroll.
    assert _auto_unroll(64, 512, 128, 2240) == 64
    # The hardware-OOM config is capped to a fitting unroll (40 is the
    # largest step-8 value whose estimate fits the 16MB scoped limit).
    assert _auto_unroll(64, 256, 256, 2368) == 40
    # Never returns less than 2, and preserves evenness.
    assert _auto_unroll(64, 1024, 1024, 65536) == 2
    assert _auto_unroll(48, 256, 256, 2368) % 2 == 0


def test_diag_kernel_wide_reads_matches_lax(make_seq):
    """The m=256 path (auto-capped unroll) stays score-exact."""
    from sparksmithwaterman_tpu.ops.pallas_score import default_interpret

    reads = [make_seq(200) for _ in range(8)]
    refs = [make_seq(500) for _ in range(2)]
    reads_enc = encode_batch(reads, 256, READ_PAD)
    refs_enc = encode_batch(refs, 512, REF_PAD)
    got = pallas_score_grid_diag(
        reads_enc, refs_enc, 5, -3, -4, read_block=8,
        interpret=default_interpret(),
    )
    want = score_grid(reads_enc, refs_enc, 5, -3, -4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
