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
    # Returns 0 (not a doomed unroll=2) when even the minimum cannot fit:
    # the triple-buffered window term alone exceeds the limit here.
    assert _auto_unroll(64, 1024, 1024, 65536) == 0
    # Preserves evenness through every descent branch (6 -> never 3).
    assert _auto_unroll(48, 256, 256, 2368) % 2 == 0
    for u0 in (6, 14):
        u = _auto_unroll(u0, 256, 320, 640)
        assert u % 2 == 0


def test_plan_diag_falls_back_to_chunked():
    """ADVICE r1 (medium): m_pad=256 reads vs refs padded to 6144 fit
    the old `n <= _CHUNKED_REF_N` gate but the whole-table window alone
    exceeds scoped VMEM at ANY unroll — plan_diag must say so, and the
    chunked planner must produce a fitting config instead."""
    from sparksmithwaterman_tpu.ops.pallas_score import _plan_chunk, plan_diag

    assert plan_diag(256, 256, 6144) is None
    chunk, unroll = _plan_chunk(256, 256, 2048, 64, extra_regs=4)
    assert chunk % 8 == 0 and chunk % unroll == 0 and unroll % 2 == 0
    # The resolved config fits the VMEM model.
    from sparksmithwaterman_tpu.ops.pallas_score import _auto_unroll

    assert _auto_unroll(unroll, 256, 256, chunk, extra_regs=4) == unroll
    # Sane configs still pick the whole table.
    assert plan_diag(512, 128, 2048) is not None


def test_batch_backend_routes_unfittable_to_chunked(monkeypatch, make_seq):
    """_score_grid_dev must pick the chunked kernel when plan_diag says
    the whole-table form cannot fit (not dispatch a doomed config)."""
    from sparksmithwaterman_tpu.config import AlignConfig
    from sparksmithwaterman_tpu.models import batch_backend as bb

    from sparksmithwaterman_tpu.ops import pallas_score as ps

    config = AlignConfig(ref_dir=".", in_dir=".", out_dir=".")
    be = bb.BatchBackend(config)
    be.use_pallas = True  # force the kernel path on CPU via interpret
    calls = {"whole": 0, "chunked": 0}

    def fake_whole(*a, **k):
        calls["whole"] += 1
        return ps.pallas_score_grid_diag(*a, **k, interpret=True)

    def fake_chunked(*a, **k):
        calls["chunked"] += 1
        return ps.pallas_score_grid_diag_chunked(*a, **k, interpret=True)

    monkeypatch.setattr(bb, "pallas_score_grid_diag", fake_whole)
    monkeypatch.setattr(bb, "pallas_score_grid_diag_chunked", fake_chunked)
    monkeypatch.setattr(bb, "plan_diag", lambda *a, **k: None)
    reads_enc = encode_batch([make_seq(12) for _ in range(8)], 16, READ_PAD)
    refs_enc = encode_batch([make_seq(50) for _ in range(8)], 64, REF_PAD)
    got = np.asarray(be._score_grid_dev(reads_enc, refs_enc))[:8, :8]
    want = np.asarray(score_grid(reads_enc, refs_enc, 5, -3, -4))
    np.testing.assert_array_equal(got, want)
    assert calls["chunked"] == 1 and calls["whole"] == 0


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


@pytest.mark.parametrize("mode", ["whole", "chunked", "stream"])
def test_packed_kernel_matches_lax(make_seq, mode):
    """Packed rows (several reads per row, _START_BIT boundaries) score
    every read identically to the unpacked reference recurrence."""
    from sparksmithwaterman_tpu.ops.packing import pack_reads, read_best
    from sparksmithwaterman_tpu.ops.pallas_score import pallas_lane_best_packed

    rng = np.random.default_rng(7)
    reads = [make_seq(int(l)) for l in rng.integers(1, 60, 21)]
    reads.append("")  # empty read -> score 0 per oracle
    refs = [make_seq(int(l)) for l in rng.integers(20, 100, 5)]
    m_pack = 64
    packed, start_idx = pack_reads(reads, m_pack)
    refs_enc = encode_batch(refs, 128, REF_PAD)
    lane_best = pallas_lane_best_packed(
        packed, refs_enc, 5, -3, -4, read_block=8, mode=mode, interpret=True,
    )
    got = np.asarray(read_best(lane_best, start_idx))
    reads_enc = encode_batch(reads, m_pack, READ_PAD)
    want = np.asarray(score_grid(reads_enc, refs_enc, 5, -3, -4))
    np.testing.assert_array_equal(got, want)


def test_pack_reads_geometry():
    from sparksmithwaterman_tpu.ops.packing import pack_reads
    from sparksmithwaterman_tpu.ops.pallas_score import _START_BIT

    reads = ["ACGT" * 10, "AC", "GGGG", ""]  # 40 + 2 + 4 + 1 lanes
    packed, start_idx = pack_reads(reads, 48)
    assert packed.shape[0] % 8 == 0
    # FFD: the 40-lane read shares a row with the small ones (47 <= 48).
    row0 = packed[0]
    starts = np.flatnonzero(row0 >= _START_BIT)
    assert len(starts) >= 4  # 4 segments + possibly trailing marker
    # Every read's start lane is marked and carries its first base.
    flat = packed.reshape(-1)
    for i, r in enumerate(reads):
        assert flat[start_idx[i]] >= _START_BIT
        if r:
            assert (flat[start_idx[i]] & (_START_BIT - 1)) == ord(r[0])
    # Start lanes are distinct.
    assert len(set(start_idx.tolist())) == len(reads)
