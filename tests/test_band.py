"""Banded wavefront kernel with boundary columns (the intra-chip fill
of the cross-chip shard_seq strategy — VERDICT r3 task 3).

Interpret-mode parity on CPU at tiny shapes; the exactness contract is:
chaining segments left-to-right through the boundary columns (zero
initial boundary) must equal the unsegmented kernel — and the serial
oracle — on the full reference.
"""

import numpy as np
import pytest

from sparksmithwaterman_tpu.io.fasta import READ_PAD, REF_PAD, encode_batch
from sparksmithwaterman_tpu.ops.packing import pack_reads, read_best
from sparksmithwaterman_tpu.ops.pallas_score import (
    pallas_band_lane_best,
)
from sparksmithwaterman_tpu.ops.recurrence import score_grid

PARAMS = (np.int32(5), np.int32(-3), np.int32(-4))
_BASES = np.array(list("ACGT"))


def _rand_seqs(rng, lens):
    return ["".join(rng.choice(_BASES, size=int(l))) for l in lens]


def _want(reads, refs, m_pad, n_pad):
    return np.asarray(
        score_grid(
            encode_batch(reads, m_pad, READ_PAD),
            encode_batch(refs, n_pad, REF_PAD),
            *PARAMS,
        )
    )


def _band_chain(packed, si, ref, m_pack, num_segs, reads):
    """Chain ``num_segs`` equal segments through the boundary columns."""
    rows = packed.shape[0]
    seg_len = -(-len(ref) // num_segs)
    ref_pad = ref + "\x00" * (num_segs * seg_len - len(ref))
    bnd = np.zeros((rows, m_pack), np.int32)
    lane_best = np.full((rows, m_pack), 0, np.int32)
    for s in range(num_segs):
        seg = ref_pad[s * seg_len : (s + 1) * seg_len]
        seg_enc = encode_batch([seg.replace("\x00", "")], seg_len, REF_PAD)[0]
        lane, bnd = pallas_band_lane_best(
            packed, seg_enc, bnd,
            *(int(p) for p in PARAMS),
            read_block=8, unroll=8, interpret=True,
        )
        lane_best = np.maximum(lane_best, np.asarray(lane))
        bnd = np.asarray(bnd)
    # read_best expects the (C, ROWS, M) lane layout; C=1 here.
    return np.asarray(read_best(lane_best[None], si)).reshape(len(reads))


@pytest.mark.parametrize("m_pack", [128, 256])
def test_band_zero_boundary_matches_plain(m_pack):
    """One segment + zero boundary == the ordinary packed kernel."""
    rng = np.random.default_rng(17)
    reads = _rand_seqs(rng, [60, 40, min(200, m_pack - 56), 25])
    ref = "".join(rng.choice(_BASES, size=300))
    packed, si = pack_reads(reads, m_pack, row_multiple=8)
    seg_enc = encode_batch([ref], 300, REF_PAD)[0]
    bnd = np.zeros(packed.shape, np.int32)
    lane, _ = pallas_band_lane_best(
        packed, seg_enc, bnd,
        *(int(p) for p in PARAMS),
        read_block=8, unroll=8, interpret=True,
    )
    got = np.asarray(read_best(np.asarray(lane)[None], si))
    want = _want(reads, [ref], m_pack, 300)
    assert np.array_equal(got.reshape(-1, 1), want)


@pytest.mark.parametrize("num_segs", [2, 3, 5])
def test_band_chained_segments_exact(num_segs):
    """Splitting the reference into segments and chaining boundary
    columns is EXACT vs the whole-reference fill — alignments crossing
    every segment edge included (the reference's wavefront crosses its
    per-diagonal boundaries the same way,
    src/sw/DistributedSW.java:364-417)."""
    rng = np.random.default_rng(23)
    reads = _rand_seqs(rng, [50, 30, 70, 20])
    # Embed one read across the midpoint so the winning path must cross
    # a segment boundary.
    base = "".join(rng.choice(_BASES, size=240))
    mid = 120 - len(reads[0]) // 2
    ref = base[:mid] + reads[0] + base[mid + len(reads[0]) :]
    packed, si = pack_reads(reads, 128, row_multiple=8)
    got = _band_chain(packed, si, ref, 128, num_segs, reads)
    want = _want(reads, [ref], 128, len(ref)).reshape(-1)
    assert np.array_equal(got, want)
    assert got[0] == 5 * len(reads[0])  # the embedded read aligns fully


def test_band_interleaved_chained_m256():
    """Chained segments at the interleaved 256-lane tier."""
    rng = np.random.default_rng(31)
    reads = _rand_seqs(rng, [150, 60, 130, 40])
    ref = "".join(rng.choice(_BASES, size=200))
    packed, si = pack_reads(reads, 256, row_multiple=8)
    got = _band_chain(packed, si, ref, 256, 2, reads)
    want = _want(reads, [ref], 256, len(ref)).reshape(-1)
    assert np.array_equal(got, want)
