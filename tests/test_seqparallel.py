"""Sequence-parallelism tests: length-sharded ref, ppermute boundaries.

Parity target: the vectorized recurrence (itself oracle-verified in
test_recurrence.py) on the unsharded problem.
"""

import numpy as np
import pytest

from sparksmithwaterman_tpu.io.fasta import READ_PAD, REF_PAD, encode_batch
from sparksmithwaterman_tpu.ops.recurrence import score_pairs
from sparksmithwaterman_tpu.parallel.mesh import build_mesh
from sparksmithwaterman_tpu.parallel.seqparallel import seqparallel_scores

PARAMS = (5, -3, -4)


def _want(reads, ref):
    m = max(len(r) for r in reads)
    reads_enc = encode_batch(list(reads), m, READ_PAD)
    refs_enc = encode_batch([ref] * len(reads), len(ref), REF_PAD)
    return np.asarray(
        score_pairs(
            reads_enc, refs_enc,
            np.int32(PARAMS[0]), np.int32(PARAMS[1]), np.int32(PARAMS[2]),
        )
    )


@pytest.mark.parametrize("seq_devices", [8, 4, 2, 1])
def test_seqparallel_matches_serial(make_seq, seq_devices):
    mesh = build_mesh((seq_devices,), axis_names=("seq",), n_devices=seq_devices)
    rng = np.random.default_rng(seq_devices)
    reads = [make_seq(int(l)) for l in rng.integers(5, 30, 6)]
    ref = make_seq(199)  # deliberately not divisible by the mesh size
    got = np.asarray(
        seqparallel_scores(reads, ref, *PARAMS, mesh=mesh, stripe=4)
    )
    np.testing.assert_array_equal(got, _want(reads, ref))


def test_seqparallel_stripe_padding(make_seq):
    """Read lengths not divisible by the stripe height still agree."""
    mesh = build_mesh((8,), axis_names=("seq",), n_devices=8)
    reads = [make_seq(13), make_seq(7)]
    ref = make_seq(96)
    got = np.asarray(
        seqparallel_scores(reads, ref, *PARAMS, mesh=mesh, stripe=8)
    )
    np.testing.assert_array_equal(got, _want(reads, ref))


def test_seqparallel_alignment_spans_boundary(make_seq):
    """A perfect hit straddling segment boundaries must score fully:
    the W/NW chains cross chips only via the ppermute'd boundary column,
    so this exercises the ring exchange end-to-end."""
    mesh = build_mesh((8,), axis_names=("seq",), n_devices=8)
    rng = np.random.default_rng(3)
    ref = make_seq(160)
    # Segment width is 20; plant a 50bp read across segments 2..5.
    read = ref[35:85]
    got = np.asarray(
        seqparallel_scores([read], ref, *PARAMS, mesh=mesh, stripe=4)
    )
    assert got[0] == 5 * 50
    np.testing.assert_array_equal(got, _want([read], ref))


def test_seqparallel_backend_strategy(tmp_path, make_seq):
    """The shard_seq pipeline strategy is total- and site-identical to
    the single-host batch backend on ragged real-ish inputs."""
    from sparksmithwaterman_tpu.config import AlignConfig
    from sparksmithwaterman_tpu.models.aligner import get_backend
    from sparksmithwaterman_tpu.models.batch_backend import BatchBackend

    config = AlignConfig(
        ref_dir=str(tmp_path),
        in_dir=str(tmp_path),
        out_dir=str(tmp_path),
        strategy="shard_seq",
        read_bucket=16,
        ref_bucket=32,
    )
    rng = np.random.default_rng(7)
    reads = [make_seq(int(l)) for l in rng.integers(1, 15, 9)]
    refs = [make_seq(int(l)) for l in rng.integers(5, 90, 4)]
    seqp = get_backend(config)
    batch = BatchBackend(config)
    np.testing.assert_array_equal(
        seqp.totals(reads, refs), batch.totals(reads, refs)
    )
    assert seqp.sites_for_ref(refs[0], reads) == batch.sites_for_ref(
        refs[0], reads
    )


def test_seqparallel_encoded_inputs(make_seq):
    mesh = build_mesh((4,), axis_names=("seq",), n_devices=4)
    reads_enc = encode_batch([make_seq(16), make_seq(12)], 16, READ_PAD)
    ref = make_seq(64)
    ref_enc = encode_batch([ref], 64, REF_PAD)[0]
    got = np.asarray(
        seqparallel_scores(reads_enc, ref_enc, *PARAMS, mesh=mesh, stripe=8)
    )
    refs_full = np.broadcast_to(ref_enc, (2, ref_enc.shape[0]))
    want = np.asarray(
        score_pairs(
            reads_enc, np.ascontiguousarray(refs_full),
            np.int32(5), np.int32(-3), np.int32(-4),
        )
    )
    np.testing.assert_array_equal(got, want)


def test_batched_seqparallel_matches_oracle(make_seq):
    """One dispatch scores MANY length-sharded refs (VERDICT r2 task 4);
    scores stay bitwise-oracle-exact, padded batch rows are harmless."""
    import jax

    from sparksmithwaterman_tpu.core import oracle
    from sparksmithwaterman_tpu.io.fasta import READ_PAD, REF_PAD, encode_batch
    from sparksmithwaterman_tpu.parallel.mesh import build_mesh
    from sparksmithwaterman_tpu.parallel.seqparallel import (
        seqparallel_scores_batch,
    )

    n_dev = min(4, len(jax.devices()))
    mesh = build_mesh((n_dev,), axis_names=("seq",), n_devices=n_dev)
    reads = [make_seq(12) for _ in range(5)] + [""]
    refs = [make_seq(40), make_seq(37), make_seq(24)]
    reads_enc = encode_batch(reads, 16, READ_PAD)
    n_pad = -(-40 // n_dev) * n_dev
    refs_enc = encode_batch(refs + [""], n_pad, REF_PAD)  # padded tail row
    got = np.asarray(
        seqparallel_scores_batch(
            reads_enc, refs_enc, 5, -3, -4, mesh=mesh, stripe=8
        )
    )
    for c, ref in enumerate(refs):
        for b, read in enumerate(reads):
            assert got[c, b] == oracle.opt_alignments(ref, read)[0]
    assert (got[3] == 0).all()  # all-pad ref row scores exactly 0


@pytest.mark.parametrize("seq_devices", [4, 2, 1])
def test_band_ring_matches_oracle(make_seq, seq_devices):
    """The banded-Pallas ring (VERDICT r3 task 3): whole-ref bands per
    (chip, round) with boundary columns ppermute'd between chips must be
    bitwise-exact vs the unsegmented recurrence — including a read
    planted across a segment boundary."""
    from sparksmithwaterman_tpu.ops.recurrence import score_grid
    from sparksmithwaterman_tpu.parallel.seqparallel import (
        seqparallel_scores_band,
    )

    mesh = build_mesh(
        (seq_devices,), axis_names=("seq",), n_devices=seq_devices
    )
    rng = np.random.default_rng(seq_devices + 40)
    base = make_seq(120)
    reads = [make_seq(int(l)) for l in rng.integers(5, 40, 5)]
    reads.append(base[45:95])  # straddles the 1/4..3/4 segment edges
    refs = [base, make_seq(77), make_seq(33)]
    n_pad = -(-120 // (4 * seq_devices)) * 4 * seq_devices
    refs_enc = encode_batch(refs, n_pad, REF_PAD)
    got = np.asarray(
        seqparallel_scores_band(
            reads, refs_enc, *PARAMS, mesh=mesh, unroll=8, interpret=True
        )
    )
    m = max(len(r) for r in reads)
    want = np.asarray(
        score_grid(
            encode_batch(reads, m, READ_PAD),
            refs_enc,
            np.int32(5), np.int32(-3), np.int32(-4),
        )
    ).T  # (C, R)
    np.testing.assert_array_equal(got, want)
    assert got[0, -1] == 5 * 50  # the straddling read aligns fully


def test_band_backend_parity(make_seq, monkeypatch):
    """SeqParallelBackend with the band path forced on (interpret mode)
    equals the lax path bit-for-bit."""
    from sparksmithwaterman_tpu.config import AlignConfig
    from sparksmithwaterman_tpu.parallel import seqparallel as sp

    cfg = AlignConfig(
        ref_dir=".", in_dir=".", out_dir=".", strategy="shard_seq",
        read_bucket=8, ref_bucket=8,
    )
    be_lax = sp.SeqParallelBackend(cfg)
    be_band = sp.SeqParallelBackend(cfg)
    be_band._use_band = True
    real = sp.seqparallel_scores_band
    monkeypatch.setattr(
        sp, "seqparallel_scores_band",
        lambda *a, **k: real(*a, **{**k, "interpret": True, "unroll": 8}),
    )
    reads = [make_seq(10) for _ in range(3)]
    refs = [make_seq(int(n)) for n in (30, 64, 17)]
    np.testing.assert_array_equal(
        be_band.totals(reads, refs), be_lax.totals(reads, refs)
    )


def test_seqparallel_backend_totals_batched(tmp_path, make_seq):
    """SeqParallelBackend.totals (now chunk-batched) equals SerialBackend."""
    from sparksmithwaterman_tpu.config import AlignConfig
    from sparksmithwaterman_tpu.models.aligner import SerialBackend
    from sparksmithwaterman_tpu.parallel.seqparallel import SeqParallelBackend

    cfg = AlignConfig(
        ref_dir=".", in_dir=".", out_dir=".", strategy="shard_seq",
        read_bucket=8, ref_bucket=8,
    )
    be = SeqParallelBackend(cfg)
    reads = [make_seq(10) for _ in range(4)]
    refs = [make_seq(int(n)) for n in (30, 64, 17, 90, 33, 9, 120, 56, 41)]
    got = be.totals(reads, refs)
    want = SerialBackend(cfg.scoring).totals(reads, refs)
    np.testing.assert_array_equal(got, want)


def test_seqparallel_totals_int32_partial_sums(make_seq, monkeypatch):
    """The read-axis reduction must stay exact past the int32-safe read
    count (VERDICT r4 weak-6): force a tiny r_safe so totals() takes the
    partial-sum path and still matches the serial engine."""
    from sparksmithwaterman_tpu.config import AlignConfig
    from sparksmithwaterman_tpu.models.aligner import SerialBackend
    from sparksmithwaterman_tpu.parallel import seqparallel as sp

    cfg = AlignConfig(
        ref_dir=".", in_dir=".", out_dir=".", strategy="shard_seq",
        read_bucket=8, ref_bucket=8,
    )
    reads = [make_seq(10) for _ in range(7)]
    refs = [make_seq(int(n)) for n in (30, 64, 17)]
    want = SerialBackend(cfg.scoring).totals(reads, refs)
    # match * m_read = 50 -> r_safe = 2 with this bound: 7 reads need
    # 4 partials per ref.
    monkeypatch.setattr(sp, "_INT32_SAFE", 100)
    got = sp.SeqParallelBackend(cfg).totals(reads, refs)
    np.testing.assert_array_equal(got, want)
