"""Sharded-engine tests on the 8-virtual-device CPU mesh (SURVEY.md §4)."""

import numpy as np
import pytest

import jax

from sparksmithwaterman_tpu.config import AlignConfig
from sparksmithwaterman_tpu.io.fasta import READ_PAD, REF_PAD, encode_batch
from sparksmithwaterman_tpu.ops.recurrence import score_grid
from sparksmithwaterman_tpu.parallel import (
    ShardedBackend,
    build_mesh,
    sharded_score_grid,
    sharded_totals,
)

PARAMS = (np.int32(5), np.int32(-3), np.int32(-4))


def test_virtual_device_count():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("shape", [(8, 1), (1, 8), (4, 2), (2, 4)])
def test_sharded_score_grid_matches_local(make_seq, shape):
    mesh = build_mesh(shape)
    reads = [make_seq(int(l)) for l in np.random.default_rng(0).integers(4, 20, 16)]
    refs = [make_seq(int(l)) for l in np.random.default_rng(1).integers(10, 60, 8)]
    reads_enc = encode_batch(reads, 24, READ_PAD)
    refs_enc = encode_batch(refs, 64, REF_PAD)
    got = np.asarray(
        sharded_score_grid(reads_enc, refs_enc, *PARAMS, mesh=mesh)
    )
    want = np.asarray(score_grid(reads_enc, refs_enc, *PARAMS))
    np.testing.assert_array_equal(got, want)


def test_sharded_totals_psum(make_seq):
    mesh = build_mesh((2, 4))
    reads = [make_seq(12) for _ in range(8)]
    refs = [make_seq(40) for _ in range(4)]
    reads_enc = encode_batch(reads, 16, READ_PAD)
    refs_enc = encode_batch(refs, 64, REF_PAD)
    got = np.asarray(sharded_totals(reads_enc, refs_enc, *PARAMS, mesh=mesh))
    want = np.asarray(score_grid(reads_enc, refs_enc, *PARAMS)).sum(axis=0)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("strategy", ["shard_refs", "shard_reads"])
def test_sharded_backend_matches_batch(tmp_path, make_seq, strategy):
    from sparksmithwaterman_tpu.models.batch_backend import BatchBackend

    config = AlignConfig(
        ref_dir=str(tmp_path),
        in_dir=str(tmp_path),
        out_dir=str(tmp_path),
        strategy=strategy,
        read_bucket=16,
        ref_bucket=32,
    )
    # Ragged, non-multiple-of-mesh counts on purpose.
    reads = [make_seq(int(l)) for l in np.random.default_rng(2).integers(1, 15, 11)]
    refs = [make_seq(int(l)) for l in np.random.default_rng(3).integers(5, 30, 5)]
    sharded = ShardedBackend(config)
    batch = BatchBackend(config)
    np.testing.assert_array_equal(
        sharded.totals(reads, refs), batch.totals(reads, refs)
    )
    assert sharded.sites_for_ref(refs[0], reads) == batch.sites_for_ref(
        refs[0], reads
    )
